from .resnet_ws import (ResNetPlain, ResNetWS, build_resnet_backbone,
                        build_ws_resnet_backbone)
from .vgg import VGG16, build_vgg_backbone

__all__ = ["ResNetPlain", "ResNetWS", "build_resnet_backbone",
           "build_ws_resnet_backbone", "VGG16", "build_vgg_backbone"]
