from .resnet_ws import ResNetWS, build_ws_resnet_backbone
from .vgg import VGG16, build_vgg_backbone

__all__ = ["ResNetWS", "build_ws_resnet_backbone", "VGG16", "build_vgg_backbone"]
