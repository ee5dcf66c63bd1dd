from .build import BACKBONE_REGISTRY, META_ARCH_REGISTRY, Registry, build_model
from .meta_arch import GeneralizedRCNNWSL

__all__ = [
    "BACKBONE_REGISTRY", "META_ARCH_REGISTRY", "Registry", "build_model",
    "GeneralizedRCNNWSL",
]
