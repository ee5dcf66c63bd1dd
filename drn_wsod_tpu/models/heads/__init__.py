from .box_head import DiscriminativeAdaptionNeck
from . import wsddn, oicr

__all__ = ["DiscriminativeAdaptionNeck", "wsddn", "oicr"]
