from .matcher import match
from .nms import nms_mask, multiclass_nms
from .roi_align import roi_align, roi_pool

__all__ = ["match", "nms_mask", "multiclass_nms", "roi_align", "roi_pool"]
