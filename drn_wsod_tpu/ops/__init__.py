from .matcher import match
from .nms import nms_mask, multiclass_nms
from .roi_align import roi_align, roi_pool
from .roi_align_rotated import roi_align_rotated
from .roi_pool_pallas import roi_pool_pallas
from .poolers import assign_boxes_to_levels, multilevel_roi_pool
from .deform_conv import deform_conv2d
from .crf import crf_forward, crf_inference
from .mask_ops import paste_masks_in_image
from . import csc, pcl

__all__ = [
    "match", "nms_mask", "multiclass_nms", "roi_align",
    "roi_align_rotated", "roi_pool",
    "roi_pool_pallas", "assign_boxes_to_levels", "multilevel_roi_pool",
    "deform_conv2d", "crf_forward", "crf_inference", "paste_masks_in_image", "csc", "pcl",
]
