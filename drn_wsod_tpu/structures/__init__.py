from .boxes import (
    BoxMode,
    area,
    clip,
    nonempty,
    pairwise_intersection,
    pairwise_iou,
    pairwise_iou_wsl,
    unique_boxes_mask,
    get_deltas,
    apply_deltas,
)
from .batch import WSODBatch, Detections
from .keypoints import Keypoints
from .masks import BitMasks, PolygonMasks, rasterize_polygons
from .rotated_boxes import (nms_rotated, pairwise_iou_rotated,
                            rotated_to_corners)

__all__ = [
    "BoxMode", "area", "clip", "nonempty", "pairwise_intersection",
    "pairwise_iou", "pairwise_iou_wsl", "unique_boxes_mask",
    "get_deltas", "apply_deltas", "WSODBatch", "Detections",
    "nms_rotated", "pairwise_iou_rotated", "rotated_to_corners",
    "BitMasks", "PolygonMasks", "rasterize_polygons", "Keypoints",
]
