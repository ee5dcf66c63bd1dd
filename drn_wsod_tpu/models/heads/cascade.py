"""Cascade R-CNN stage helpers (supervised pseudo-GT retraining variant).

TPU-native re-design of the reference CascadeROIHeads
(detectron2/modeling/roi_heads/cascade_rcnn.py): K stages with increasing
IoU thresholds; stage k trains on the (gradient-detached) regressed boxes of
stage k-1, re-matched to GT at its own threshold (no re-sampling after stage
0, cascade_rcnn.py `_match_and_label_boxes`); inference averages class
probabilities over stages and takes the last stage's class-agnostic boxes.

Here every stage runs over the SAME static slot count chosen by the stage-0
subsample, so the whole cascade is one fixed-shape jitted program.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ...ops.matcher import match
from ...structures import boxes as box_ops


def match_and_label(boxes: jnp.ndarray, gt_boxes: jnp.ndarray,
                    gt_classes: jnp.ndarray, gt_valid: jnp.ndarray,
                    iou_threshold: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Label regressed boxes against GT at one cascade stage's threshold
    (single image; reference cascade_rcnn.py:_match_and_label_boxes).

    Returns (gt_class (-1 = background), gt_box) per slot.
    """
    quality = box_ops.pairwise_iou(gt_boxes, boxes)
    midx, mlab = match(quality, gt_valid, [iou_threshold], [0, 1])
    fg = mlab == 1
    cls = jnp.where(fg, gt_classes[midx], -1).astype(jnp.int32)
    return cls, gt_boxes[midx]
