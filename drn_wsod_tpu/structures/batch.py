"""Fixed-shape batch containers.

The reference threads ``List[Instances]`` with per-image variable lengths
through the whole stack (detectron2/structures/instances.py:7). On TPU every
shape must be static, so the framework's central data structures are padded,
masked pytrees: one compilation per (image-bucket, proposal-count) pair.
"""

from __future__ import annotations

from typing import Optional

import chex
import jax.numpy as jnp


@chex.dataclass
class WSODBatch:
    """A padded training/eval batch.

    Attributes:
      image: (B, H, W, 3) float — normalized pixels (NHWC, TPU-native layout;
        the reference uses NCHW).
      image_hw: (B, 2) int32 — valid (height, width) inside the padded canvas.
      orig_hw: (B, 2) int32 — original image size, for rescaling detections.
      proposals: (B, P, 4) float — XYXY boxes in the (resized) image frame.
      proposal_mask: (B, P) bool — validity of each padded proposal slot.
      objectness: (B, P) float — proposal objectness logits/scores.
      labels: (B, C) float — multi-hot image-level class labels.
      image_id: (B,) int32 — index into the dataset records (host bookkeeping).
    """

    image: jnp.ndarray
    image_hw: jnp.ndarray
    orig_hw: jnp.ndarray
    proposals: jnp.ndarray
    proposal_mask: jnp.ndarray
    objectness: jnp.ndarray
    labels: jnp.ndarray
    image_id: jnp.ndarray
    # Padded instance GT — used by the supervised Fast R-CNN head (pseudo-GT
    # retraining); WSOD heads only read the image-level ``labels``.
    gt_boxes: Optional[jnp.ndarray] = None    # (B, G, 4)
    gt_classes: Optional[jnp.ndarray] = None  # (B, G) int32
    gt_valid: Optional[jnp.ndarray] = None    # (B, G) bool
    # Dense GT for the supervised mask / keypoint / panoptic paths
    # (reference: Instances.gt_masks/gt_keypoints + "sem_seg" input key).
    gt_masks: Optional[jnp.ndarray] = None    # (B, G, H, W) {0,1}
    gt_keypoints: Optional[jnp.ndarray] = None  # (B, G, K, 3) x,y,vis
    sem_seg: Optional[jnp.ndarray] = None     # (B, H, W) int32, 255 = ignore

    @property
    def batch_size(self) -> int:
        return self.image.shape[0]

    @property
    def num_proposals(self) -> int:
        return self.proposals.shape[1]


@chex.dataclass
class Detections:
    """Fixed-size per-image detection results (padded with score = -1).

    Equivalent of the reference's inference-time ``Instances`` with
    pred_boxes/scores/pred_classes (projects/WSL/wsl/modeling/roi_heads/
    fast_rcnn.py:137-141), plus the full score/box matrices kept for TTA
    (fast_rcnn.py:103-106).
    """

    boxes: jnp.ndarray    # (B, D, 4)
    scores: jnp.ndarray   # (B, D)
    classes: jnp.ndarray  # (B, D) int32
    valid: jnp.ndarray    # (B, D) bool
    # Full (proposal, class) score / box matrices for TTA averaging.
    all_scores: Optional[jnp.ndarray] = None  # (B, P, C+1)
    all_boxes: Optional[jnp.ndarray] = None   # (B, P, 4) or (B, P, C*4)
