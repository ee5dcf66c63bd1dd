"""OICR online instance refinement (the DRN-WSOD main head).

Re-implementation of the reference OICR machinery as fixed-shape masked
tensor ops, replacing per-image Python loops:

  * pseudo-GT mining ``get_pgt`` (projects/WSL/wsl/modeling/roi_heads/
    roi_heads_oicr.py:491-567): per *present* image class, the top-scoring
    proposal of the previous branch becomes a pseudo box; its weight is the
    WSDDN image-level evidence of that class.
  * proposal labeling (roi_heads.py:255-353 + detectron2/modeling/matcher.py):
    IoU-match all proposals against the pseudo boxes; >= 0.5 -> foreground of
    the matched class, else background; every proposal inherits the weight of
    its best-matching pseudo box.
  * branch loss (fast_rcnn.py:1128-1144): weighted softmax CE over K+1
    classes, sum / (# proposals with weight > 1e-12).
  * optional per-branch box regression (fast_rcnn.py:1146-1240).

Here a "class slot" axis of size C replaces the variable-length present-class
list: absent classes are masked out of matching by giving their pseudo boxes
-1 match quality.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.matcher import match
from ...structures import boxes as box_ops


class RefinementOutputLayers(nn.Module):
    """Linear cls (C+1) + linear box deltas per refinement branch
    (reference OICROutputLayers, fast_rcnn.py:1280-1340)."""

    num_classes: int
    cls_agnostic_bbox_reg: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray):
        """feats: (B, P, D) -> (cls_logits (B, P, C+1), deltas (B, P, R*4))."""
        cls_logits = nn.Dense(
            self.num_classes + 1,
            kernel_init=nn.initializers.normal(stddev=0.01),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="cls_score",
        )(feats)
        num_reg = 1 if self.cls_agnostic_bbox_reg else self.num_classes
        deltas = nn.Dense(
            num_reg * 4,
            kernel_init=nn.initializers.normal(stddev=0.001),
            bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="bbox_pred",
        )(feats)
        return cls_logits.astype(jnp.float32), deltas.astype(jnp.float32)


class PseudoTargets(NamedTuple):
    """Per-image mined pseudo ground truth, one slot per class."""

    boxes: jnp.ndarray    # (C, 4) seed box per class slot
    valid: jnp.ndarray    # (C,) bool — class present in image labels
    weights: jnp.ndarray  # (C,) WSDDN image evidence per class
    scores: jnp.ndarray   # (C,) seed proposal score (vis/stats only)


def mine_pgt(prev_scores: jnp.ndarray, prev_boxes: jnp.ndarray,
             prop_mask: jnp.ndarray, labels: jnp.ndarray,
             img_evidence: jnp.ndarray) -> PseudoTargets:
    """Mine one pseudo box per present class (single image).

    Args:
      prev_scores: (P, C) previous-branch class scores (fg columns only).
      prev_boxes: (P, 4) class-agnostic or (P, C, 4) class-specific boxes of
        the previous branch.
      prop_mask: (P,) proposal validity.
      labels: (C,) multi-hot image labels.
      img_evidence: (C,) clamped WSDDN image probabilities
        (``pred_class_img_logits`` in the reference).
    """
    C = prev_scores.shape[1]
    masked = jnp.where(prop_mask[:, None], prev_scores, -jnp.inf)
    seed_idx = jnp.argmax(masked, axis=0)                      # (C,)
    seed_score = jnp.max(masked, axis=0)
    if prev_boxes.ndim == 3:
        boxes = prev_boxes[seed_idx, jnp.arange(C)]
    else:
        boxes = prev_boxes[seed_idx]
    valid = labels > 0.5
    return PseudoTargets(
        boxes=boxes,
        valid=valid,
        weights=img_evidence,
        scores=jnp.where(valid, seed_score, 0.0),
    )


class ProposalTargets(NamedTuple):
    """Per-proposal supervision for one refinement branch (single image)."""

    gt_class: jnp.ndarray   # (P,) int32 in [0, C] (C = background), -1 ignore
    weight: jnp.ndarray     # (P,) float
    gt_box: jnp.ndarray     # (P, 4) matched pseudo box (for box reg)


def label_proposals(pgt: PseudoTargets, proposals: jnp.ndarray,
                    prop_mask: jnp.ndarray,
                    iou_thresholds=(0.5,), iou_labels=(0, 1)) -> ProposalTargets:
    """Match proposals to mined pseudo-GT (single image)."""
    C = pgt.valid.shape[0]
    quality = box_ops.pairwise_iou(pgt.boxes, proposals)   # (C, P)
    midx, mlab = match(quality, pgt.valid, list(iou_thresholds), list(iou_labels))
    gt_class = jnp.where(mlab == 1, midx, jnp.int32(C))
    gt_class = jnp.where(mlab == -1, jnp.int32(-1), gt_class)
    gt_class = jnp.where(prop_mask, gt_class, jnp.int32(-1))
    weight = pgt.weights[midx]
    weight = jnp.where((gt_class >= 0), weight, 0.0)
    return ProposalTargets(gt_class=gt_class, weight=weight,
                           gt_box=pgt.boxes[midx])


def refinement_loss(cls_logits: jnp.ndarray, targets: ProposalTargets) -> jnp.ndarray:
    """Weighted CE over the batch (reference fast_rcnn.py:1128-1144).

    cls_logits: (B, P, C+1); targets fields: (B, P).
    """
    logp = jax.nn.log_softmax(cls_logits, axis=-1)
    cls = jnp.maximum(targets.gt_class, 0)
    ce = -jnp.take_along_axis(logp, cls[..., None], axis=-1)[..., 0]
    ce = jnp.where(targets.gt_class >= 0, ce, 0.0)
    w = targets.weight
    valid = (w > 1e-12).astype(jnp.float32)
    return jnp.sum(ce * w) / jnp.maximum(jnp.sum(valid), 1.0)


def refinement_box_loss(deltas: jnp.ndarray, proposals: jnp.ndarray,
                        targets: ProposalTargets, prop_mask: jnp.ndarray,
                        num_classes: int,
                        reg_weights=(10.0, 10.0, 5.0, 5.0),
                        smooth_l1_beta: float = 0.0) -> jnp.ndarray:
    """Smooth-L1 box regression against matched pseudo boxes, foreground
    proposals only, normalized by total proposal count
    (reference fast_rcnn.py:1146-1240).

    deltas: (B, P, R*4); proposals: (B, P, 4).
    """
    B, P = targets.gt_class.shape
    fg = (targets.gt_class >= 0) & (targets.gt_class < num_classes)
    gt_deltas = box_ops.get_deltas(proposals, targets.gt_box, reg_weights)
    R = deltas.shape[-1] // 4
    d = deltas.reshape(B, P, R, 4)
    cls_idx = jnp.clip(targets.gt_class, 0, R - 1)
    pred = jnp.take_along_axis(d, cls_idx[..., None, None].repeat(4, -1), axis=2)[:, :, 0]
    diff = jnp.abs(pred - gt_deltas)
    if smooth_l1_beta > 0:
        l = jnp.where(diff < smooth_l1_beta,
                      0.5 * diff ** 2 / smooth_l1_beta,
                      diff - 0.5 * smooth_l1_beta)
    else:
        l = diff
    l = jnp.where(fg[..., None], l, 0.0)
    denom = jnp.maximum(jnp.sum(prop_mask.astype(jnp.float32)), 1.0)
    return jnp.sum(l) / denom


def branch_probs(cls_logits: jnp.ndarray) -> jnp.ndarray:
    """Softmax probabilities over K+1 classes; (B, P, C+1)."""
    return jax.nn.softmax(cls_logits, axis=-1)


def average_branch_probs(cls_logits_list) -> jnp.ndarray:
    """Inference-time mean of branch softmaxes
    (reference predict_probs_K, fast_rcnn.py:1577-1596)."""
    probs = [jax.nn.softmax(l, axis=-1) for l in cls_logits_list]
    return sum(probs) / len(probs)
