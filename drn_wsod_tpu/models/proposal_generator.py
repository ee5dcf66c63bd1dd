"""Anchor generation + RPN (Region Proposal Network).

Re-implementation of the reference proposal generator substrate
(detectron2/modeling/anchor_generator.py:20-378, proposal_generator/rpn.py:
24-508): WSOD itself uses precomputed proposals (the reference builder
returns None for "PrecomputedProposals", proposal_generator/build.py:15-24),
but the framework carries the full supervised substrate for pseudo-GT
retraining with learned proposals.

TPU shape discipline: anchors are a static (A*Hf*Wf, 4) grid per level; the
proposal selection keeps static top-k counts with validity masks instead of
filtering.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.matcher import match
from ..ops.nms import nms_mask
from ..structures import boxes as box_ops


def generate_anchors(feature_hw: Tuple[int, int], stride: int,
                     sizes: Sequence[float],
                     aspect_ratios: Sequence[float]) -> jnp.ndarray:
    """Dense anchor grid for one level -> (Hf*Wf*A, 4) XYXY
    (reference DefaultAnchorGenerator.grid_anchors + generate_cell_anchors,
    anchor_generator.py:80-185)."""
    cell = []
    for size in sizes:
        area = float(size) ** 2
        for ar in aspect_ratios:
            w = (area / ar) ** 0.5
            h = ar * w
            cell.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    cell_anchors = jnp.asarray(cell, dtype=jnp.float32)       # (A, 4)

    Hf, Wf = feature_hw
    shifts_x = (jnp.arange(Wf, dtype=jnp.float32) + 0.5) * stride
    shifts_y = (jnp.arange(Hf, dtype=jnp.float32) + 0.5) * stride
    sy, sx = jnp.meshgrid(shifts_y, shifts_x, indexing="ij")
    shifts = jnp.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)
    anchors = shifts + cell_anchors[None]
    return anchors.reshape(-1, 4)


class StandardRPNHead(nn.Module):
    """3x3 conv -> 1x1 objectness + 1x1 anchor deltas
    (reference rpn.py StandardRPNHead:31-85)."""

    num_anchors: int
    conv_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray]):
        conv = nn.Conv(self.conv_dim, (3, 3), dtype=self.dtype, name="conv")
        obj = nn.Conv(self.num_anchors, (1, 1),
                      kernel_init=nn.initializers.normal(0.01),
                      dtype=jnp.float32, name="objectness_logits")
        deltas = nn.Conv(self.num_anchors * 4, (1, 1),
                         kernel_init=nn.initializers.normal(0.01),
                         dtype=jnp.float32, name="anchor_deltas")
        outs = []
        for f in feats:
            t = nn.relu(conv(f))
            outs.append((obj(t), deltas(t)))
        return outs


def rpn_losses(anchors: jnp.ndarray, obj_logits: jnp.ndarray,
               pred_deltas: jnp.ndarray, gt_boxes: jnp.ndarray,
               gt_valid: jnp.ndarray, rng: jax.Array,
               batch_size: int = 256, positive_fraction: float = 0.5,
               iou_thresholds=(0.3, 0.7), iou_labels=(0, -1, 1),
               reg_weights=(1.0, 1.0, 1.0, 1.0)):
    """Single-image RPN losses (reference rpn.py:270-345): sampled binary
    objectness CE + smooth-L1 on positive anchors."""
    N = anchors.shape[0]
    quality = box_ops.pairwise_iou(gt_boxes, anchors)
    midx, mlab = match(quality, gt_valid, list(iou_thresholds),
                       list(iou_labels))

    num_pos = int(batch_size * positive_fraction)
    k1, k2 = jax.random.split(rng)
    pos_keys = jnp.where(mlab == 1, jax.random.uniform(k1, (N,)), -1.0)
    neg_keys = jnp.where(mlab == 0, jax.random.uniform(k2, (N,)), -1.0)
    pv, pi = jax.lax.top_k(pos_keys, num_pos)
    nv, ni = jax.lax.top_k(neg_keys, batch_size - num_pos)
    sel = jnp.concatenate([pi, ni])
    sel_valid = jnp.concatenate([pv >= 0, nv >= 0])
    sel_pos = jnp.concatenate([pv >= 0, jnp.zeros_like(nv, dtype=bool)])

    logits = obj_logits[sel]
    bce = jnp.where(sel_pos, -jax.nn.log_sigmoid(logits),
                    -jax.nn.log_sigmoid(-logits))
    bce = jnp.where(sel_valid, bce, 0.0)
    denom = jnp.maximum(sel_valid.sum(), 1)
    loss_obj = jnp.sum(bce) / denom

    gt_for = gt_boxes[midx[sel]]
    tgt = box_ops.get_deltas(anchors[sel], gt_for, reg_weights)
    diff = jnp.abs(pred_deltas[sel] - tgt)
    diff = jnp.where((sel_pos & sel_valid)[:, None], diff, 0.0)
    loss_loc = jnp.sum(diff) / denom
    return loss_obj, loss_loc


def select_proposals(anchors: jnp.ndarray, obj_logits: jnp.ndarray,
                     pred_deltas: jnp.ndarray, image_hw,
                     pre_nms_topk: int = 2000, post_nms_topk: int = 1000,
                     nms_thresh: float = 0.7, min_size: float = 0.0,
                     reg_weights=(1.0, 1.0, 1.0, 1.0)):
    """Decode + top-k + NMS, static shapes (reference
    find_top_rpn_proposals, proposal_utils.py). Single image, one level.

    Returns (boxes (post, 4), scores (post,), valid (post,)).
    """
    boxes = box_ops.apply_deltas(pred_deltas, anchors, reg_weights)
    boxes = box_ops.clip(boxes, image_hw)
    k = min(pre_nms_topk, boxes.shape[0])
    top_scores, top_idx = jax.lax.top_k(obj_logits, k)
    top_boxes = boxes[top_idx]
    ok = box_ops.nonempty(top_boxes, min_size) & jnp.isfinite(top_scores)
    keep = nms_mask(top_boxes, top_scores, ok, nms_thresh)
    kept_scores = jnp.where(keep, top_scores, -jnp.inf)
    k2 = min(post_nms_topk, k)
    final_scores, fi = jax.lax.top_k(kept_scores, k2)
    valid = jnp.isfinite(final_scores)
    return top_boxes[fi], jnp.where(valid, final_scores, 0.0), valid


def generate_rotated_anchors(feature_hw: Tuple[int, int], stride: int,
                             sizes: Sequence[float],
                             aspect_ratios: Sequence[float],
                             angles: Sequence[float]) -> jnp.ndarray:
    """Dense rotated anchor grid -> (Hf*Wf*A, 5) (cx, cy, w, h, deg)
    (reference RotatedAnchorGenerator, anchor_generator.py:227-330)."""
    cell = []
    for size in sizes:
        area = float(size) ** 2
        for ar in aspect_ratios:
            w = (area / ar) ** 0.5
            h = ar * w
            for a in angles:
                cell.append([0.0, 0.0, w, h, float(a)])
    cell_anchors = jnp.asarray(cell, dtype=jnp.float32)       # (A, 5)

    Hf, Wf = feature_hw
    shifts_x = (jnp.arange(Wf, dtype=jnp.float32) + 0.5) * stride
    shifts_y = (jnp.arange(Hf, dtype=jnp.float32) + 0.5) * stride
    sy, sx = jnp.meshgrid(shifts_y, shifts_x, indexing="ij")
    zeros = jnp.zeros_like(sx)
    shifts = jnp.stack([sx, sy, zeros, zeros, zeros],
                       axis=-1).reshape(-1, 1, 5)
    return (shifts + cell_anchors[None]).reshape(-1, 5)


def rrpn_losses(anchors: jnp.ndarray, obj_logits: jnp.ndarray,
                pred_deltas: jnp.ndarray, gt_boxes: jnp.ndarray,
                gt_valid: jnp.ndarray, rng: jax.Array,
                batch_size: int = 256, positive_fraction: float = 0.5,
                iou_thresholds=(0.3, 0.7), iou_labels=(0, -1, 1),
                reg_weights=(1.0, 1.0, 1.0, 1.0, 1.0)):
    """Rotated RPN losses (reference proposal_generator/rrpn.py: same
    sampling/objective as RPN with rotated IoU matching and 5-param
    box deltas). anchors (N, 5); gt_boxes (G, 5)."""
    from ..structures.rotated_boxes import (get_deltas_rotated,
                                            pairwise_iou_rotated)

    N = anchors.shape[0]
    quality = pairwise_iou_rotated(gt_boxes, anchors)
    midx, mlab = match(quality, gt_valid, list(iou_thresholds),
                       list(iou_labels), allow_low_quality=True)

    num_pos = int(batch_size * positive_fraction)
    k1, k2 = jax.random.split(rng)
    pos_keys = jnp.where(mlab == 1, jax.random.uniform(k1, (N,)), -1.0)
    neg_keys = jnp.where(mlab == 0, jax.random.uniform(k2, (N,)), -1.0)
    pv, pi = jax.lax.top_k(pos_keys, num_pos)
    nv, ni = jax.lax.top_k(neg_keys, batch_size - num_pos)
    sel = jnp.concatenate([pi, ni])
    sel_valid = jnp.concatenate([pv >= 0, nv >= 0])
    sel_pos = jnp.concatenate([pv >= 0, jnp.zeros_like(nv, dtype=bool)])

    logits = obj_logits[sel]
    bce = jnp.where(sel_pos, -jax.nn.log_sigmoid(logits),
                    -jax.nn.log_sigmoid(-logits))
    bce = jnp.where(sel_valid, bce, 0.0)
    denom = jnp.maximum(sel_valid.sum(), 1)
    loss_obj = jnp.sum(bce) / denom

    gt_for = gt_boxes[midx[sel]]
    tgt = get_deltas_rotated(anchors[sel], gt_for, reg_weights)
    diff = jnp.abs(pred_deltas[sel] - tgt)
    diff = jnp.where((sel_pos & sel_valid)[:, None], diff, 0.0)
    loss_loc = jnp.sum(diff) / denom
    return loss_obj, loss_loc


def select_proposals_rotated(anchors: jnp.ndarray, obj_logits: jnp.ndarray,
                             pred_deltas: jnp.ndarray, image_hw,
                             pre_nms_topk: int = 2000,
                             post_nms_topk: int = 1000,
                             nms_thresh: float = 0.7,
                             reg_weights=(1.0, 1.0, 1.0, 1.0, 1.0)):
    """Rotated analog of select_proposals: decode + top-k + rotated NMS
    (reference rrpn.py find_top_rrpn_proposals). Centers are clipped to
    the image; boxes keep their extent/angle (reference clips the same
    way via RotatedBoxes.clip)."""
    from ..structures.rotated_boxes import (apply_deltas_rotated,
                                            nms_rotated)

    boxes = apply_deltas_rotated(pred_deltas, anchors, reg_weights)
    h, w = image_hw[0], image_hw[1]
    boxes = boxes.at[..., 0].set(jnp.clip(boxes[..., 0], 0, w))
    boxes = boxes.at[..., 1].set(jnp.clip(boxes[..., 1], 0, h))
    k = min(pre_nms_topk, boxes.shape[0])
    top_scores, top_idx = jax.lax.top_k(obj_logits, k)
    top_boxes = boxes[top_idx]
    ok = (top_boxes[:, 2] > 0) & (top_boxes[:, 3] > 0) & \
        jnp.isfinite(top_scores)
    keep = nms_rotated(top_boxes, top_scores, ok, nms_thresh)
    kept_scores = jnp.where(keep, top_scores, -jnp.inf)
    k2 = min(post_nms_topk, k)
    final_scores, fi = jax.lax.top_k(kept_scores, k2)
    valid = jnp.isfinite(final_scores)
    return top_boxes[fi], jnp.where(valid, final_scores, 0.0), valid
