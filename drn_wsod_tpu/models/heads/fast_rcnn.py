"""Supervised Fast R-CNN head (for pseudo-GT re-training).

Re-implementation of the reference supervised pipeline pieces used by the
"train a Fast R-CNN on DRN-WSOD's top boxes" workflow:
``FastRCNNOutputLayers`` (detectron2/modeling/roi_heads/fast_rcnn.py:182-566),
``FastRCNNConvFCHead`` (roi_heads/box_head.py) and proposal subsampling
(modeling/sampling.py:10-54 + roi_heads.py:201-244), as fixed-shape masked
ops:

  * subsampling draws a STATIC number of slots (batch_size_per_image) via
    top-k over randomized keys — fg quota first, bg fill, validity mask for
    shortfalls (the reference uses dynamic-length index lists);
  * losses: softmax CE over sampled slots + smooth-L1 on foreground boxes
    normalized by the sampled count.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.matcher import match
from ...structures import boxes as box_ops


class FastRCNNConvFCHead(nn.Module):
    """N FC layers with ReLU (reference box_head.py FastRCNNConvFCHead,
    conv count 0 in the C4/DC5 configs)."""

    fc_dims: Sequence[int] = (1024, 1024)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if x.ndim > 2:
            x = x.reshape(x.shape[0], -1)
        for i, dim in enumerate(self.fc_dims, start=1):
            x = nn.Dense(dim, kernel_init=nn.initializers.variance_scaling(
                1.0, "fan_in", "uniform"), dtype=self.dtype, name=f"fc{i}")(x)
            x = nn.relu(x)
        return x


class FastRCNNOutputLayers(nn.Module):
    num_classes: int
    cls_agnostic_bbox_reg: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats):
        cls = nn.Dense(self.num_classes + 1,
                       kernel_init=nn.initializers.normal(0.01),
                       bias_init=nn.initializers.zeros,
                       dtype=self.dtype, name="cls_score")(feats)
        n_reg = 1 if self.cls_agnostic_bbox_reg else self.num_classes
        deltas = nn.Dense(n_reg * 4,
                          kernel_init=nn.initializers.normal(0.001),
                          bias_init=nn.initializers.zeros,
                          dtype=self.dtype, name="bbox_pred")(feats)
        return cls.astype(jnp.float32), deltas.astype(jnp.float32)


class SampledProposals(NamedTuple):
    indices: jnp.ndarray   # (S,) int32 into the P proposals
    gt_class: jnp.ndarray  # (S,) int32, C = background
    gt_box: jnp.ndarray    # (S, 4)
    valid: jnp.ndarray     # (S,) bool


def subsample_proposals(proposals: jnp.ndarray, prop_mask: jnp.ndarray,
                        gt_boxes: jnp.ndarray, gt_classes: jnp.ndarray,
                        gt_valid: jnp.ndarray, rng: jax.Array,
                        batch_size: int = 512,
                        positive_fraction: float = 0.25,
                        iou_thresholds=(0.5,), iou_labels=(0, 1)
                        ) -> SampledProposals:
    """Match + randomly subsample a fixed number of proposals (one image).

    Reference semantics (sampling.py:10-54): up to batch_size *
    positive_fraction foreground slots, rest background; random without
    replacement. Static shapes: random keys + top_k.
    """
    P = proposals.shape[0]
    batch_size = min(batch_size, P)
    num_pos = int(batch_size * positive_fraction)

    quality = box_ops.pairwise_iou(gt_boxes, proposals)
    midx, mlab = match(quality, gt_valid, list(iou_thresholds),
                       list(iou_labels))

    fg = (mlab == 1) & prop_mask
    bg = (mlab == 0) & prop_mask

    k1, k2 = jax.random.split(rng)
    fg_keys = jnp.where(fg, jax.random.uniform(k1, (P,)), -1.0)
    bg_keys = jnp.where(bg, jax.random.uniform(k2, (P,)), -1.0)

    fg_vals, fg_idx = jax.lax.top_k(fg_keys, num_pos)
    n_bg = batch_size - num_pos
    bg_vals, bg_idx = jax.lax.top_k(bg_keys, n_bg)

    idx = jnp.concatenate([fg_idx, bg_idx]).astype(jnp.int32)
    valid = jnp.concatenate([fg_vals >= 0, bg_vals >= 0])

    sel_midx = midx[idx]
    sel_fg = jnp.concatenate([fg_vals >= 0,
                              jnp.zeros(n_bg, dtype=bool)])
    gt_cls = gt_classes[sel_midx]
    return SampledProposals(
        indices=idx,
        gt_class=jnp.where(sel_fg, gt_cls, -1).astype(jnp.int32),
        gt_box=gt_boxes[sel_midx],
        valid=valid,
    )


def fast_rcnn_losses(cls_logits: jnp.ndarray, deltas: jnp.ndarray,
                     proposals: jnp.ndarray, sampled: SampledProposals,
                     num_classes: int,
                     reg_weights=(10.0, 10.0, 5.0, 5.0),
                     smooth_l1_beta: float = 0.0) -> Tuple[jnp.ndarray,
                                                           jnp.ndarray]:
    """CE + smooth-L1 over sampled slots (single image).

    cls_logits/deltas: (S, C+1) / (S, R*4) gathered at sampled.indices;
    proposals: (P, 4). ``sampled.gt_class`` is -1 for background slots (we
    store fg class or -1; background CE target is class C).
    """
    S = sampled.indices.shape[0]
    tgt = jnp.where(sampled.gt_class >= 0, sampled.gt_class, num_classes)
    logp = jax.nn.log_softmax(cls_logits, axis=-1)
    ce = -jnp.take_along_axis(logp, tgt[:, None], axis=-1)[:, 0]
    ce = jnp.where(sampled.valid, ce, 0.0)
    n_valid = jnp.maximum(jnp.sum(sampled.valid.astype(jnp.float32)), 1.0)
    loss_cls = jnp.sum(ce) / n_valid

    fg = sampled.gt_class >= 0
    sel_props = proposals[sampled.indices]
    gt_deltas = box_ops.get_deltas(sel_props, sampled.gt_box, reg_weights)
    R = deltas.shape[-1] // 4
    d = deltas.reshape(S, R, 4)
    cls_idx = jnp.clip(sampled.gt_class, 0, R - 1)
    pred = jnp.take_along_axis(
        d, cls_idx[:, None, None].repeat(4, -1), axis=1)[:, 0]
    diff = jnp.abs(pred - gt_deltas)
    if smooth_l1_beta > 0:
        l = jnp.where(diff < smooth_l1_beta,
                      0.5 * diff ** 2 / smooth_l1_beta,
                      diff - 0.5 * smooth_l1_beta)
    else:
        l = diff
    l = jnp.where((fg & sampled.valid)[:, None], l, 0.0)
    loss_box = jnp.sum(l) / n_valid
    return loss_cls, loss_box
