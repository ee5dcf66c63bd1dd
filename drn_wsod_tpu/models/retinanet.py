"""RetinaNet: single-stage dense detector.

TPU-native re-implementation of the reference RetinaNet
(detectron2/modeling/meta_arch/retinanet.py, 448 LoC): shared 4-conv class /
box towers over FPN levels, dense per-anchor sigmoid focal loss + smooth-L1,
low-quality-match anchor labeling, and per-level top-k candidate trimming at
inference. Everything is a static-shape jittable program: anchors are a
fixed grid per level, matching/labeling are masked tensor ops over all
anchors (no index lists), and inference returns fixed-size (K, C+1) score /
(K, 4) box matrices that ride the shared multiclass-NMS path.

Deviations (documented):
  * the reference's EMA loss normalizer (retinanet.py ``loss_normalizer``,
    momentum 0.9) is replaced by the batch's ``max(1, num_pos)`` — the EMA
    is training-loop state that does not fit a pure step function, and the
    original paper normalizes by the positive count.
  * inference keeps the top-k anchors per level ranked by max class
    probability with FULL per-class score rows (the reference flattens
    anchorxclass pairs); the downstream per-class NMS consumes the same
    candidate set.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.matcher import match
from ..structures import boxes as box_ops
from .proposal_generator import generate_anchors


class RetinaNetHead(nn.Module):
    """Shared class/box conv towers (reference RetinaNetHead,
    retinanet.py:358-448)."""

    num_classes: int
    num_anchors: int
    num_convs: int = 4
    conv_dim: int = 256
    prior_prob: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        cls_tower = [nn.Conv(self.conv_dim, (3, 3),
                             kernel_init=nn.initializers.normal(0.01),
                             dtype=self.dtype, name=f"cls_subnet_{i}")
                     for i in range(self.num_convs)]
        box_tower = [nn.Conv(self.conv_dim, (3, 3),
                             kernel_init=nn.initializers.normal(0.01),
                             dtype=self.dtype, name=f"bbox_subnet_{i}")
                     for i in range(self.num_convs)]
        bias = -math.log((1 - self.prior_prob) / self.prior_prob)
        cls_score = nn.Conv(
            self.num_anchors * self.num_classes, (3, 3),
            kernel_init=nn.initializers.normal(0.01),
            bias_init=nn.initializers.constant(bias),
            dtype=jnp.float32, name="cls_score")
        bbox_pred = nn.Conv(
            self.num_anchors * 4, (3, 3),
            kernel_init=nn.initializers.normal(0.01),
            dtype=jnp.float32, name="bbox_pred")

        outs = []
        for f in feats:
            c, b = f, f
            for conv in cls_tower:
                c = nn.relu(conv(c))
            for conv in box_tower:
                b = nn.relu(conv(b))
            outs.append((cls_score(c), bbox_pred(b)))
        return outs


def sigmoid_focal_loss(logits, targets, alpha: float, gamma: float):
    """Elementwise sigmoid focal loss (reference fvcore
    sigmoid_focal_loss; retinanet.py:losses)."""
    p = jax.nn.sigmoid(logits)
    ce = (jnp.maximum(logits, 0) - logits * targets
          + jnp.log1p(jnp.exp(-jnp.abs(logits))))
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        loss = loss * (alpha * targets + (1 - alpha) * (1 - targets))
    return loss


class RetinaNet(nn.Module):
    """Dense one-stage detector over an FPN backbone."""

    backbone: nn.Module
    in_features: Tuple[str, ...] = ("p3", "p4", "p5", "p6")
    strides: Tuple[int, ...] = (8, 16, 32, 64)
    anchor_sizes: Tuple[Tuple[float, ...], ...] = (
        (32.0, 40.0, 51.0), (64.0, 81.0, 102.0),
        (128.0, 161.0, 203.0), (256.0, 323.0, 406.0))
    aspect_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    num_classes: int = 80
    num_convs: int = 4
    prior_prob: float = 0.01
    iou_thresholds: Tuple[float, ...] = (0.4, 0.5)
    iou_labels: Tuple[int, ...] = (0, -1, 1)
    focal_alpha: float = 0.25
    focal_gamma: float = 2.0
    smooth_l1_beta: float = 0.1
    reg_weights: Tuple[float, ...] = (1.0, 1.0, 1.0, 1.0)
    topk_candidates: int = 1000
    pixel_mean: Sequence[float] = (103.53, 116.28, 123.675)
    pixel_std: Sequence[float] = (57.375, 57.12, 58.395)
    dtype: Any = jnp.float32

    def setup(self):
        self.head = RetinaNetHead(
            num_classes=self.num_classes,
            num_anchors=len(self.aspect_ratios) * len(self.anchor_sizes[0]),
            num_convs=self.num_convs, prior_prob=self.prior_prob,
            dtype=self.dtype, name="head")

    def _forward_dense(self, image):
        """(B, H, W, 3) -> per-anchor (B, N, C) logits, (B, N, 4) deltas,
        (N, 4) anchors concatenated over levels."""
        mean = jnp.asarray(self.pixel_mean, dtype=jnp.float32)
        std = jnp.asarray(self.pixel_std, dtype=jnp.float32)
        x = ((image - mean) / std).astype(self.dtype)
        fmap = self.backbone(x)
        feats = [fmap[f] for f in self.in_features]
        outs = self.head(feats)

        B = image.shape[0]
        logits, deltas, anchors = [], [], []
        for (cls, box), f, stride, sizes in zip(
                outs, feats, self.strides, self.anchor_sizes):
            Hf, Wf = f.shape[1:3]
            logits.append(cls.reshape(B, -1, self.num_classes))
            deltas.append(box.reshape(B, -1, 4))
            anchors.append(generate_anchors(
                (Hf, Wf), stride, sizes, self.aspect_ratios))
        sizes_per_level = [a.shape[0] for a in anchors]
        return (jnp.concatenate(logits, axis=1),
                jnp.concatenate(deltas, axis=1),
                jnp.concatenate(anchors, axis=0), sizes_per_level)

    def __call__(self, batch, *, train: bool = True,
                 csc_w=None, cpg=None) -> Dict[str, jnp.ndarray]:
        """Training losses (reference retinanet.py:losses)."""
        logits, deltas, anchors, _ = self._forward_dense(batch.image)

        def one_image(lg, dl, gb, gc, gv):
            quality = box_ops.pairwise_iou(gb, anchors)
            midx, mlab = match(quality, gv, list(self.iou_thresholds),
                               list(self.iou_labels),
                               allow_low_quality=True)
            fg = mlab == 1
            valid = mlab >= 0
            tgt_cls = jax.nn.one_hot(gc[midx], self.num_classes) \
                * fg[:, None]
            cls_loss = sigmoid_focal_loss(
                lg, tgt_cls, self.focal_alpha, self.focal_gamma)
            cls_loss = jnp.sum(cls_loss * valid[:, None])

            tgt_deltas = box_ops.get_deltas(anchors, gb[midx],
                                            tuple(self.reg_weights))
            diff = jnp.abs(dl - tgt_deltas)
            if self.smooth_l1_beta > 0:
                l1 = jnp.where(diff < self.smooth_l1_beta,
                               0.5 * diff ** 2 / self.smooth_l1_beta,
                               diff - 0.5 * self.smooth_l1_beta)
            else:
                l1 = diff
            box_loss = jnp.sum(l1 * fg[:, None])
            return cls_loss, box_loss, jnp.sum(fg)

        cls_l, box_l, n_pos = jax.vmap(one_image)(
            logits.astype(jnp.float32), deltas.astype(jnp.float32),
            batch.gt_boxes, batch.gt_classes, batch.gt_valid)
        norm = jnp.maximum(jnp.sum(n_pos).astype(jnp.float32), 1.0)
        return {"loss_cls": jnp.sum(cls_l) / norm,
                "loss_box_reg": jnp.sum(box_l) / norm}

    def inference_scores(self, batch) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Per-level top-k candidates -> (B, K, C+1) scores (bg column
        zeros) + (B, K, 4) decoded boxes for the shared NMS path
        (reference retinanet.py:inference_single_image)."""
        logits, deltas, anchors, sizes = self._forward_dense(batch.image)
        probs = jax.nn.sigmoid(logits.astype(jnp.float32))
        boxes = box_ops.apply_deltas(
            deltas.astype(jnp.float32), anchors[None],
            tuple(self.reg_weights))
        boxes = jax.vmap(box_ops.clip)(boxes, batch.image_hw)

        # per-level top-k by best class prob, keeping full class rows
        out_scores, out_boxes = [], []
        start = 0
        for n in sizes:
            p = probs[:, start:start + n]
            b = boxes[:, start:start + n]
            k = min(self.topk_candidates, n)
            best = jnp.max(p, axis=-1)
            _, idx = jax.lax.top_k(best, k)
            out_scores.append(jnp.take_along_axis(p, idx[..., None], axis=1))
            out_boxes.append(jnp.take_along_axis(b, idx[..., None], axis=1))
            start += n
        scores = jnp.concatenate(out_scores, axis=1)
        boxes = jnp.concatenate(out_boxes, axis=1)
        bg = jnp.zeros(scores.shape[:-1] + (1,), scores.dtype)
        return jnp.concatenate([scores, bg], axis=-1), boxes
