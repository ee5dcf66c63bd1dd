"""PanopticFPN: joint instance detection + semantic segmentation.

TPU-native re-implementation of the reference PanopticFPN
(detectron2/modeling/meta_arch/panoptic_fpn.py): an FPN backbone feeding
(a) a Fast R-CNN instance branch with a Mask R-CNN head and (b) the
SemSegFPNHead semantic branch; instance losses are scaled by
``instance_loss_weight`` and inference fuses the two outputs with
``evaluation.panoptic_eval.combine_semantic_and_instance_outputs`` (the
fusion is host-side numpy post-processing, as in the reference).

Like the rest of the framework, the instance branch runs over the batch's
padded proposals (the supervised substrate's static-shape design) — the
reference's RPN can supply them offline (models/proposal_generator.py) or
precomputed proposals are used directly.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.matcher import match
from ..ops.poolers import multilevel_roi_pool
from ..ops.roi_align import roi_align
from ..structures import boxes as box_ops
from .heads import fast_rcnn as fast_rcnn_lib
from .heads.seg import (MaskRCNNHead, SemSegFPNHead, mask_loss,
                        sem_seg_loss)


class PanopticFPN(nn.Module):
    backbone: nn.Module
    # box-pooler pyramid (name, stride); sem head consumes sem_in_features
    pyramid_strides: Tuple[Tuple[str, int], ...] = (
        ("p2", 4), ("p3", 8), ("p4", 16), ("p5", 32))
    sem_in_features: Tuple[str, ...] = ("p2", "p3", "p4", "p5")
    sem_strides: Tuple[int, ...] = (4, 8, 16, 32)
    num_classes: int = 80            # thing classes
    sem_num_classes: int = 54        # stuff classes (0 = special things id)
    common_stride: int = 4
    sem_conv_dim: int = 128
    pooler_resolution: int = 7
    mask_pooler_resolution: int = 14
    mask_on: bool = True
    instance_loss_weight: float = 1.0
    sem_loss_weight: float = 0.5
    reg_weights: Sequence[float] = (10.0, 10.0, 5.0, 5.0)
    pixel_mean: Sequence[float] = (103.53, 116.28, 123.675)
    pixel_std: Sequence[float] = (57.375, 57.12, 58.395)
    dtype: Any = jnp.float32

    def setup(self):
        self.box_head = fast_rcnn_lib.FastRCNNConvFCHead(
            fc_dims=(1024, 1024), dtype=self.dtype, name="box_head")
        self.box_predictor = fast_rcnn_lib.FastRCNNOutputLayers(
            num_classes=self.num_classes, dtype=self.dtype,
            name="box_predictor")
        if self.mask_on:
            self.mask_head = MaskRCNNHead(
                num_classes=self.num_classes, dtype=self.dtype,
                name="mask_head")
        self.sem_head = SemSegFPNHead(
            num_classes=self.sem_num_classes,
            in_strides=tuple(self.sem_strides),
            common_stride=self.common_stride,
            conv_dim=self.sem_conv_dim, dtype=self.dtype, name="sem_seg_head")

    # ------------------------------------------------------------------ parts
    def features(self, image: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        mean = jnp.asarray(self.pixel_mean, dtype=jnp.float32)
        std = jnp.asarray(self.pixel_std, dtype=jnp.float32)
        return self.backbone(((image - mean) / std).astype(self.dtype))

    def _pool(self, feats, boxes, resolution):
        """(B, S, 4) boxes -> (B, S, r, r, C) via FPN level assignment."""
        strides = dict(self.pyramid_strides)
        names = [n for n, _ in self.pyramid_strides]

        def one(fmap_dict, bx):
            return multilevel_roi_pool(fmap_dict, strides, bx, names,
                                       resolution=resolution)
        return jax.vmap(one)(feats, boxes)

    def semantic_logits(self, batch) -> jnp.ndarray:
        """(B, H/cs, W/cs, S) semantic logits."""
        feats = self.features(batch.image)
        return self.sem_head([feats[f] for f in self.sem_in_features])

    # ------------------------------------------------------------------ train
    def __call__(self, batch, *, train: bool = True,
                 csc_w=None, cpg=None) -> Dict[str, jnp.ndarray]:
        feats = self.features(batch.image)
        losses: Dict[str, jnp.ndarray] = {}

        sem_logits = self.sem_head(
            [feats[f] for f in self.sem_in_features])
        if batch.sem_seg is not None:
            cs = self.common_stride
            h, w = sem_logits.shape[1:3]
            tgt = batch.sem_seg[:, ::cs, ::cs][:, :h, :w]
            losses["loss_sem_seg"] = (
                self.sem_loss_weight * sem_seg_loss(sem_logits, tgt))

        rng = self.make_rng("dropout")
        B = batch.image.shape[0]
        sampled = jax.vmap(
            lambda p, m, gb, gc, gv, r: fast_rcnn_lib.subsample_proposals(
                p, m, gb, gc, gv, r)
        )(batch.proposals, batch.proposal_mask, batch.gt_boxes,
          batch.gt_classes, batch.gt_valid, jax.random.split(rng, B))
        boxes = jnp.take_along_axis(
            batch.proposals, sampled.indices[..., None], axis=1)
        S = boxes.shape[1]

        pooled = self._pool(feats, boxes, self.pooler_resolution)
        h = self.box_head(pooled.reshape(B * S, -1))
        cls_logits, deltas = self.box_predictor(h)
        lc, lb = jax.vmap(
            lambda cl, d, p, s: fast_rcnn_lib.fast_rcnn_losses(
                cl, d, p, s, self.num_classes, tuple(self.reg_weights))
        )(cls_logits.reshape(B, S, -1), deltas.reshape(B, S, -1),
          batch.proposals, sampled)
        w_i = self.instance_loss_weight
        losses["loss_cls"] = w_i * jnp.mean(lc)
        losses["loss_box_reg"] = w_i * jnp.mean(lb)

        if self.mask_on and batch.gt_masks is not None:
            mr = self.mask_pooler_resolution
            mpooled = self._pool(feats, boxes, mr)
            mlogits = self.mask_head(
                mpooled.reshape(B * S, mr, mr, -1))     # (BS, 2mr, 2mr, C)
            m_out = mlogits.shape[1]
            # rasterize per-slot targets: crop the matched GT's full-res
            # mask to the proposal box (reference mask_head.py
            # crop_and_resize on gt_masks)
            midx = jax.vmap(
                lambda gb, gv, bx: match(
                    box_ops.pairwise_iou(gb, bx), gv, [0.5], [0, 1])[0]
            )(batch.gt_boxes, batch.gt_valid, boxes)    # (B, S)

            def crop_one(masks, mi, bx):
                def crop(i, b):
                    m = masks[i][..., None].astype(jnp.float32)
                    return roi_align(m, b[None], 1.0, resolution=m_out,
                                     sampling_ratio=2,
                                     aligned=True)[0, :, :, 0]
                return jax.vmap(crop)(mi, bx)

            targets = jax.vmap(crop_one)(
                batch.gt_masks, midx, boxes)            # (B, S, 2mr, 2mr)
            fg = (sampled.gt_class >= 0) & sampled.valid
            losses["loss_mask"] = w_i * mask_loss(
                mlogits.reshape(B * S, m_out, m_out, -1),
                sampled.gt_class.reshape(B * S),
                (targets >= 0.5).astype(jnp.float32).reshape(
                    B * S, m_out, m_out),
                fg.reshape(B * S))
        return losses

    # -------------------------------------------------------------- inference
    def inference_scores(self, batch):
        """Instance branch scores/boxes for the shared NMS path (the
        semantic/panoptic outputs come from ``semantic_logits`` +
        ``mask_probs`` + evaluation.panoptic_eval.combine)."""
        feats = self.features(batch.image)
        pooled = self._pool(feats, batch.proposals, self.pooler_resolution)
        B, P = pooled.shape[:2]
        h = self.box_head(pooled.reshape(B * P, -1))
        cls_logits, deltas = self.box_predictor(h)
        scores = jax.nn.softmax(cls_logits.reshape(B, P, -1), axis=-1)
        boxes = box_ops.apply_deltas(
            deltas.reshape(B, P, -1), batch.proposals,
            tuple(self.reg_weights))
        mask = batch.proposal_mask[..., None]
        return jnp.where(mask, scores, 0.0), boxes

    def mask_probs(self, batch, boxes: jnp.ndarray,
                   classes: jnp.ndarray) -> jnp.ndarray:
        """(B, D, 4) boxes + (B, D) classes -> (B, D, 2mr, 2mr) mask
        probabilities for the selected class (reference mask_rcnn_inference)."""
        feats = self.features(batch.image)
        mr = self.mask_pooler_resolution
        pooled = self._pool(feats, boxes, mr)
        B, D = pooled.shape[:2]
        logits = self.mask_head(pooled.reshape(B * D, mr, mr, -1))
        m_out = logits.shape[1]
        logits = logits.reshape(B, D, m_out, m_out, -1)
        cls = jnp.clip(classes, 0, self.num_classes - 1)
        sel = jnp.take_along_axis(
            logits, cls[:, :, None, None, None], axis=-1)[..., 0]
        return jax.nn.sigmoid(sel)
