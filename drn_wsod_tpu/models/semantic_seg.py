"""SemanticSegmentor: plain semantic segmentation meta-architecture.

TPU-native equivalent of the reference SemanticSegmentor
(detectron2/modeling/meta_arch/semantic_seg.py): backbone -> SemSegFPNHead
-> per-pixel cross-entropy; inference upsamples logits to the input
resolution (the shared dense-eval loop does the argmax +
original-resolution resize, evaluation/evaluator.py:make_sem_seg_fn)."""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from .heads.seg import SemSegFPNHead, sem_seg_loss


class SemanticSegmentor(nn.Module):
    backbone: nn.Module
    sem_in_features: Tuple[str, ...] = ("p2", "p3", "p4", "p5")
    sem_strides: Tuple[int, ...] = (4, 8, 16, 32)
    num_classes: int = 54
    common_stride: int = 4
    conv_dim: int = 128
    loss_weight: float = 1.0
    ignore_value: int = 255
    pixel_mean: Sequence[float] = (103.53, 116.28, 123.675)
    pixel_std: Sequence[float] = (57.375, 57.12, 58.395)
    dtype: Any = jnp.float32

    def setup(self):
        self.sem_head = SemSegFPNHead(
            num_classes=self.num_classes,
            in_strides=tuple(self.sem_strides),
            common_stride=self.common_stride,
            conv_dim=self.conv_dim, dtype=self.dtype, name="sem_seg_head")

    def features(self, image: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        mean = jnp.asarray(self.pixel_mean, dtype=jnp.float32)
        std = jnp.asarray(self.pixel_std, dtype=jnp.float32)
        return self.backbone(((image - mean) / std).astype(self.dtype))

    def semantic_logits(self, batch) -> jnp.ndarray:
        feats = self.features(batch.image)
        return self.sem_head([feats[f] for f in self.sem_in_features])

    def __call__(self, batch, *, train: bool = True,
                 csc_w=None, cpg=None) -> Dict[str, jnp.ndarray]:
        logits = self.semantic_logits(batch)
        losses: Dict[str, jnp.ndarray] = {}
        if batch.sem_seg is not None:
            cs = self.common_stride
            h, w = logits.shape[1:3]
            tgt = batch.sem_seg[:, ::cs, ::cs][:, :h, :w]
            losses["loss_sem_seg"] = self.loss_weight * sem_seg_loss(
                logits, tgt, ignore_value=self.ignore_value)
        return losses
