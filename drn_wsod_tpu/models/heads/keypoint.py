"""Keypoint R-CNN head (supervised substrate parity).

Equivalent of the reference keypoint head
(detectron2/modeling/roi_heads/keypoint_head.py: KRCNNConvDeconvUpsampleHead
+ keypoint_rcnn_loss/inference): per-RoI keypoint heatmaps with CE over
spatial positions; fixed shapes (padded keypoint slots + validity).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class KRCNNConvDeconvUpsampleHead(nn.Module):
    num_keypoints: int = 17
    conv_dims: Sequence[int] = (512,) * 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray) -> jnp.ndarray:
        """(N, r, r, C) -> (N, 4r, 4r, K) keypoint heatmap logits."""
        x = roi_feats
        for i, d in enumerate(self.conv_dims, start=1):
            x = nn.Conv(d, (3, 3), dtype=self.dtype, name=f"conv_fcn{i}")(x)
            x = nn.relu(x)
        x = nn.ConvTranspose(self.num_keypoints, (4, 4), strides=(2, 2),
                             dtype=jnp.float32, name="score_lowres")(x)
        # reference interpolates up 2x after the deconv
        N, H, W, K = x.shape
        return jax.image.resize(x, (N, H * 2, W * 2, K), "bilinear")


def keypoints_to_heatmap_targets(keypoints: jnp.ndarray, boxes: jnp.ndarray,
                                 heatmap_size: int
                                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Discretize (N, K, 3) keypoints (x, y, vis) into per-box heatmap cell
    indices (reference structures/keypoints.py:_keypoints_to_heatmap).

    Returns (targets (N, K) flat cell index, valid (N, K))."""
    x1, y1 = boxes[:, 0:1], boxes[:, 1:2]
    w = jnp.maximum(boxes[:, 2:3] - x1, 1e-6)
    h = jnp.maximum(boxes[:, 3:4] - y1, 1e-6)
    px = (keypoints[..., 0] - x1) / w * heatmap_size
    py = (keypoints[..., 1] - y1) / h * heatmap_size
    xi = jnp.clip(jnp.floor(px), 0, heatmap_size - 1).astype(jnp.int32)
    yi = jnp.clip(jnp.floor(py), 0, heatmap_size - 1).astype(jnp.int32)
    inside = (px >= 0) & (px < heatmap_size) & (py >= 0) & (py < heatmap_size)
    valid = (keypoints[..., 2] > 0) & inside
    return yi * heatmap_size + xi, valid


def keypoint_rcnn_loss(heatmap_logits: jnp.ndarray, targets: jnp.ndarray,
                       valid: jnp.ndarray) -> jnp.ndarray:
    """CE over spatial cells for visible keypoints
    (reference keypoint_head.py keypoint_rcnn_loss).

    heatmap_logits: (N, S, S, K); targets/valid: (N, K)."""
    N, S, _, K = heatmap_logits.shape
    flat = heatmap_logits.reshape(N, S * S, K).transpose(0, 2, 1)  # (N, K, SS)
    logp = jax.nn.log_softmax(flat, axis=-1)
    ce = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    ce = jnp.where(valid, ce, 0.0)
    return jnp.sum(ce) / jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)


def heatmaps_to_keypoints(heatmap_logits: jnp.ndarray, boxes: jnp.ndarray
                          ) -> jnp.ndarray:
    """Argmax decode back to image coords -> (N, K, 3) with scores."""
    N, S, _, K = heatmap_logits.shape
    flat = heatmap_logits.reshape(N, S * S, K)
    idx = jnp.argmax(flat, axis=1)                       # (N, K)
    score = jax.nn.softmax(flat, axis=1)
    score = jnp.take_along_axis(score, idx[:, None, :], axis=1)[:, 0]
    yi = (idx // S).astype(jnp.float32) + 0.5
    xi = (idx % S).astype(jnp.float32) + 0.5
    x1, y1 = boxes[:, 0:1], boxes[:, 1:2]
    w = boxes[:, 2:3] - x1
    h = boxes[:, 3:4] - y1
    return jnp.stack([x1 + xi / S * w, y1 + yi / S * h, score], axis=-1)
