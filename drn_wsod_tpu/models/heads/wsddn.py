"""WSDDN two-stream MIL head.

Re-implementation of the reference WSDDN predictor and loss
(projects/WSL/wsl/modeling/roi_heads/fast_rcnn.py:400-560):

  scores = softmax(cls(x), over classes) * softmax(det(x), over proposals)

with the detection-stream softmax taken per image over *valid* proposals
(padding masked to -inf — the single most parity-sensitive numeric detail of
the static-shape port, see SURVEY.md "Hard parts"), image scores = clamped
per-class sums, and BCE against the multi-hot image labels.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

CLAMP_LO = 1e-6
CLAMP_HI = 1.0 - 1e-6


class WSDDNOutputLayers(nn.Module):
    """The two linear streams; returns per-proposal MIL scores."""

    num_classes: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        """feats: (B, P, D); mask: (B, P) validity. Returns (B, P, C) scores
        (padded rows exactly zero)."""
        dense = dict(kernel_init=nn.initializers.xavier_uniform(),
                     bias_init=nn.initializers.zeros, dtype=self.dtype)
        cls_logits = nn.Dense(self.num_classes, name="cls", **dense)(feats)
        det_logits = nn.Dense(self.num_classes, name="det", **dense)(feats)

        cls_sm = jax.nn.softmax(cls_logits.astype(jnp.float32), axis=-1)
        det_masked = jnp.where(mask[..., None], det_logits.astype(jnp.float32),
                               -jnp.inf)
        det_sm = jax.nn.softmax(det_masked, axis=-2)  # over proposals, per image
        det_sm = jnp.where(mask[..., None], det_sm, 0.0)
        return cls_sm * det_sm


def image_probs(scores: jnp.ndarray) -> jnp.ndarray:
    """Per-image class evidence: clamped sum of proposal scores
    (reference fast_rcnn.py:331-343). scores: (B, P, C) -> (B, C)."""
    return jnp.clip(jnp.sum(scores, axis=-2), CLAMP_LO, CLAMP_HI)


def wsddn_loss(scores: jnp.ndarray, labels: jnp.ndarray,
               mean_loss: bool = True) -> jnp.ndarray:
    """Binary cross-entropy between image probs and multi-hot labels
    (reference fast_rcnn.py:317-329): reduction (mean|sum) / batch_size.

    scores: (B, P, C); labels: (B, C) in {0, 1}.
    """
    p = image_probs(scores)
    bce = -(labels * jnp.log(p) + (1.0 - labels) * jnp.log(1.0 - p))
    red = jnp.mean(bce) if mean_loss else jnp.sum(bce)
    return red / scores.shape[0]


def append_background(scores: jnp.ndarray) -> jnp.ndarray:
    """Add the zero background column used at inference
    (reference fast_rcnn.py:376-386). (B, P, C) -> (B, P, C+1)."""
    bg = jnp.zeros((*scores.shape[:-1], 1), dtype=scores.dtype)
    return jnp.concatenate([scores, bg], axis=-1)
