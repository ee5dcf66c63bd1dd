"""Contextual Suppression Constraint (CSC) weights, fully on device.

Re-implementation of the reference native CSC op
(projects/WSL/wsl/layers/csrc/csc/csc_cuda.cu:184-554 and
wsl/layers/csc.py:1-100), which binarizes each class-peak-gradient (CPG) map,
builds an integral image ON THE HOST, and launches a CUDA kernel per class
with device<->host ping-pong per class. Here the whole thing is one XLA
program: integral images are two cumsums, the center-surround pooling is a
handful of gathers, and classes are vmapped.

Semantics preserved:
  * binarize CPG at ``fg_threshold * max``; integral image;
  * per-RoI score = sum_frame/sqrt(area_frame) - sum_context/sqrt(area_context)
    with inner box = roi/context_scale and outer = roi*context_scale (clipped);
  * per-class normalization: positive scores / max, negatives / |min|,
    all-ones fallback when no positive mass;
  * confidence blend W <- pred * W + (1 - pred), and W fixed to 1 for absent
    classes (the reference initializes W = ones and skips those classes);
  * PL = labels, NL = zeros.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

KMIN_SCORE = -1e20


def integral_image(x: jnp.ndarray) -> jnp.ndarray:
    """(H, W) -> inclusive 2-D prefix sums (the host loop
    binary_and_integral_cpu becomes two cumsums)."""
    return jnp.cumsum(jnp.cumsum(x, axis=0), axis=1)


def _integral_lookup(ii: jnp.ndarray, hs, he, ws, we):
    """Sum over [hs, he] x [ws, we] (inclusive) from integral image ii."""
    H, W = ii.shape

    def at(y, x, valid):
        y = jnp.clip(y, 0, H - 1)
        x = jnp.clip(x, 0, W - 1)
        return jnp.where(valid, ii[y, x], 0.0)

    a1 = at(he, we, True)
    a2 = at(he, ws - 1, ws - 1 >= 0)
    a3 = at(hs - 1, we, hs - 1 >= 0)
    a4 = at(hs - 1, ws - 1, (hs - 1 >= 0) & (ws - 1 >= 0))
    return a1 - a2 - a3 + a4


def csc_pool_class(cpg_binary_integral: jnp.ndarray, rois: jnp.ndarray,
                   area_sqrt: bool = True,
                   context_scale: float = 1.8) -> jnp.ndarray:
    """Per-RoI center-surround contrast for one class
    (csc_cuda.cu:184-352). rois: (P, 4) XYXY in image pixels. -> (P,)."""
    H, W = cpg_binary_integral.shape
    r = jnp.round(rois).astype(jnp.int32)
    ws = jnp.clip(r[:, 0], 0, W - 1)
    hs = jnp.clip(r[:, 1], 0, H - 1)
    we = jnp.clip(r[:, 2], 0, W - 1)
    he = jnp.clip(r[:, 3], 0, H - 1)

    w_roi = (we - ws).astype(jnp.float32)
    h_roi = (he - hs).astype(jnp.float32)
    wc = (we + ws).astype(jnp.float32) / 2.0
    hc = (he + hs).astype(jnp.float32) / 2.0

    def bounds(c, size, lo=None, hi=None):
        half = size / 2.0
        s = c - half
        e = c + half
        if lo is not None:
            s = jnp.maximum(s, lo)
        if hi is not None:
            e = jnp.minimum(e, hi)
        return jnp.round(s).astype(jnp.int32), jnp.round(e).astype(jnp.int32)

    ws_i, we_i = bounds(wc, w_roi / context_scale)
    hs_i, he_i = bounds(hc, h_roi / context_scale)
    ws_o, we_o = bounds(wc, w_roi * context_scale, lo=0.0, hi=W - 1.0)
    hs_o, he_o = bounds(hc, h_roi * context_scale, lo=0.0, hi=H - 1.0)

    def lk(hs_, he_, ws_, we_):
        return jax.vmap(lambda a, b, c, d: _integral_lookup(
            cpg_binary_integral, a, b, c, d))(hs_, he_, ws_, we_)

    sum_roi = lk(hs, he, ws, we)
    sum_inner = lk(hs_i, he_i, ws_i, we_i)
    sum_outer = lk(hs_o, he_o, ws_o, we_o)

    area = lambda hs_, he_, ws_, we_: (  # noqa: E731
        (he_ - hs_ + 1) * (we_ - ws_ + 1)).astype(jnp.float32)
    area_frame = jnp.maximum(area(hs, he, ws, we) - area(hs_i, he_i, ws_i, we_i),
                             1.0)
    area_context = jnp.maximum(area(hs_o, he_o, ws_o, we_o)
                               - area(hs, he, ws, we), 1.0)

    sum_frame = sum_roi - sum_inner
    sum_context = sum_outer - sum_roi
    if area_sqrt:
        return (sum_frame / jnp.sqrt(area_frame)
                - sum_context / jnp.sqrt(area_context))
    return sum_frame / area_frame - sum_context / area_context


def _normalize_class_weights(w: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """Per-class normalization + confidence blend (csc_cuda.cu:487-530)."""
    max_v = jnp.max(w)
    min_v = jnp.min(w)
    pos_neg = (max_v > 0) & (min_v < 0)
    pos_only = (max_v > 0) & (min_v == 0)
    norm = jnp.where(w > 0, w / jnp.where(max_v > 0, max_v, 1.0),
                     w / jnp.where(min_v < 0, -min_v, 1.0))
    out = jnp.where(pos_neg | pos_only, norm, jnp.ones_like(w))
    return pred * out + (1.0 - pred)


def csc_forward(cpgs: jnp.ndarray, labels: jnp.ndarray, preds: jnp.ndarray,
                rois: jnp.ndarray, prop_mask: jnp.ndarray,
                fg_threshold: float = 0.1, area_sqrt: bool = True,
                context_scale: float = 1.8
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single image CSC.

    Args:
      cpgs: (C, H, W) normalized CPG maps (max-normalized per class).
      labels: (C,) multi-hot; preds: (C,) clamped image probs.
      rois: (P, 4) image-pixel XYXY; prop_mask: (P,).

    Returns: (W (P, C), PL (C,), NL (C,)).
    """
    def per_class(cpg, label, pred):
        binary = (cpg >= fg_threshold).astype(jnp.float32)
        ii = integral_image(binary)
        scores = csc_pool_class(ii, rois, area_sqrt, context_scale)
        w = _normalize_class_weights(scores, pred)
        return jnp.where(label > 0.5, w, 1.0)

    W = jax.vmap(per_class)(cpgs, labels, preds).T       # (P, C)
    W = jnp.where(prop_mask[:, None], W, 0.0)
    PL = labels
    NL = jnp.zeros_like(labels)
    return W, PL, NL


def csc_loss(scores: jnp.ndarray, W: jnp.ndarray, PL: jnp.ndarray,
             NL: jnp.ndarray, mean_loss: bool = True) -> Tuple[jnp.ndarray,
                                                               jnp.ndarray]:
    """CSC-weighted image BCE pair (reference csc_loss,
    fast_rcnn.py:888-935). scores/W: (B, P, C); PL/NL: (B, C)."""
    W_pos = jnp.abs(jnp.clip(W, 0.0, None))
    W_neg = jnp.abs(jnp.clip(W, None, 0.0))
    # Reference clamp (fast_rcnn.py:331): 1e-6 — anything smaller underflows
    # in float32 (1 - 1e-20 == 1.0 -> log(0) = -inf).
    eps = 1e-6
    img_pos = jnp.clip(jnp.sum(scores * W_pos, axis=1), eps, 1 - eps)
    img_neg = jnp.clip(jnp.sum(scores * W_neg, axis=1), eps, 1 - eps)

    def bce(p, t):
        v = -(t * jnp.log(p) + (1 - t) * jnp.log(1 - p))
        return (jnp.mean(v) if mean_loss else jnp.sum(v)) / p.shape[0]

    return bce(img_pos, PL), bce(img_neg, NL)


def compute_cpg_batched(score_fn, image: jnp.ndarray, labels: jnp.ndarray,
                        preds: jnp.ndarray, tau: float = 0.7) -> jnp.ndarray:
    """Batched class-peak-gradient maps.

    score_fn(image (B,H,W,3)) -> (B, P, C). Because images in a batch are
    independent, the VJP with cotangent "one-hot class c for every proposal"
    yields each image's own CPG for class c — so C batched backward passes
    (vmapped into one) replace the reference's per-(image, class) autograd
    loop (roi_heads_csc.py:442-460).

    Returns (B, C, H, W), max-normalized per (image, class), zeroed for
    absent or low-confidence (pred < tau) classes.
    """
    scores, vjp = jax.vjp(score_fn, image)
    B, P, C = scores.shape
    eye = jnp.eye(C, dtype=scores.dtype)

    def one_class(onehot):
        ct = jnp.broadcast_to(onehot, (B, P, C))
        return vjp(ct)[0]                                # (B, H, W, 3)

    grads = jax.lax.map(one_class, eye)                  # (C, B, H, W, 3)
    cpg = jnp.max(jnp.abs(grads), axis=-1)               # (C, B, H, W)
    cpg = jnp.transpose(cpg, (1, 0, 2, 3)).astype(jnp.float32)
    max_v = jnp.max(cpg, axis=(2, 3), keepdims=True)
    cpg = cpg / jnp.maximum(max_v, 1e-12)
    active = (labels > 0.5) & (preds >= tau)             # (B, C)
    return jnp.where(active[..., None, None], cpg, 0.0)


def compute_cpg(score_fn, image: jnp.ndarray, num_classes: int,
                labels: jnp.ndarray, preds: jnp.ndarray,
                tau: float = 0.7) -> jnp.ndarray:
    """Class-peak-gradient maps via vectorized VJP.

    The reference loops classes with one ``torch.autograd.grad`` each
    (roi_heads_csc.py:423-474); here all C backward passes batch into one
    vmapped VJP. ``score_fn(image) -> (P, C)`` proposal scores.

    Returns (C, H, W) maps, max-normalized, zeroed for absent / low-
    confidence (< tau) classes.
    """
    scores, vjp = jax.vjp(score_fn, image)
    P, C = scores.shape
    onehots = (jax.lax.broadcasted_iota(jnp.int32, (C, 1, C), 2)
               == jax.lax.broadcasted_iota(jnp.int32, (C, 1, C), 0)
               ).astype(scores.dtype) * jnp.ones((1, P, 1), scores.dtype)
    grads = jax.vmap(lambda ct: vjp(ct)[0])(onehots)     # (C, H, W, 3)
    cpg = jnp.max(jnp.abs(grads), axis=-1)               # (C, H, W)
    max_v = jnp.max(cpg, axis=(1, 2), keepdims=True)
    cpg = cpg / jnp.maximum(max_v, 1e-12)
    active = (labels > 0.5) & (preds >= tau)
    return jnp.where(active[:, None, None], cpg, 0.0)
