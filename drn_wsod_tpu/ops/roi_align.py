"""RoI feature extraction as static-shape gathers.

TPU-native replacement for the reference's CUDA RoIAlign / torchvision RoIPool
(detectron2/layers/csrc/ROIAlign/, detectron2/modeling/poolers.py:148-172).
Instead of per-box dynamic loops, every RoI samples a fixed grid of points;
bilinear (align) or nearest (pool) values are fetched with one big gather from
the flattened feature map, which XLA lowers to efficient dynamic-gather on
TPU. RoIs are processed in chunks to bound the intermediate size.

Semantics:
  * ``roi_align`` matches torchvision RoIAlign with a static
    ``sampling_ratio`` (the reference's adaptive ceil(bin) sampling is a
    dynamic shape; a fixed ratio is the standard static approximation).
  * ``roi_pool`` matches torchvision RoIPool (quantized bins, max) exactly
    whenever every bin spans <= ``samples`` cells, and approximates the max
    with a ``samples``^2 sub-grid for larger RoIs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _bilinear_1d(coord, size):
    """Return (lo, hi, w_lo, w_hi) for 1-D bilinear sampling, torchvision
    boundary semantics: points outside [-1, size] contribute zero."""
    oob = (coord < -1.0) | (coord > size)
    c = jnp.clip(coord, 0.0, size - 1)
    lo = jnp.floor(c)
    hi = jnp.minimum(lo + 1, size - 1)
    w_hi = c - lo
    w_lo = 1.0 - w_hi
    w_lo = jnp.where(oob, 0.0, w_lo)
    w_hi = jnp.where(oob, 0.0, w_hi)
    return lo.astype(jnp.int32), hi.astype(jnp.int32), w_lo, w_hi


def _sample_grid(start, bin_size, resolution, samples):
    """Sample coordinates (..., resolution * samples) within each bin."""
    # offsets (resolution*samples,): (ph + (i + .5)/samples) * bin for each bin
    ph = jnp.arange(resolution, dtype=jnp.float32)
    frac = (jnp.arange(samples, dtype=jnp.float32) + 0.5) / samples
    offs = (ph[:, None] + frac[None, :]).reshape(-1)  # (R*S,)
    return start[..., None] + bin_size[..., None] * offs[None, :]


@partial(jax.jit, static_argnames=("resolution", "sampling_ratio", "aligned", "chunk"))
def roi_align(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    spatial_scale: float,
    resolution: int = 7,
    sampling_ratio: int = 2,
    aligned: bool = False,
    chunk: int = 256,
) -> jnp.ndarray:
    """Bilinear average RoI pooling.

    Args:
      features: (H, W, C) one image's feature map (NHWC slice).
      boxes: (P, 4) XYXY in input-image coordinates.
      spatial_scale: 1 / feature stride.
      resolution: output bins per side.
      sampling_ratio: static samples per bin side (>0).
      aligned: half-pixel alignment (RoIAlignV2).

    Returns: (P, resolution, resolution, C)
    """
    H, W, C = features.shape
    P = boxes.shape[0]
    R, S = resolution, sampling_ratio
    offset = 0.5 if aligned else 0.0

    scaled = boxes.astype(jnp.float32) * spatial_scale - offset
    x1, y1, x2, y2 = scaled[:, 0], scaled[:, 1], scaled[:, 2], scaled[:, 3]
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_w = roi_w / R
    bin_h = roi_h / R

    ys = _sample_grid(y1, bin_h, R, S)  # (P, R*S)
    xs = _sample_grid(x1, bin_w, R, S)  # (P, R*S)

    y_lo, y_hi, wy_lo, wy_hi = _bilinear_1d(ys, H)
    x_lo, x_hi, wx_lo, wx_hi = _bilinear_1d(xs, W)

    flat = features.reshape(H * W, C)
    n = R * S

    def pool_chunk(args):
        yl, yh, wyl, wyh, xl, xh, wxl, wxh = args
        # (CH, n, n) flattened indices for the 4 bilinear corners.
        def gathered(yi, xi):
            idx = yi[:, :, None] * W + xi[:, None, :]
            return jnp.take(flat, idx.reshape(-1), axis=0).reshape(
                idx.shape[0], n, n, C)

        out = (
            gathered(yl, xl) * (wyl[:, :, None] * wxl[:, None, :])[..., None]
            + gathered(yl, xh) * (wyl[:, :, None] * wxh[:, None, :])[..., None]
            + gathered(yh, xl) * (wyh[:, :, None] * wxl[:, None, :])[..., None]
            + gathered(yh, xh) * (wyh[:, :, None] * wxh[:, None, :])[..., None]
        )
        # (CH, R, S, R, S, C) -> average over sample sub-grid
        out = out.reshape(out.shape[0], R, S, R, S, C)
        return out.mean(axis=(2, 4))

    ch = min(chunk, P)
    if P % ch != 0:
        ch = P  # fall back to a single chunk for odd sizes
    def reshape_c(a):
        return a.reshape(P // ch, ch, *a.shape[1:])

    args = tuple(map(reshape_c, (y_lo, y_hi, wy_lo.astype(features.dtype),
                                 wy_hi.astype(features.dtype), x_lo, x_hi,
                                 wx_lo.astype(features.dtype),
                                 wx_hi.astype(features.dtype))))
    out = jax.lax.map(pool_chunk, args)
    return out.reshape(P, R, R, C)


@partial(jax.jit, static_argnames=("resolution", "samples", "chunk"))
def roi_pool(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    spatial_scale: float,
    resolution: int = 7,
    samples: int = 8,
    chunk: int = 256,
) -> jnp.ndarray:
    """Quantized max RoI pooling (torchvision RoIPool semantics).

    Exact when each bin spans <= ``samples`` feature cells; otherwise the max
    is taken over a ``samples``^2 sub-grid of the bin (documented TPU-native
    approximation — the reference WSOD configs use RoIPool only for historic
    parity; see SURVEY.md "RoI ops").

    Args / returns: as :func:`roi_align`.
    """
    H, W, C = features.shape
    P = boxes.shape[0]
    R, S = resolution, samples

    scaled = jnp.round(boxes.astype(jnp.float32) * spatial_scale)
    x1, y1 = scaled[:, 0], scaled[:, 1]
    x2, y2 = scaled[:, 2], scaled[:, 3]
    roi_w = jnp.maximum(x2 - x1 + 1.0, 1.0)
    roi_h = jnp.maximum(y2 - y1 + 1.0, 1.0)
    bin_w = roi_w / R
    bin_h = roi_h / R

    ph = jnp.arange(R, dtype=jnp.float32)
    # torchvision: hstart = floor(ph * bin), hend = ceil((ph + 1) * bin)
    def bounds(start, bin_size):
        lo = jnp.floor(ph[None, :] * bin_size[:, None]) + start[:, None]
        hi = jnp.ceil((ph[None, :] + 1.0) * bin_size[:, None]) + start[:, None]
        lo = jnp.clip(lo, 0, None)
        return lo, hi  # (P, R)

    hs_lo, hs_hi = bounds(y1, bin_h)
    ws_lo, ws_hi = bounds(x1, bin_w)

    # Sample integer positions lo + floor(i * (hi - lo) / S): covers every cell
    # when (hi - lo) <= S.
    i = jnp.arange(S, dtype=jnp.float32)

    def positions(lo, hi, size):
        span = hi - lo
        pos = lo[..., None] + jnp.floor(i * span[..., None] / S)
        pos = jnp.clip(pos, 0, size - 1).astype(jnp.int32)
        valid = i[None, None, :] * span[..., None] / S < span[..., None]
        return pos.reshape(pos.shape[0], R * S), valid.reshape(pos.shape[0], R * S)

    ypos, yval = positions(hs_lo, hs_hi, H)  # (P, R*S)
    xpos, xval = positions(ws_lo, ws_hi, W)

    flat = features.reshape(H * W, C)
    n = R * S
    neg_inf = jnp.asarray(-jnp.inf, dtype=features.dtype)

    def pool_chunk(args):
        yp, yv, xp, xv = args
        idx = yp[:, :, None] * W + xp[:, None, :]
        vals = jnp.take(flat, idx.reshape(-1), axis=0).reshape(
            idx.shape[0], n, n, C)
        m = (yv[:, :, None] & xv[:, None, :])[..., None]
        vals = jnp.where(m, vals, neg_inf)
        vals = vals.reshape(vals.shape[0], R, S, R, S, C).max(axis=(2, 4))
        # Empty bins (hend <= hstart) -> 0, matching torchvision.
        return jnp.where(jnp.isfinite(vals), vals, 0.0).astype(features.dtype)

    ch = min(chunk, P)
    if P % ch != 0:
        ch = P
    def reshape_c(a):
        return a.reshape(P // ch, ch, *a.shape[1:])

    out = jax.lax.map(pool_chunk, tuple(map(reshape_c, (ypos, yval, xpos, xval))))
    return out.reshape(P, R, R, C)
