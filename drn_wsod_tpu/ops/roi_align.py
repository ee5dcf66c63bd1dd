"""RoI feature extraction as static-shape gathers.

TPU-native replacement for the reference's CUDA RoIAlign / torchvision RoIPool
(detectron2/layers/csrc/ROIAlign/, detectron2/modeling/poolers.py:148-172).
Instead of per-box dynamic loops, every RoI samples a fixed grid of points;
bilinear (align) or nearest (pool) values are fetched with gathers from the
flattened feature map, which XLA lowers to efficient dynamic-gather on TPU.

Memory shape: the computation iterates over the (S x S) sample sub-grid, so
the peak intermediate is one (chunk, R, R, C) buffer per bilinear corner —
NOT the full (chunk, R*S, R*S, C) cross product. RoIs are additionally
processed in chunks to bound that buffer.

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


def _gather_rr(flat, y_idx, x_idx, W, C):
    """flat: (H*W, C); y_idx/x_idx: (N, R) -> (N, R, R, C) values."""
    N, R = y_idx.shape
    idx = y_idx[:, :, None] * W + x_idx[:, None, :]
    return jnp.take(flat, idx.reshape(-1), axis=0).reshape(N, R, R, C)


@partial(jax.jit, static_argnames=("resolution", "sampling_ratio", "aligned", "chunk"))
def roi_align(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    spatial_scale: float,
    resolution: int = 7,
    sampling_ratio: int = 2,
    aligned: bool = False,
    chunk: int = 512,
) -> jnp.ndarray:
    """Bilinear average RoI pooling.

    Args:
      features: (H, W, C) one image's feature map (NHWC slice).
      boxes: (P, 4) XYXY in input-image coordinates.
      spatial_scale: 1 / feature stride.

    Returns: (P, resolution, resolution, C), features.dtype.
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

    flat = features.reshape(H * W, C)
    ph = jnp.arange(R, dtype=jnp.float32)

    def pool_chunk(args):
        cx1, cy1, cbw, cbh = args
        n = cx1.shape[0]
        dt = features.dtype
        acc = jnp.zeros((n, R, R, C), dtype=dt)
        for iy in range(S):
            ys = cy1[:, None] + (ph[None, :] + (iy + 0.5) / S) * cbh[:, None]
            yl, yh, wyl, wyh = _bilinear_1d(ys, H)
            for ix in range(S):
                xs = cx1[:, None] + (ph[None, :] + (ix + 0.5) / S) * cbw[:, None]
                xl, xh, wxl, wxh = _bilinear_1d(xs, W)
                v = (_gather_rr(flat, yl, xl, W, C)
                     * (wyl[:, :, None] * wxl[:, None, :])[..., None].astype(dt)
                     + _gather_rr(flat, yl, xh, W, C)
                     * (wyl[:, :, None] * wxh[:, None, :])[..., None].astype(dt)
                     + _gather_rr(flat, yh, xl, W, C)
                     * (wyh[:, :, None] * wxl[:, None, :])[..., None].astype(dt)
                     + _gather_rr(flat, yh, xh, W, C)
                     * (wyh[:, :, None] * wxh[:, None, :])[..., None].astype(dt))
                acc = acc + v
        return acc / jnp.asarray(S * S, dtype=dt)

    ch = min(chunk, P)
    if P % ch != 0:
        ch = P

    def reshape_c(a):
        return a.reshape(P // ch, ch, *a.shape[1:])

    out = jax.lax.map(pool_chunk,
                      tuple(map(reshape_c, (x1, y1, bin_w, bin_h))))
    return out.reshape(P, R, R, C)


@partial(jax.jit, static_argnames=("resolution", "samples", "chunk"))
def roi_pool(  # noqa: C901
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    spatial_scale: float,
    resolution: int = 7,
    samples: int = 2,
    chunk: int = 512,
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

    scaled = jnp.round(boxes.astype(jnp.float32) * spatial_scale).astype(jnp.int32)
    x1, y1 = scaled[:, 0], scaled[:, 1]
    x2, y2 = scaled[:, 2], scaled[:, 3]
    roi_w = jnp.maximum(x2 - x1 + 1, 1)
    roi_h = jnp.maximum(y2 - y1 + 1, 1)

    ph = jnp.arange(R, dtype=jnp.int32)
    flat = features.reshape(H * W, C)

    def bounds(start, roi_size, size):
        # torchvision: hstart = min(max(floor(ph * roi/R) + y1, 0), H),
        # hend = min(max(ceil((ph+1) * roi/R) + y1, 0), H); empty bins
        # (hend <= hstart — the bin lies off the feature map) pool to ZERO.
        # Bin edges are integer ratios, so compute them with exact integer
        # arithmetic (fp32 ceil leaks a cell when (ph+1)*roi/R lands epsilon
        # above an integer).
        lo = (ph[None, :] * roi_size[:, None]) // R + start[:, None]
        hi = -((-(ph[None, :] + 1) * roi_size[:, None]) // R) + start[:, None]
        lo = jnp.clip(lo, 0, size)
        hi = jnp.clip(hi, 0, size)
        return (lo.astype(jnp.float32), hi.astype(jnp.float32),
                hi > lo)                                     # (n, R) valid

    def pool_chunk(args):
        # Lean hot path: pure gathers + running max in the feature dtype.
        # No per-sample masks: sample position lo + floor(i*span/S) is always
        # inside [lo, hi) for span >= 1 (bounds are pre-clamped to the map,
        # matching torchvision). Off-map (empty) bins are zeroed at the end.
        cx1, cy1, cbw, cbh = args
        hs, he, vy = bounds(cy1, cbh, H)           # (n, R)
        ws, we, vx = bounds(cx1, cbw, W)
        acc = None
        for iy in range(S):
            ypos = hs + jnp.floor(iy * jnp.maximum(he - hs, 1.0) / S)
            yi = jnp.clip(ypos, 0, H - 1).astype(jnp.int32)
            for ix in range(S):
                xpos = ws + jnp.floor(ix * jnp.maximum(we - ws, 1.0) / S)
                xi = jnp.clip(xpos, 0, W - 1).astype(jnp.int32)
                v = _gather_rr(flat, yi, xi, W, C)
                acc = v if acc is None else jnp.maximum(acc, v)
        valid = (vy[:, :, None] & vx[:, None, :])[..., None]
        return jnp.where(valid, acc, jnp.zeros((), acc.dtype))

    ch = min(chunk, P)
    if P % ch != 0:
        ch = P

    def reshape_c(a):
        return a.reshape(P // ch, ch, *a.shape[1:])

    out = jax.lax.map(pool_chunk,
                      tuple(map(reshape_c, (x1, y1, roi_w, roi_h))))
    return out.reshape(P, R, R, C)
