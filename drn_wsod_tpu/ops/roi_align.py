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
  * ``roi_pool`` matches torchvision RoIPool (quantized bins, max, empty
    off-map bins pool to zero) EXACTLY for every bin size: each bin max is
    4 gathers from power-of-two sparse max tables (range-max-query
    decomposition), so exactness costs the same gather traffic as the old
    2x2 sampled approximation.
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


def _max_span(size: int, resolution: int) -> int:
    """Largest bin span (cells) on a ``size``-cell axis: spans reach
    ceil((size+2)/R)+1 (rounding can push roi edges one cell past the map on
    each side)."""
    return max((size + 2 + resolution - 1) // resolution + 1, 1)


def _num_levels(size: int, resolution: int) -> int:
    """Levels {1, 2, 4, ... 2^(K-1)} needed to cover every possible bin
    span on a ``size``-cell axis."""
    max_span = _max_span(size, resolution)
    k = 0
    while (1 << k) <= max_span:
        k += 1
    return k                       # floor(log2(max_span)) + 1 levels


def build_max_tables(features: jnp.ndarray, ky: int, kx: int) -> jnp.ndarray:
    """Sparse (range-max-query) tables: T[iy, ix][y, x] = max over the
    window features[y : y+2^iy, x : x+2^ix].

    Built by doubling (iy+ix passes of elementwise max of a shifted copy);
    entries within 2^i of the edge hold partial (to-the-edge) maxes, which
    RMQ lookups never read. Returns (ky*kx, H, W, C).
    """
    H, W, C = features.shape

    def doubled(t, axis, d):
        size = t.shape[axis]
        if d >= size:
            return t
        shifted = jax.lax.slice_in_dim(t, d, size, axis=axis)
        head = jax.lax.slice_in_dim(t, 0, size - d, axis=axis)
        tail = jax.lax.slice_in_dim(t, size - d, size, axis=axis)
        return jnp.concatenate([jnp.maximum(head, shifted), tail], axis=axis)

    rows = [features]
    for i in range(1, kx):
        rows.append(doubled(rows[-1], 1, 1 << (i - 1)))
    tables = []
    for tx in rows:
        col = tx
        tables.append(col)
        cols = [col]
        for i in range(1, ky):
            cols.append(doubled(cols[-1], 0, 1 << (i - 1)))
        tables[-1:] = cols                      # ky tables for this kx
    # order as [iy * kx + ix]
    stacked = jnp.stack(tables, 0).reshape(kx, ky, H, W, C)
    return stacked.transpose(1, 0, 2, 3, 4).reshape(ky * kx, H, W, C)


def build_y_tables(features: jnp.ndarray, ky: int,
                   pad_w: int = 0) -> jnp.ndarray:
    """y-axis-only doubling tables in the stacked kernel layout: returns
    (ky*H, W+pad_w, C) with T[k*H + y, x] = max(features[y : y+2^k, x]).
    Pads W first so the whole build stays in the final layout (no
    stack/transpose copies — the generic 2-D builder measured ~5.5 ms of
    XLA copies per step at DC5 scale)."""
    H, W, C = features.shape
    if pad_w:
        features = jnp.pad(features, ((0, 0), (0, pad_w), (0, 0)))
    levels = [features]
    for k in range(1, ky):
        d = 1 << (k - 1)
        prev = levels[-1]
        if d >= H:
            levels.append(prev)
            continue
        shifted = prev[d:]
        head = jnp.maximum(prev[:H - d], shifted)
        levels.append(jnp.concatenate([head, prev[H - d:]], axis=0))
    return jnp.concatenate(levels, axis=0)


def _rmq_bounds(start, roi_size, size, R, num_levels):
    """Integer bin edges (torchvision exact arithmetic), clamped to the map.

    Returns (lo, pos2, level, valid): the two RMQ gather positions covering
    [lo, hi) are ``lo`` and ``pos2 = hi - 2^level``, level = floor(log2(span)).
    Empty (off-map) bins pool to zero via ``valid``.
    """
    ph = jnp.arange(R, dtype=jnp.int32)
    lo = (ph[None, :] * roi_size[:, None]) // R + start[:, None]
    hi = -((-(ph[None, :] + 1) * roi_size[:, None]) // R) + start[:, None]
    lo = jnp.clip(lo, 0, size)
    hi = jnp.clip(hi, 0, size)
    span = jnp.maximum(hi - lo, 1)
    level = 31 - jax.lax.clz(span)                  # floor(log2(span))
    # _num_levels sizes the table stack for every reachable span; the clamp
    # only guards pathological inputs from indexing past the stack.
    level = jnp.minimum(level, num_levels - 1)
    pos2 = hi - (1 << level)
    return lo, jnp.maximum(pos2, 0), level, hi > lo


@partial(jax.jit, static_argnames=("resolution", "samples", "chunk"))
def roi_pool(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    spatial_scale: float,
    resolution: int = 7,
    samples: int = 2,          # kept for API compat; pooling is always exact
    chunk: int = 512,
) -> jnp.ndarray:
    """Quantized max RoI pooling (torchvision RoIPool semantics), EXACT for
    every bin size.

    Any integer span [lo, hi) is the union of two overlapping power-of-two
    windows (the classic sparse-table RMQ identity), so each 2-D bin max is
    the max of 4 gathers from the (level_y, level_x) doubling table — the
    same gather count as 2x2 sampling, with a cheap O(L * H * W * C) table
    build. Replaces the earlier sampled-max approximation (mean error vs
    exact was ~45% of feature scale on VOC-like large-box distributions).

    Args / returns: as :func:`roi_align`.
    """
    H, W, C = features.shape
    P = boxes.shape[0]
    R = resolution
    Ky, Kx = _num_levels(H, R), _num_levels(W, R)

    scaled = jnp.round(boxes.astype(jnp.float32) * spatial_scale).astype(jnp.int32)
    x1, y1 = scaled[:, 0], scaled[:, 1]
    x2, y2 = scaled[:, 2], scaled[:, 3]
    roi_w = jnp.maximum(x2 - x1 + 1, 1)
    roi_h = jnp.maximum(y2 - y1 + 1, 1)

    tables = build_max_tables(features, Ky, Kx)      # (L, H, W, C)
    flat = tables.reshape(Ky * Kx * H * W, C)

    def pool_chunk(args):
        cx1, cy1, cbw, cbh = args
        ys, y2p, ly, vy = _rmq_bounds(cy1, cbh, H, R, Ky)  # (n, R)
        xs, x2p, lx, vx = _rmq_bounds(cx1, cbw, W, R, Kx)
        pair = (ly[:, :, None] * Kx + lx[:, None, :])      # (n, R, R)
        base = pair * (H * W)
        acc = None
        for yy in (ys, y2p):
            for xx in (xs, x2p):
                idx = (base + (yy[:, :, None] * W + xx[:, None, :])).reshape(-1)
                v = jnp.take(flat, idx, axis=0).reshape(
                    cx1.shape[0], R, R, C)
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
