"""Pallas TPU kernel for RoIPool.

The XLA gather formulation of RoI pooling re-reads the (small) feature map
from HBM for every sampled cell: ~3.3 GB of gather traffic against a ~30 MB
map per image (measured ~90 ms of a ~200 ms train step). This kernel keeps a
channel tile of the ENTIRE feature map resident in VMEM and walks the RoIs
against it, so HBM traffic collapses to (read map once per channel tile) +
(write pooled output once).

Structure:
  grid = (C_tiles, RoI_blocks)           # RoI innermost: the feature tile's
  feature block (H, W8, CT) -> VMEM      # index map is constant in the RoI
  sample coords (RB, R, S)   -> SMEM     # dim, so Pallas keeps it resident
  out block (RB, R*R, CT)    -> VMEM

Mosaic alignment: dynamic indexing is only unconstrained on untiled (leading)
dims, so the kernel indexes H dynamically (dim 0), loads an 8-aligned window
along W (the sublane dim, pre-padded to a multiple of 8) and isolates the
target column with a precomputed additive one-hot table (see _make_kernel) —
bins are statically unrolled so the output stores use constant sublane
indices.

Measured perf (v5e, B=2, 4096 RoIs, 88x88x2048 bf16): 51 ms with the old
per-sample compare/select/reduce; 35 ms with the additive table. Ablations
show the remaining time is pure VPU issue throughput of the (8, CT) window
ops (fully static indices and removing the feature load barely move it), so
further gains need fewer bytes per sample (int8 features) or a different
algorithm, not better scheduling.

Sample positions (integer cell coords, torchvision quantized-bin semantics)
are precomputed by XLA exactly as in ops/roi_align.roi_pool; the kernel only
max-reduces gathered vectors. Forward-only: WSOD freezes the backbone
(FREEZE_AT 5), so no gradient ever flows to the feature map and the backward
kernel is unnecessary (stop_gradient upstream).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sample_positions(boxes, spatial_scale, H, W, R, S):
    """Integer sample coords (P, R, S) per axis + per-bin validity (P, R) —
    same math as ops/roi_align.roi_pool (exact integer bin edges, clamped to
    the map; off-map bins are invalid and pool to zero, torchvision's
    empty-bin semantics)."""
    scaled = jnp.round(boxes.astype(jnp.float32) * spatial_scale).astype(jnp.int32)
    x1, y1 = scaled[:, 0], scaled[:, 1]
    x2, y2 = scaled[:, 2], scaled[:, 3]
    roi_w = jnp.maximum(x2 - x1 + 1, 1)
    roi_h = jnp.maximum(y2 - y1 + 1, 1)
    ph = jnp.arange(R, dtype=jnp.int32)

    def axis_positions(start, roi_size, size):
        lo = (ph[None, :] * roi_size[:, None]) // R + start[:, None]
        hi = -((-(ph[None, :] + 1) * roi_size[:, None]) // R) + start[:, None]
        lo = jnp.clip(lo, 0, size)
        hi = jnp.clip(hi, 0, size)
        span = jnp.maximum(hi - lo, 1)
        i = jnp.arange(S, dtype=jnp.int32)
        pos = lo[..., None] + (i[None, None, :] * span[..., None]) // S
        return jnp.clip(pos, 0, size - 1), (hi > lo)        # (P, R, S), (P, R)

    ys, vy = axis_positions(y1, roi_h, H)
    xs, vx = axis_positions(x1, roi_w, W)
    return ys, xs, vy, vx


def _make_kernel(RB, R, S, CT, neg_val: float, dtype, unroll_rois=False):
    """Additive one-hot formulation.

    Selecting lane ``xo`` out of an 8-lane window used to cost a compare +
    select + cross-sublane reduce PER SAMPLE (~20 vreg-ops). Instead we
    precompute an additive table T (8 offsets x (8, CT)): T[k] is 0 on
    sublane k and a huge negative elsewhere, so

        window + T[xo]

    leaves the selected sublane's values intact and poisons the rest; the
    bin max then accumulates whole (8, CT) tiles (2 vreg-ops/sample in
    bf16) with ONE deferred sublane reduce per bin. Bit-exact vs the old
    select: adding 0.0 is exact, and poisoned lanes can never win the max
    (features are finite, poison is finfo.min/2).
    """

    def kernel(ys_ref, x8_ref, xo_ref, scale_ref, feat_ref, out_ref,
               tab_ref):
        # Fill the additive table once (scratch persists across grid steps).
        @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
        def _():
            # Build in f32 (i1 masks from i32 compares have (8, 128) tiling,
            # which Mosaic cannot relayout into a bf16 (16, 128) select).
            sub = jax.lax.broadcasted_iota(
                jnp.int32, (8, CT), 0).astype(jnp.float32)
            for k in range(8):
                tab_ref[k] = jnp.where(
                    sub == float(k), jnp.zeros((), jnp.float32),
                    jnp.asarray(neg_val, jnp.float32)).astype(dtype)

        def one_roi(i):
            for b in range(R * R):           # static: aligned output stores
                py, px = b // R, b % R
                acc = None
                for sy in range(S):
                    y = ys_ref[i, py, sy]
                    for sx in range(S):
                        x8 = pl.multiple_of(x8_ref[i, px, sx], 8)
                        xo = xo_ref[i, px, sx]
                        t = (feat_ref[y, pl.ds(x8, 8), :]     # (8, CT)
                             + tab_ref[xo])
                        acc = t if acc is None else jnp.maximum(acc, t)
                m = jnp.max(acc, axis=0)                      # (CT,)
                # fused epilogue: per-bin scale = (objectness+1) * validity
                # * bin-on-map (0 zeroes off-map/empty bins, torchvision
                # semantics)
                out_ref[i, b, :] = m * scale_ref[i, py, px].astype(dtype)

        if unroll_rois:
            # static unroll: independent bins across rois pipeline freely
            for i in range(RB):
                one_roi(i)
        else:
            def roi_body(i, _):
                one_roi(i)
                return 0

            jax.lax.fori_loop(0, RB, roi_body, 0)

    return kernel


@partial(jax.jit, static_argnames=("spatial_scale", "resolution", "samples",
                                   "roi_block", "c_tile", "interpret"))
def roi_pool_pallas(features: jnp.ndarray, boxes: jnp.ndarray,
                    spatial_scale: float, resolution: int = 7,
                    samples: int = 2, roi_block: int = 8,
                    c_tile: int = 512, interpret: bool = False,
                    roi_scale: jnp.ndarray | None = None) -> jnp.ndarray:
    """(H, W, C) features + (P, 4) boxes -> (P, R, R, C) pooled, max.

    ``roi_scale`` (P,) optionally scales each RoI's output in the kernel
    epilogue (fuses the WSOD (objectness+1)*validity multiply, saving two
    full passes over the 800MB pooled tensor)."""
    H, W, C = features.shape
    P = boxes.shape[0]
    R, S = resolution, samples
    RB = min(roi_block, P)
    while P % RB != 0:
        RB //= 2
    CT = min(c_tile, C)
    while C % CT != 0:
        CT //= 2

    ys, xs, vy, vx = _sample_positions(boxes, spatial_scale, H, W, R, S)
    if roi_scale is None:
        roi_scale = jnp.ones((P,), jnp.float32)
    # per-bin scale: roi scale where the bin intersects the map, 0 otherwise
    bin_scale = (roi_scale.astype(jnp.float32)[:, None, None]
                 * vy[:, :, None] * vx[:, None, :])          # (P, R, R)

    # pad W (sublane dim) to a multiple of 8 for aligned window loads
    W8 = -(-W // 8) * 8
    if W8 != W:
        features = jnp.pad(features, ((0, 0), (0, W8 - W), (0, 0)))

    neg_val = float(jnp.finfo(features.dtype).min) / 2
    x8 = (xs // 8) * 8
    xo = xs - x8
    grid = (C // CT, P // RB)
    out = pl.pallas_call(
        _make_kernel(RB, R, S, CT, neg_val, features.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((RB, R, S), lambda c, r: (r, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((RB, R, S), lambda c, r: (r, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((RB, R, S), lambda c, r: (r, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((RB, R, R), lambda c, r: (r, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((H, W8, CT), lambda c, r: (0, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RB, R * R, CT), lambda c, r: (r, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, R * R, C), features.dtype),
        scratch_shapes=[pltpu.VMEM((8, 8, CT), features.dtype)],
        # default scoped-vmem limit is 16M; the additive table (+64K) tips
        # the double-buffered feature block over it.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(ys, x8, xo, bin_scale, features)
    return out.reshape(P, R, R, C)
