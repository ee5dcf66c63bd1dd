"""Pallas TPU kernel for RoIPool (exact max, torchvision semantics).

The XLA gather formulation of RoI pooling re-reads the (small) feature map
from HBM for every sampled cell: ~3.3 GB of gather traffic against a ~30 MB
map per image (measured ~90 ms of a ~200 ms train step). This kernel keeps a
channel tile of the feature map resident in VMEM and walks the RoIs against
it, so HBM traffic collapses to (read map once per channel tile) + (write
pooled output once).

Exact bin max in exactly TWO samples per bin:

  * y axis — sparse-table RMQ: any row span [hs, he) is the union of two
    overlapping power-of-two windows, so the input is a stack of Ky y-maxed
    tables T[ky][y, x] = max(features[y : y+2^ky, x]) and each bin reads 2
    rows (ky*H + hs and ky*H + he-2^ky), addressed dynamically on the
    untiled leading dim. Ky = 4 levels for DC5-sized maps — the stacked
    block still fits VMEM at a wide channel tile (a full 2-D (ky, kx) table
    stack would need 16 levels and forces CT=128, measured 11x slower:
    per-sample scalar overhead stops amortizing below (8, 512) tiles).
  * x axis — ONE wide aligned load + additive range mask: the whole span
    [ws, we) (< max_span cells, misaligned by ws%8 <= 7) fits inside a
    single 8-aligned (LX, CT) window with LX = 8*ceil((7 + max_span)/8)
    sublanes (24 for 704px DC5 maps). A precomputed mask table
    M[a*(LX-7) + span-1] is 0 on sublanes [a, a+span) and a huge negative
    elsewhere, so ``window + M[mi]`` poisons exactly the out-of-span lanes.

The kernel is scalar-issue-bound per sample (~18 cycles of SMEM loads +
dynamic addressing vs ~3-12 cycles of vector work), so ONE wide load beats
three narrow ones (the previous <=3x 8-lane-window formulation measured
47 ms; per-bin pl.when predication measured 2x SLOWER than dense — branches
break the pipeline; a per-ROI small-roi fast path helped only distributions
dominated by sub-57px boxes).

Mosaic alignment: dynamic indexing is only unconstrained on untiled
(leading) dims, so the kernel indexes (ky*H + y) dynamically (dim 0) and
loads 8-aligned (LX, CT) windows along W (the sublane dim, padded so every
window is in bounds); bins are statically unrolled so output stores use
constant sublane indices.

Sample coords (integer cell bins, torchvision quantized semantics, off-map
bins pool to zero) are precomputed by XLA with the exact integer arithmetic
of ops/roi_align.roi_pool; the kernel only max-reduces masked windows.
Forward-only: WSOD freezes the backbone (FREEZE_AT 5), so no gradient ever
flows to the feature map and the backward kernel is unnecessary
(stop_gradient upstream).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .roi_align import (_max_span, _num_levels, _rmq_bounds,
                        build_y_tables)


LX = 16  # native bf16 sublane tile: all x-loads are (16, CT)


def _load_extent(W: int, R: int) -> int:
    """Number of (16, CT) x-loads needed in the worst case: spans up to
    max_span plus <=7 misalignment."""
    return -(-(7 + _max_span(W, R)) // LX)


def _kernel_positions(boxes, spatial_scale, H, W, R, row_share=True,
                      band_start=None, band_rows=0, num_levels=None):
    """Per-bin gather coords for the y-RMQ + masked-16-window-x kernel.

    ``band_start``/``band_rows``: banded mode — y rows are emitted RELATIVE
    to each roi's band (``(row - band_start) + level * band_rows``) so the
    kernel can run against a band-sized level-stack scratch; every roi must
    be fully contained in its band (guaranteed by _partition_small_rois).
    ``num_levels`` caps the table's level count (banded tables hold only the
    levels short rois can reach).

    Returns (unbroadcast — y-data per y-bin, x-data per x-bin; the kernel's
    bin ids are static so it splits ``b`` into (yb, xb) at trace time):
      ys: (P, R*2) int32 — stacked-table row ``ky*H + y`` for the two
        covering y-windows of each y-bin.
      x8: (P, R) int32 — 8-aligned start of each x-bin's first (16, CT)
        window.
      mi: (P, R*NW) int32 — range-mask indices a*16 + (b-1) (lanes [a, b)
        of a 16-window) per x-bin and window; a window beyond the span gets
        the all-poison entry.
      tier: (P, 1) int32 —
        0: per-bin, one y-row x one 16-window;
        1: per-bin, two y-rows x one window;
        2: per-bin, two y-rows x NW windows (widest rois);
        3: ROW-SHARED, whole roi x-extent inside ONE roi-aligned window —
           the window pair is loaded once per y-row and reused by all R
           x-bins (masks address lanes relative to the shared start);
        4: ROW-SHARED over TWO adjacent windows;
        5: ROW-SHARED + DEGENERATE-Y, one window — every bin's y-RMQ pair
           collapses (all bin spans are exactly a power of two; true for
           every roi up to ~8 cells tall, where spans stay in {1, 2}), so
           each y-row costs ONE load, no pair max. Small selective-search
           proposals dominate WSOD box distributions;
        6: ROW-SHARED + DEGENERATE-Y over TWO windows.
      bin_scale_mask: (P, R, R) f32 — 1 on on-map bins, 0 on empty bins.
    """
    Ky = _num_levels(H, R) if num_levels is None else num_levels
    scaled = jnp.round(boxes.astype(jnp.float32) * spatial_scale).astype(jnp.int32)
    x1, y1 = scaled[:, 0], scaled[:, 1]
    x2, y2 = scaled[:, 2], scaled[:, 3]
    roi_w = jnp.maximum(x2 - x1 + 1, 1)
    roi_h = jnp.maximum(y2 - y1 + 1, 1)

    ylo, y2p, ly, vy = _rmq_bounds(y1, roi_h, H, R, Ky)      # (P, R)
    if band_start is not None:
        rows = band_rows
        r0 = jnp.clip(jnp.clip(ylo, 0, H - 1) - band_start[:, None],
                      0, rows - 1)
        r1 = jnp.clip(jnp.clip(y2p, 0, H - 1) - band_start[:, None],
                      0, rows - 1)
        ys = jnp.stack([r0 + ly * rows, r1 + ly * rows], -1)  # (P, R, 2)
    else:
        ys = jnp.stack([jnp.clip(ylo, 0, H - 1) + ly * H,
                        jnp.clip(y2p, 0, H - 1) + ly * H], -1)  # (P, R, 2)

    # x bins: exact integer edges clamped to the map (same arithmetic as
    # _rmq_bounds but we need the raw [ws, we) span, not an RMQ pair)
    ph = jnp.arange(R, dtype=jnp.int32)
    ws = (ph[None, :] * roi_w[:, None]) // R + x1[:, None]
    we = -((-(ph[None, :] + 1) * roi_w[:, None]) // R) + x1[:, None]
    ws = jnp.clip(ws, 0, W)
    we = jnp.clip(we, 0, W)
    vx = we > ws
    # mask indices: entry a*16 + (b-1) is zero on lanes [a, b) of a
    # 16-window; the extra entry LX*LX is all-poison (window beyond the span)
    NW = max(_load_extent(W, R), 2)
    span = jnp.clip(we - ws, 1, NW * LX - 7)
    x8 = jnp.clip((ws // 8) * 8, 0, W - 1)   # ws == W only on empty bins
    a = jnp.clip(ws - x8, 0, 7)
    end = a + span
    ALL_POISON = LX * LX                             # extra table entry
    js = jnp.arange(NW, dtype=jnp.int32)
    a_j = jnp.clip(a[..., None] - js * LX, 0, 7)     # a for j=0, else 0
    b_j = jnp.clip(end[..., None] - js * LX, 1, LX)
    has_j = end[..., None] > js * LX
    mi = jnp.where(has_j, a_j * LX + (b_j - 1), ALL_POISON)  # (P, R, NW)

    P = boxes.shape[0]
    # per-roi tier: 0 = degenerate y pairs + single window everywhere,
    # 1 = two y rows + single window, 2 = full (multi-window somewhere)
    y_deg = (ys[..., 1] == ys[..., 0]).all(axis=-1)          # (P,)
    one_w = jnp.logical_not(has_j[..., 1:].any((-2, -1)))    # (P,)

    # ---- row-shared tiers: the whole roi x-extent fits 1 or 2 windows
    # aligned at the ROI's (not the bin's) 8-aligned start, so each y-row's
    # window loads are shared by all R x-bins. Mask lane offsets are
    # relative to x8r and may reach LX-1 (the table covers a in [0, LX)).
    ws_min, we_max = ws[:, 0], we[:, -1]                      # (P,)
    x8r = jnp.clip((jnp.clip(ws_min, 0, W - 1) // 8) * 8, 0, W - 1)
    xfit1 = we_max <= x8r + LX
    xfit2 = we_max <= x8r + 2 * LX
    js2 = jnp.arange(2, dtype=jnp.int32)
    rs = ws - x8r[:, None]                                    # (P, R)
    re_ = we - x8r[:, None]
    a_s = jnp.clip(rs[..., None] - js2 * LX, 0, LX - 1)       # (P, R, 2)
    b_s = jnp.clip(re_[..., None] - js2 * LX, 1, LX)
    has_s = ((re_[..., None] > js2 * LX)
             & (rs[..., None] < (js2 + 1) * LX) & vx[..., None])
    mi_s = jnp.where(has_s, a_s * LX + (b_s - 1), ALL_POISON)
    if NW > 2:
        mi_s = jnp.concatenate(
            [mi_s, jnp.full((P, R, NW - 2), ALL_POISON, jnp.int32)], -1)

    # tier priority (measured per-roi vreg-op costs): shared-1-window beats
    # everything it covers; degenerate-y variants drop the pair load+max;
    # per-bin degenerate-y beats shared-2-window.
    if not row_share:
        xfit1 = xfit2 = jnp.zeros_like(xfit1)
    # deg-y shared-2-window (6) beats per-bin deg-y (0): 14 dynamic loads
    # vs 49, and loads dominate the per-sample cost (PERF.md cost model)
    tier = jnp.where(
        xfit1 & y_deg, 5,
        jnp.where(
            xfit1, 3,
            jnp.where(xfit2 & y_deg, 6,
                      jnp.where(one_w & y_deg, 0,
                                jnp.where(xfit2, 4,
                                          jnp.where(one_w, 1, 2))))))
    tier = tier.astype(jnp.int32)[:, None]
    shared = tier[:, 0] >= 3
    x8 = jnp.where(shared[:, None], x8r[:, None], x8)
    mi = jnp.where(shared[:, None, None], mi_s, mi)

    valid = (vy[:, :, None] & vx[:, None, :]).astype(jnp.float32)
    # y-data depends only on the y-bin and x-data only on the x-bin, and the
    # kernel's bin index is STATIC at trace time (unrolled loops), so the
    # coords ship unbroadcast: (P, R*2) y-rows + (P, R) window starts +
    # (P, R*NW) mask ids instead of (P, R*R*{2,1,NW}) — 7x less SMEM traffic
    # and no XLA broadcast/materialize pass.
    return (ys.reshape(P, R * 2), x8, mi.reshape(P, R * NW), tier, valid)


def _make_kernel(RB, R, CT, NW, neg_val: float, dtype, unroll_rois=False,
                 hbm_tables=False, int8_mode=False,
                 fuse_table_build=False, H=0, row_share=True,
                 joint_emit=True, fused_dma=False, banded=False,
                 band_rows=0):
    """Masked-16-window formulation with per-ROI tiers (module docstring).

    ``hbm_tables``: the stacked y-tables stay in HBM and each channel pass
    DMAs its (Ky*H, W8, CT) slice into a SINGLE-buffered VMEM scratch at the
    pass's first grid step. This frees the double buffer the block pipeline
    would allocate, which is what lets CT reach 1024 (2 channel passes for
    C=2048 instead of 4 — the kernel is scalar-issue-bound per sample
    iteration, and iterations scale with C/CT). The copy costs ~100us per
    pass vs ~10ms of pass compute.

    ``int8_mode``: the tables hold per-channel symmetrically quantized int8
    (max commutes with the monotone per-channel map, so the pooled MAX is
    exact in int8 space); lanes are masked by ``min`` against a {127, -128}
    table (min(x, 127) = x keeps, min(x, -128) = -128 poisons — one op like
    the additive bf16 poison, no overflow) and the emit dequantizes with the
    per-channel scale. int8 packs 4 elements per 32-bit lane vs bf16's 2,
    halving the vector-issue cost of the loads/masks/maxes that dominate
    the kernel.

    ``fuse_table_build``: the input is the RAW padded (H, W8, C) feature
    map; the y-RMQ level stack is built into a single-buffered VMEM scratch
    at each channel pass's first grid step with Ky-1 whole-level sliced
    maxes (~10us of vector work). This removes the XLA-side build_y_tables
    program (~3ms/step at DC5 scale) and shrinks the kernel's HBM read from
    the Ky-replicated stack to the raw map.
    """

    def kernel(*refs):
        if banded:
            (ys_ref, x8_ref, mi_ref, tier_ref, scale_ref, bstart_ref,
             bflag_ref, feat_hbm_or_vmem, out_ref) = refs[:9]
            scratch = refs[9:]
        elif int8_mode:
            (ys_ref, x8_ref, mi_ref, tier_ref, scale_ref, chs_ref,
             feat_hbm_or_vmem, out_ref) = refs[:8]
            scratch = refs[8:]
        else:
            (ys_ref, x8_ref, mi_ref, tier_ref, scale_ref,
             feat_hbm_or_vmem, out_ref) = refs[:7]
            scratch = refs[7:]
        run_block = None
        if banded:
            # banded batch-in-grid mode: grid = (B, C/CT, NBLK). Roi blocks
            # are band-pure and band-sorted (see _pack_banded); bflag bit 0
            # says "this block starts a new band -> DMA + rebuild the
            # band's level stack", bit 1 says "dummy tail block -> skip".
            # The raw map stays in HBM; each (b, c, band) DMAs only the
            # band's ``band_rows`` rows, so the level-stack scratch holds
            # LV * band_rows rows instead of Ky_full * H — which is what
            # lets CT stay wide on large eval maps where the full stack
            # collapses CT to 128 (PERF.md round-3 "remaining eval
            # headroom").
            tab_ref, feat_ref, copy_sem = scratch
            b_id, c_id = pl.program_id(0), pl.program_id(1)
            flags = bflag_ref[0, 0]
            run_block = (flags & 2) == 0

            @pl.when(run_block
                     & ((pl.program_id(2) == 0) | ((flags & 1) == 1)))
            def _():
                start = bstart_ref[0, 0]
                cp = pltpu.make_async_copy(
                    feat_hbm_or_vmem.at[b_id, pl.ds(start, band_rows), :,
                                        pl.ds(c_id * CT, CT)],
                    feat_ref.at[pl.ds(0, band_rows)], copy_sem)
                cp.start()
                cp.wait()
                LV = feat_ref.shape[0] // band_rows
                HB = band_rows
                for k in range(1, LV):
                    d = 1 << (k - 1)
                    lo = (k - 1) * HB
                    if d >= HB:
                        feat_ref[k * HB:(k + 1) * HB] = feat_ref[lo:lo + HB]
                        continue
                    feat_ref[k * HB:k * HB + HB - d] = jnp.maximum(
                        feat_ref[lo:lo + HB - d], feat_ref[lo + d:lo + HB])
                    feat_ref[k * HB + HB - d:(k + 1) * HB] = \
                        feat_ref[lo + HB - d:lo + HB]
        elif fused_dma:
            # batch-in-grid mode: grid = (B, C/CT, P/RB); the RAW padded
            # (B, H, W8, C) map stays in HBM and each (b, c) pass DMAs its
            # (H, W8, CT) slice into the level-0 region of a SINGLE-buffered
            # level-stack scratch, then builds the y-RMQ levels in place.
            # Single-buffering the raw block (vs the block pipeline's double
            # buffer) is what lets CT reach 1024 — which HALVES the number
            # of bin-passes the scalar-overhead-bound inner loop runs.
            tab_ref, feat_ref, copy_sem = scratch
            b_id, c_id = pl.program_id(0), pl.program_id(1)

            @pl.when(pl.program_id(2) == 0)
            def _():
                cp = pltpu.make_async_copy(
                    feat_hbm_or_vmem.at[b_id, :, :, pl.ds(c_id * CT, CT)],
                    feat_ref.at[pl.ds(0, H)], copy_sem)
                cp.start()
                cp.wait()
                Ky = feat_ref.shape[0] // H
                for k in range(1, Ky):
                    d = 1 << (k - 1)
                    lo = (k - 1) * H
                    if d >= H:
                        feat_ref[k * H:(k + 1) * H] = feat_ref[lo:lo + H]
                        continue
                    feat_ref[k * H:k * H + H - d] = jnp.maximum(
                        feat_ref[lo:lo + H - d], feat_ref[lo + d:lo + H])
                    feat_ref[k * H + H - d:(k + 1) * H] = \
                        feat_ref[lo + H - d:lo + H]
        elif fuse_table_build:
            tab_ref, feat_ref = scratch       # feat_ref: level-stack scratch
            raw_ref = feat_hbm_or_vmem        # (H, W8, CT) block

            @pl.when(pl.program_id(1) == 0)
            def _():
                # level 0 = raw rows; level k rows y<H-d are
                # max(prev[y], prev[y+d]), the tail keeps prev (same
                # recurrence as ops/roi_align.build_y_tables)
                feat_ref[0:H] = raw_ref[...]
                Ky = feat_ref.shape[0] // H
                for k in range(1, Ky):
                    d = 1 << (k - 1)
                    lo = (k - 1) * H
                    if d >= H:
                        feat_ref[k * H:(k + 1) * H] = feat_ref[lo:lo + H]
                        continue
                    feat_ref[k * H:k * H + H - d] = jnp.maximum(
                        feat_ref[lo:lo + H - d], feat_ref[lo + d:lo + H])
                    feat_ref[k * H + H - d:(k + 1) * H] = \
                        feat_ref[lo + H - d:lo + H]
        elif hbm_tables:
            tab_ref, feat_ref, copy_sem = scratch
            cidx = pl.program_id(0)

            @pl.when(pl.program_id(1) == 0)
            def _():
                cp = pltpu.make_async_copy(
                    feat_hbm_or_vmem.at[:, :, pl.ds(cidx * CT, CT)],
                    feat_ref, copy_sem)
                cp.start()
                cp.wait()
        else:
            (tab_ref,) = scratch
            feat_ref = feat_hbm_or_vmem

        # Fill the mask table once (scratch persists across grid steps).
        _first = (pl.program_id(0) == 0) & (pl.program_id(1) == 0)
        if fused_dma or banded:
            _first = _first & (pl.program_id(2) == 0)

        @pl.when(_first)
        def _():
            # Build in f32 (i1 masks from i32 compares have (8, 128) tiling,
            # which Mosaic cannot relayout into a bf16 (16, 128) select).
            sub = jax.lax.broadcasted_iota(
                jnp.int32, (LX, CT), 0).astype(jnp.float32)
            keep = jnp.asarray(127.0 if int8_mode else 0.0, jnp.float32)
            poison = jnp.asarray(-128.0 if int8_mode else neg_val,
                                 jnp.float32)
            tdt = jnp.int8 if int8_mode else dtype
            # a reaches LX-1: row-shared tiers address lanes relative to
            # the ROI's aligned start, not the bin's
            for a in range(LX):
                for b in range(a + 1, LX + 1):
                    tab_ref[a * LX + (b - 1)] = jnp.where(
                        (sub >= float(a)) & (sub < float(b)),
                        keep, poison).astype(tdt)
            tab_ref[LX * LX] = jnp.full((LX, CT), poison).astype(tdt)

        def one_roi(i):
            # coords ship unbroadcast (y-data per y-bin, x-data per x-bin);
            # bin ids are static Python ints so the split is trace-time free
            def win(b, sy, j):
                y = ys_ref[i, 2 * (b // R) + sy]  # ky*H + row (RMQ pair)
                x8 = pl.multiple_of(x8_ref[i, b % R], 8) + j * LX
                w = feat_ref[y, pl.ds(x8, LX), :]
                t = tab_ref[mi_ref[i, NW * (b % R) + j]]
                return jnp.minimum(w, t) if int8_mode else w + t

            def win_pair(b, j):
                # The mask table entry is shared by both rows of a bin's
                # y-RMQ pair, so max BEFORE masking saves one (16, CT) op
                # per window: max(w0 + t, w1 + t) == max(w0, w1) + t
                # (min for the int8 poison likewise).
                y0 = ys_ref[i, 2 * (b // R)]
                y1 = ys_ref[i, 2 * (b // R) + 1]
                x8 = pl.multiple_of(x8_ref[i, b % R], 8) + j * LX
                w = jnp.maximum(feat_ref[y0, pl.ds(x8, LX), :],
                                feat_ref[y1, pl.ds(x8, LX), :])
                t = tab_ref[mi_ref[i, NW * (b % R) + j]]
                return jnp.minimum(w, t) if int8_mode else w + t

            def emit_single(b, acc):
                # fused epilogue: per-bin scale = (objectness+1) * validity
                # * bin-on-map (0 zeroes off-map/empty bins, torchvision
                # semantics). Applying this as an XLA pass instead measured
                # NET SLOWER (unfused 1.6GB elementwise pass).
                # halve the cross-sublane reduce first: one (8, CT) max
                # replaces a level of the 16-row shuffle tree
                if int8_mode:
                    # Mosaic has no int8 axis-reduction: one elementwise
                    # split-half max in int8, then finish the tree in f32
                    m = jnp.max(jnp.maximum(acc[:8], acc[8:])
                                .astype(jnp.float32), axis=0)
                    out_ref[i, b, :] = (m * chs_ref[0]
                                        * scale_ref[i, b]).astype(dtype)
                else:
                    m = jnp.max(jnp.maximum(acc[:8], acc[8:]), axis=0)
                    out_ref[i, b, :] = m * scale_ref[i, b].astype(dtype)

            # ---- joint emit: butterfly multi-reduce of 8 consecutive bins.
            # Each bin's (16, CT) acc folds to a scaled (8, CT) partial; a
            # 3-round select/rotate butterfly then computes all 8 sublane
            # reductions AT ONCE, landing bin b0+k's total on sublane k (the
            # bit-reversal permutation [0,4,2,6,1,5,3,7] is absorbed by slot
            # assignment), so 8 bins cost 7 pair-merges (5 vreg-ops each) +
            # ONE (8, CT) store instead of 8 shuffle trees + 8 row stores.
            def _rot(v, d):
                # _rot(v,d)[i] = v[(i+d)%8]. Static slice+concat instead of
                # pltpu.roll: Mosaic's tpu.dynamic_rotate is unimplemented
                # for non-32-bit element types (bf16 accs).
                k = d % 8
                if k == 0:
                    return v
                return jnp.concatenate([v[k:], v[:k]], axis=0)

            def _pair(a, b, d):
                m = (jax.lax.broadcasted_iota(jnp.int32, (8, CT), 0)
                     % (2 * d)) < d
                x = jnp.where(m, a, _rot(b, -d))
                y = jnp.where(m, _rot(a, d), b)
                return jnp.maximum(x, y)

            _PI = (0, 4, 2, 6, 1, 5, 3, 7)       # self-inverse

            def _flush(pend):
                if len(pend) == 8:
                    b0 = pend[0][0]
                    s = [pend[_PI[k]][1] for k in range(8)]
                    c = [_pair(s[2 * k], s[2 * k + 1], 4) for k in range(4)]
                    e = [_pair(c[2 * k], c[2 * k + 1], 2) for k in range(2)]
                    out_ref[i, b0:b0 + 8, :] = _pair(e[0], e[1], 1)
                else:
                    for b, p in pend:
                        out_ref[i, b, :] = jnp.max(p, axis=0)
                pend.clear()

            use_joint = joint_emit and not int8_mode

            def make_emit():
                """Per-tier-body emitter (each pl.when body traces its own
                pending-group state)."""
                if not use_joint:
                    return emit_single, (lambda: None)
                pend = []

                def emit(b, acc):
                    m = jnp.maximum(acc[:8], acc[8:])
                    pend.append((b, m * scale_ref[i, b].astype(dtype)))
                    if len(pend) == 8:
                        _flush(pend)

                return emit, (lambda: _flush(pend))

            # one branch per ROI (per-bin branches measured 2x slower)
            tier = tier_ref[i, 0]

            @pl.when(tier == 0)
            def _():
                emit, fin = make_emit()
                for b in range(R * R):       # 1 sample/bin
                    emit(b, win(b, 0, 0))
                fin()

            @pl.when(tier == 1)
            def _():
                emit, fin = make_emit()
                for b in range(R * R):       # 2 samples/bin, 1 shared mask
                    emit(b, win_pair(b, 0))
                fin()

            @pl.when(tier == 2)
            def _():
                emit, fin = make_emit()
                for b in range(R * R):       # 2*NW samples/bin (rare rois)
                    acc = None
                    for j in range(NW):
                        t = win_pair(b, j)
                        acc = t if acc is None else jnp.maximum(acc, t)
                    emit(b, acc)
                fin()

            if not row_share:
                return
            # row-shared tiers: the (16, CT) window(s) for a y-row are
            # loaded once and reused by all R x-bins of that row (mask
            # offsets are relative to the roi-shared x8). The y-RMQ pair
            # max is taken BEFORE masking (max(w0, w1) + t == the max of
            # the two masked windows; min for the int8 poison likewise).
            def row_windows(b0, j):
                y0 = ys_ref[i, 2 * (b0 // R)]
                y1 = ys_ref[i, 2 * (b0 // R) + 1]
                x8 = pl.multiple_of(x8_ref[i, b0 % R], 8) + j * LX
                return jnp.maximum(feat_ref[y0, pl.ds(x8, LX), :],
                                   feat_ref[y1, pl.ds(x8, LX), :])

            def masked(m, b, j):
                t = tab_ref[mi_ref[i, NW * (b % R) + j]]
                return jnp.minimum(m, t) if int8_mode else m + t

            @pl.when(tier == 3)
            def _():
                emit, fin = make_emit()
                for yb in range(R):          # one shared window per y-row
                    b0 = yb * R
                    m = row_windows(b0, 0)
                    for xb in range(R):
                        emit(b0 + xb, masked(m, b0 + xb, 0))
                fin()

            @pl.when(tier == 4)
            def _():
                emit, fin = make_emit()
                for yb in range(R):          # two shared windows per y-row
                    b0 = yb * R
                    m0 = row_windows(b0, 0)
                    m1 = row_windows(b0, 1)
                    for xb in range(R):
                        b = b0 + xb
                        emit(b, jnp.maximum(masked(m0, b, 0),
                                            masked(m1, b, 1)))
                fin()

            # degenerate-y variants: the bin's RMQ pair collapses to one
            # row, so each y-row costs ONE load and no pair max
            def row_window1(b0, j):
                y0 = ys_ref[i, 2 * (b0 // R)]
                x8 = pl.multiple_of(x8_ref[i, b0 % R], 8) + j * LX
                return feat_ref[y0, pl.ds(x8, LX), :]

            @pl.when(tier == 5)
            def _():
                emit, fin = make_emit()
                for yb in range(R):          # ONE shared window per y-row
                    b0 = yb * R
                    m = row_window1(b0, 0)
                    for xb in range(R):
                        emit(b0 + xb, masked(m, b0 + xb, 0))
                fin()

            @pl.when(tier == 6)
            def _():
                emit, fin = make_emit()
                for yb in range(R):          # TWO shared windows per y-row
                    b0 = yb * R
                    m0 = row_window1(b0, 0)
                    m1 = row_window1(b0, 1)
                    for xb in range(R):
                        b = b0 + xb
                        emit(b, jnp.maximum(masked(m0, b, 0),
                                            masked(m1, b, 1)))
                fin()

        def all_rois():
            if unroll_rois:
                # static unroll: independent bins across rois pipeline freely
                for i in range(RB):
                    one_roi(i)
            else:
                def roi_body(i, _):
                    one_roi(i)
                    return 0

                jax.lax.fori_loop(0, RB, roi_body, 0)

        if run_block is None:
            all_rois()
        else:
            # dummy tail blocks cost one grid step and an (unread) garbage
            # out-block write, not RB*R*R bin passes
            @pl.when(run_block)
            def _():
                all_rois()

    return kernel


_VMEM_BUDGET = 120 * 1024 * 1024      # leave headroom under v5e's 128M

# Register-allocator spill slots are not in the analytic footprint. Measured
# on hardware: NW=2 programs (every train bucket) spill <= 17M at CT=1024,
# but the NW=3 multi-window tier-2 code path spilled 32.1M at CT=256 on a
# 191x191 DC5 map (TTA's 1536 eval bucket), and an NW=2 / CT=512 program on
# a 136x136 map (the 1088 eval bucket) spilled 31.5M — both OOMing a
# footprint the naive model said fit. Empirically the spill stays <= 17M
# only on the CT=1024 programs (the train buckets); every measured CT<=512
# compile spilled ~32M regardless of NW. Budget per-CT accordingly.
_SPILL_MARGIN = 34 * 1024 * 1024
_SPILL_MARGIN_CT1024 = 17 * 1024 * 1024


def _spill_margin(ct: int) -> int:
    return _SPILL_MARGIN_CT1024 if ct >= 1024 else _SPILL_MARGIN


class GridCTSelection(NamedTuple):
    """Channel-tile choice + the derived launch geometry it was computed
    from. The kernel launch uses THESE fields (not locally recomputed
    copies) so the footprint model the tests exercise and the actual
    scratch/BlockSpec layout share one source of truth."""
    ct: int
    start_ct: int            # tile before any VMEM-driven shrink
    footprint: object        # ct -> bytes (incl. measured spill margin)
    ky: int                  # y-RMQ levels in the stacked table
    nw: int                  # max x-load windows per bin row
    w8: int                  # padded table width (8-aligned + NW windows)
    n_masks: int             # x-range mask table rows


def grid_ct_selection(H, W, C, itemsize, c_tile=1024, roi_block=8,
                      resolution=7) -> GridCTSelection:
    """Channel-tile selection for the batch-in-grid kernel, exposed so tests
    can assert every realizable eval/TTA map stays within the measured VMEM
    envelope (static footprint + per-CT spill margin) without compiling."""
    R = resolution
    Ky = _num_levels(H, R)
    NW = max(_load_extent(W, R), 2)
    W8 = ((W - 1) // 8) * 8 + NW * LX
    n_masks = LX * LX + 1

    def footprint(ct):
        table = Ky * H * W8 * ct * itemsize           # single-buffered
        masks = n_masks * LX * ct * itemsize
        out_blk = 2 * roi_block * R * R * ct * itemsize  # double-buffered
        return table + masks + out_blk + _spill_margin(ct)

    CT = min(c_tile, C)
    while C % CT != 0:
        CT //= 2
    start_ct = CT
    while CT > 128 and footprint(CT) > _VMEM_BUDGET:
        CT //= 2
    return GridCTSelection(CT, start_ct, footprint, Ky, NW, W8, n_masks)


def _xla_fallback(features, boxes, spatial_scale, resolution, roi_scale):
    """Exact XLA roi_pool for maps too large for any Pallas VMEM layout
    (e.g. unbucketed eval near MAX_SIZE 4000). Matches the kernel's output
    contract incl. the fused roi_scale epilogue; batched via vmap
    (plain XLA ops, no BlockSpecs to rewrite)."""
    from .roi_align import roi_pool as _roi_pool

    batched = features.ndim == 4
    if not batched:
        features, boxes = features[None], boxes[None]
        roi_scale = None if roi_scale is None else roi_scale[None]
    pooled = jax.vmap(
        lambda f, b: _roi_pool(f, b, spatial_scale, resolution=resolution)
    )(features, boxes)
    if roi_scale is not None:
        pooled = pooled * roi_scale[:, :, None, None, None].astype(pooled.dtype)
    return pooled if batched else pooled[0]


def roi_pool_pallas_batched(features: jnp.ndarray, boxes: jnp.ndarray,
                            spatial_scale: float, resolution: int = 7,
                            interpret: bool = False,
                            roi_scale: jnp.ndarray | None = None
                            ) -> jnp.ndarray:
    """(B, H, W, C) batched wrapper: statically unrolled per-image kernel
    launches. NOT jax.vmap — vmap of pallas_call folds the batch into the
    grid by rewriting every BlockSpec, which the ANY-memory-space table
    input (hbm_tables wide-CT layout) does not support; B is 1-4 here and
    per-launch overhead is ~100us."""
    B = features.shape[0]
    outs = []
    for b in range(B):
        outs.append(roi_pool_pallas(
            features[b], boxes[b], spatial_scale, resolution=resolution,
            interpret=interpret,
            roi_scale=None if roi_scale is None else roi_scale[b]))
    return jnp.stack(outs)


@partial(jax.jit, static_argnames=("spatial_scale", "resolution",
                                   "roi_block", "c_tile", "interpret",
                                   "unroll_rois", "row_share",
                                   "joint_emit", "allow_banded"))
def roi_pool_pallas_grid(features: jnp.ndarray, boxes: jnp.ndarray,
                         spatial_scale: float, resolution: int = 7,
                         roi_block: int = 8, c_tile: int = 1024,
                         interpret: bool = False,
                         roi_scale: jnp.ndarray | None = None,
                         unroll_rois: bool = False,
                         row_share: bool = True,
                         joint_emit: bool = False,
                         allow_banded: bool = False) -> jnp.ndarray:
    """Batch-in-grid exact RoIPool: (B, H, W, C) + (B, P, 4) -> (B, P, R, R, C).

    Same masked-16-window / y-RMQ / tiered formulation as
    :func:`roi_pool_pallas`, but the batch is a leading GRID dimension of one
    pallas_call instead of a ``jax.vmap`` (vmap's BlockSpec rewrite cannot
    carry ANY-memory-space inputs), and the raw feature map stays in HBM with
    a per-(b, c)-pass DMA into a SINGLE-buffered level-stack scratch. Freeing
    the block pipeline's double buffer is what lets the channel tile reach
    1024: bin-passes (P * R^2 * C/CT), whose fixed per-pass scalar overhead
    bounds the kernel, HALVE vs the CT=512 vmap path.
    """
    B, H, W, C = features.shape
    P = boxes.shape[1]
    R = resolution
    RB = min(roi_block, P)
    while P % RB != 0:
        RB //= 2

    sel = grid_ct_selection(
        H, W, C, jnp.dtype(features.dtype).itemsize, c_tile=c_tile,
        roi_block=RB, resolution=R)
    # the launch geometry below comes from the selection so the footprint
    # model tests assert against is what actually launches (ADVICE r4)
    CT, start_ct = sel.ct, sel.start_ct
    Ky, NW, W8, n_masks = sel.ky, sel.nw, sel.w8, sel.n_masks
    if sel.footprint(CT) > _VMEM_BUDGET and not interpret:
        return _xla_fallback(features, boxes, spatial_scale, resolution,
                             roi_scale)
    if allow_banded and CT * 4 <= start_ct:
        # Banded two-launch path: short rois against 48-row band-local
        # stacks at CT=1024, tall rois against the full stack. OFF BY
        # DEFAULT after round-5 hardware measurements: on the VOC-like
        # eval mix the band packing + two launches never pay for the wide
        # tile — classic wins at every bucket where the switch would fire
        # (1088: 24.7 vs 34.0 ms; 1280: 25.6 vs 35.5; 1536: 48.5 vs 52.1;
        # bit-exact everywhere; PERF.md round-5). Kept behind the flag for
        # proposal mixes with a much higher short-roi fraction.
        return roi_pool_pallas_banded(
            features, boxes, spatial_scale, resolution=resolution,
            roi_block=roi_block, c_tile=c_tile, interpret=interpret,
            roi_scale=roi_scale, row_share=row_share)

    pos = jax.vmap(lambda bx: _kernel_positions(
        bx, spatial_scale, H, W, R, row_share=row_share))(boxes)
    ys, x8, mi, tier, valid = pos
    if roi_scale is None:
        roi_scale = jnp.ones((B, P), jnp.float32)
    bin_scale = (roi_scale.astype(jnp.float32)[:, :, None, None]
                 * valid).reshape(B, P, R * R)

    raw = jnp.pad(features, ((0, 0), (0, 0), (0, W8 - W), (0, 0)))

    neg_val = float(jnp.finfo(features.dtype).min) / 2
    grid = (B, C // CT, P // RB)
    smem_specs = [
        pl.BlockSpec((None, RB, R * 2), lambda b, c, r: (b, r, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((None, RB, R), lambda b, c, r: (b, r, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((None, RB, R * NW), lambda b, c, r: (b, r, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((None, RB, 1), lambda b, c, r: (b, r, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((None, RB, R * R), lambda b, c, r: (b, r, 0),
                     memory_space=pltpu.SMEM),
    ]
    scratch = [pltpu.VMEM((n_masks, LX, CT), features.dtype),
               pltpu.VMEM((Ky * H, W8, CT), features.dtype),
               pltpu.SemaphoreType.DMA]
    out = pl.pallas_call(
        _make_kernel(RB, R, CT, NW, neg_val, features.dtype,
                     unroll_rois=unroll_rois, H=H,
                     row_share=row_share, joint_emit=joint_emit,
                     fused_dma=True),
        grid=grid,
        in_specs=smem_specs + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((None, RB, R * R, CT),
                               lambda b, c, r: (b, r, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P, R * R, C), features.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )(ys, x8, mi, tier, bin_scale, raw)
    return out.reshape(B, P, R, R, C)


# ---------------------------------------------------------------------------
# Banded two-launch path for large eval maps (VERDICT r4 item 6)
# ---------------------------------------------------------------------------

def _scatter_slots(arr: jnp.ndarray, slot: jnp.ndarray) -> jnp.ndarray:
    """Scatter rows of ``arr`` (P, ...) to ``slot`` (P,) in [0, P]; slot P is
    a dump row that gets dropped. Unfilled slots stay zero."""
    P = arr.shape[0]
    out = jnp.zeros((P + 1,) + arr.shape[1:], arr.dtype)
    return out.at[slot].set(arr)[:P]


def _pack_banded(boxes, roi_scale, spatial_scale, H, W, R, RB,
                 small_h, band_rows, lv_small, row_share):
    """Single-image roi partition for the banded two-launch pool.

    Short rois (clamped height <= small_h AND every bin's RMQ level <
    lv_small) are packed into band-pure, RB-aligned slot runs sorted by
    band (band k = rows [k*stride, k*stride + band_rows), stride =
    band_rows - small_h, so any short roi is fully contained in its band);
    everything else is packed to the front of a second "rest" launch that
    runs the classic full-height table. Returns the kernel inputs for both
    launches plus the merge indices.
    """
    P = boxes.shape[0]
    stride = band_rows - small_h
    NB = -(-H // stride)
    NBLK = P // RB

    scaled = jnp.round(boxes.astype(jnp.float32) *
                       spatial_scale).astype(jnp.int32)
    y1, y2 = scaled[:, 1], scaled[:, 3]
    y1c = jnp.clip(y1, 0, H - 1)
    y2c = jnp.clip(jnp.maximum(y2, y1), 0, H - 1)
    vis_h = y2c - y1c + 1
    roi_h = jnp.maximum(y2 - y1 + 1, 1)
    _, _, ly, _ = _rmq_bounds(y1, roi_h, H, R, 32)           # uncapped levels
    max_ly = jnp.max(ly, axis=1)

    band = y1c // stride
    bstart_roi = jnp.clip(band * stride, 0, max(H - band_rows, 0))
    fits = y2c < bstart_roi + band_rows
    is_s = (vis_h <= small_h) & fits & (max_ly <= lv_small - 1)

    # --- band-pure RB-aligned slot assignment for short rois
    cnt = jnp.zeros(NB, jnp.int32).at[band].add(is_s.astype(jnp.int32))
    padded = -(-cnt // RB) * RB
    ends = jnp.cumsum(padded)
    off = ends - padded
    csum = jnp.concatenate([jnp.zeros(1, jnp.int32),
                            jnp.cumsum(cnt)[:-1].astype(jnp.int32)])

    sort_key = jnp.where(is_s, band, NB) * P + jnp.arange(P)
    order = jnp.argsort(sort_key)
    sb = band[order]
    si = is_s[order]
    rank = jnp.arange(P, dtype=jnp.int32) - csum[sb]
    slot_sorted = off[sb].astype(jnp.int32) + rank
    ok_sorted = si & (slot_sorted < P)                        # cap overflow
    slot_sorted = jnp.where(ok_sorted, slot_sorted, P)
    slot_s = jnp.zeros(P, jnp.int32).at[order].set(slot_sorted)
    is_s = jnp.zeros(P, bool).at[order].set(ok_sorted)

    used_s = jnp.minimum(ends[-1], P)
    blk0 = jnp.arange(NBLK, dtype=jnp.int32) * RB
    blk_band = jnp.clip(jnp.searchsorted(ends, blk0, side="right"),
                        0, NB - 1).astype(jnp.int32)
    blk_bstart = jnp.clip(blk_band * stride, 0, max(H - band_rows, 0))
    blk_used = blk0 < used_s
    prev = jnp.concatenate([jnp.full(1, -1, jnp.int32), blk_band[:-1]])
    blk_build = blk_used & (blk_band != prev)
    flags_s = jnp.where(blk_used, blk_build.astype(jnp.int32), 2)

    # --- rest launch: real rois packed to the front
    is_r = ~is_s
    rank_r = jnp.cumsum(is_r.astype(jnp.int32)) - 1
    slot_r = jnp.where(is_r, rank_r, P)
    n_r = jnp.sum(is_r.astype(jnp.int32))
    flags_r = jnp.where(blk0 < n_r, 0, 2).astype(jnp.int32)
    bstart_r = jnp.zeros(NBLK, jnp.int32)

    # --- kernel coords, scattered into launch slots
    pos_s = _kernel_positions(boxes, spatial_scale, H, W, R,
                              row_share=row_share, band_start=bstart_roi,
                              band_rows=band_rows, num_levels=lv_small)
    pos_r = _kernel_positions(boxes, spatial_scale, H, W, R,
                              row_share=row_share)

    def build_inputs(pos, slot, scale_mask):
        ys, x8, mi, tier, valid = pos
        bscale = (roi_scale.astype(jnp.float32)[:, None, None]
                  * valid).reshape(P, R * R)
        bscale = bscale * scale_mask[:, None].astype(jnp.float32)
        return (_scatter_slots(ys.reshape(P, -1), slot),
                _scatter_slots(x8, slot),
                _scatter_slots(mi.reshape(P, -1), slot),
                _scatter_slots(tier, slot),
                _scatter_slots(bscale, slot))

    in_s = build_inputs(pos_s, slot_s, is_s)
    in_r = build_inputs(pos_r, slot_r, is_r)
    return (in_s, blk_bstart, flags_s, slot_s,
            in_r, bstart_r, flags_r, slot_r, is_s)


def _banded_launch(raw, ins, bstart, flags, CT, RB, R, NW, band_rows,
                   lv, neg_val, row_share, interpret):
    """One banded pallas launch over pre-packed slots. raw: (B, H, W8, C)."""
    B, H, W8, C = raw.shape
    P = ins[0].shape[1]
    NBLK = P // RB
    grid = (B, C // CT, NBLK)
    smem_specs = [
        pl.BlockSpec((None, RB, R * 2), lambda b, c, r: (b, r, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((None, RB, R), lambda b, c, r: (b, r, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((None, RB, R * NW), lambda b, c, r: (b, r, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((None, RB, 1), lambda b, c, r: (b, r, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((None, RB, R * R), lambda b, c, r: (b, r, 0),
                     memory_space=pltpu.SMEM),
        # Per-block scalars (band start row, control flags). Mosaic requires
        # the block's second-to-last dim divisible by 8 (or full), so each
        # scalar is replicated to an 8-row stripe and the kernel reads the
        # stripe's first row ([0, 0]).
        pl.BlockSpec((None, 8, 1), lambda b, c, r: (b, r, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((None, 8, 1), lambda b, c, r: (b, r, 0),
                     memory_space=pltpu.SMEM),
    ]
    scratch = [pltpu.VMEM((LX * LX + 1, LX, CT), raw.dtype),
               pltpu.VMEM((lv * band_rows, W8, CT), raw.dtype),
               pltpu.SemaphoreType.DMA]
    return pl.pallas_call(
        _make_kernel(RB, R, CT, NW, neg_val, raw.dtype,
                     row_share=row_share, joint_emit=False,
                     banded=True, band_rows=band_rows),
        grid=grid,
        in_specs=smem_specs + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((None, RB, R * R, CT),
                               lambda b, c, r: (b, r, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, P, R * R, C), raw.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )(*ins[:5], jnp.repeat(bstart, 8, axis=1)[:, :, None],
      jnp.repeat(flags, 8, axis=1)[:, :, None], raw)


@partial(jax.jit, static_argnames=("spatial_scale", "resolution",
                                   "roi_block", "c_tile", "interpret",
                                   "row_share", "small_h", "band_rows"))
def roi_pool_pallas_banded(features: jnp.ndarray, boxes: jnp.ndarray,
                           spatial_scale: float, resolution: int = 7,
                           roi_block: int = 16, c_tile: int = 1024,
                           interpret: bool = False,
                           roi_scale: jnp.ndarray | None = None,
                           row_share: bool = True,
                           small_h: int = 24,
                           band_rows: int = 48) -> jnp.ndarray:
    """Two-launch exact RoIPool for maps whose full y-RMQ stack collapses
    the channel tile (large eval/TTA buckets, PERF.md round-3):

      * SHORT rois (clamped height <= ``small_h``) run against band-local
        level stacks (``band_rows`` rows x 3 levels) at a WIDE channel tile
        — at the 1536 bucket the full stack forces CT=128 (8x the bin
        passes of the train bucket) while a 48-row band keeps CT=1024;
      * the rest run the classic full-height stack at whatever CT fits,
        with dummy-tail blocks skipped so passes scale with the ACTUAL
        tall-roi count.

    Both launches cover P slots; rois are packed (band-pure, RB-aligned)
    and the results merged by a per-roi gather. Exactness is unchanged —
    the same RMQ-pair/masked-window samples, just against band-local
    tables. Typical WSOD proposal mixes are dominated by short rois, so
    most passes run at the wide tile.
    """
    B, H, W, C = features.shape
    P = boxes.shape[1]
    R = resolution
    RB = min(roi_block, P)
    while P % RB != 0:
        RB //= 2

    LV_S = 3                       # bands hold levels {1, 2, 4}
    Ky = _num_levels(H, R)
    NW = max(_load_extent(W, R), 2)
    W8 = ((W - 1) // 8) * 8 + NW * LX
    itemsize = jnp.dtype(features.dtype).itemsize
    n_masks = LX * LX + 1
    def footprint(rows, ct):
        return ((rows * W8 * ct + n_masks * LX * ct
                 + 2 * RB * R * R * ct) * itemsize + _spill_margin(ct))

    def pick_ct(rows, start):
        ct = min(start, C)
        while C % ct != 0:
            ct //= 2
        while ct > 128 and footprint(rows, ct) > _VMEM_BUDGET:
            ct //= 2
        return ct

    CT_S = pick_ct(LV_S * band_rows, c_tile)
    CT_R = pick_ct(Ky * H, c_tile)

    if roi_scale is None:
        roi_scale = jnp.ones((B, P), jnp.float32)

    packed = jax.vmap(lambda bx, rs: _pack_banded(
        bx, rs, spatial_scale, H, W, R, RB, small_h, band_rows, LV_S,
        row_share))(boxes, roi_scale)
    (in_s, bstart_s, flags_s, slot_s,
     in_r, bstart_r, flags_r, slot_r, is_s) = packed

    raw = jnp.pad(features, ((0, 0), (0, 0), (0, W8 - W), (0, 0)))
    neg_val = float(jnp.finfo(features.dtype).min) / 2

    out_s = _banded_launch(raw, in_s, bstart_s, flags_s, CT_S, RB, R, NW,
                           band_rows, LV_S, neg_val, row_share, interpret)
    out_r = _banded_launch(raw, in_r, bstart_r, flags_r, CT_R, RB, R, NW,
                           H, Ky, neg_val, row_share, interpret)

    gs = jnp.take_along_axis(
        out_s, jnp.clip(slot_s, 0, P - 1)[:, :, None, None], axis=1)
    gr = jnp.take_along_axis(
        out_r, jnp.clip(slot_r, 0, P - 1)[:, :, None, None], axis=1)
    out = jnp.where(is_s[:, :, None, None], gs, gr)
    return out.reshape(B, P, R, R, C)


@partial(jax.jit, static_argnames=("spatial_scale", "resolution",
                                   "roi_block", "c_tile", "interpret",
                                   "unroll_rois", "quantize_int8",
                                   "row_share", "joint_emit"))
def roi_pool_pallas(features: jnp.ndarray, boxes: jnp.ndarray,
                    spatial_scale: float, resolution: int = 7,
                    roi_block: int = 8,
                    c_tile: int = 512, interpret: bool = False,
                    roi_scale: jnp.ndarray | None = None,
                    unroll_rois: bool = False,
                    quantize_int8: bool = False,
                    row_share: bool = True,
                    joint_emit: bool = False) -> jnp.ndarray:
    """(H, W, C) features + (P, 4) boxes -> (P, R, R, C) pooled, exact max.

    ``roi_scale`` (P,) optionally scales each RoI's output in the kernel
    epilogue (fuses the WSOD (objectness+1)*validity multiply, saving two
    full passes over the 800MB pooled tensor).

    Channel-tile selection: sample iterations are P * R^2 * (C / CT) and the
    kernel is scalar-issue-bound per iteration, so the widest CT that fits
    VMEM wins. The block pipeline double-buffers the stacked-table block; at
    CT=1024 that no longer fits, so wide tiles switch to a single-buffered
    scratch filled by an explicit per-pass DMA (``hbm_tables``)."""
    H, W, C = features.shape
    P = boxes.shape[0]
    R = resolution
    RB = min(roi_block, P)
    while P % RB != 0:
        RB //= 2

    Ky = _num_levels(H, R)
    NW = max(_load_extent(W, R), 2)
    W8 = ((W - 1) // 8) * 8 + NW * LX
    n_masks = LX * LX + 1                      # + all-poison entry
    table_dtype = jnp.int8 if quantize_int8 else features.dtype
    itemsize = jnp.dtype(table_dtype).itemsize

    def footprint(ct, mode):
        table = Ky * H * W8 * ct * itemsize
        raw = H * W8 * ct * itemsize
        masks = n_masks * LX * ct * itemsize
        out_blk = 2 * RB * R * R * ct * itemsize
        spill = _spill_margin(ct)
        if mode == "fused":               # 2x raw block + 1x table scratch
            return table + 2 * raw + masks + out_blk + spill
        return (1 if mode == "hbm" else 2) * table + masks + out_blk + spill

    CT = min(c_tile, C)
    while C % CT != 0:
        CT //= 2
    # shrink until SOME layout fits; prefer the fused in-kernel table build
    while CT > 128 and footprint(CT, "hbm") > _VMEM_BUDGET:
        CT //= 2
    if footprint(CT, "hbm") > _VMEM_BUDGET and not interpret:
        return _xla_fallback(features, boxes, spatial_scale, resolution,
                             roi_scale)
    fuse_table_build = footprint(CT, "fused") <= _VMEM_BUDGET
    hbm_tables = (not fuse_table_build
                  and footprint(CT, "block") > _VMEM_BUDGET)

    ys, x8, mi, tier, valid = _kernel_positions(boxes, spatial_scale, H, W, R,
                                                row_share=row_share)
    if roi_scale is None:
        roi_scale = jnp.ones((P,), jnp.float32)
    # per-bin scale: roi scale where the bin intersects the map, 0 otherwise
    bin_scale = (roi_scale.astype(jnp.float32)[:, None, None]
                 * valid).reshape(P, R * R)

    # pad W (sublane dim) so every aligned (LX,) window is in bounds:
    # max start is (W-1)//8*8 + (NW-1)*LX
    if quantize_int8:
        # per-channel symmetric quantization: the pooled max is exact in
        # int8 space (monotone map); dequantized in the kernel epilogue
        absmax = jnp.max(jnp.abs(features.astype(jnp.float32)), axis=(0, 1))
        ch_scale = (jnp.maximum(absmax, 1e-6) / 127.0)            # (C,)
        src = jnp.clip(
            jnp.round(features.astype(jnp.float32) / ch_scale),
            -127, 127).astype(jnp.int8)
        chs = ch_scale.reshape(1, C)
    else:
        src = features
        chs = None
    if fuse_table_build:
        tables = jnp.pad(src, ((0, 0), (0, W8 - W), (0, 0)))  # raw (H,W8,C)
    else:
        tables = build_y_tables(src, Ky, pad_w=W8 - W)   # (Ky*H, W8, C)

    neg_val = float(jnp.finfo(features.dtype).min) / 2
    grid = (C // CT, P // RB)
    smem_specs = [
        pl.BlockSpec((RB, R * 2), lambda c, r: (r, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((RB, R), lambda c, r: (r, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((RB, R * NW), lambda c, r: (r, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((RB, 1), lambda c, r: (r, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((RB, R * R), lambda c, r: (r, 0),
                     memory_space=pltpu.SMEM),
    ]
    if quantize_int8:
        smem_specs.append(pl.BlockSpec((1, CT), lambda c, r: (0, c),
                                       memory_space=pltpu.VMEM))
    scratch = [pltpu.VMEM((n_masks, LX, CT), table_dtype)]
    if fuse_table_build:
        feat_spec = pl.BlockSpec((H, W8, CT), lambda c, r: (0, 0, c),
                                 memory_space=pltpu.VMEM)
        scratch += [pltpu.VMEM((Ky * H, W8, CT), table_dtype)]
    elif hbm_tables:
        feat_spec = pl.BlockSpec(memory_space=pl.ANY)
        scratch += [pltpu.VMEM((Ky * H, W8, CT), table_dtype),
                    pltpu.SemaphoreType.DMA]
    else:
        feat_spec = pl.BlockSpec((Ky * H, W8, CT), lambda c, r: (0, 0, c),
                                 memory_space=pltpu.VMEM)
    args = [ys, x8, mi, tier, bin_scale]
    if quantize_int8:
        args.append(chs)
    args.append(tables)
    out = pl.pallas_call(
        _make_kernel(RB, R, CT, NW, neg_val, features.dtype,
                     unroll_rois=unroll_rois, hbm_tables=hbm_tables,
                     int8_mode=quantize_int8,
                     fuse_table_build=fuse_table_build, H=H,
                     row_share=row_share, joint_emit=joint_emit),
        grid=grid,
        in_specs=smem_specs + [feat_spec],
        out_specs=pl.BlockSpec((RB, R * R, CT), lambda c, r: (r, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, R * R, C), features.dtype),
        scratch_shapes=scratch,
        # the stacked-table block (Ky*H, W8, CT) is far over the default 16M
        # scoped-vmem limit; v5e has 128M VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return out.reshape(P, R, R, C)
