"""Pallas RoIPool kernel: parity with the XLA gather formulation
(interpreter mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from drn_wsod_tpu.ops.roi_align import roi_pool
from drn_wsod_tpu.ops.roi_pool_pallas import roi_pool_pallas


@pytest.mark.slow
@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_matches_xla(seed):
    rng = np.random.RandomState(seed)
    H = W = 24
    C = 8
    P = 8
    feat = rng.randn(H, W, C).astype(np.float32)
    x1 = rng.uniform(0, W * 4, P).astype(np.float32)
    y1 = rng.uniform(0, H * 4, P).astype(np.float32)
    bw = rng.uniform(16, 80, P).astype(np.float32)
    boxes = np.stack([x1, y1, x1 + bw, y1 + bw], -1)

    want = np.asarray(roi_pool(jnp.asarray(feat), jnp.asarray(boxes), 0.25,
                               resolution=7, samples=2))
    got = np.asarray(roi_pool_pallas(jnp.asarray(feat), jnp.asarray(boxes),
                                     0.25, resolution=7,
                                     roi_block=4, c_tile=8, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.slow
def test_pallas_hbm_tables_path_matches_xla(monkeypatch):
    """The single-buffered DMA-scratch layout (used on real maps at wide
    channel tiles) must be bit-identical to the pipelined block layout."""
    import sys

    rp = sys.modules["drn_wsod_tpu.ops.roi_pool_pallas"]
    monkeypatch.setattr(rp, "_VMEM_BUDGET", 500 * 1024)
    rng = np.random.RandomState(2)
    H = W = 24
    C = 16
    P = 8
    feat = rng.randn(H, W, C).astype(np.float32)
    x1 = rng.uniform(0, W * 4, P).astype(np.float32)
    y1 = rng.uniform(0, H * 4, P).astype(np.float32)
    bw = rng.uniform(16, 80, P).astype(np.float32)
    boxes = np.stack([x1, y1, x1 + bw, y1 + bw], -1)

    want = np.asarray(roi_pool(jnp.asarray(feat), jnp.asarray(boxes), 0.25,
                               resolution=7, samples=2))
    got = np.asarray(rp.roi_pool_pallas(jnp.asarray(feat),
                                        jnp.asarray(boxes),
                                        0.25, resolution=7,
                                        roi_block=4, c_tile=16,
                                        interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.slow
def test_pallas_int8_quantized_within_tolerance():
    """int8-table mode: pooled max within one per-channel quantization step
    of the exact result (max commutes with the monotone per-channel map)."""
    rng = np.random.RandomState(3)
    H = W = 24
    C = 8
    P = 8
    feat = rng.randn(H, W, C).astype(np.float32)
    x1 = rng.uniform(0, W * 4, P).astype(np.float32)
    y1 = rng.uniform(0, H * 4, P).astype(np.float32)
    bw = rng.uniform(16, 80, P).astype(np.float32)
    boxes = np.stack([x1, y1, x1 + bw, y1 + bw], -1)

    want = np.asarray(roi_pool(jnp.asarray(feat), jnp.asarray(boxes), 0.25,
                               resolution=7, samples=2))
    got = np.asarray(roi_pool_pallas(jnp.asarray(feat), jnp.asarray(boxes),
                                     0.25, resolution=7,
                                     roi_block=4, c_tile=8, interpret=True,
                                     quantize_int8=True))
    ch_step = np.abs(feat).max(axis=(0, 1)) / 127.0
    tol = ch_step[None, None, None, :] * 0.51 + 1e-6
    assert (np.abs(got - want) <= tol).all(), \
        f"max err {np.abs(got - want).max()}, tol {tol.max()}"


@pytest.mark.slow
@pytest.mark.parametrize("joint_emit,unroll", [(False, False), (True, False),
                                               (True, True)])
def test_pallas_all_tiers_match_xla(joint_emit, unroll):
    """Force every kernel tier (per-bin 0/1/2 and row-shared 3/4) in one
    launch and check exact parity: tiny boxes (shared single window),
    mid-size (shared two windows), flat/degenerate-y, and whole-image
    context boxes (full multi-window fallback). Parametrized over the
    butterfly joint-emit epilogue (8-bin multi-reduce — 49 bins = 6 full
    groups + 1 single-emit leftover) and static roi unrolling."""
    from drn_wsod_tpu.ops.roi_pool_pallas import _kernel_positions

    rng = np.random.RandomState(7)
    H = W = 64
    C = 8
    boxes = np.array(
        [
            [4.0, 4.0, 24.0, 24.0],        # ~6x6 cells, deg-y: tier 5
            [9.0, 3.0, 40.0, 90.0],        # misaligned narrow, tall: tier 3
            [8.0, 8.0, 100.0, 100.0],      # ~24x24 cells: tier 4
            [8.0, 8.0, 100.0, 36.0],       # 24x8 cells, deg-y: tier 6
            [2.0, 40.0, 162.0, 62.0],      # 40 cells wide, flat: tier 0
            [0.0, 0.0, 255.0, 255.0],      # whole image: tier 2
            [5.0, 0.0, 165.0, 60.0],       # 40 cells wide, 15 rows: tier 1
            [120.0, 120.0, 126.0, 126.0],  # sub-bin tiny, deg-y: tier 5
            [-20.0, -20.0, 300.0, 300.0],  # out-of-map context: tier 2
            [30.0, 30.0, 90.0, 140.0],     # 16x28 cells: tier 3
            [40.0, 100.0, 150.0, 128.0],   # 28x7 cells, deg-y: tier 6
            [200.0, 8.0, 230.0, 100.0],    # 8x24 cells, tall narrow: tier 3
        ],
        np.float32)
    feat = rng.randn(H, W, C).astype(np.float32)
    tiers = np.asarray(_kernel_positions(
        jnp.asarray(boxes), 0.25, H, W, 7)[3])[:, 0]
    assert {0, 1, 2, 3, 4, 5, 6} <= set(tiers.tolist()), tiers.tolist()

    want = np.asarray(roi_pool(jnp.asarray(feat), jnp.asarray(boxes), 0.25,
                               resolution=7))
    got = np.asarray(roi_pool_pallas(jnp.asarray(feat), jnp.asarray(boxes),
                                     0.25, resolution=7,
                                     roi_block=4, c_tile=8, interpret=True,
                                     joint_emit=joint_emit,
                                     unroll_rois=unroll))
    np.testing.assert_allclose(got, want, rtol=1e-6)


@pytest.mark.slow
def test_pallas_grid_batched_matches_xla():
    """Batch-in-grid kernel (leading batch grid dim + fused-DMA single-buffer
    table build) matches the XLA formulation per image, including the fused
    per-roi scale epilogue."""
    from drn_wsod_tpu.ops.roi_pool_pallas import roi_pool_pallas_grid

    rng = np.random.RandomState(0)
    B, H, W, C, P = 2, 24, 24, 16, 8
    feat = rng.randn(B, H, W, C).astype(np.float32)
    x1 = rng.uniform(0, W * 4, (B, P)).astype(np.float32)
    y1 = rng.uniform(0, H * 4, (B, P)).astype(np.float32)
    bw = rng.uniform(8, 90, (B, P)).astype(np.float32)
    boxes = np.stack([x1, y1, x1 + bw, y1 + bw], -1)
    scale = rng.uniform(1, 2, (B, P)).astype(np.float32)

    got = np.asarray(roi_pool_pallas_grid(
        jnp.asarray(feat), jnp.asarray(boxes), 0.25, resolution=7,
        roi_block=4, c_tile=8, interpret=True,
        roi_scale=jnp.asarray(scale)))
    for b in range(B):
        want = np.asarray(roi_pool(jnp.asarray(feat[b]),
                                   jnp.asarray(boxes[b]), 0.25,
                                   resolution=7, samples=2))
        want = want * scale[b][:, None, None, None]
        np.testing.assert_allclose(got[b], want, rtol=1e-5)


def test_fast_dropout_exact_bernoulli_half():
    """FastDropout(0.5): zeros ~half the entries, doubles the survivors,
    and is deterministic per rng key."""
    import jax

    from drn_wsod_tpu.models.heads.box_head import FastDropout

    x = jnp.ones((512, 64), jnp.float32)
    mod = FastDropout(0.5)
    y = mod.apply({}, x, deterministic=False,
                  rngs={"dropout": jax.random.PRNGKey(3)})
    y = np.asarray(y)
    assert set(np.unique(y)) <= {0.0, 2.0}
    frac = (y == 2.0).mean()
    assert 0.45 < frac < 0.55
    y2 = np.asarray(mod.apply({}, x, deterministic=False,
                              rngs={"dropout": jax.random.PRNGKey(3)}))
    np.testing.assert_array_equal(y, y2)
    yd = np.asarray(mod.apply({}, x, deterministic=True))
    np.testing.assert_array_equal(yd, np.ones_like(yd))


@pytest.mark.core
def test_grid_vmem_overflow_falls_back_to_xla():
    """Maps whose level-stack scratch cannot fit VMEM at any channel tile
    must dispatch to the exact XLA formulation instead of OOMing the TPU
    compiler (observed: TTA's 1536 eval bucket -> 191x191 DC5 map, 108M
    scratch + 32M register spills > 128M vmem). interpret=False on CPU is
    safe here precisely because the fallback fires before any pallas_call
    is built."""
    from drn_wsod_tpu.ops.roi_pool_pallas import (_SPILL_MARGIN,
                                                  _VMEM_BUDGET,
                                                  roi_pool_pallas_grid)

    rng = np.random.RandomState(1)
    B, H, W, C, P = 1, 512, 512, 128, 8
    # self-check the premise: even CT=128 overflows for this shape
    from drn_wsod_tpu.ops.roi_align import _num_levels
    from drn_wsod_tpu.ops.roi_pool_pallas import LX, _load_extent
    NW = max(_load_extent(W, 8), 2)
    W8 = ((W - 1) // 8) * 8 + NW * LX
    assert _num_levels(H, 7) * H * W8 * 128 * 4 + _SPILL_MARGIN > _VMEM_BUDGET

    feat = rng.randn(B, H, W, C).astype(np.float32)
    x1 = rng.uniform(0, W, (B, P)).astype(np.float32)
    y1 = rng.uniform(0, H, (B, P)).astype(np.float32)
    bw = rng.uniform(32, 400, (B, P)).astype(np.float32)
    boxes = np.stack([x1, y1, x1 + bw, y1 + bw], -1)
    scale = rng.uniform(1, 2, (B, P)).astype(np.float32)

    got = np.asarray(roi_pool_pallas_grid(
        jnp.asarray(feat), jnp.asarray(boxes), 1.0, resolution=7,
        interpret=False, roi_scale=jnp.asarray(scale)))
    want = np.asarray(roi_pool(jnp.asarray(feat[0]), jnp.asarray(boxes[0]),
                               1.0, resolution=7))
    want = want * scale[0][:, None, None, None]
    np.testing.assert_allclose(got[0], want, rtol=1e-5)


@pytest.mark.slow
def test_pallas_banded_matches_xla():
    """Banded two-launch path (large eval buckets, VERDICT r4 item 6):
    short rois against band-local 3-level stacks at a wide channel tile +
    tall/edge rois against the classic full stack, merged — must match the
    XLA formulation exactly, including the fused per-roi scale epilogue,
    across a mix of tiny, tall, edge-crossing and off-map boxes."""
    from drn_wsod_tpu.ops.roi_pool_pallas import roi_pool_pallas_banded

    rng = np.random.RandomState(3)
    B, H, W, C, P = 2, 48, 40, 16, 16
    feat = rng.randn(B, H, W, C).astype(np.float32)
    # mix: short boxes all over (band path), tall boxes (rest path),
    # edge-crossers (clamped), one fully off-map
    boxes = np.zeros((B, P, 4), np.float32)
    for b in range(B):
        for p in range(P):
            if p < 9:          # short: fits 12-row bands at scale .25
                y1 = rng.uniform(-8, H * 4 - 8)
                hgt = rng.uniform(4, 20)          # <= 5 cells
                x1 = rng.uniform(-8, W * 4 - 8)
                wid = rng.uniform(4, 140)
            elif p < 14:       # tall
                y1 = rng.uniform(-30, H * 2)
                hgt = rng.uniform(60, H * 4)
                x1 = rng.uniform(0, W * 2)
                wid = rng.uniform(10, W * 4)
            elif p < 15:       # fully off-map
                y1, hgt, x1, wid = H * 4 + 50, 10, W * 4 + 50, 10
            else:              # whole-image
                y1, hgt, x1, wid = 0, H * 4 - 1, 0, W * 4 - 1
            boxes[b, p] = (x1, y1, x1 + wid, y1 + hgt)
    scale = rng.uniform(1, 2, (B, P)).astype(np.float32)

    got = np.asarray(roi_pool_pallas_banded(
        jnp.asarray(feat), jnp.asarray(boxes), 0.25, resolution=7,
        roi_block=4, c_tile=8, interpret=True,
        roi_scale=jnp.asarray(scale), small_h=6, band_rows=12))
    for b in range(B):
        want = np.asarray(roi_pool(jnp.asarray(feat[b]),
                                   jnp.asarray(boxes[b]), 0.25,
                                   resolution=7, samples=2))
        want = want * scale[b][:, None, None, None]
        np.testing.assert_allclose(got[b], want, rtol=1e-5,
                                   err_msg=f"image {b}")


@pytest.mark.slow
@pytest.mark.parametrize("case", ["all_short", "all_tall"])
def test_pallas_banded_degenerate_mixes(case):
    """One launch fully dummy (every block skipped) must still merge
    correctly."""
    from drn_wsod_tpu.ops.roi_pool_pallas import roi_pool_pallas_banded

    rng = np.random.RandomState(5)
    B, H, W, C, P = 1, 48, 40, 8, 8
    feat = rng.randn(B, H, W, C).astype(np.float32)
    if case == "all_short":
        y1 = rng.uniform(0, H * 4 - 20, (B, P))
        hgt = rng.uniform(4, 18, (B, P))
    else:
        y1 = rng.uniform(0, H, (B, P))
        hgt = rng.uniform(100, H * 4, (B, P))
    x1 = rng.uniform(0, W * 2, (B, P))
    wid = rng.uniform(8, W * 3, (B, P))
    boxes = np.stack([x1, y1, x1 + wid, y1 + hgt], -1).astype(np.float32)

    got = np.asarray(roi_pool_pallas_banded(
        jnp.asarray(feat), jnp.asarray(boxes), 0.25, resolution=7,
        roi_block=4, c_tile=8, interpret=True, small_h=6, band_rows=12))
    for b in range(B):
        want = np.asarray(roi_pool(jnp.asarray(feat[b]),
                                   jnp.asarray(boxes[b]), 0.25,
                                   resolution=7, samples=2))
        np.testing.assert_allclose(got[b], want, rtol=1e-5)


def test_grid_ct_selection_vmem_envelope():
    """Every map the eval/TTA pipeline can realize must select a channel
    tile whose static footprint plus the MEASURED register-spill envelope
    fits v5e VMEM (128M). Round-4 hardware regression this guards: the
    1088 bucket (136x136 DC5 map) selected CT=512 from a footprint model
    with no spill margin at NW=2 and OOM'd the TPU compiler at 142.6M
    (static 111.0M + 31.5M spill slots). The margin is per-CT: measured
    spills are <=17M on CT=1024 programs, ~32M on every CT<=512 program."""
    from drn_wsod_tpu.ops.roi_pool_pallas import (_VMEM_BUDGET,
                                                  grid_ct_selection)

    HARD = 128 * 1024 * 1024
    # dense sweep over DC5 map sizes across the SUPPORTED eval/TTA range
    # (train buckets through the largest TTA bucket, 1536): every one must
    # select a Pallas-servable tile — the XLA gather fallback is reserved
    # for unbucketed near-MAX_SIZE-4000 maps and would be a silent 5x eval
    # regression on a protocol bucket — and clear the hard cap including
    # the measured spill margin.
    for S in range(320, 1568, 32):
        m = S // 8
        sel = grid_ct_selection(m, m, 2048, 2)
        fp = sel.footprint(sel.ct)
        assert fp <= _VMEM_BUDGET, (S, sel.ct, fp)   # no XLA fallback
        assert fp <= HARD, (S, sel.ct, fp)

    # expected per-bucket selections (PERF.md round-4 hardware table):
    # flagship train buckets keep the wide tile (the round-2 2x win);
    # 896 halves; 1088+ collapse >=4x (the geometry the opt-in banded path
    # keys on — banded dispatch is OFF by default after the round-5
    # hardware timings showed classic wins at every such bucket).
    expected_ct = {512: 1024, 704: 1024, 768: 1024, 896: 512,
                   1088: 256, 1216: 256, 1280: 256, 1536: 128}
    for S, want in expected_ct.items():
        sel = grid_ct_selection(S // 8, S // 8, 2048, 2)
        assert sel.ct == want, (S, sel.ct, want)
        collapsed = sel.ct * 4 <= sel.start_ct
        assert collapsed == (S >= 1088), (S, sel.ct, sel.start_ct)
