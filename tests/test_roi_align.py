"""Golden-value RoI pooling tests.

Pattern follows the reference kernel tests (tests/layers/test_roi_align.py:
12-106): small feature maps with analytically known pooled outputs, plus a
dense numpy re-implementation for randomized comparison.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from drn_wsod_tpu.ops import roi_align, roi_pool


def np_roi_align(feat, boxes, scale, res, ratio, aligned):
    """Dense numpy RoIAlign (torchvision semantics, fixed sampling ratio)."""
    H, W, C = feat.shape
    out = np.zeros((len(boxes), res, res, C), dtype=np.float64)
    off = 0.5 if aligned else 0.0
    for r, box in enumerate(boxes):
        x1, y1, x2, y2 = [v * scale - off for v in box]
        rw, rh = x2 - x1, y2 - y1
        if not aligned:
            rw, rh = max(rw, 1.0), max(rh, 1.0)
        bw, bh = rw / res, rh / res
        for ph in range(res):
            for pw in range(res):
                acc = np.zeros(C)
                for iy in range(ratio):
                    for ix in range(ratio):
                        y = y1 + (ph + (iy + 0.5) / ratio) * bh
                        x = x1 + (pw + (ix + 0.5) / ratio) * bw
                        if y < -1.0 or y > H or x < -1.0 or x > W:
                            continue
                        y = min(max(y, 0.0), H - 1)
                        x = min(max(x, 0.0), W - 1)
                        y0, x0 = int(np.floor(y)), int(np.floor(x))
                        y1_, x1_ = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
                        ly, lx = y - y0, x - x0
                        acc += ((1 - ly) * (1 - lx) * feat[y0, x0]
                                + (1 - ly) * lx * feat[y0, x1_]
                                + ly * (1 - lx) * feat[y1_, x0]
                                + ly * lx * feat[y1_, x1_])
                out[r, ph, pw] = acc / (ratio * ratio)
    return out


def np_roi_pool(feat, boxes, scale, res):
    """Exact torchvision RoIPool in numpy."""
    H, W, C = feat.shape
    out = np.zeros((len(boxes), res, res, C), dtype=np.float64)
    for r, box in enumerate(boxes):
        x1 = int(round(box[0] * scale)); y1 = int(round(box[1] * scale))
        x2 = int(round(box[2] * scale)); y2 = int(round(box[3] * scale))
        rw = max(x2 - x1 + 1, 1); rh = max(y2 - y1 + 1, 1)
        bw, bh = rw / res, rh / res
        for ph in range(res):
            for pw in range(res):
                hs = min(max(int(np.floor(ph * bh)) + y1, 0), H)
                he = min(max(int(np.ceil((ph + 1) * bh)) + y1, 0), H)
                ws = min(max(int(np.floor(pw * bw)) + x1, 0), W)
                we = min(max(int(np.ceil((pw + 1) * bw)) + x1, 0), W)
                if he <= hs or we <= ws:
                    out[r, ph, pw] = 0.0
                else:
                    out[r, ph, pw] = feat[hs:he, ws:we].reshape(-1, C).max(axis=0)
    return out


def test_roi_align_identity_2x2():
    # A 2x2 output over a 4x4 map with an exactly-covering box and aligned
    # sampling reproduces the 2x2 average pooling of the map.
    feat = np.arange(16, dtype=np.float32).reshape(4, 4, 1)
    boxes = jnp.array([[0, 0, 4, 4]], dtype=jnp.float32)
    out = roi_align(jnp.asarray(feat), boxes, 1.0, resolution=2,
                    sampling_ratio=2, aligned=True)
    want = feat.reshape(2, 2, 2, 2).transpose(0, 2, 1, 3).reshape(2, 2, 4).mean(-1)
    np.testing.assert_allclose(np.asarray(out)[0, :, :, 0], want, rtol=1e-5)


def test_roi_align_matches_numpy_random():
    rng = np.random.RandomState(1)
    feat = rng.randn(12, 16, 3).astype(np.float32)
    boxes = np.array([
        [0, 0, 32, 24],
        [8, 4, 40, 30],
        [2.5, 3.5, 20.0, 17.0],
        [30, 20, 34, 25],
    ], dtype=np.float32)
    for aligned in (False, True):
        got = np.asarray(roi_align(jnp.asarray(feat), jnp.asarray(boxes), 0.5,
                                   resolution=7, sampling_ratio=2,
                                   aligned=aligned, chunk=4))
        want = np_roi_align(feat, boxes, 0.5, 7, 2, aligned)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_roi_pool_matches_numpy_small_bins():
    rng = np.random.RandomState(2)
    feat = rng.randn(16, 16, 2).astype(np.float32)
    # RoIs whose bins are <= 8 cells -> sampled max is exact.
    boxes = np.array([
        [0, 0, 30, 30],
        [4, 4, 20, 28],
        [10, 2, 14, 8],
    ], dtype=np.float32)
    got = np.asarray(roi_pool(jnp.asarray(feat), jnp.asarray(boxes), 0.5,
                              resolution=7, samples=8, chunk=3))
    want = np_roi_pool(feat, boxes, 0.5, 7)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_roi_pool_grad_flows():
    import jax
    feat = jnp.ones((8, 8, 2))
    boxes = jnp.array([[0, 0, 8, 8]], dtype=jnp.float32)

    def f(x):
        return roi_align(x, boxes, 1.0, resolution=2, sampling_ratio=2).sum()

    g = jax.grad(f)(feat)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def _brute_force_roi_pool(feats, boxes, scale=1 / 8, R=7):
    """Direct torchvision-RoIPool reference: integer bins, exact max over
    every cell, empty (off-map) bins = 0."""
    Hf, Wf, C = feats.shape
    out = np.zeros((len(boxes), R, R, C), np.float32)
    for n, (bx1, by1, bx2, by2) in enumerate(boxes):
        x1, y1, x2, y2 = [int(round(float(v) * scale))
                          for v in (bx1, by1, bx2, by2)]
        rw = max(x2 - x1 + 1, 1)
        rh = max(y2 - y1 + 1, 1)
        for ph in range(R):
            hs = min(max(ph * rh // R + y1, 0), Hf)
            he = min(max(-((-(ph + 1) * rh) // R) + y1, 0), Hf)
            for pw in range(R):
                ws = min(max(pw * rw // R + x1, 0), Wf)
                we = min(max(-((-(pw + 1) * rw) // R) + x1, 0), Wf)
                if he > hs and we > ws:
                    out[n, ph, pw] = feats[hs:he, ws:we].max((0, 1))
    return out


def test_roi_pool_exact_all_bin_sizes():
    """The sparse-table (RMQ) roi_pool is EXACT for every bin size — large
    context/whole-image boxes included (bins up to ~14 cells on the 87x87
    DC5 map; the old 2x2 sampled max had ~45% mean error there)."""
    H = W = 87  # 704px image at DC5 stride 8 (res3 s1-pool shrinks by 1)
    C = 16
    rng = np.random.RandomState(0)
    feats = rng.randn(H, W, C).astype(np.float32)
    P = 512
    s = rng.uniform(0.05, 1.0, P) ** 0.5
    bw = s * 700
    bh = s * 700 * rng.uniform(0.5, 2.0, P)
    x1 = rng.uniform(0, np.maximum(703 - bw, 1))
    y1 = rng.uniform(0, np.maximum(703 - bh, 1))
    boxes = np.stack([x1, y1, np.minimum(x1 + bw, 703),
                      np.minimum(y1 + bh, 703)], -1).astype(np.float32)
    boxes[:20] = [0, 0, 703, 703]  # whole-image proposals

    want = _brute_force_roi_pool(feats, boxes)
    got = np.asarray(roi_pool(jnp.asarray(feats), jnp.asarray(boxes), 1 / 8))
    np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_roi_pool_pallas_exact_all_bin_sizes():
    from drn_wsod_tpu.ops.roi_pool_pallas import roi_pool_pallas

    H = W = 30
    C = 8
    rng = np.random.RandomState(1)
    feats = rng.randn(H, W, C).astype(np.float32)
    P = 32
    x1 = rng.uniform(0, 200, P)
    y1 = rng.uniform(0, 200, P)
    x2 = np.minimum(x1 + rng.uniform(8, 239, P), 239)
    y2 = np.minimum(y1 + rng.uniform(8, 239, P), 239)
    boxes = np.stack([x1, y1, x2, y2], -1).astype(np.float32)
    boxes[:4] = [0, 0, 239, 239]

    want = _brute_force_roi_pool(feats, boxes)
    got = np.asarray(roi_pool_pallas(
        jnp.asarray(feats), jnp.asarray(boxes), 1 / 8,
        roi_block=8, c_tile=8, interpret=True))
    np.testing.assert_array_equal(got, want)
