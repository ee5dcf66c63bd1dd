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
