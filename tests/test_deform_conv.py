import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drn_wsod_tpu.ops.deform_conv import deform_conv2d


def test_zero_offsets_match_plain_conv():
    rng = np.random.RandomState(0)
    H = W = 10
    Cin, Cout, K = 4, 6, 3
    x = jnp.asarray(rng.randn(H, W, Cin).astype(np.float32))
    w = jnp.asarray(rng.randn(K, K, Cin, Cout).astype(np.float32))
    offsets = jnp.zeros((H, W, 2 * K * K))
    got = deform_conv2d(x, offsets, w)

    want = jax.lax.conv_general_dilated(
        x[None], w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_integer_offset_shift():
    rng = np.random.RandomState(1)
    H = W = 8
    x = jnp.asarray(rng.randn(H, W, 1).astype(np.float32))
    # 1x1 kernel with offset (0, 1): output(h, w) = x(h, w+1)
    w = jnp.ones((1, 1, 1, 1))
    off = jnp.zeros((H, W, 2)).at[..., 1].set(1.0)
    got = np.asarray(deform_conv2d(x, off, w, kernel_size=1))[..., 0]
    want = np.zeros((H, W), np.float32)
    want[:, :-1] = np.asarray(x)[:, 1:, 0]
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_modulation_scales():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(6, 6, 2).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 2, 3).astype(np.float32))
    off = jnp.zeros((6, 6, 18))
    m_half = jnp.full((6, 6, 9), 0.5)
    full = deform_conv2d(x, off, w)
    half = deform_conv2d(x, off, w, modulation=m_half)
    np.testing.assert_allclose(np.asarray(half), np.asarray(full) * 0.5,
                               rtol=1e-4)


def test_grad_flows():
    x = jnp.ones((5, 5, 2))
    w = jnp.ones((3, 3, 2, 2))
    off = jnp.zeros((5, 5, 18)) + 0.3

    g = jax.grad(lambda o: deform_conv2d(x, o, w).sum())(off)
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.slow
def test_deform_bottleneck_in_ws_resnet_trains():
    """DEFORM_ON_PER_STAGE wires DeformBottleneckBlock into WS-ResNet and a
    train step runs (reference resnet_ws.py:240-354 + defaults.py:488-493).
    Zero-init offsets: at init the deform blocks behave as plain convs."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_modeling import tiny_batch, tiny_cfg

    from drn_wsod_tpu.models import build_model

    cfg = tiny_cfg("OICRROIHeads", depth=50)
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 16
    cfg.MODEL.RESNETS.WIDTH_PER_GROUP = 4
    cfg.MODEL.RESNETS.DEFORM_ON_PER_STAGE = [False, False, True, True]
    cfg.MODEL.RESNETS.DEFORM_MODULATED = True
    model = build_model(cfg)
    batch = tiny_batch()
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           batch, train=True)
    bb = variables["params"]["backbone"]
    assert "conv2_offset" in bb["res4_0"], sorted(bb["res4_0"])
    assert "conv2_deform_weight" in bb["res4_0"]
    assert "conv2_offset" not in bb["res2_0"]

    losses = model.apply(variables, batch, train=True,
                         rngs={"dropout": jax.random.PRNGKey(2)})
    for k, v in losses.items():
        assert np.isfinite(float(v)), k


def test_deform_config_yaml_builds():
    from drn_wsod_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.merge_from_file(
        os.path.join(os.path.dirname(__file__), "..", "configs",
                     "PascalVOC-Detection", "oicr_WSR_50_DC5_deform_1x.yaml"))
    assert cfg.MODEL.RESNETS.DEFORM_ON_PER_STAGE == [False, False, True, True]
    assert cfg.MODEL.RESNETS.DEFORM_MODULATED is True

