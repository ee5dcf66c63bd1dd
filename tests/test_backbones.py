import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drn_wsod_tpu.models.backbones import ResNetWS, VGG16


@pytest.mark.parametrize("depth,dilation,stride,chan", [
    (18, 2, 8, 512),
    (50, 2, 8, 2048),
    (50, 1, 16, 2048),
])
@pytest.mark.slow
def test_resnet_ws_stride_and_channels(depth, dilation, stride, chan):
    res2 = 64 if depth in (18, 34) else 256
    model = ResNetWS(depth=depth, res5_dilation=dilation,
                     res2_out_channels=res2, out_features=("res5",))
    assert model.feature_strides["res5"] == stride
    assert model.feature_channels["res5"] == chan

    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)["res5"]
    assert out.shape[-1] == chan
    # Trailing VALID 2x2 pools shave fractional cells; stride dominates.
    assert out.shape[1] in (64 // stride, 64 // stride - 1)


def test_resnet_ws_dc5_res3_pool_stride1():
    """With RES5_DILATION=2 the res3 trailing pool has stride 1 (reference
    resnet_ws.py:671-678: first_stride=2 only for res2 or res3-with-dil-1)."""
    specs = ResNetWS.stage_specs(50, 2, 256, 64)
    by_stage = {s["stage"]: s for s in specs}
    assert by_stage["res2"]["pool_stride"] == 2 and by_stage["res2"]["has_pool"]
    assert by_stage["res3"]["pool_stride"] == 1 and by_stage["res3"]["has_pool"]
    assert not by_stage["res4"]["has_pool"]
    assert by_stage["res4"]["dilation"] == 2 and by_stage["res5"]["dilation"] == 2


def test_vgg16_shapes():
    model = VGG16(conv5_dilation=2, out_features=("plain5",))
    assert model.feature_strides["plain5"] == 8
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)["plain5"]
    # plain4's stride-1 VALID 2x2 pool shaves one cell (matches the
    # reference's nn.MaxPool2d(2, 1, 0)): 64/8 - 1 = 7.
    assert out.shape == (1, 7, 7, 512)


def test_frozen_bn_folding():
    from drn_wsod_tpu.models.backbones.resnet_ws import FrozenBatchNorm
    bn = FrozenBatchNorm(4)
    x = jnp.ones((1, 2, 2, 4))
    params = {"params": {"weight": jnp.full((4,), 2.0),
                         "bias": jnp.full((4,), 1.0),
                         "running_mean": jnp.full((4,), 0.5),
                         "running_var": jnp.full((4,), 4.0)}}
    out = np.asarray(bn.apply(params, x))
    want = (1.0 - 0.5) / np.sqrt(4.0 + 1e-5) * 2.0 + 1.0
    np.testing.assert_allclose(out, want, rtol=1e-6)


def test_plain_resnet_stride_and_channels():
    """Strided standard ResNet (reference resnet.py:643) — DC5: stride 16,
    res5 dilated."""
    import jax
    import jax.numpy as jnp

    from drn_wsod_tpu.config import get_cfg
    from drn_wsod_tpu.models.backbones import build_resnet_backbone

    cfg = get_cfg()
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.DTYPE = "float32"
    bb, strides, chans = build_resnet_backbone(cfg)
    assert strides["res5"] == 16 and chans["res5"] == 512
    x = jnp.zeros((1, 64, 64, 3))
    v = bb.init(jax.random.PRNGKey(0), x)
    out = bb.apply(v, x)
    assert out["res5"].shape == (1, 4, 4, 512)
    # param names follow the d2 layout for checkpoint import
    p = v["params"]
    assert "conv1" in p["stem"] and "conv1_norm" in p["stem"]
    assert "shortcut" in p["res3_0"]


def test_csc_oicr_head_builds_and_trains():
    """CSCOICRROIHeads: CSC image loss + OICR refinement branches
    (reference csc_oicr_* configs)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    import jax
    import numpy as np
    from test_modeling import tiny_batch, tiny_cfg

    from drn_wsod_tpu.engine import create_train_state, make_csc_train_step
    from drn_wsod_tpu.models import build_model
    from drn_wsod_tpu.solver import build_optimizer

    cfg = tiny_cfg("CSCOICRROIHeads")
    model = build_model(cfg)
    assert model.refine_k == 3 and not model.use_pallas_pooler
    batch = tiny_batch()
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           batch, train=True)
    tx = build_optimizer(cfg, variables)
    state = create_train_state(variables, tx)
    step = jax.jit(make_csc_train_step(model, tx))
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert "loss_cls_pos" in metrics and "loss_cls_r0" in metrics
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
