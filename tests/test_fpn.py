import pytest
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from test_modeling import tiny_batch, tiny_cfg  # noqa: E402

from drn_wsod_tpu.models import build_model  # noqa: E402
from drn_wsod_tpu.models.backbones.fpn import build_resnet_fpn_backbone  # noqa: E402
from drn_wsod_tpu.ops.poolers import assign_boxes_to_levels  # noqa: E402


def test_fpn_backbone_levels():
    cfg = tiny_cfg()
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    model, strides, channels = build_resnet_fpn_backbone(cfg)
    assert strides == {"p2": 4, "p3": 8, "p4": 16, "p5": 32, "p6": 64}
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert set(out) == {"p2", "p3", "p4", "p5", "p6"}
    assert out["p2"].shape == (1, 16, 16, 256)
    assert out["p5"].shape == (1, 2, 2, 256)


def test_level_assignment():
    boxes = jnp.asarray([
        [0, 0, 32, 32],      # small -> lowest level
        [0, 0, 224, 224],    # canonical -> level 4
        [0, 0, 900, 900],    # huge -> clamped to max level
    ], dtype=jnp.float32)
    lv = np.asarray(assign_boxes_to_levels(boxes, 2, 5))
    assert lv[0] == 2
    assert lv[1] == 4
    assert lv[2] == 5


@pytest.mark.slow
def test_fpn_wsod_model_e2e():
    cfg = tiny_cfg("OICRROIHeads")
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.ROI_BOX_HEAD.POOLER_TYPE = "ROIAlignV2"
    model = build_model(cfg)
    batch = tiny_batch()
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, batch, train=True)
    losses = model.apply(params, batch, train=True,
                         rngs={"dropout": jax.random.PRNGKey(2)})
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    scores, boxes = model.apply(params, batch, method="inference_scores")
    assert np.isfinite(np.asarray(scores)).all()
