"""WSJDS joint detection+segmentation smoke test."""

import pytest
import os
import sys

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from test_modeling import tiny_batch, tiny_cfg  # noqa: E402

from drn_wsod_tpu.engine import create_train_state, make_csc_train_step  # noqa: E402
from drn_wsod_tpu.models import build_model  # noqa: E402
from drn_wsod_tpu.solver import build_optimizer  # noqa: E402


@pytest.mark.slow
def test_wsjds_train_step():
    cfg = tiny_cfg("WSJDSROIHeads")
    model = build_model(cfg)
    assert model.with_seg
    batch = tiny_batch()
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           batch, train=True)
    assert "seg_head" in variables["params"]
    tx = build_optimizer(cfg, variables)
    state = create_train_state(variables, tx)
    step = make_csc_train_step(model, tx, tau=0.0)
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert "loss_seg" in metrics
    assert {"loss_cls_pos", "loss_cls_neg"} <= set(metrics)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k


def test_semantic_logits_shape():
    cfg = tiny_cfg("WSJDSROIHeads")
    model = build_model(cfg)
    batch = tiny_batch()
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           batch, train=True)
    logits = model.apply(variables, batch, method="semantic_logits")
    B, H = batch.image.shape[0], batch.image.shape[1]
    C = cfg.MODEL.ROI_HEADS.NUM_CLASSES
    assert logits.shape[0] == B and logits.shape[-1] == C + 1
