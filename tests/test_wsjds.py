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


def test_crf_constraint_targets_and_loss():
    """Constraint semantics (reference SemSegHead.crf, seg_heads.py:173-229
    + the loss :140-147): per-(image,class) balanced weights from
    thresholded CRF-refined probs, KL zeroing of >1000 entries, SUM
    reduction, stop-gradient targets."""
    import jax.numpy as jnp

    from drn_wsod_tpu.models.heads.seg import (crf_constraint,
                                               crf_constraint_loss)

    rng = np.random.RandomState(0)
    B, h, w, C = 1, 24, 24, 2
    # two-region image; class-0 probs agree with the left region
    img = np.zeros((B, 48, 48, 3), np.float32)
    img[:, :, :24] = 200.0
    img[:, :, 24:] = 40.0
    fg = np.full((B, h, w, C), 0.05, np.float32)
    fg[:, :, :12, 0] = 0.9
    fg += rng.rand(B, h, w, C).astype(np.float32) * 0.02

    crf_fg, wts = crf_constraint(jnp.asarray(fg), jnp.asarray(img))
    crf_fg, wts = np.asarray(crf_fg), np.asarray(wts)
    assert crf_fg.shape == wts.shape == (B, h, w, C)
    assert np.isfinite(crf_fg).all() and np.isfinite(wts).all()
    # balanced weights: each (image, class) plane's weights sum to
    # (#pos>0) + (#neg>0) <= 2 (reciprocal-count balancing)
    plane_sums = wts.sum(axis=(1, 2))
    assert (plane_sums <= 2.0 + 1e-5).all()
    assert (plane_sums > 0.0).all()
    # the CRF keeps the confident left-region class-0 blob positive
    assert (crf_fg[0, :, :12, 0] >= 0.5).mean() > 0.8

    loss = float(crf_constraint_loss(jnp.asarray(fg), jnp.asarray(crf_fg),
                                     jnp.asarray(wts)))
    assert np.isfinite(loss)
    # perfect agreement in the double-sigmoid metric == minimal loss:
    # feeding the CRF output itself cannot be beaten by the raw prediction
    loss_self = float(crf_constraint_loss(
        jnp.asarray(crf_fg), jnp.asarray(crf_fg), jnp.asarray(wts)))
    assert np.isfinite(loss_self)


@pytest.mark.slow
def test_wsjds_constraint_train_step():
    """CSC train step with MODEL.SEM_SEG_HEAD.CONSTRAINT: the
    loss_constraint term appears, is finite, and gradients flow."""
    cfg = tiny_cfg("WSJDSROIHeads")
    cfg.MODEL.SEM_SEG_HEAD.CONSTRAINT = True
    model = build_model(cfg)
    assert model.seg_constraint
    batch = tiny_batch()
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           batch, train=True)
    tx = build_optimizer(cfg, variables)
    state = create_train_state(variables, tx)
    step = make_csc_train_step(model, tx, tau=0.0)
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert "loss_constraint" in metrics
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k

    # inference-side CRF refinement keeps the logits contract
    logits = model.apply(state.params, batch, method="semantic_logits")
    assert np.isfinite(np.asarray(logits)).all()
