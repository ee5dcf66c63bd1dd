"""Supervised Fast R-CNN head tests (pattern of the reference
tests/modeling/test_fast_rcnn.py: loss values + shapes on tiny inputs)."""

import pytest
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from test_modeling import tiny_batch, tiny_cfg  # noqa: E402

from drn_wsod_tpu.models import build_model  # noqa: E402
from drn_wsod_tpu.models.heads import fast_rcnn as fr  # noqa: E402


def test_subsample_proposals_quota():
    P = 32
    rng = np.random.RandomState(0)
    proposals = rng.uniform(0, 50, (P, 4)).astype(np.float32)
    proposals[:, 2:] = proposals[:, :2] + 20
    gt_boxes = proposals[:4].copy()
    gt_classes = jnp.asarray([0, 1, 0, 1], dtype=jnp.int32)
    s = fr.subsample_proposals(
        jnp.asarray(proposals), jnp.ones(P, bool), jnp.asarray(gt_boxes),
        gt_classes, jnp.ones(4, bool), jax.random.PRNGKey(0),
        batch_size=16, positive_fraction=0.25)
    assert s.indices.shape == (16,)
    fg = np.asarray(s.gt_class) >= 0
    assert fg.sum() <= 4  # <= num_pos quota
    assert np.asarray(s.valid).sum() == 16  # plenty of bg available


def test_subsample_no_gt_all_background():
    P = 8
    proposals = jnp.asarray(np.random.RandomState(0).uniform(
        0, 50, (P, 4)).astype(np.float32))
    s = fr.subsample_proposals(
        proposals, jnp.ones(P, bool), jnp.zeros((1, 4)),
        jnp.zeros(1, jnp.int32), jnp.zeros(1, bool), jax.random.PRNGKey(0),
        batch_size=8, positive_fraction=0.25)
    assert (np.asarray(s.gt_class) < 0).all()


def test_fast_rcnn_losses_perfect_predictions():
    S, C = 8, 3
    sampled = fr.SampledProposals(
        indices=jnp.arange(S, dtype=jnp.int32),
        gt_class=jnp.asarray([0, 1, -1, -1, -1, -1, -1, -1], jnp.int32),
        gt_box=jnp.tile(jnp.asarray([[0., 0., 10., 10.]]), (S, 1)),
        valid=jnp.ones(S, bool))
    logits = jnp.full((S, C + 1), -10.0)
    # perfect: fg slots predict their class, bg slots predict background
    logits = logits.at[0, 0].set(10.0).at[1, 1].set(10.0)
    for i in range(2, S):
        logits = logits.at[i, C].set(10.0)
    proposals = jnp.tile(jnp.asarray([[0., 0., 10., 10.]]), (S, 1))
    deltas = jnp.zeros((S, C * 4))
    lc, lb = fr.fast_rcnn_losses(logits, deltas, proposals, sampled, C)
    assert float(lc) < 1e-3
    assert float(lb) < 1e-6  # proposals == gt -> zero deltas are perfect


@pytest.mark.slow
def test_fast_rcnn_meta_arch_e2e():
    cfg = tiny_cfg("StandardROIHeads")
    model = build_model(cfg)
    batch = tiny_batch()
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, batch, train=True)
    losses = model.apply(params, batch, train=True,
                         rngs={"dropout": jax.random.PRNGKey(2)})
    assert set(losses) == {"loss_cls", "loss_box_reg"}
    for v in losses.values():
        assert np.isfinite(float(v))

    scores, boxes = model.apply(params, batch, method="inference_scores")
    B, P = batch.proposals.shape[:2]
    C = cfg.MODEL.ROI_HEADS.NUM_CLASSES
    assert scores.shape == (B, P, C + 1)
    assert boxes.shape == (B, P, C * 4)
