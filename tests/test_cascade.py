"""Cascade R-CNN heads (reference detectron2 cascade_rcnn.py semantics:
stage re-matching, per-stage losses, averaged inference probs)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from test_modeling import tiny_batch, tiny_cfg  # noqa: E402

from drn_wsod_tpu.models import build_model  # noqa: E402
from drn_wsod_tpu.models.heads.cascade import match_and_label  # noqa: E402


def test_match_and_label_thresholds():
    gt = jnp.asarray([[0.0, 0.0, 10.0, 10.0]])
    gt_cls = jnp.asarray([3], jnp.int32)
    gt_valid = jnp.ones(1, bool)
    boxes = jnp.asarray([
        [0.0, 0.0, 10.0, 10.0],    # IoU 1.0 -> fg at any threshold
        [0.0, 0.0, 10.0, 18.0],    # IoU ~0.55 -> fg@0.5, bg@0.7
        [20.0, 20.0, 30.0, 30.0],  # IoU 0 -> bg
    ])
    cls5, gt5 = match_and_label(boxes, gt, gt_cls, gt_valid, 0.5)
    assert list(np.asarray(cls5)) == [3, 3, -1]
    cls7, _ = match_and_label(boxes, gt, gt_cls, gt_valid, 0.7)
    assert list(np.asarray(cls7)) == [3, -1, -1]
    np.testing.assert_allclose(np.asarray(gt5[0]), [0, 0, 10, 10])


@pytest.mark.slow
def test_cascade_meta_arch_e2e():
    cfg = tiny_cfg("CascadeROIHeads")
    cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG = True
    model = build_model(cfg)
    batch = tiny_batch()
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, batch, train=True)
    losses = model.apply(params, batch, train=True,
                         rngs={"dropout": jax.random.PRNGKey(2)})
    assert set(losses) == {f"loss_{n}_stage{k}"
                           for n in ("cls", "box_reg") for k in range(3)}
    for v in losses.values():
        assert np.isfinite(float(v))

    scores, boxes = model.apply(params, batch, method="inference_scores")
    B, P = batch.proposals.shape[:2]
    C = cfg.MODEL.ROI_HEADS.NUM_CLASSES
    assert scores.shape == (B, P, C + 1)
    assert boxes.shape == (B, P, 4)  # class-agnostic last-stage regression
    # probs: each slot's (C+1) scores sum to 1 where the proposal is valid
    sums = np.asarray(scores.sum(-1))
    m = np.asarray(batch.proposal_mask)
    np.testing.assert_allclose(sums[m], 1.0, atol=1e-4)
