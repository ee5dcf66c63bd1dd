"""Golden-value tests for WSDDN / OICR head math (the reference has no unit
tests for these — SURVEY.md §4 calls out adding them)."""

import jax
import jax.numpy as jnp
import numpy as np

from drn_wsod_tpu.models.heads import oicr, wsddn
import pytest

pytestmark = pytest.mark.core


def test_wsddn_scores_masked_softmax():
    """Padded proposals must not leak into the detection-stream softmax."""
    B, P, C, D = 1, 4, 3, 8
    rng = jax.random.PRNGKey(0)
    feats = jax.random.normal(rng, (B, P, D))
    mask = jnp.array([[True, True, True, False]])

    layer = wsddn.WSDDNOutputLayers(num_classes=C)
    params = layer.init(rng, feats, mask)
    scores = layer.apply(params, feats, mask)

    assert scores.shape == (B, P, C)
    np.testing.assert_allclose(np.asarray(scores[0, 3]), 0.0)
    # detection softmax sums to 1 over valid proposals (per class), so the
    # per-class score sum equals the cls-softmax weighted average in [0, 1].
    s = np.asarray(scores)
    assert (s >= 0).all() and (s.sum(axis=1) <= 1 + 1e-5).all()

    # Identical feats with a padded slot removed must give identical scores.
    scores_sub = layer.apply(params, feats[:, :3], mask[:, :3])
    np.testing.assert_allclose(np.asarray(scores[:, :3]), np.asarray(scores_sub),
                               rtol=1e-6)


def test_wsddn_loss_golden():
    """BCE computed against an independent numpy evaluation."""
    scores = jnp.array([[[0.2, 0.05], [0.3, 0.01]]])  # (1, 2, 2)
    labels = jnp.array([[1.0, 0.0]])
    p = np.clip(np.asarray(scores).sum(axis=1), 1e-6, 1 - 1e-6)  # (1, 2)
    want = -(np.log(p[0, 0]) + np.log(1 - p[0, 1])) / 2 / 1
    got = float(wsddn.wsddn_loss(scores, labels, mean_loss=True))
    np.testing.assert_allclose(got, want, rtol=1e-6)

    want_sum = -(np.log(p[0, 0]) + np.log(1 - p[0, 1])) / 1
    got_sum = float(wsddn.wsddn_loss(scores, labels, mean_loss=False))
    np.testing.assert_allclose(got_sum, want_sum, rtol=1e-6)


def test_image_probs_clamped():
    scores = jnp.array([[[0.9, 0.0], [0.9, 0.0]]])  # sums to 1.8 > 1
    p = np.asarray(wsddn.image_probs(scores))
    np.testing.assert_allclose(p, [[1 - 1e-6, 1e-6]], atol=1e-7)


def test_mine_pgt_picks_argmax_per_present_class():
    P, C = 5, 3
    prev = np.zeros((P, C), dtype=np.float32)
    prev[2, 0] = 0.9   # class 0 seed = proposal 2
    prev[4, 1] = 0.8   # class 1 seed = proposal 4 (absent -> weight dont care)
    prev[0, 2] = 0.7
    boxes = np.arange(P * 4, dtype=np.float32).reshape(P, 4)
    mask = np.ones(P, dtype=bool)
    labels = np.array([1.0, 0.0, 1.0])
    evid = np.array([0.6, 0.5, 0.4], dtype=np.float32)

    pgt = oicr.mine_pgt(jnp.asarray(prev), jnp.asarray(boxes),
                        jnp.asarray(mask), jnp.asarray(labels),
                        jnp.asarray(evid))
    np.testing.assert_array_equal(np.asarray(pgt.valid), [True, False, True])
    np.testing.assert_allclose(np.asarray(pgt.boxes[0]), boxes[2])
    np.testing.assert_allclose(np.asarray(pgt.boxes[2]), boxes[0])
    np.testing.assert_allclose(np.asarray(pgt.weights), evid)


def test_mine_pgt_ignores_masked_proposals():
    prev = np.array([[0.9], [0.5]], dtype=np.float32)
    boxes = np.array([[0, 0, 1, 1], [2, 2, 3, 3]], dtype=np.float32)
    mask = np.array([False, True])
    pgt = oicr.mine_pgt(jnp.asarray(prev), jnp.asarray(boxes),
                        jnp.asarray(mask), jnp.asarray([1.0]),
                        jnp.asarray([0.7]))
    np.testing.assert_allclose(np.asarray(pgt.boxes[0]), boxes[1])


def test_label_proposals_fg_bg_and_weights():
    C = 2
    pgt = oicr.PseudoTargets(
        boxes=jnp.array([[0, 0, 10, 10], [20, 20, 30, 30]], dtype=jnp.float32),
        valid=jnp.array([True, False]),
        weights=jnp.array([0.8, 0.3]),
        scores=jnp.array([0.9, 0.0]),
    )
    proposals = jnp.array([
        [0, 0, 10, 10],      # IoU 1 with class 0 -> fg class 0
        [0, 0, 5, 10],       # IoU .5 -> fg
        [40, 40, 50, 50],    # IoU 0 -> bg, weight of best match (class 0)
        [21, 21, 29, 29],    # high IoU with class-1 pgt, but class 1 absent -> bg
    ], dtype=jnp.float32)
    mask = jnp.array([True, True, True, True])
    t = oicr.label_proposals(pgt, proposals, mask)
    np.testing.assert_array_equal(np.asarray(t.gt_class), [0, 0, C, C])
    np.testing.assert_allclose(np.asarray(t.weight), [0.8, 0.8, 0.8, 0.8])


def test_label_proposals_masks_padding():
    pgt = oicr.PseudoTargets(
        boxes=jnp.array([[0, 0, 10, 10]], dtype=jnp.float32),
        valid=jnp.array([True]),
        weights=jnp.array([0.8]),
        scores=jnp.array([0.9]),
    )
    proposals = jnp.array([[0, 0, 10, 10], [0, 0, 10, 10]], dtype=jnp.float32)
    mask = jnp.array([True, False])
    t = oicr.label_proposals(pgt, proposals, mask)
    assert int(t.gt_class[1]) == -1
    assert float(t.weight[1]) == 0.0


def test_refinement_loss_golden():
    # 1 image, 3 proposals, 2 classes (+bg): hand-computed weighted CE.
    logits = jnp.asarray(np.log(np.array([
        [[0.7, 0.2, 0.1],
         [0.1, 0.8, 0.1],
         [0.2, 0.2, 0.6]]])), dtype=jnp.float32)
    t = oicr.ProposalTargets(
        gt_class=jnp.array([[0, 1, -1]]),
        weight=jnp.array([[0.5, 0.25, 0.0]]),
        gt_box=jnp.zeros((1, 3, 4)),
    )
    want = (0.5 * -np.log(0.7) + 0.25 * -np.log(0.8)) / 2.0
    got = float(oicr.refinement_loss(logits, t))
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_average_branch_probs():
    l1 = jnp.zeros((1, 2, 3))
    l2 = jnp.asarray(np.log(np.array([[[0.5, 0.25, 0.25]] * 2])), dtype=jnp.float32)
    avg = np.asarray(oicr.average_branch_probs([l1, l2]))
    np.testing.assert_allclose(avg[0, 0], (np.array([1 / 3] * 3)
                                           + np.array([0.5, 0.25, 0.25])) / 2,
                               rtol=1e-5)
