import jax
import jax.numpy as jnp
import numpy as np

from drn_wsod_tpu.models.proposal_generator import (StandardRPNHead,
                                                    generate_anchors,
                                                    rpn_losses,
                                                    select_proposals)


def test_generate_anchors_grid():
    a = generate_anchors((2, 3), stride=16, sizes=[32], aspect_ratios=[1.0])
    assert a.shape == (6, 4)
    # first anchor centered at (8, 8) with size 32
    np.testing.assert_allclose(np.asarray(a[0]), [-8, -8, 24, 24])
    # areas all ~32^2
    w = a[:, 2] - a[:, 0]
    h = a[:, 3] - a[:, 1]
    np.testing.assert_allclose(np.asarray(w * h), 1024.0, rtol=1e-5)


def test_generate_anchors_aspect_ratios():
    a = generate_anchors((1, 1), 16, sizes=[32], aspect_ratios=[0.5, 1.0, 2.0])
    assert a.shape == (3, 4)
    w = np.asarray(a[:, 2] - a[:, 0])
    h = np.asarray(a[:, 3] - a[:, 1])
    np.testing.assert_allclose(h / w, [0.5, 1.0, 2.0], rtol=1e-5)
    np.testing.assert_allclose(w * h, 1024.0, rtol=1e-5)


def test_rpn_head_shapes():
    head = StandardRPNHead(num_anchors=3, conv_dim=16)
    feats = [jnp.zeros((1, 8, 8, 16)), jnp.zeros((1, 4, 4, 16))]
    params = head.init(jax.random.PRNGKey(0), feats)
    outs = head.apply(params, feats)
    assert outs[0][0].shape == (1, 8, 8, 3)
    assert outs[0][1].shape == (1, 8, 8, 12)
    assert outs[1][0].shape == (1, 4, 4, 3)


def test_rpn_losses_finite_and_supervised():
    anchors = generate_anchors((8, 8), 8, [16], [1.0])
    N = anchors.shape[0]
    gt = jnp.asarray([[8.0, 8.0, 28.0, 28.0]])
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(N).astype(np.float32))
    deltas = jnp.asarray(rng.randn(N, 4).astype(np.float32) * 0.1)
    lo, ll = rpn_losses(anchors, logits, deltas, gt, jnp.ones(1, bool),
                        jax.random.PRNGKey(0), batch_size=32)
    assert np.isfinite(float(lo)) and np.isfinite(float(ll))


def test_select_proposals_static():
    anchors = generate_anchors((8, 8), 8, [16], [1.0])
    N = anchors.shape[0]
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(N).astype(np.float32))
    deltas = jnp.zeros((N, 4))
    boxes, scores, valid = select_proposals(
        anchors, logits, deltas, (64, 64), pre_nms_topk=32, post_nms_topk=8)
    assert boxes.shape == (8, 4)
    assert np.asarray(valid).sum() > 0
    s = np.asarray(scores)[np.asarray(valid)]
    assert (np.diff(s) <= 1e-6).all()
