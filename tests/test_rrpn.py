"""Rotated RPN machinery: box transform round-trip, rotated anchors,
losses and proposal selection (reference Box2BoxTransformRotated +
RotatedAnchorGenerator + rrpn.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drn_wsod_tpu.models.proposal_generator import (
    generate_rotated_anchors, rrpn_losses, select_proposals_rotated)
from drn_wsod_tpu.structures.rotated_boxes import (apply_deltas_rotated,
                                                   get_deltas_rotated)


def test_rotated_delta_roundtrip():
    rng = np.random.RandomState(0)
    src = np.stack([rng.uniform(20, 80, 16), rng.uniform(20, 80, 16),
                    rng.uniform(8, 40, 16), rng.uniform(8, 40, 16),
                    rng.uniform(-180, 180, 16)], -1).astype(np.float32)
    tgt = np.stack([rng.uniform(20, 80, 16), rng.uniform(20, 80, 16),
                    rng.uniform(8, 40, 16), rng.uniform(8, 40, 16),
                    rng.uniform(-180, 180, 16)], -1).astype(np.float32)
    d = get_deltas_rotated(jnp.asarray(src), jnp.asarray(tgt))
    back = np.asarray(apply_deltas_rotated(d, jnp.asarray(src)))
    np.testing.assert_allclose(back[:, :4], tgt[:, :4], rtol=1e-4, atol=1e-3)
    # angles equal mod 360 mapped to [-180, 180)
    da = (back[:, 4] - tgt[:, 4] + 180.0) % 360.0 - 180.0
    np.testing.assert_allclose(da, 0.0, atol=1e-3)


def test_zero_deltas_identity():
    b = jnp.asarray([[50.0, 50.0, 20.0, 10.0, 30.0]])
    out = np.asarray(apply_deltas_rotated(jnp.zeros((1, 5)), b))
    np.testing.assert_allclose(out, np.asarray(b), atol=1e-5)


def test_rotated_anchor_grid():
    a = generate_rotated_anchors((4, 6), 16, sizes=[32.0],
                                 aspect_ratios=[1.0], angles=[0.0, 45.0])
    assert a.shape == (4 * 6 * 2, 5)
    a = np.asarray(a)
    # first cell center at half-stride; both angles present
    np.testing.assert_allclose(a[0], [8.0, 8.0, 32.0, 32.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(a[1, 4], 45.0)
    # all anchors share the size, centers stride apart
    np.testing.assert_allclose(a[2, 0] - a[0, 0], 16.0)


@pytest.mark.slow
def test_rrpn_losses_and_selection():
    anchors = generate_rotated_anchors((8, 8), 8, sizes=[16.0],
                                       aspect_ratios=[1.0],
                                       angles=[0.0, 90.0])
    N = anchors.shape[0]
    gt = jnp.asarray([[32.0, 32.0, 16.0, 16.0, 0.0]])
    rng = jax.random.PRNGKey(0)
    # perfect predictions: deltas toward GT, high objectness at best anchor
    logits = jnp.zeros((N,))
    deltas = jnp.zeros((N, 5))
    lo, ll = rrpn_losses(anchors, logits, deltas, gt, jnp.ones(1, bool),
                         rng, batch_size=32)
    assert np.isfinite(float(lo)) and np.isfinite(float(ll))

    boxes, scores, valid = select_proposals_rotated(
        anchors, logits, deltas, (64, 64), pre_nms_topk=32,
        post_nms_topk=8, nms_thresh=0.7)
    assert boxes.shape == (8, 5)
    assert bool(valid.any())
    b = np.asarray(boxes)[np.asarray(valid)]
    assert (b[:, 0] >= 0).all() and (b[:, 0] <= 64).all()
