import jax.numpy as jnp
import numpy as np

from drn_wsod_tpu.ops import match
from drn_wsod_tpu.structures import pairwise_iou
import pytest

pytestmark = pytest.mark.core


def test_match_basic():
    gt = jnp.array([[0, 0, 10, 10], [20, 20, 30, 30]], dtype=jnp.float32)
    pred = jnp.array([
        [0, 0, 10, 10],      # iou 1.0 with gt0
        [21, 21, 31, 31],    # high iou with gt1
        [50, 50, 60, 60],    # no overlap
    ], dtype=jnp.float32)
    q = pairwise_iou(gt, pred)
    idx, lab = match(q, jnp.array([True, True]), [0.5], [0, 1])
    np.testing.assert_array_equal(np.asarray(idx)[:2], [0, 1])
    np.testing.assert_array_equal(np.asarray(lab), [1, 1, 0])


def test_match_no_gt():
    q = jnp.zeros((2, 3))
    idx, lab = match(q, jnp.array([False, False]), [0.5], [0, 1])
    np.testing.assert_array_equal(np.asarray(idx), [0, 0, 0])
    np.testing.assert_array_equal(np.asarray(lab), [0, 0, 0])


def test_match_ignore_band():
    # thresholds [0.3, 0.7] with labels [0, -1, 1]: middle band ignored.
    q = jnp.array([[0.1, 0.5, 0.9]])
    idx, lab = match(q, jnp.array([True]), [0.3, 0.7], [0, -1, 1])
    np.testing.assert_array_equal(np.asarray(lab), [0, -1, 1])


def test_match_padded_gt_ignored():
    # The padded (invalid) GT row has high IoU but must not be matched.
    q = jnp.array([[0.9, 0.9], [0.2, 0.8]])
    idx, lab = match(q, jnp.array([False, True]), [0.5], [0, 1])
    np.testing.assert_array_equal(np.asarray(idx), [1, 1])
    np.testing.assert_array_equal(np.asarray(lab), [0, 1])
