import pytest
import jax.numpy as jnp
import numpy as np

from drn_wsod_tpu.structures.rotated_boxes import (nms_rotated,
                                                   pairwise_iou_rotated,
                                                   rotated_to_corners)


def test_corners_axis_aligned():
    b = jnp.asarray([[10.0, 10.0, 8.0, 4.0, 0.0]])
    c = np.asarray(rotated_to_corners(b))[0]
    np.testing.assert_allclose(sorted(c[:, 0]), [6, 6, 14, 14])
    np.testing.assert_allclose(sorted(c[:, 1]), [8, 8, 12, 12])


def test_corners_rotated_90():
    b = jnp.asarray([[0.0, 0.0, 8.0, 4.0, 90.0]])
    c = np.asarray(rotated_to_corners(b))[0]
    # w and h swap roles
    np.testing.assert_allclose(sorted(np.abs(c[:, 0])), [2, 2, 2, 2],
                               atol=1e-5)
    np.testing.assert_allclose(sorted(np.abs(c[:, 1])), [4, 4, 4, 4],
                               atol=1e-5)


@pytest.mark.slow
def test_iou_identity_and_disjoint():
    b = jnp.asarray([[10.0, 10.0, 8.0, 6.0, 30.0],
                     [100.0, 100.0, 8.0, 6.0, -15.0]])
    iou = np.asarray(pairwise_iou_rotated(b, b))
    np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-3)
    assert iou[0, 1] < 1e-6


@pytest.mark.slow
def test_iou_rotated_vs_axis_aligned_half_overlap():
    # angle 0 degenerates to standard IoU: two boxes overlapping half
    a = jnp.asarray([[5.0, 5.0, 10.0, 10.0, 0.0]])
    b = jnp.asarray([[10.0, 5.0, 10.0, 10.0, 0.0]])
    iou = float(pairwise_iou_rotated(a, b)[0, 0])
    np.testing.assert_allclose(iou, 50.0 / 150.0, atol=1e-3)


def test_iou_90_rotation_square_invariance():
    a = jnp.asarray([[0.0, 0.0, 10.0, 10.0, 0.0]])
    b = jnp.asarray([[0.0, 0.0, 10.0, 10.0, 90.0]])
    iou = float(pairwise_iou_rotated(a, b)[0, 0])
    np.testing.assert_allclose(iou, 1.0, atol=1e-3)


@pytest.mark.slow
def test_nms_rotated():
    boxes = jnp.asarray([
        [10.0, 10.0, 10.0, 10.0, 0.0],
        [10.5, 10.0, 10.0, 10.0, 2.0],     # near-duplicate, slight rotation
        [50.0, 50.0, 10.0, 10.0, 45.0],
    ])
    scores = jnp.asarray([0.9, 0.8, 0.7])
    keep = np.asarray(nms_rotated(boxes, scores, jnp.ones(3, bool), 0.5))
    np.testing.assert_array_equal(keep, [True, False, True])
