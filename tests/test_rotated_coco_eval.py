"""Rotated COCO AP: numpy rotated IoU vs the (tested) on-device version +
evaluator sanity (reference rotated_coco_evaluation.py)."""

import numpy as np

import jax.numpy as jnp

from drn_wsod_tpu.evaluation.rotated_coco_eval import (
    RotatedCOCODetectionEvaluator, iou_matrix_rotated)
from drn_wsod_tpu.structures.rotated_boxes import pairwise_iou_rotated


def test_numpy_iou_matches_device_iou():
    rng = np.random.RandomState(0)
    a = np.stack([rng.uniform(20, 80, 12), rng.uniform(20, 80, 12),
                  rng.uniform(8, 40, 12), rng.uniform(8, 40, 12),
                  rng.uniform(-180, 180, 12)], -1).astype(np.float32)
    b = np.stack([rng.uniform(20, 80, 9), rng.uniform(20, 80, 9),
                  rng.uniform(8, 40, 9), rng.uniform(8, 40, 9),
                  rng.uniform(-180, 180, 9)], -1).astype(np.float32)
    got = iou_matrix_rotated(a, b)
    want = np.asarray(pairwise_iou_rotated(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_identical_rotated_boxes_iou_one():
    b = np.asarray([[50.0, 50.0, 20.0, 10.0, 33.0]])
    np.testing.assert_allclose(iou_matrix_rotated(b, b), [[1.0]], atol=1e-6)


def test_rotated_evaluator_perfect_detection():
    gt = {"img0": [{"category_id": 0,
                    "bbox": [50.0, 50.0, 20.0, 10.0, 30.0],
                    "difficult": 0}]}
    ev = RotatedCOCODetectionEvaluator(["thing"], gt)
    ev.process_single("img0", np.asarray([[50.0, 50.0, 20.0, 10.0, 30.0]]),
                      np.asarray([0.9]), np.asarray([0]))
    res = ev.evaluate()["bbox"]
    assert res["AP50"] == 100.0
    assert res["AP"] == 100.0


def test_rotated_evaluator_wrong_angle_misses_at_high_iou():
    gt = {"img0": [{"category_id": 0,
                    "bbox": [50.0, 50.0, 40.0, 8.0, 0.0],
                    "difficult": 0}]}
    ev = RotatedCOCODetectionEvaluator(["thing"], gt)
    # a 90-degree-off detection of an elongated box has tiny IoU
    ev.process_single("img0", np.asarray([[50.0, 50.0, 40.0, 8.0, 90.0]]),
                      np.asarray([0.9]), np.asarray([0]))
    res = ev.evaluate()["bbox"]
    assert res["AP50"] == 0.0
