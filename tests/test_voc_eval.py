import numpy as np

from drn_wsod_tpu.evaluation.voc_eval import (PascalVOCDetectionEvaluator,
                                              voc_ap, voc_eval_class,
                                              voc_eval_corloc_class)

import pytest

pytestmark = pytest.mark.core


def _gt():
    return {
        "img1": [
            {"category_id": 0, "bbox": [10, 10, 50, 50], "difficult": 0},
            {"category_id": 1, "bbox": [60, 60, 90, 90], "difficult": 0},
        ],
        "img2": [
            {"category_id": 0, "bbox": [20, 20, 70, 80], "difficult": 0},
        ],
    }


def test_voc_ap_perfect():
    rec = np.array([0.5, 1.0])
    prec = np.array([1.0, 1.0])
    assert voc_ap(rec, prec, use_07_metric=False) == 1.0
    np.testing.assert_allclose(voc_ap(rec, prec, use_07_metric=True), 1.0)


def test_voc_eval_class_perfect_detections():
    dets = [("img1", 0.9, 10, 10, 50, 50), ("img2", 0.8, 20, 20, 70, 80)]
    ap = voc_eval_class(dets, _gt(), 0, 0.5, use_07_metric=True)
    np.testing.assert_allclose(ap, 1.0)


def test_voc_eval_class_duplicate_is_fp():
    dets = [("img1", 0.9, 10, 10, 50, 50), ("img1", 0.85, 11, 11, 50, 50),
            ("img2", 0.8, 20, 20, 70, 80)]
    ap = voc_eval_class(dets, _gt(), 0, 0.5, use_07_metric=False)
    assert 0.5 < ap < 1.0  # duplicate counted as FP hurts precision


def test_voc_eval_class_miss():
    dets = [("img1", 0.9, 100, 100, 120, 120)]
    ap = voc_eval_class(dets, _gt(), 0, 0.5, use_07_metric=False)
    assert ap == 0.0


def test_corloc_top1_only():
    # Highest-scoring box per image is wrong in img1, right in img2.
    dets = [("img1", 0.9, 100, 100, 120, 120), ("img1", 0.5, 10, 10, 50, 50),
            ("img2", 0.8, 20, 20, 70, 80)]
    cl = voc_eval_corloc_class(dets, _gt(), 0, 0.5)
    np.testing.assert_allclose(cl, 0.5)


def test_evaluator_end_to_end():
    ev = PascalVOCDetectionEvaluator(["cls0", "cls1"], _gt(), year=2007)
    # process feeds 0-based boxes; evaluator shifts origin corner by +1
    ev.process_single("img1",
                      np.array([[9, 9, 50, 50], [59, 59, 90, 90]]),
                      np.array([0.9, 0.8]), np.array([0, 1]),
                      np.array([True, True]))
    ev.process_single("img2", np.array([[19, 19, 70, 80]]),
                      np.array([0.7]), np.array([0]), np.array([True]))
    res = ev.evaluate()
    np.testing.assert_allclose(res["bbox"]["AP50"], 100.0)
    np.testing.assert_allclose(res["bbox CorLoc"]["CL50"], 100.0)
    assert "AP" in res["bbox"] and "AP75" in res["bbox"]
