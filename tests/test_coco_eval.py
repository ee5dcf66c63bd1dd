import numpy as np

from drn_wsod_tpu.evaluation.coco_eval import COCODetectionEvaluator


def _gt():
    return {
        "a": [{"category_id": 0, "bbox": [10, 10, 60, 60], "difficult": 0},
              {"category_id": 1, "bbox": [70, 70, 120, 130], "difficult": 0}],
        "b": [{"category_id": 0, "bbox": [0, 0, 50, 40], "difficult": 0}],
    }


def test_perfect_detections_ap100():
    ev = COCODetectionEvaluator(["c0", "c1"], _gt())
    ev.process_single("a", np.array([[10, 10, 60, 60], [70, 70, 120, 130]]),
                      np.array([0.9, 0.8]), np.array([0, 1]))
    ev.process_single("b", np.array([[0, 0, 50, 40]]), np.array([0.7]),
                      np.array([0]))
    r = ev.evaluate()["bbox"]
    np.testing.assert_allclose(r["AP"], 100.0, atol=1e-6)
    np.testing.assert_allclose(r["AP50"], 100.0, atol=1e-6)


def test_loose_box_only_counts_at_low_iou():
    ev = COCODetectionEvaluator(["c0"], {
        "a": [{"category_id": 0, "bbox": [0, 0, 100, 100], "difficult": 0}]})
    # IoU vs GT = 60x100/100x100 ~ 0.6: TP at 0.5/0.55/0.6, FP above
    ev.process_single("a", np.array([[0, 0, 60, 100]]), np.array([0.9]),
                      np.array([0]))
    r = ev.evaluate()["bbox"]
    assert r["AP50"] > 99.0
    assert r["AP75"] < 1.0
    assert 0 < r["AP"] < 50.0


def test_duplicate_detection_fp():
    ev = COCODetectionEvaluator(["c0"], {
        "a": [{"category_id": 0, "bbox": [0, 0, 100, 100], "difficult": 0}]})
    ev.process_single("a", np.array([[0, 0, 100, 100], [1, 1, 100, 100]]),
                      np.array([0.9, 0.8]), np.array([0, 0]))
    r = ev.evaluate()["bbox"]
    # one TP, one FP after it -> AP50 stays 100 (precision envelope at
    # recall 1.0 reached before the FP)
    np.testing.assert_allclose(r["AP50"], 100.0, atol=1e-5)


def test_missed_gt_reduces_ap():
    ev = COCODetectionEvaluator(["c0"], _gt())
    ev.process_single("a", np.array([[10, 10, 60, 60]]), np.array([0.9]),
                      np.array([0]))
    # image b's GT never detected -> recall capped at 0.5 for class 0
    r = ev.evaluate()["bbox"]
    assert 40.0 < r["AP50"] < 60.0
