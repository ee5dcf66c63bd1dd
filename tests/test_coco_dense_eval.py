"""COCO segm (mask AP) and keypoints (OKS AP) evaluator tasks
(reference detectron2/evaluation/coco_evaluation.py tasks +
pycocotools maskUtils / cocoeval.computeOks)."""

import numpy as np

from drn_wsod_tpu.evaluation.coco_eval import (COCODetectionEvaluator,
                                               _mask_iou_matrix, _oks_matrix,
                                               rasterize_polygons, rle_area,
                                               rle_decode, rle_encode)


def _rect_mask(h, w, x1, y1, x2, y2):
    m = np.zeros((h, w), bool)
    m[y1:y2, x1:x2] = True
    return m


def test_rle_roundtrip_and_area():
    rng = np.random.RandomState(0)
    m = rng.rand(23, 17) > 0.5
    rle = rle_encode(m)
    np.testing.assert_array_equal(rle_decode(rle), m)
    assert rle_area(rle) == int(m.sum())
    # empty + full masks
    for m2 in (np.zeros((5, 4), bool), np.ones((5, 4), bool)):
        np.testing.assert_array_equal(rle_decode(rle_encode(m2)), m2)


def test_rasterize_matches_rect_polygon():
    poly = [[10, 5, 30, 5, 30, 20, 10, 20]]
    m = rasterize_polygons(poly, 32, 40)
    # PIL's polygon fill includes the boundary; interior must be filled
    assert m[10, 15] and m[6, 11] and not m[2, 2] and not m[25, 35]


def test_mask_iou_matrix_values():
    a = _rect_mask(20, 20, 0, 0, 10, 10)
    b = _rect_mask(20, 20, 0, 0, 10, 5)     # half of a
    ious = _mask_iou_matrix([a], [b])
    np.testing.assert_allclose(ious, [[0.5]])


def test_oks_exact_and_far():
    sig = np.full(3, 0.1)
    gt = np.array([[[10, 10, 2], [20, 20, 2], [30, 30, 0]]], float)
    det_exact = np.array([[[10, 10, 1], [20, 20, 1], [0, 0, 1]]], float)
    det_far = np.array([[[500, 500, 1], [600, 600, 1], [0, 0, 1]]], float)
    areas = np.array([100.0])
    ious = _oks_matrix(np.concatenate([det_exact, det_far]), gt, areas, sig)
    np.testing.assert_allclose(ious[0, 0], 1.0, atol=1e-12)
    assert ious[1, 0] < 1e-6
    # hand-computed: one kpt offset by d with var=(2s)^2, a=100
    det_off = np.array([[[13, 10, 1], [20, 20, 1], [0, 0, 1]]], float)
    e = 9.0 / (2 * 0.1) ** 2 / (2 * (100 + np.spacing(1)))
    expect = (np.exp(-e) + 1.0) / 2
    np.testing.assert_allclose(
        _oks_matrix(det_off, gt, areas, sig)[0, 0], expect, rtol=1e-12)


def _seg_gt():
    return {
        "a": [{"category_id": 0, "bbox": [10, 10, 30, 30],
               "segmentation": [[10, 10, 30, 10, 30, 30, 10, 30]],
               "difficult": 0}],
    }


def test_segm_task_perfect_and_shifted():
    H = W = 64
    gt_mask = rasterize_polygons([[10, 10, 30, 10, 30, 30, 10, 30]], H, W)

    ev = COCODetectionEvaluator(["c0"], _seg_gt(), tasks=("bbox", "segm"))
    ev.process_single("a", np.array([[10, 10, 30, 30]]), np.array([0.9]),
                      np.array([0]), masks=gt_mask[None])
    r = ev.evaluate()
    np.testing.assert_allclose(r["segm"]["AP"], 100.0, atol=1e-6)
    np.testing.assert_allclose(r["bbox"]["AP"], 100.0, atol=1e-6)

    # same box, but a mask covering only the left half: box AP50 stays
    # perfect while mask AP75 dies — the tasks measure different geometry
    ev = COCODetectionEvaluator(["c0"], _seg_gt(), tasks=("bbox", "segm"))
    half = _rect_mask(H, W, 10, 10, 20, 31)
    ev.process_single("a", np.array([[10, 10, 30, 30]]), np.array([0.9]),
                      np.array([0]), masks=half[None])
    r = ev.evaluate()
    assert r["bbox"]["AP50"] > 99.0
    assert r["segm"]["AP75"] < 1.0


def test_keypoints_task_ap():
    gt = {
        "a": [{"category_id": 0, "bbox": [0, 0, 50, 50], "area": 2500.0,
               "keypoints": [10, 10, 2, 20, 20, 2, 30, 30, 2],
               "difficult": 0}],
    }
    ev = COCODetectionEvaluator(["person"], gt, tasks=("bbox", "keypoints"),
                                kpt_sigmas=np.full(3, 0.1))
    ev.process_single(
        "a", np.array([[0, 0, 50, 50]]), np.array([0.9]), np.array([0]),
        keypoints=np.array([[[10, 10, 1], [20, 20, 1], [30, 30, 1]]], float))
    r = ev.evaluate()["keypoints"]
    np.testing.assert_allclose(r["AP"], 100.0, atol=1e-6)

    ev.reset()
    ev.process_single(
        "a", np.array([[0, 0, 50, 50]]), np.array([0.9]), np.array([0]),
        keypoints=np.array([[[500, 9, 1], [600, 19, 1], [700, 29, 1]]],
                           float))
    r = ev.evaluate()["keypoints"]
    assert r["AP"] < 1.0


def test_dense_state_roundtrip_multihost_merge():
    gt = _seg_gt()
    H = W = 64
    gt_mask = rasterize_polygons([[10, 10, 30, 10, 30, 30, 10, 30]], H, W)
    ev = COCODetectionEvaluator(["c0"], gt, tasks=("bbox", "segm"))
    ev.process_single("a", np.array([[10, 10, 30, 30]]), np.array([0.9]),
                      np.array([0]), masks=gt_mask[None])
    state = ev.state_dict()

    ev2 = COCODetectionEvaluator(["c0"], gt, tasks=("bbox", "segm"))
    ev2.merge_states([state])
    r = ev2.evaluate()
    np.testing.assert_allclose(r["segm"]["AP"], 100.0, atol=1e-6)
