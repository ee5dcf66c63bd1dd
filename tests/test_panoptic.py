"""Panoptic fusion + PQ metric on hand-checkable maps (reference
panoptic_fpn.py:combine_semantic_and_instance_outputs + panopticapi PQ)."""

import numpy as np

from drn_wsod_tpu.evaluation.panoptic_eval import (
    PanopticQualityEvaluator, combine_semantic_and_instance_outputs)


def _square_mask(h, w, y0, x0, y1, x1):
    m = np.zeros((h, w), bool)
    m[y0:y1, x0:x1] = True
    return m


def test_combine_paints_instances_by_score():
    H = W = 32
    masks = np.stack([
        _square_mask(H, W, 0, 0, 10, 10),     # score 0.9
        _square_mask(H, W, 5, 5, 15, 15),     # overlaps 25/100 -> kept,
                                              # clipped to free pixels
        _square_mask(H, W, 0, 0, 9, 9),       # 81 px, ~all covered -> skip
    ])
    scores = np.array([0.9, 0.8, 0.7])
    classes = np.array([2, 3, 2])
    sem = np.zeros((H, W), np.int64)
    pan, infos = combine_semantic_and_instance_outputs(
        masks, scores, classes, sem, overlap_threshold=0.5,
        stuff_area_limit=10_000, instances_confidence_threshold=0.5)
    things = [s for s in infos if s["isthing"]]
    assert len(things) == 2
    assert (pan[0:10, 0:10] == 1).all()
    # second instance got only its non-overlapped part
    assert (pan[10:15, 5:15] == 2).all()
    assert pan.max() == 2


def test_combine_fills_stuff_above_area_limit():
    H = W = 64
    sem = np.zeros((H, W), np.int64)
    sem[:, :32] = 5          # 2048 px of stuff class 5
    sem[:2, 32:36] = 7       # 8 px of class 7 -> below limit
    pan, infos = combine_semantic_and_instance_outputs(
        np.zeros((0, H, W), bool), np.zeros(0), np.zeros(0, np.int64),
        sem, stuff_area_limit=100)
    stuff = [s for s in infos if not s["isthing"]]
    assert len(stuff) == 1
    assert stuff[0]["category_id"] == 5
    assert stuff[0]["area"] == 64 * 32


def test_pq_perfect_match():
    gt = np.zeros((20, 20), np.int64)
    gt[:10] = 1
    gt[10:] = 2
    infos = [{"id": 1, "category_id": 0}, {"id": 2, "category_id": 1}]
    ev = PanopticQualityEvaluator(num_categories=3)
    ev.process_single(gt, infos, gt, infos)
    res = ev.evaluate()["panoptic_seg"]
    assert res["PQ"] == 100.0 and res["SQ"] == 100.0 and res["RQ"] == 100.0


def test_pq_partial_and_unmatched():
    H = W = 20
    gt = np.zeros((H, W), np.int64)
    gt[:, :10] = 1                      # cat 0, 200 px
    gt_infos = [{"id": 1, "category_id": 0}]
    pred = np.zeros((H, W), np.int64)
    pred[:, :8] = 1                     # IoU 160/200 = 0.8 -> TP
    pred[:, 12:14] = 2                  # 40 px entirely on GT void
    pred_infos = [{"id": 1, "category_id": 0},
                  {"id": 2, "category_id": 1}]
    ev = PanopticQualityEvaluator(num_categories=2)
    ev.process_single(pred, pred_infos, gt, gt_infos)
    res = ev.evaluate()["panoptic_seg"]
    # cat0: TP with IoU 0.8 -> PQ0 = 0.8; cat1: 1 FP... but pred seg 2 lies
    # entirely on GT void -> ignored by the panopticapi rule, so no FP
    assert abs(res["PQ"] - (100 * 0.8) / 1) < 1e-6
    assert res["N"] == 1


def test_pq_category_mismatch_is_fp_fn():
    gt = np.zeros((10, 10), np.int64)
    gt[:5] = 1
    pred = np.zeros((10, 10), np.int64)
    pred[:5] = 1
    ev = PanopticQualityEvaluator(num_categories=4)
    ev.process_single(pred, [{"id": 1, "category_id": 2}],
                      gt, [{"id": 1, "category_id": 3}])
    res = ev.evaluate()["panoptic_seg"]
    assert res["PQ"] == 0.0
    # cat3: FN (denom 0.5); cat2: the pred overlaps labeled GT, so it
    # counts as FP -> both categories enter the average with PQ 0
    assert res["N"] == 2


def test_merge_states():
    gt = np.zeros((8, 8), np.int64)
    gt[:4] = 1
    infos = [{"id": 1, "category_id": 0}]
    a = PanopticQualityEvaluator(2)
    a.process_single(gt, infos, gt, infos)
    b = PanopticQualityEvaluator(2)
    merged = PanopticQualityEvaluator(2)
    merged.merge_states([a.state_dict(), b.state_dict()])
    assert merged.evaluate() == a.evaluate()
