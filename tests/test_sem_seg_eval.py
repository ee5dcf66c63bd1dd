"""SemSegEvaluator confusion-matrix metrics (reference
sem_seg_evaluation.py definitions) on hand-checkable label maps."""

import numpy as np

from drn_wsod_tpu.evaluation.sem_seg_eval import SemSegEvaluator


def test_perfect_prediction():
    ev = SemSegEvaluator(["bg", "cat"], ignore_label=255)
    gt = np.array([[0, 0], [1, 1]])
    ev.process_single(gt, gt)
    res = ev.evaluate()["sem_seg"]
    assert res["mIoU"] == 100.0
    assert res["pACC"] == 100.0
    assert res["IoU-cat"] == 100.0


def test_half_overlap_iou():
    ev = SemSegEvaluator(["bg", "cat"], ignore_label=255)
    gt = np.array([[1, 1, 0, 0]])
    pred = np.array([[1, 0, 0, 0]])
    ev.process_single(pred, gt)
    res = ev.evaluate()["sem_seg"]
    # cat: tp=1, union=2 -> 50; bg: tp=2, union=3 -> 66.7
    np.testing.assert_allclose(res["IoU-cat"], 50.0)
    np.testing.assert_allclose(res["IoU-bg"], 100 * 2 / 3)
    np.testing.assert_allclose(res["mIoU"], (50 + 100 * 2 / 3) / 2)
    np.testing.assert_allclose(res["pACC"], 75.0)


def test_ignore_label_excluded():
    ev = SemSegEvaluator(["bg", "cat"], ignore_label=255)
    gt = np.array([[1, 255, 255, 255]])
    pred = np.array([[1, 0, 0, 1]])  # predictions on void pixels ignored
    ev.process_single(pred, gt)
    res = ev.evaluate()["sem_seg"]
    assert res["pACC"] == 100.0
    assert res["IoU-cat"] == 100.0


def test_merge_states_equals_single_pass():
    rng = np.random.RandomState(0)
    gt = rng.randint(0, 3, (4, 16, 16))
    pred = rng.randint(0, 3, (4, 16, 16))
    names = ["a", "b", "c"]
    single = SemSegEvaluator(names)
    for p, g in zip(pred, gt):
        single.process_single(p, g)
    a, b = SemSegEvaluator(names), SemSegEvaluator(names)
    for p, g in zip(pred[:2], gt[:2]):
        a.process_single(p, g)
    for p, g in zip(pred[2:], gt[2:]):
        b.process_single(p, g)
    merged = SemSegEvaluator(names)
    merged.merge_states([a.state_dict(), b.state_dict()])
    assert single.evaluate() == merged.evaluate()
