"""LVIS federated evaluation + RepeatFactorTrainingSampler + COCO/LVIS CLI
evaluator dispatch (reference lvis_evaluation.py,
distributed_sampler.py:173-257, projects/WSL/tools/train_net.py:119-167)."""

import numpy as np

from drn_wsod_tpu.data.loader import (TrainLoader,
                                      repeat_factors_from_category_frequency)
from drn_wsod_tpu.evaluation.lvis_eval import LVISDetectionEvaluator

BOX = [10.0, 10.0, 50.0, 50.0]
OFF = [60.0, 60.0, 90.0, 90.0]


def _eval(dets_by_image, gt, info=None, names=("a", "b")):
    ev = LVISDetectionEvaluator(list(names), gt, info)
    for img, (boxes, scores, classes) in dets_by_image.items():
        ev.process_single(img, np.asarray(boxes, np.float32),
                          np.asarray(scores, np.float32),
                          np.asarray(classes))
    return ev.evaluate()


def test_lvis_federated_ignores_unverified_images():
    gt = {
        "im0": [{"category_id": 0, "bbox": BOX}],
        "im1": [],   # NOT verified for class 0 (no pos, no neg)
    }
    perfect = {"im0": ([BOX], [0.9], [0])}
    base = _eval(perfect, gt)["AP"]
    assert base == 100.0

    # a false positive on an UNVERIFIED image must not change AP ...
    with_fp = {"im0": ([BOX], [0.9], [0]),
               "im1": ([OFF], [0.95], [0])}
    assert _eval(with_fp, gt)["AP"] == base

    # ... but on an image where class 0 is verified-negative it is an FP
    info = {"im1": {"neg_category_ids": [0],
                    "not_exhaustive_category_ids": []}}
    assert _eval(with_fp, gt, info)["AP"] < base


def test_lvis_not_exhaustive_ignores_unmatched_dets():
    gt = {"im0": [{"category_id": 0, "bbox": BOX}]}
    info = {"im0": {"neg_category_ids": [],
                    "not_exhaustive_category_ids": [0]}}
    # matched det is a TP; the extra unmatched det is IGNORED, not an FP
    dets = {"im0": ([BOX, OFF], [0.9, 0.95], [0, 0])}
    assert _eval(dets, gt, info)["AP"] == 100.0
    # without the not-exhaustive flag, the extra det is an FP
    assert _eval(dets, gt)["AP"] < 100.0


def test_repeat_factors_math():
    # class 0 in 8/10 images, class 1 in 2/10; threshold 0.5
    records = []
    for i in range(10):
        cats = [0] if i < 8 else [1]
        records.append({"annotations": [
            {"category_id": c, "bbox": BOX} for c in cats]})
    rf = repeat_factors_from_category_frequency(records, repeat_thresh=0.5)
    # f(0)=0.8 >= t -> 1.0 ; f(1)=0.2 -> sqrt(0.5/0.2)
    np.testing.assert_allclose(rf[:8], 1.0)
    np.testing.assert_allclose(rf[8:], np.sqrt(0.5 / 0.2))


class _IdentityMapper:
    def __call__(self, record, rng, dataset_index=0):
        return {"image": np.zeros((4, 4, 3), np.float32),
                "image_hw": np.asarray([4, 4], np.int32),
                "orig_hw": np.asarray([4, 4], np.int32),
                "proposals": np.zeros((2, 4), np.float32),
                "proposal_mask": np.ones((2,), bool),
                "objectness": np.zeros((2,), np.float32),
                "labels": np.zeros((2,), np.float32),
                "gt_boxes": np.zeros((1, 4), np.float32),
                "gt_classes": np.zeros((1,), np.int32),
                "gt_valid": np.zeros((1,), bool),
                "image_id": np.asarray(dataset_index, np.int32),
                "_bucket": 4}

    def plan_bucket(self, record, rng):
        return 4


def test_repeat_factor_sampler_oversamples_rare():
    records = [{"annotations": [{"category_id": 0 if i < 8 else 1,
                                 "bbox": BOX}]} for i in range(10)]
    rf = repeat_factors_from_category_frequency(records, 0.5)
    ld = TrainLoader(records, _IdentityMapper(), batch_size=2, seed=0,
                     prefetch=0, process_index=0, process_count=1,
                     repeat_factors=rf)
    counts = np.zeros(10)
    it = iter(ld)
    for _ in range(200):
        b = next(it)
        for i in np.asarray(b.image_id):
            counts[int(i)] += 1
    rare_rate = counts[8:].mean()
    common_rate = counts[:8].mean()
    # rare images repeated ~sqrt(2.5) = 1.58x as often
    assert 1.2 < rare_rate / common_rate < 2.2, (rare_rate, common_rate)


def test_cli_build_evaluator_dispatch(tmp_path):
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import train_net

    from drn_wsod_tpu.config import get_cfg
    from drn_wsod_tpu.data import MetadataCatalog

    cfg = get_cfg()
    MetadataCatalog.get("t_coco").set(evaluator_type="coco",
                                      thing_classes=["a", "b"])
    MetadataCatalog.get("t_lvis").set(evaluator_type="lvis",
                                      thing_classes=["a", "b"],
                                      thing_frequencies=["r", "f"])
    recs = [{"image_id": "i0", "annotations": [],
             "neg_category_ids": [0], "not_exhaustive_category_ids": []}]
    ev_coco = train_net.build_evaluator(cfg, "t_coco", recs)
    ev_lvis = train_net.build_evaluator(cfg, "t_lvis", recs)
    from drn_wsod_tpu.evaluation.coco_eval import COCODetectionEvaluator

    assert isinstance(ev_coco, COCODetectionEvaluator)
    assert isinstance(ev_lvis, LVISDetectionEvaluator)
    assert ev_lvis._info["i0"]["neg_category_ids"] == [0]
