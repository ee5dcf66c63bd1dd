"""Cityscapes-native evaluators (reference
detectron2/evaluation/cityscapes_evaluation.py semantics, computed
in-memory): labelId->trainId mapping, 19-class pixel IoU, instance-mask AP
with crowd-region ignore."""

import numpy as np

from drn_wsod_tpu.evaluation import (CityscapesInstanceEvaluator,
                                     CityscapesSemSegEvaluator,
                                     label_ids_to_train_ids)
from drn_wsod_tpu.evaluation.cityscapes_eval import (
    CITYSCAPES_SEM_SEG_CLASSES)


def test_label_id_mapping():
    ids = np.array([[0, 7, 8], [26, 24, 33], [9, 255, 31]])
    train = label_ids_to_train_ids(ids)
    # void/ignoreInEval -> 255; road 7->0, sidewalk 8->1, car 26->13,
    # person 24->11, bicycle 33->18, train 31->16, parking 9 -> ignore
    assert train.tolist() == [[255, 0, 1], [13, 11, 18], [255, 255, 16]]
    assert len(CITYSCAPES_SEM_SEG_CLASSES) == 19
    assert CITYSCAPES_SEM_SEG_CLASSES[0] == "road"
    assert CITYSCAPES_SEM_SEG_CLASSES[13] == "car"


def test_sem_seg_evaluator_perfect_and_half():
    ev = CityscapesSemSegEvaluator()
    gt_ids = np.full((8, 8), 7, np.uint8)        # road everywhere
    gt_ids[:, 4:] = 26                           # right half car
    gt_ids[0, 0] = 0                             # one void pixel
    perfect = label_ids_to_train_ids(gt_ids)
    perfect = np.where(perfect == 255, 0, perfect)
    ev.process_single(perfect, gt_ids)
    res = ev.evaluate()["sem_seg"]
    assert res["mIoU"] == 100.0 and res["pACC"] == 100.0

    ev.reset()
    pred = np.zeros((8, 8), np.int64)            # all road
    ev.process_single(pred, gt_ids)
    res = ev.evaluate()["sem_seg"]
    # road: tp=31 (road GT pixels, one void excluded), fp=32 (car pixels
    # predicted road) -> IoU 31/63; car IoU 0 -> mIoU over the 2 classes
    assert abs(res["mIoU"] - 100.0 * (31 / 63) / 2) < 1e-6
    assert abs(res["pACC"] - 100.0 * 31 / 63) < 1e-6


def _mask(h, w, y0, y1, x0, x1):
    m = np.zeros((h, w), bool)
    m[y0:y1, x0:x1] = True
    return m


def test_instance_evaluator_perfect():
    gt = {"img0": [
        {"category_id": 2, "iscrowd": 0,
         "segmentation": [[4, 4, 20, 4, 20, 16, 4, 16]],
         "bbox": [4, 4, 20, 16]},
        {"category_id": 0, "iscrowd": 0,
         "segmentation": [[30, 30, 44, 30, 44, 44, 30, 44]],
         "bbox": [30, 30, 44, 44]},
    ]}
    ev = CityscapesInstanceEvaluator(["person", "rider", "car"], gt)
    # PIL polygon rasterization includes the outline -> masks span
    # [x0, x1] x [y0, y1] inclusive
    masks = np.stack([_mask(64, 64, 4, 17, 4, 21),
                      _mask(64, 64, 30, 45, 30, 45)])
    ev.process_single("img0", np.zeros((2, 4)), np.array([0.9, 0.8]),
                      np.array([2, 0]), valid=np.array([True, True]),
                      masks=masks)
    res = ev.evaluate()["segm"]
    assert res["AP"] == 100.0 and res["AP50"] == 100.0


def test_instance_evaluator_crowd_ignored_and_miss():
    gt = {"img0": [
        {"category_id": 0, "iscrowd": 0,
         "segmentation": [[4, 4, 20, 4, 20, 16, 4, 16]],
         "bbox": [4, 4, 20, 16]},
        {"category_id": 0, "iscrowd": 1,          # crowd: ignore region
         "segmentation": [[40, 40, 60, 40, 60, 60, 40, 60]],
         "bbox": [40, 40, 60, 60]},
        {"category_id": 0, "iscrowd": 0,          # missed instance
         "segmentation": [[30, 4, 40, 4, 40, 12, 30, 12]],
         "bbox": [30, 4, 40, 12]},
    ]}
    ev = CityscapesInstanceEvaluator(["person"], gt)
    masks = np.stack([
        _mask(64, 64, 4, 17, 4, 21),     # matches GT 0
        _mask(64, 64, 40, 61, 40, 61),   # hits the crowd region -> ignored
    ])
    ev.process_single("img0", np.zeros((2, 4)), np.array([0.9, 0.7]),
                      np.array([0, 0]), valid=np.array([True, True]),
                      masks=masks)
    res = ev.evaluate()["segm"]
    # 1 of 2 real instances found at precision 1, crowd hit doesn't count
    # as FP: 101-point AP = 51/101 (recall grid points <= 0.5)
    assert abs(res["AP50"] - 100.0 * 51 / 101) < 1e-6
    assert 0.0 < res["AP"] <= res["AP50"]


def test_instance_evaluator_multihost_merge():
    gt = {"a": [{"category_id": 0, "iscrowd": 0,
                 "segmentation": [[2, 2, 10, 2, 10, 10, 2, 10]],
                 "bbox": [2, 2, 10, 10]}],
          "b": [{"category_id": 0, "iscrowd": 0,
                 "segmentation": [[2, 2, 10, 2, 10, 10, 2, 10]],
                 "bbox": [2, 2, 10, 10]}]}
    ev1 = CityscapesInstanceEvaluator(["person"], gt)
    ev2 = CityscapesInstanceEvaluator(["person"], gt)
    m = np.stack([_mask(16, 16, 2, 11, 2, 11)])
    ev1.process_single("a", np.zeros((1, 4)), np.array([0.9]),
                       np.array([0]), masks=m)
    ev2.process_single("b", np.zeros((1, 4)), np.array([0.8]),
                       np.array([0]), masks=m)
    ev1.merge_states([ev2.state_dict()])
    res = ev1.evaluate()["segm"]
    assert res["AP50"] == 100.0
