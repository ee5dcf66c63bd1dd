"""Dense-output evaluation plumbing: SemanticSegmentor -> mIoU loop,
PanopticFPN -> instance AP (+ mask AP) and PQ fusion loop, and the CLI
evaluator dispatch (reference tools/train_net.py:build_evaluator +
detectron2/evaluation/{sem_seg,panoptic}_evaluation.py)."""

import importlib.util
import json
import os
import pickle

import jax
import numpy as np
import pytest
from PIL import Image

from drn_wsod_tpu.config import get_cfg
from drn_wsod_tpu.data import (DatasetCatalog, DatasetMapper, MetadataCatalog,
                               build_detection_test_loader)
from drn_wsod_tpu.models import build_model

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _id2rgb(idmap):
    rgb = np.zeros((*idmap.shape, 3), np.uint8)
    rgb[..., 0] = idmap % 256
    rgb[..., 1] = (idmap // 256) % 256
    rgb[..., 2] = idmap // (256 * 256)
    return rgb


def _semseg_cfg():
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "SemanticSegmentor"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.FPN.OUT_CHANNELS = 32
    cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 5
    cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM = 16
    cfg.MODEL.LOAD_PROPOSALS = False
    cfg.MODEL.DTYPE = "float32"
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.INPUT.MAX_SIZE_TEST = 64
    cfg.INPUT.BUCKETS = [64]
    cfg.DATALOADER.PREFETCH = 0
    return cfg


def _register_semseg(tmp_path, name):
    rng = np.random.RandomState(0)
    records = []
    for i in range(3):
        img_path = str(tmp_path / f"im{i}.png")
        Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)
                        ).save(img_path)
        sem_path = str(tmp_path / f"sem{i}.png")
        Image.fromarray(np.zeros((64, 64), np.uint8)).save(sem_path)
        records.append({"file_name": img_path, "image_id": i,
                        "height": 64, "width": 64,
                        "sem_seg_file_name": sem_path, "annotations": []})
    if name in DatasetCatalog:
        DatasetCatalog.remove(name)
    DatasetCatalog.register(name, lambda: records)
    MetadataCatalog.get(name).set(
        evaluator_type="sem_seg", ignore_label=255,
        stuff_classes=[f"s{i}" for i in range(5)])
    return records


@pytest.mark.slow
def test_sem_seg_eval_loop_self_consistent(tmp_path):
    """Write the model's own predictions as GT -> the eval loop must score
    mIoU == 100 (validates crop/resize/id geometry end to end)."""
    from drn_wsod_tpu.evaluation import (SemSegEvaluator, make_sem_seg_fn,
                                         sem_seg_inference_on_dataset)

    name = "semseg_test_ds"
    records = _register_semseg(tmp_path, name)
    cfg = _semseg_cfg()
    model = build_model(cfg)
    mapper = DatasetMapper(cfg, is_train=False)
    loader = build_detection_test_loader(cfg, name, mapper)

    batch0, _ = next(iter(loader))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           batch0, train=False)
    sem_fn = make_sem_seg_fn(model)

    # first pass: dump predictions as the GT label PNGs
    for batch, n_real in loader:
        pred = np.asarray(jax.device_get(sem_fn(variables, batch)))
        ids = np.asarray(jax.device_get(batch.image_id))
        for i in range(n_real):
            r = records[int(ids[i])]
            Image.fromarray(pred[i, :64, :64].astype(np.uint8)).save(
                r["sem_seg_file_name"])

    evaluator = SemSegEvaluator([f"s{i}" for i in range(5)])
    res = sem_seg_inference_on_dataset(
        sem_fn, variables, loader, evaluator, loader._records)
    np.testing.assert_allclose(res["sem_seg"]["mIoU"], 100.0, atol=1e-6)
    np.testing.assert_allclose(res["sem_seg"]["pACC"], 100.0, atol=1e-6)


def _make_panoptic_dataset(tmp_path):
    """Builtin-layout COCO panoptic-separated with 2 images."""
    rng = np.random.RandomState(0)
    root = tmp_path
    img_root = root / "imgs"
    pan_root = root / "pan"
    sem_root = root / "sem"
    for d in (img_root, pan_root, sem_root):
        os.makedirs(d, exist_ok=True)

    images, inst_annos, pan_annos = [], [], []
    ids, boxes_all, logits_all = [], [], []
    for i in range(2):
        name = f"{i:06d}.png"
        Image.fromarray(rng.randint(0, 255, (64, 64, 3), np.uint8)
                        ).save(img_root / name)
        images.append({"id": i, "file_name": name,
                       "height": 64, "width": 64})
        # one thing instance (category 1) + stuff background (category 10)
        x1, y1, w, h = 10, 10, 25, 25
        inst_annos.append({
            "id": i + 1, "image_id": i, "category_id": 1,
            "bbox": [x1, y1, w, h], "area": w * h, "iscrowd": 0,
            "segmentation": [[x1, y1, x1 + w, y1, x1 + w, y1 + h,
                              x1, y1 + h]]})
        idmap = np.full((64, 64), 2, np.int32)      # segment 2 = stuff
        idmap[y1:y1 + h, x1:x1 + w] = 1             # segment 1 = thing
        Image.fromarray(_id2rgb(idmap)).save(pan_root / name)
        sem = np.full((64, 64), 1, np.uint8)        # stuff label 1
        sem[y1:y1 + h, x1:x1 + w] = 0               # 0 = special thing class
        Image.fromarray(sem).save(sem_root / name)
        pan_annos.append({
            "image_id": i, "file_name": name,
            "segments_info": [
                {"id": 1, "category_id": 1, "isthing": 1},
                {"id": 2, "category_id": 10, "isthing": 0}]})
        # proposals
        ids.append(i)
        pb = np.array([[x1, y1, x1 + w, y1 + h],
                       [5, 5, 50, 50], [0, 0, 63, 63],
                       [20, 20, 40, 40]], np.float32)
        boxes_all.append(pb)
        logits_all.append(rng.uniform(0, 1, len(pb)).astype(np.float32))

    inst_json = str(root / "instances.json")
    with open(inst_json, "w") as f:
        json.dump({"images": images, "annotations": inst_annos,
                   "categories": [{"id": 1, "name": "thing_a"}]}, f)
    pan_json = str(root / "panoptic.json")
    with open(pan_json, "w") as f:
        json.dump({"images": images, "annotations": pan_annos,
                   "categories": [{"id": 1, "name": "thing_a", "isthing": 1},
                                  {"id": 10, "name": "stuff_a",
                                   "isthing": 0}]}, f)
    prop_file = str(root / "props.pkl")
    with open(prop_file, "wb") as f:
        pickle.dump({"ids": ids, "boxes": boxes_all,
                     "objectness_logits": logits_all, "bbox_mode": 0}, f)
    return str(img_root), str(pan_root), pan_json, str(sem_root), \
        inst_json, prop_file


@pytest.mark.slow
def test_panoptic_eval_loops(tmp_path):
    """PanopticFPN through the dense eval plumbing: COCO bbox+segm AP and
    the PQ fusion loop both run and produce finite metrics."""
    from drn_wsod_tpu.data.datasets.coco import \
        register_coco_panoptic_separated
    from drn_wsod_tpu.evaluation import (inference_on_dataset,
                                         make_detect_fn, make_sem_seg_fn,
                                         panoptic_inference_on_dataset)
    from drn_wsod_tpu.evaluation.coco_eval import COCODetectionEvaluator
    from drn_wsod_tpu.evaluation.panoptic_eval import \
        PanopticQualityEvaluator

    img_root, pan_root, pan_json, sem_root, inst_json, prop_file = \
        _make_panoptic_dataset(tmp_path)
    name = "panoptic_test_ds"
    if name in DatasetCatalog:
        DatasetCatalog.remove(name)
    register_coco_panoptic_separated(name, img_root, pan_root, pan_json,
                                     sem_root, inst_json)

    cfg = _semseg_cfg()
    cfg.MODEL.META_ARCHITECTURE = "PanopticFPN"
    cfg.MODEL.LOAD_PROPOSALS = True
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 1
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 2
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 4

    model = build_model(cfg)
    mapper = DatasetMapper(cfg, is_train=False)
    loader = build_detection_test_loader(cfg, name, mapper,
                                         proposal_file=prop_file)
    records = loader._records
    assert all("pan_seg_file_name" in r and "sem_seg_file_name" in r
               and r["segments_info"] for r in records)

    batch0, _ = next(iter(loader))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           batch0, train=False)

    detect = make_detect_fn(model, score_thresh=0.0, nms_thresh=0.5,
                            topk=10, mask_on=True)
    evaluator = COCODetectionEvaluator(["thing_a"],
                                       {str(r["image_id"]): r["annotations"]
                                        for r in records},
                                       tasks=("bbox", "segm"))
    res = inference_on_dataset(detect, variables, loader, evaluator, records)
    assert "bbox" in res and "segm" in res
    for task in ("bbox", "segm"):
        assert np.isfinite(res[task]["AP50"]) or np.isnan(res[task]["AP50"])

    sem_fn = make_sem_seg_fn(model)
    pq_eval = PanopticQualityEvaluator(2)   # 1 thing + 2 stuff - 1
    loader2 = build_detection_test_loader(cfg, name, mapper,
                                          proposal_file=prop_file)
    pq = panoptic_inference_on_dataset(
        detect, sem_fn, variables, loader2, pq_eval, loader2._records,
        num_thing_classes=1)
    assert "panoptic" in pq or "PQ" in str(pq)


def test_build_evaluator_dispatch(tmp_path):
    """CLI evaluator dispatch covers every registered evaluator_type
    (reference tools/train_net.py:119-167)."""
    spec = importlib.util.spec_from_file_location(
        "train_net_mod", os.path.join(REPO, "tools", "train_net.py"))
    tn = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tn)

    from drn_wsod_tpu.evaluation import (CityscapesInstanceEvaluator,
                                         CityscapesSemSegEvaluator,
                                         RotatedCOCODetectionEvaluator,
                                         SemSegEvaluator)
    from drn_wsod_tpu.evaluation.coco_eval import COCODetectionEvaluator
    from drn_wsod_tpu.evaluation.voc_eval import PascalVOCDetectionEvaluator

    cfg = get_cfg()
    cfg.MODEL.MASK_ON = True
    records = [{"image_id": 0, "annotations": []}]
    cases = {
        "pascal_voc": PascalVOCDetectionEvaluator,
        "coco": COCODetectionEvaluator,
        "rotated_coco": RotatedCOCODetectionEvaluator,
        "sem_seg": SemSegEvaluator,
        "cityscapes_instance": CityscapesInstanceEvaluator,
        "cityscapes_sem_seg": CityscapesSemSegEvaluator,
    }
    for etype, klass in cases.items():
        name = f"dispatch_{etype}_ds"
        if name in DatasetCatalog:
            DatasetCatalog.remove(name)
        DatasetCatalog.register(name, lambda: records)
        MetadataCatalog.get(name).set(
            evaluator_type=etype, thing_classes=["a"], stuff_classes=["a"],
            year=2007)
        ev = tn.build_evaluator(cfg, name, records)
        assert isinstance(ev, klass), (etype, type(ev))
    # coco with MASK_ON carries the segm task
    ev = tn.build_evaluator(cfg, "dispatch_coco_ds", records)
    assert ev._tasks == ("bbox", "segm")
    # cityscapes_instance without masks falls back to COCO bbox AP
    cfg.MODEL.MASK_ON = False
    ev = tn.build_evaluator(cfg, "dispatch_cityscapes_instance_ds", records)
    assert isinstance(ev, COCODetectionEvaluator)
