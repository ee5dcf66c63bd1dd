"""Data pipeline tests: VOC loader, proposal attach, mapper, bucketed
loaders (reference pattern: tests/data/)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))
from test_e2e_train import CLASSES, make_voc_dataset, tiny_e2e_cfg  # noqa: E402

from drn_wsod_tpu.data import (DatasetCatalog, DatasetMapper,  # noqa: E402
                               build_detection_test_loader,
                               build_detection_train_loader,
                               get_detection_dataset_dicts)
from drn_wsod_tpu.data.datasets.voc import (load_voc_instances,  # noqa: E402
                                            register_pascal_voc)

import pytest  # noqa: E402

pytestmark = pytest.mark.core


def setup_ds(tmp_path, name_prefix):
    d, prop_file = make_voc_dataset(str(tmp_path))
    names = (f"{name_prefix}_train", f"{name_prefix}_test")
    for n in names:
        if n in DatasetCatalog:
            DatasetCatalog.remove(n)
    register_pascal_voc(names[0], d, "train", 2007, CLASSES)
    register_pascal_voc(names[1], d, "test", 2007, CLASSES)
    return d, prop_file, names


def test_load_voc_instances(tmp_path):
    d, _, _ = setup_ds(tmp_path, "dp0")
    recs = load_voc_instances(d, "train", CLASSES)
    assert len(recs) == 5
    r = recs[0]
    assert r["height"] == 64 and r["width"] == 64
    assert len(r["annotations"]) == 1
    a = r["annotations"][0]
    assert 0 <= a["category_id"] < len(CLASSES)
    x1, y1, x2, y2 = a["bbox"]
    assert x2 > x1 and y2 > y1


def test_proposals_attached_sorted(tmp_path):
    _, prop_file, names = setup_ds(tmp_path, "dp1")
    recs = get_detection_dataset_dicts([names[0]], [prop_file])
    r = recs[0]
    assert "proposal_boxes" in r
    logits = r["proposal_objectness_logits"]
    assert (np.diff(logits) <= 1e-6).all()  # descending


def test_mapper_static_shapes(tmp_path):
    _, prop_file, names = setup_ds(tmp_path, "dp2")
    cfg = tiny_e2e_cfg(tmp_path, prop_file)
    cfg.DATASETS.TRAIN = (names[0],)
    mapper = DatasetMapper(cfg, is_train=True)
    recs = get_detection_dataset_dicts([names[0]], [prop_file])
    rng = np.random.RandomState(0)
    s = mapper(recs[0], rng)
    P = cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE
    assert s["image"].shape == (64, 64, 3)
    assert s["proposals"].shape == (P, 4)
    assert s["proposal_mask"].sum() > 0
    assert s["labels"].shape == (2,)
    assert s["gt_valid"].sum() == 1


def test_train_loader_batches(tmp_path):
    _, prop_file, names = setup_ds(tmp_path, "dp3")
    cfg = tiny_e2e_cfg(tmp_path, prop_file)
    cfg.DATASETS.TRAIN = (names[0],)
    cfg.DATALOADER.PREFETCH = 0
    loader = build_detection_train_loader(cfg, DatasetMapper(cfg, True))
    it = iter(loader)
    for _ in range(3):
        b = next(it)
        assert b.image.shape[0] == cfg.SOLVER.IMS_PER_BATCH
        assert b.proposals.shape[1] == cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE


def test_test_loader_covers_all_once(tmp_path):
    _, prop_file, names = setup_ds(tmp_path, "dp4")
    cfg = tiny_e2e_cfg(tmp_path, prop_file)
    cfg.DATASETS.TEST = (names[1],)
    cfg.DATASETS.PROPOSAL_FILES_TEST = (prop_file,)
    cfg.DATALOADER.PREFETCH = 0
    loader = build_detection_test_loader(cfg, names[1],
                                         DatasetMapper(cfg, False),
                                         batch_size=2)
    seen = []
    for batch, n_real in loader:
        ids = np.asarray(batch.image_id)[:n_real]
        seen.extend(ids.tolist())
    assert sorted(seen) == list(range(5))


def test_mapper_dense_gt(tmp_path):
    """MASK_ON/KEYPOINT_ON/sem_seg_file_name produce padded dense GT
    (reference dataset_mapper.py use_instance_mask / use_keypoint)."""
    import numpy as np
    from PIL import Image as PILImage

    from drn_wsod_tpu.config import get_cfg
    from drn_wsod_tpu.data.mapper import DatasetMapper

    img_path = str(tmp_path / "img.png")
    PILImage.fromarray(np.zeros((48, 64, 3), np.uint8)).save(img_path)
    sem_path = str(tmp_path / "sem.png")
    sem = np.zeros((48, 64), np.uint8)
    sem[:24] = 3
    PILImage.fromarray(sem).save(sem_path)

    cfg = get_cfg()
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.KEYPOINT_ON = True
    cfg.MODEL.ROI_KEYPOINT_HEAD.NUM_KEYPOINTS = 4
    cfg.INPUT.MIN_SIZE_TEST = 48
    cfg.INPUT.MAX_SIZE_TEST = 64
    cfg.INPUT.BUCKETS = [64]
    record = {
        "file_name": img_path,
        "sem_seg_file_name": sem_path,
        "height": 48, "width": 64, "image_id": 0,
        "annotations": [{
            "category_id": 1,
            "bbox": [8, 8, 40, 40],
            "bbox_mode": "XYXY_ABS",
            "difficult": 0,
            "segmentation": [[8, 8, 40, 8, 40, 40, 8, 40]],
            "keypoints": [10, 10, 2, 20, 20, 2, 30, 30, 2, 0, 0, 0],
        }],
    }
    mapper = DatasetMapper(cfg, is_train=False)
    out = mapper(record, np.random.RandomState(0))

    masks = out["gt_masks"]
    assert masks.shape[1:] == (64, 64)
    # polygon interior rasterized for the first GT slot
    assert masks[0, 20, 20] == 1.0 and masks[0, 50, 50] == 0.0
    assert masks[1].sum() == 0

    kps = out["gt_keypoints"]
    assert kps.shape == (masks.shape[0], 4, 3)
    np.testing.assert_allclose(kps[0, 0], [10, 10, 2])
    assert kps[0, 3, 2] == 0          # invisible slot

    sem_out = out["sem_seg"]
    assert sem_out.shape == (64, 64)
    assert sem_out[10, 10] == 3 and sem_out[40, 10] == 0
    assert sem_out[60, 60] == 255     # padding is ignore


def test_collate_yields_host_arrays():
    """_collate must return HOST (numpy) batches: jnp leaves would upload
    every batch through a remote-TPU tunnel at collate time and the chunked
    trainer's stack step would pull each one BACK to stack it — a measured
    ~500 ms/img round-trip on a degraded link (round-5 collate bug)."""
    import numpy as np

    from drn_wsod_tpu.data.loader import _collate

    samples = [{"image": np.zeros((8, 8, 3), np.uint8),
                "image_hw": np.asarray([8, 8], np.int32),
                "orig_hw": np.asarray([8, 8], np.int32),
                "proposals": np.zeros((4, 4), np.float32),
                "proposal_mask": np.ones((4,), bool),
                "objectness": np.zeros((4,), np.float32),
                "labels": np.zeros((3,), np.float32),
                "image_id": np.asarray(i, np.int32),
                "gt_boxes": np.zeros((2, 4), np.float32),
                "gt_classes": np.zeros((2,), np.int32),
                "gt_valid": np.zeros((2,), bool),
                "_bucket": 8} for i in range(2)]
    batch = _collate(samples)
    for name in ("image", "proposals", "proposal_mask", "labels"):
        leaf = getattr(batch, name)
        assert type(leaf) is np.ndarray, (name, type(leaf))
    assert batch.image.shape == (2, 8, 8, 3)
