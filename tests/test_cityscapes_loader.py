"""Cityscapes loader on a synthetic gtFine tree (reference
data/datasets/cityscapes.py semantics: polygons json -> instances,
group labels -> iscrowd ignore regions, labelIds for semantic records)."""

import json
import os

import numpy as np
from PIL import Image

from drn_wsod_tpu.data.datasets.cityscapes import (
    CITYSCAPES_THING_CLASSES, load_cityscapes_instances,
    load_cityscapes_semantic, register_all_cityscapes)
from drn_wsod_tpu.data.catalog import DatasetCatalog, MetadataCatalog


def _make_tree(root):
    img_dir = os.path.join(root, "leftImg8bit", "train", "city1")
    gt_dir = os.path.join(root, "gtFine", "train", "city1")
    os.makedirs(img_dir)
    os.makedirs(gt_dir)
    stem = "city1_000000_000000_"
    Image.fromarray(np.zeros((64, 96, 3), np.uint8)).save(
        os.path.join(img_dir, stem + "leftImg8bit.png"))
    ann = {
        "imgHeight": 64, "imgWidth": 96,
        "objects": [
            {"label": "car",
             "polygon": [[10, 10], [40, 10], [40, 30], [10, 30]]},
            {"label": "persongroup",             # crowd -> iscrowd=1
             "polygon": [[0, 0], [5, 0], [5, 5]]},
            {"label": "sky",                     # not a thing class
             "polygon": [[0, 0], [96, 0], [96, 10]]},
            {"label": "person", "deleted": 1,    # deleted -> skipped
             "polygon": [[1, 1], [2, 2], [1, 2]]},
            {"label": "bicycle",
             "polygon": [[50, 40], [80, 42], [70, 60]]},
        ],
    }
    with open(os.path.join(gt_dir, stem + "gtFine_polygons.json"), "w") as f:
        json.dump(ann, f)
    Image.fromarray(np.zeros((64, 96), np.uint8)).save(
        os.path.join(gt_dir, stem + "gtFine_labelIds.png"))
    return os.path.dirname(img_dir), os.path.dirname(gt_dir)


def test_load_instances(tmp_path):
    image_dir, gt_dir = _make_tree(str(tmp_path))
    dicts = load_cityscapes_instances(image_dir, gt_dir)
    assert len(dicts) == 1
    r = dicts[0]
    assert r["height"] == 64 and r["width"] == 96
    annos = r["annotations"]
    assert len(annos) == 3   # car + persongroup(crowd) + bicycle; sky/deleted skipped
    car = annos[0]
    assert car["category_id"] == CITYSCAPES_THING_CLASSES.index("car")
    assert car["bbox"] == [10, 10, 40, 30]
    assert car["iscrowd"] == 0
    assert len(car["segmentation"][0]) == 8      # flattened polygon coords
    crowd = annos[1]
    assert crowd["category_id"] == CITYSCAPES_THING_CLASSES.index("person")
    assert crowd["iscrowd"] == 1
    bike = annos[2]
    assert bike["bbox"] == [50, 40, 80, 60]


def test_load_semantic(tmp_path):
    image_dir, gt_dir = _make_tree(str(tmp_path))
    dicts = load_cityscapes_semantic(image_dir, gt_dir)
    assert len(dicts) == 1
    assert dicts[0]["sem_seg_file_name"].endswith("gtFine_labelIds.png")
    assert os.path.exists(dicts[0]["sem_seg_file_name"])


def test_register_all(tmp_path):
    register_all_cityscapes(str(tmp_path / "nonexistent"))
    assert "cityscapes_fine_instance_seg_train" in DatasetCatalog
    meta = MetadataCatalog.get("cityscapes_fine_instance_seg_val")
    assert meta.thing_classes == CITYSCAPES_THING_CLASSES
    assert "cityscapes_fine_sem_seg_train" in DatasetCatalog
