"""Cityscapes instance/semantic loaders.

Self-contained re-implementation of the reference loader
(detectron2/data/datasets/cityscapes.py): scans the
``leftImg8bit/<split>/<city>`` image tree against
``gtFine/<split>/<city>`` annotations and parses the
``*_gtFine_polygons.json`` files directly — no ``cityscapesscripts``
dependency (boxes come from polygon extents; polygons are kept verbatim in
the record for mask training). The 8 "thing" classes and the instance/void
semantics follow the Cityscapes label spec the reference inherits from
cityscapesscripts/helpers/labels.py.
"""

from __future__ import annotations

import json
import os
from typing import List

from ..catalog import DatasetCatalog, MetadataCatalog

# The 8 instance ("thing") classes, contiguous ids 0-7 (reference
# cityscapes_files_to_dict uses labels.py `hasInstances and not ignoreInEval`)
CITYSCAPES_THING_CLASSES = [
    "person", "rider", "car", "truck", "bus", "train", "motorcycle",
    "bicycle",
]

# group labels ("persongroup" etc.) mark crowd regions -> skipped like the
# reference's iscrowd handling when loading from json
_GROUP_SUFFIX = "group"


def _files(image_dir: str, gt_dir: str):
    out = []
    for city in sorted(os.listdir(image_dir)):
        city_img = os.path.join(image_dir, city)
        if not os.path.isdir(city_img):
            continue
        for basename in sorted(os.listdir(city_img)):
            suffix = "leftImg8bit.png"
            if not basename.endswith(suffix):
                continue
            stem = basename[:-len(suffix)]
            out.append((
                os.path.join(city_img, basename),
                os.path.join(gt_dir, city, stem + "gtFine_polygons.json"),
                os.path.join(gt_dir, city, stem + "gtFine_labelIds.png"),
            ))
    return out


def load_cityscapes_instances(image_dir: str, gt_dir: str) -> List[dict]:
    """Instance-detection records from the polygon json (reference
    load_cityscapes_instances with from_json=True)."""
    name_to_id = {n: i for i, n in enumerate(CITYSCAPES_THING_CLASSES)}
    dicts = []
    for image_file, json_file, _ in _files(image_dir, gt_dir):
        with open(json_file) as f:
            ann = json.load(f)
        record = {
            "file_name": image_file,
            "height": ann["imgHeight"],
            "width": ann["imgWidth"],
            "image_id": os.path.basename(image_file)[:-len(
                "_leftImg8bit.png")],
        }
        annos = []
        for obj in ann["objects"]:
            if obj.get("deleted"):
                continue
            label = obj["label"]
            iscrowd = 0
            if label.endswith(_GROUP_SUFFIX):
                # crowd region (reference maps "xxxgroup" to iscrowd=1;
                # evaluators treat these as ignore regions)
                label = label[:-len(_GROUP_SUFFIX)]
                iscrowd = 1
            if label not in name_to_id:
                continue
            poly = obj["polygon"]
            xs = [p[0] for p in poly]
            ys = [p[1] for p in poly]
            annos.append({
                "category_id": name_to_id[label],
                "bbox": [min(xs), min(ys), max(xs), max(ys)],
                "bbox_mode": "XYXY_ABS",
                "difficult": 0,
                "iscrowd": iscrowd,
                "segmentation": [[c for p in poly for c in p]],
            })
        record["annotations"] = annos
        dicts.append(record)
    return dicts


def load_cityscapes_semantic(image_dir: str, gt_dir: str) -> List[dict]:
    """Semantic-segmentation records: image + labelIds map path (reference
    load_cityscapes_semantic; the train-id conversion is done by the
    consumer, as in the reference's note that it expects *labelTrainIds*)."""
    dicts = []
    for image_file, json_file, label_file in _files(image_dir, gt_dir):
        with open(json_file) as f:
            ann = json.load(f)
        dicts.append({
            "file_name": image_file,
            "sem_seg_file_name": label_file,
            "height": ann["imgHeight"],
            "width": ann["imgWidth"],
            "image_id": os.path.basename(image_file)[:-len(
                "_leftImg8bit.png")],
        })
    return dicts


_SPLITS = {
    "cityscapes_fine_instance_seg_train": ("leftImg8bit/train", "gtFine/train"),
    "cityscapes_fine_instance_seg_val": ("leftImg8bit/val", "gtFine/val"),
    "cityscapes_fine_instance_seg_test": ("leftImg8bit/test", "gtFine/test"),
}


def register_all_cityscapes(root: str = "datasets"):
    """Builtin registrations (reference data/datasets/builtin.py:
    register_all_cityscapes)."""
    for name, (img, gt) in _SPLITS.items():
        if name in DatasetCatalog:
            continue
        image_dir = os.path.join(root, "cityscapes", img)
        gt_dir = os.path.join(root, "cityscapes", gt)
        DatasetCatalog.register(
            name, lambda i=image_dir, g=gt_dir: load_cityscapes_instances(i, g))
        MetadataCatalog.get(name).set(
            thing_classes=list(CITYSCAPES_THING_CLASSES),
            image_dir=image_dir, gt_dir=gt_dir,
            evaluator_type="cityscapes_instance")
        sem_name = name.replace("instance_seg", "sem_seg")
        DatasetCatalog.register(
            sem_name,
            lambda i=image_dir, g=gt_dir: load_cityscapes_semantic(i, g))
        MetadataCatalog.get(sem_name).set(
            image_dir=image_dir, gt_dir=gt_dir,
            evaluator_type="cityscapes_sem_seg")
