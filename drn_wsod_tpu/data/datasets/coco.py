"""COCO-format json dataset loader
(reference: detectron2/data/datasets/coco.py:33-260, simplified to the boxes +
class labels WSOD needs; segmentation/keypoints are carried through opaquely).
"""

from __future__ import annotations

import json
import logging
import os
from typing import List, Optional

from ..catalog import DatasetCatalog, MetadataCatalog

logger = logging.getLogger(__name__)


def load_coco_json(json_file: str, image_root: str,
                   dataset_name: Optional[str] = None) -> List[dict]:
    with open(json_file) as f:
        coco = json.load(f)

    cats = sorted(coco.get("categories", []), key=lambda c: c["id"])
    cat_ids = [c["id"] for c in cats]
    id_map = {cid: i for i, cid in enumerate(cat_ids)}
    thing_classes = [c["name"] for c in cats]
    if dataset_name is not None:
        MetadataCatalog.get(dataset_name).set(
            thing_classes=thing_classes,
            thing_dataset_id_to_contiguous_id=id_map,
            json_file=json_file, image_root=image_root,
            evaluator_type="coco")

    anns_by_image = {}
    for a in coco.get("annotations", []):
        anns_by_image.setdefault(a["image_id"], []).append(a)

    dicts = []
    for img in coco["images"]:
        record = {
            "file_name": os.path.join(image_root, img["file_name"]),
            "height": img["height"],
            "width": img["width"],
            "image_id": img["id"],
        }
        annos = []
        for a in anns_by_image.get(img["id"], []):
            if a.get("iscrowd", 0):
                continue
            x, y, w, h = a["bbox"]
            annos.append({
                "category_id": id_map[a["category_id"]],
                "bbox": [x, y, x + w, y + h],
                "bbox_mode": "XYXY_ABS",
                "difficult": 0,
            })
        record["annotations"] = annos
        dicts.append(record)
    return dicts


def register_coco_instances(name: str, json_file: str, image_root: str):
    DatasetCatalog.register(
        name, lambda: load_coco_json(json_file, image_root, name))
    MetadataCatalog.get(name).set(
        json_file=json_file, image_root=image_root, evaluator_type="coco")


# builtin COCO registrations (reference detectron2/data/datasets/builtin.py)
_BUILTIN_COCO = {
    "coco_2014_train": ("coco/train2014",
                        "coco/annotations/instances_train2014.json"),
    "coco_2014_val": ("coco/val2014",
                      "coco/annotations/instances_val2014.json"),
    "coco_2017_train": ("coco/train2017",
                        "coco/annotations/instances_train2017.json"),
    "coco_2017_val": ("coco/val2017",
                      "coco/annotations/instances_val2017.json"),
}


def register_all_coco(root: str = "datasets"):
    for name, (image_root, json_file) in _BUILTIN_COCO.items():
        if name not in DatasetCatalog:
            register_coco_instances(
                name, os.path.join(root, json_file),
                os.path.join(root, image_root))
