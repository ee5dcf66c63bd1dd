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
            x, y, w, h = a["bbox"]
            anno = {
                "category_id": id_map[a["category_id"]],
                "bbox": [x, y, x + w, y + h],
                "bbox_mode": "XYXY_ABS",
                # crowd regions are excluded from training (the mapper skips
                # difficult annos) and ignored at evaluation, matching the
                # reference COCOEvaluator's iscrowd handling
                "difficult": int(a.get("iscrowd", 0)),
                "iscrowd": int(a.get("iscrowd", 0)),
            }
            # dense-GT fields for the mask/keypoint branches and the
            # segm/keypoints evaluator tasks
            if "segmentation" in a:
                anno["segmentation"] = a["segmentation"]
            if "keypoints" in a:
                anno["keypoints"] = a["keypoints"]
            if "area" in a:
                anno["area"] = a["area"]
            annos.append(anno)
        record["annotations"] = annos
        dicts.append(record)
    return dicts


def register_coco_instances(name: str, json_file: str, image_root: str):
    DatasetCatalog.register(
        name, lambda: load_coco_json(json_file, image_root, name))
    MetadataCatalog.get(name).set(
        json_file=json_file, image_root=image_root, evaluator_type="coco")


def load_coco_panoptic_separated(panoptic_json: str, image_root: str,
                                 panoptic_root: str, sem_seg_root: str,
                                 instances_json: str,
                                 dataset_name: Optional[str] = None
                                 ) -> List[dict]:
    """COCO panoptic in the "separated" flavor (reference
    detectron2/data/datasets/coco_panoptic.py:register_coco_panoptic_separated):
    instance annotations feed the thing branch, per-pixel PNGs in
    ``sem_seg_root`` feed the stuff branch, and the panoptic id PNG +
    segments_info feed PQ evaluation.

    Category spaces: things are contiguous [0, n_thing); the sem-seg space
    is 0 = special "thing" class, stuff l in [1, n_stuff); segments_info
    category ids are converted to the combined PQ space
    (thing c -> c, stuff l -> n_thing + l - 1), matching
    evaluation.evaluator.panoptic_inference_on_dataset."""
    records = load_coco_json(instances_json, image_root, dataset_name)
    with open(panoptic_json) as f:
        pan = json.load(f)
    things = [c for c in pan.get("categories", []) if c.get("isthing")]
    stuffs = [c for c in pan.get("categories", []) if not c.get("isthing")]
    thing_map = {c["id"]: i for i, c in
                 enumerate(sorted(things, key=lambda c: c["id"]))}
    stuff_map = {c["id"]: i + 1 for i, c in
                 enumerate(sorted(stuffs, key=lambda c: c["id"]))}
    n_thing = len(thing_map)
    if dataset_name is not None:
        MetadataCatalog.get(dataset_name).set(
            stuff_classes=["things"] + [
                c["name"] for c in sorted(stuffs, key=lambda c: c["id"])],
            stuff_dataset_id_to_contiguous_id=stuff_map)

    by_image = {p["image_id"]: p for p in pan.get("annotations", [])}
    for r in records:
        p = by_image.get(r["image_id"])
        if p is None:
            continue
        segments = []
        for s in p.get("segments_info", []):
            cid = s["category_id"]
            if cid in thing_map:
                cat, isthing = thing_map[cid], True
            elif cid in stuff_map:
                cat, isthing = n_thing + stuff_map[cid] - 1, False
            else:
                continue
            segments.append({"id": s["id"], "category_id": cat,
                             "isthing": isthing})
        r["pan_seg_file_name"] = os.path.join(panoptic_root, p["file_name"])
        r["segments_info"] = segments
        r["sem_seg_file_name"] = os.path.join(sem_seg_root, p["file_name"])
    return records


def register_coco_panoptic_separated(name: str, image_root: str,
                                     panoptic_root: str, panoptic_json: str,
                                     sem_seg_root: str, instances_json: str):
    DatasetCatalog.register(
        name, lambda: load_coco_panoptic_separated(
            panoptic_json, image_root, panoptic_root, sem_seg_root,
            instances_json, name))
    MetadataCatalog.get(name).set(
        panoptic_json=panoptic_json, image_root=image_root,
        panoptic_root=panoptic_root, sem_seg_root=sem_seg_root,
        json_file=instances_json, evaluator_type="coco_panoptic_seg")


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


_BUILTIN_COCO_PANOPTIC = {
    "coco_2017_train_panoptic_separated": (
        "coco/train2017", "coco/panoptic_train2017",
        "coco/annotations/panoptic_train2017.json",
        "coco/panoptic_stuff_train2017",
        "coco/annotations/instances_train2017.json"),
    "coco_2017_val_panoptic_separated": (
        "coco/val2017", "coco/panoptic_val2017",
        "coco/annotations/panoptic_val2017.json",
        "coco/panoptic_stuff_val2017",
        "coco/annotations/instances_val2017.json"),
}


def register_all_coco(root: str = "datasets"):
    for name, (image_root, json_file) in _BUILTIN_COCO.items():
        if name not in DatasetCatalog:
            register_coco_instances(
                name, os.path.join(root, json_file),
                os.path.join(root, image_root))
    for name, paths in _BUILTIN_COCO_PANOPTIC.items():
        if name not in DatasetCatalog:
            register_coco_panoptic_separated(
                name, *[os.path.join(root, p) for p in paths])
