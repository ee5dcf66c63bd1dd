#!/usr/bin/env python
"""Convert Selective-Search / MCG proposal files into the framework's pickle
format (same layout as the reference tool,
projects/WSL/tools/proposal_convert.py: {"ids", "boxes", "objectness_logits",
"bbox_mode"}).

Usage:
  python tools/proposal_convert.py ss  voc_2007_train SS.mat out.pkl
  python tools/proposal_convert.py mcg voc_2007_train mcg_dir/ out.pkl
"""

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from drn_wsod_tpu.data import DatasetCatalog  # noqa: E402
from drn_wsod_tpu.data.datasets.voc import register_all_pascal_voc  # noqa: E402


def convert_ss_box(dataset_name: str, mat_path: str, out_path: str):
    """Selective-Search .mat: 1-indexed (y1, x1, y2, x2) -> 0-indexed
    XYXY (reference proposal_convert.py:38-40). Scores are all-ONES, as in
    the reference (:41) — they feed the WSDDN (objectness+1) feature scale,
    so the constant matters numerically."""
    from scipy.io import loadmat

    data = loadmat(mat_path)
    raw_boxes = data["boxes"].ravel()
    raw_images = data.get("images")
    records = DatasetCatalog.get(dataset_name)

    ids, boxes, scores = [], [], []
    index = {}
    if raw_images is not None:
        for i, im in enumerate(raw_images.ravel()):
            index[str(np.squeeze(im))] = i
    for j, r in enumerate(records):
        i = index.get(str(r["image_id"]), j)
        b = raw_boxes[i].astype(np.float32)
        b = b[:, (1, 0, 3, 2)] - 1.0          # y1x1y2x2 (1-based) -> x1y1x2y2
        ids.append(r["image_id"])
        boxes.append(b)
        scores.append(np.ones(len(b), dtype=np.float32))
    _dump(ids, boxes, scores, out_path)


def _mcg_key(record: dict, dataset_name: str) -> str:
    """Per-image MCG filename stem: image_id for VOC-style datasets, the
    file_name basename for coco/flickr (reference proposal_convert.py:67-73)."""
    if "flickr" in dataset_name or "coco" in dataset_name:
        return os.path.splitext(os.path.basename(record["file_name"]))[0]
    return str(record["image_id"])


def convert_mcg_box(dataset_name: str, mcg_dir: str, out_path: str):
    """MCG per-image .mat files with 'boxes' (y1, x1, y2, x2 1-based) and
    'scores' — or 'bboxes'/'bboxes_scores' for the flickr web datasets
    (reference proposal_convert.py:53-97)."""
    from scipy.io import loadmat

    records = DatasetCatalog.get(dataset_name)
    ids, boxes, scores = [], [], []
    for r in records:
        m = loadmat(os.path.join(mcg_dir, f"{_mcg_key(r, dataset_name)}.mat"))
        if "flickr" in dataset_name:
            raw_b, raw_s = m["bboxes"], m["bboxes_scores"]
        else:
            raw_b, raw_s = m["boxes"], m["scores"]
        b = raw_b.astype(np.float32)
        b = b[:, (1, 0, 3, 2)] - 1.0
        s = np.squeeze(raw_s).astype(np.float32)
        ids.append(r["image_id"])
        boxes.append(b)
        scores.append(s)
    _dump(ids, boxes, scores, out_path)


def _dump(ids, boxes, scores, out_path):
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with open(out_path, "wb") as f:
        pickle.dump({"ids": ids, "boxes": boxes,
                     "objectness_logits": scores, "bbox_mode": 0}, f)
    print(f"Wrote {len(ids)} images of proposals to {out_path}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("method", choices=["ss", "mcg"])
    p.add_argument("dataset")
    p.add_argument("src")
    p.add_argument("out")
    args = p.parse_args()
    register_all_pascal_voc(os.environ.get("DETECTRON2_DATASETS", "datasets"))
    if args.method == "ss":
        convert_ss_box(args.dataset, args.src, args.out)
    else:
        convert_mcg_box(args.dataset, args.src, args.out)
