"""LVIS AP evaluation (federated-annotation protocol), self-contained.

Capability equivalent of the reference LVISEvaluator
(detectron2/evaluation/lvis_evaluation.py, which wraps the lvis-api): for a
category c, only images where c is exhaustively verified count — images with
positive annotations for c, plus images listing c in ``neg_category_ids``.
Detections of c elsewhere are neither TP nor FP. On images listing c in
``not_exhaustive_category_ids`` unmatched detections are ignored rather than
counted as FP. Reports AP/AP50/AP75 plus APr/APc/APf when per-category
frequency groups are available (LVIS v1 ``frequency`` field).

Shares the greedy COCO matcher and 101-point AP interpolation with
``coco_eval`` (detections capped at 300/image/category — the in-memory
analogue of LVIS max_dets=300).
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np

from .coco_eval import (IOU_THRS, _average_precision, _match_image)

MAX_DETS = 300


class LVISDetectionEvaluator:
    """Same process/evaluate API as the VOC/COCO evaluators."""

    def __init__(self, class_names: Sequence[str],
                 gt_by_image: Dict[str, List[dict]],
                 img_info_by_image: Optional[Dict[str, dict]] = None,
                 frequencies: Optional[Sequence[str]] = None):
        """img_info_by_image: image_id -> {"neg_category_ids": [...],
        "not_exhaustive_category_ids": [...]}. frequencies: per-class 'r'
        (rare), 'c' (common), 'f' (frequent)."""
        self._class_names = list(class_names)
        self._gt = gt_by_image
        self._info = img_info_by_image or {}
        self._freq = list(frequencies) if frequencies is not None else None
        self.reset()

    def reset(self):
        self._dets = defaultdict(lambda: defaultdict(list))

    def process_single(self, image_id: str, boxes, scores, classes,
                       valid=None):
        for i in range(len(scores)):
            if valid is not None and not valid[i]:
                continue
            self._dets[int(classes[i])][image_id].append(
                (float(scores[i]), *[float(v) for v in boxes[i]]))

    def state_dict(self):
        return {c: {img: list(d) for img, d in per.items()}
                for c, per in self._dets.items()}

    def merge_states(self, states):
        for st in states:
            for c, per in st.items():
                for img, d in per.items():
                    self._dets[int(c)][img].extend(d)

    def _eval_images(self, cls_id) -> List[str]:
        """Federated evaluation set for a category: positively annotated
        images + images where the category was verified absent."""
        out = []
        for image_id, annos in self._gt.items():
            pos = any(a["category_id"] == cls_id for a in annos)
            neg = cls_id in self._info.get(image_id, {}).get(
                "neg_category_ids", [])
            if pos or neg:
                out.append(image_id)
        return out

    def evaluate(self) -> Dict[str, float]:
        per_class = []
        for cls_id, _name in enumerate(self._class_names):
            tps, igns, scs = [], [], []
            npos = 0
            for image_id in self._eval_images(cls_id):
                annos = self._gt.get(image_id, [])
                gt = [a for a in annos if a["category_id"] == cls_id]
                gt_boxes = np.array([a["bbox"] for a in gt],
                                    dtype=np.float64).reshape(-1, 4)
                gt_ignore = np.zeros(len(gt), dtype=bool)
                npos += len(gt)
                d = self._dets[cls_id].get(image_id, [])
                if not d and not gt:
                    continue
                d = np.array(d, dtype=np.float64).reshape(-1, 5)
                tp, ign, s = _match_image(d[:, 1:], d[:, 0], gt_boxes,
                                          gt_ignore, IOU_THRS, MAX_DETS)
                if cls_id in self._info.get(image_id, {}).get(
                        "not_exhaustive_category_ids", []):
                    ign = ign | ~tp       # unmatched dets are not FPs here
                tps.append(tp); igns.append(ign); scs.append(s)
            if tps:
                per_class.append(_average_precision(
                    np.concatenate(tps, axis=1), np.concatenate(igns, axis=1),
                    np.concatenate(scs), npos))
            else:
                per_class.append(np.full(len(IOU_THRS), np.nan))
        ap = np.stack(per_class)                        # (C, T)

        with np.errstate(invalid="ignore"):
            results = {
                "AP": float(np.nanmean(ap) * 100),
                "AP50": float(np.nanmean(ap[:, 0]) * 100),
                "AP75": float(np.nanmean(ap[:, 5]) * 100),
            }
            if self._freq:
                for tag, key in (("r", "APr"), ("c", "APc"), ("f", "APf")):
                    sel = [i for i, f in enumerate(self._freq) if f == tag]
                    results[key] = (float(np.nanmean(ap[sel]) * 100)
                                    if sel else float("nan"))
        return results
