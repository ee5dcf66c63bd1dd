"""COCO-style AP evaluation, self-contained.

Capability equivalent of the reference COCOEvaluator + its C++ fast path
(detectron2/evaluation/coco_evaluation.py, detectron2/layers/csrc/cocoeval/
cocoeval.cpp): AP@[.5:.95] with 101-point recall interpolation, per-area
ranges and max-detections caps, computed directly from in-memory arrays
(no pycocotools dependency in this image). The greedy matcher follows the
COCOeval rules: detections sorted by score match the best remaining GT with
IoU >= threshold; crowd/difficult handling reduced to the 'ignore' flag.
"""

from __future__ import annotations

import logging
from collections import defaultdict
from typing import Dict, List, Sequence

import numpy as np

logger = logging.getLogger(__name__)

IOU_THRS = np.linspace(0.5, 0.95, 10)
RECALL_THRS = np.linspace(0.0, 1.0, 101)
AREA_RANGES = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e10),
}


def _iou_matrix(det: np.ndarray, gt: np.ndarray) -> np.ndarray:
    if len(det) == 0 or len(gt) == 0:
        return np.zeros((len(det), len(gt)))
    lt = np.maximum(det[:, None, :2], gt[None, :, :2])
    rb = np.minimum(det[:, None, 2:], gt[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    a_d = (det[:, 2] - det[:, 0]) * (det[:, 3] - det[:, 1])
    a_g = (gt[:, 2] - gt[:, 0]) * (gt[:, 3] - gt[:, 1])
    union = a_d[:, None] + a_g[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def _match_image(det_boxes, det_scores, gt_boxes, gt_ignore, iou_thrs,
                 max_det, iou_fn=None):
    """Greedy per-image matching. Returns (tp (T, D), ignore_det (T, D),
    scores (D,)) for the top max_det detections."""
    order = np.argsort(-det_scores, kind="stable")[:max_det]
    det_boxes = det_boxes[order]
    det_scores = det_scores[order]
    D, G, T = len(det_boxes), len(gt_boxes), len(iou_thrs)
    ious = (iou_fn or _iou_matrix)(det_boxes, gt_boxes)
    tp = np.zeros((T, D), dtype=bool)
    ign = np.zeros((T, D), dtype=bool)
    for t, thr in enumerate(iou_thrs):
        taken = np.zeros(G, dtype=bool)
        for d in range(D):
            best, best_iou = -1, thr
            for g in range(G):
                if taken[g] and not gt_ignore[g]:
                    continue
                if ious[d, g] >= best_iou:
                    # prefer non-ignored matches (cocoeval rule)
                    if best > -1 and not gt_ignore[best] and gt_ignore[g]:
                        continue
                    best, best_iou = g, ious[d, g]
            if best > -1:
                if gt_ignore[best]:
                    ign[t, d] = True
                else:
                    tp[t, d] = True
                    taken[best] = True
    return tp, ign, det_scores


def _average_precision(tp, ign, scores, npos):
    """PR curve -> 101-point interpolated AP for each IoU threshold."""
    T = tp.shape[0]
    aps = np.full(T, np.nan)
    if npos == 0:
        return aps
    for t in range(T):
        keep = ~ign[t]
        tps = tp[t][keep]
        s = scores[keep]
        order = np.argsort(-s, kind="stable")
        tps = tps[order]
        tp_cum = np.cumsum(tps)
        fp_cum = np.cumsum(~tps)
        rec = tp_cum / npos
        prec = tp_cum / np.maximum(tp_cum + fp_cum, 1e-12)
        # precision envelope
        for i in range(len(prec) - 1, 0, -1):
            prec[i - 1] = max(prec[i - 1], prec[i])
        idx = np.searchsorted(rec, RECALL_THRS, side="left")
        p = np.zeros(len(RECALL_THRS))
        valid = idx < len(prec)
        p[valid] = prec[idx[valid]]
        aps[t] = p.mean()
    return aps


class COCODetectionEvaluator:
    """Same process/evaluate API as the VOC evaluator."""

    def __init__(self, class_names: Sequence[str],
                 gt_by_image: Dict[str, List[dict]]):
        self._class_names = list(class_names)
        self._gt = gt_by_image
        self.reset()

    def reset(self):
        self._dets = defaultdict(lambda: defaultdict(list))  # cls -> img -> []

    def process_single(self, image_id: str, boxes, scores, classes,
                       valid=None):
        for i in range(len(scores)):
            if valid is not None and not valid[i]:
                continue
            self._dets[int(classes[i])][image_id].append(
                (float(scores[i]), *[float(v) for v in boxes[i]]))

    def state_dict(self):
        """Picklable accumulated predictions (for multi-host gather)."""
        return {c: {img: list(d) for img, d in per.items()}
                for c, per in self._dets.items()}

    def merge_states(self, states):
        for st in states:
            for c, per in st.items():
                for img, d in per.items():
                    self._dets[int(c)][img].extend(d)

    # geometry hooks (overridden by the rotated variant)
    _box_dim = 4
    _iou_fn = staticmethod(_iou_matrix)

    @staticmethod
    def _box_areas(boxes: np.ndarray) -> np.ndarray:
        return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

    def evaluate(self) -> Dict[str, Dict[str, float]]:
        per_class_ap = {}     # cls -> (T, A) AP array
        results = {}
        BD = self._box_dim
        for area_name, (lo, hi) in AREA_RANGES.items():
            ap_list = []
            for cls_id, _ in enumerate(self._class_names):
                tps, igns, scs = [], [], []
                npos = 0
                for image_id, annos in self._gt.items():
                    gt = [a for a in annos if a["category_id"] == cls_id]
                    gt_boxes = np.array([a["bbox"] for a in gt],
                                        dtype=np.float64).reshape(-1, BD)
                    areas = self._box_areas(gt_boxes)
                    gt_ignore = np.array(
                        [bool(a.get("difficult", 0)) for a in gt],
                        dtype=bool) | (areas < lo) | (areas >= hi)
                    npos += int((~gt_ignore).sum())
                    d = self._dets[cls_id].get(image_id, [])
                    if not d and len(gt) == 0:
                        continue
                    d = np.array(d, dtype=np.float64).reshape(-1, 1 + BD)
                    tp, ign, s = _match_image(
                        d[:, 1:], d[:, 0], gt_boxes, gt_ignore, IOU_THRS,
                        100, self._iou_fn)
                    # detections outside the area range are ignored too
                    d_areas = self._box_areas(d[:, 1:])
                    oob = ((d_areas < lo) | (d_areas >= hi))[
                        np.argsort(-d[:, 0], kind="stable")[:100]]
                    ign = ign | (oob[None, :] & ~tp)
                    tps.append(tp); igns.append(ign); scs.append(s)
                if tps:
                    tp = np.concatenate(tps, axis=1)
                    ign = np.concatenate(igns, axis=1)
                    sc = np.concatenate(scs)
                    ap_list.append(_average_precision(tp, ign, sc, npos))
                else:
                    ap_list.append(np.full(len(IOU_THRS), np.nan))
            per_class_ap[area_name] = np.stack(ap_list)  # (C, T)

        ap_all = per_class_ap["all"]
        with np.errstate(invalid="ignore"):
            results["bbox"] = {
                "AP": float(np.nanmean(ap_all) * 100),
                "AP50": float(np.nanmean(ap_all[:, 0]) * 100),
                "AP75": float(np.nanmean(ap_all[:, 5]) * 100),
                "APs": float(np.nanmean(per_class_ap["small"]) * 100),
                "APm": float(np.nanmean(per_class_ap["medium"]) * 100),
                "APl": float(np.nanmean(per_class_ap["large"]) * 100),
            }
        return results
