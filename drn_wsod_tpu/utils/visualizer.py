"""Detection visualization (capability equivalent of the reference
detectron2/utils/visualizer.py for the WSOD use cases: drawing detections and
pseudo-GT mining dumps, reference roi_heads_oicr.py:569-625). PIL-based — no
matplotlib dependency."""

from __future__ import annotations

import colorsys
import os
from typing import Optional, Sequence

import numpy as np
from PIL import Image, ImageDraw


def _class_colors(n: int):
    return [tuple(int(c * 255) for c in colorsys.hsv_to_rgb(i / max(n, 1),
                                                            0.85, 0.95))
            for i in range(n)]


# COCO person skeleton (17-keypoint connectivity, reference
# detectron2/data/datasets/builtin_meta.py keypoint_connection_rules).
COCO_PERSON_SKELETON = [
    (15, 13), (13, 11), (16, 14), (14, 12), (11, 12), (5, 11), (6, 12),
    (5, 6), (5, 7), (6, 8), (7, 9), (8, 10), (1, 2), (0, 1), (0, 2),
    (1, 3), (2, 4), (3, 5), (4, 6),
]


def _mask_contour(mask: np.ndarray) -> np.ndarray:
    """Boundary pixels of a boolean mask: mask minus its 4-neighbour
    erosion (pure numpy; the reference uses cv2.findContours)."""
    m = np.asarray(mask, bool)
    if not m.any():
        return m
    er = m.copy()
    er[1:, :] &= m[:-1, :]
    er[:-1, :] &= m[1:, :]
    er[:, 1:] &= m[:, :-1]
    er[:, :-1] &= m[:, 1:]
    return m & ~er


class Visualizer:
    def __init__(self, image_bgr: np.ndarray,
                 class_names: Optional[Sequence[str]] = None):
        """image_bgr: (H, W, 3) uint8 in BGR (pipeline order)."""
        rgb = np.ascontiguousarray(image_bgr[:, :, ::-1]).astype(np.uint8)
        self._img = Image.fromarray(rgb)
        self._draw = ImageDraw.Draw(self._img)
        self._names = list(class_names) if class_names else None
        self._colors = _class_colors(len(self._names) if self._names else 80)

    def draw_instance_predictions(self, boxes, scores, classes, valid=None,
                                  score_thresh: float = 0.0, masks=None,
                                  keypoints=None):
        """Draw detections; optional (N, H, W) bool masks and (N, K, 3)
        keypoints (reference Visualizer.draw_instance_predictions)."""
        for i in range(len(scores)):
            if valid is not None and not valid[i]:
                continue
            if scores[i] < score_thresh:
                continue
            cid = int(classes[i])
            self.draw_box(boxes[i], cid, float(scores[i]))
            if masks is not None:
                self.draw_mask(masks[i], cid)
            if keypoints is not None:
                self.draw_keypoints(keypoints[i], cid)
        return self

    def draw_mask(self, mask, class_id: int = 0, alpha: float = 0.45,
                  color=None, outline: bool = True):
        """Alpha-blend a boolean (H, W) mask in the class color, with a
        solid boundary contour (reference Visualizer.draw_binary_mask)."""
        if color is None:
            color = self._colors[class_id % len(self._colors)]
        base = np.asarray(self._img).astype(np.float32)
        m = np.asarray(mask, bool)
        over = np.asarray(color, np.float32)
        base[m] = (1 - alpha) * base[m] + alpha * over
        if outline:
            base[_mask_contour(m)] = over
        self._img = Image.fromarray(base.astype(np.uint8))
        self._draw = ImageDraw.Draw(self._img)
        return self

    def draw_keypoints(self, kpts, class_id: int = 0, radius: int = 2,
                       skeleton=None):
        """(K, 3) keypoints; visibility > 0 drawn as dots. ``skeleton``
        is a list of (i, j) index pairs drawn as connecting lines
        (reference draw_and_connect_keypoints); defaults to the COCO
        person skeleton when K == 17."""
        color = self._colors[class_id % len(self._colors)]
        kpts = np.asarray(kpts)
        if skeleton is None and len(kpts) == 17:
            skeleton = COCO_PERSON_SKELETON
        for i, j in (skeleton or ()):
            if i < len(kpts) and j < len(kpts) \
                    and kpts[i, 2] > 0 and kpts[j, 2] > 0:
                self._draw.line([tuple(kpts[i, :2]), tuple(kpts[j, :2])],
                                fill=color, width=1)
        for x, y, v in kpts:
            if v > 0:
                self._draw.ellipse([x - radius, y - radius,
                                    x + radius, y + radius], fill=color)
        return self

    def draw_rotated_box(self, box5, class_id: int = 0,
                         score: Optional[float] = None):
        """5-param rotated box (cx, cy, w, h, angle_degrees CCW), the
        structures/rotated_boxes.py convention (reference
        Visualizer.draw_rotated_box_with_label)."""
        color = self._colors[class_id % len(self._colors)]
        cx, cy, w, h, a = [float(v) for v in box5]
        t = np.deg2rad(a)
        c, s = np.cos(t), np.sin(t)
        # y grows downward, so CCW angle rotates with -sin in image coords
        pts = [(cx + c * dx + s * dy, cy - s * dx + c * dy)
               for dx, dy in ((-w / 2, -h / 2), (w / 2, -h / 2),
                              (w / 2, h / 2), (-w / 2, h / 2))]
        self._draw.polygon(pts, outline=color)
        if self._names or score is not None:
            name = self._names[class_id] if self._names else str(class_id)
            label = f"{name} {score:.2f}" if score is not None else name
            x0, y0 = pts[0]
            self._draw.text((x0 + 2, max(y0 - 11, 0)), label, fill=color)
        return self

    def draw_panoptic_seg(self, panoptic_map, segments_info,
                          alpha: float = 0.45):
        """(H, W) segment-id map + list of {"id", "category_id",
        "isthing"} dicts (reference Visualizer.draw_panoptic_seg):
        stuff segments get the class color, thing segments a distinct
        per-instance jittered color, labels at segment centroids."""
        pan = np.asarray(panoptic_map)
        rng = np.random.RandomState(0)
        for info in segments_info:
            m = pan == info["id"]
            if not m.any():
                continue
            cid = int(info.get("category_id", 0))
            color = np.asarray(self._colors[cid % len(self._colors)],
                               np.float32)
            if info.get("isthing", False):
                color = np.clip(color + rng.uniform(-40, 40, 3), 0, 255)
            self.draw_mask(m, cid, alpha=alpha,
                           color=tuple(int(v) for v in color))
            if self._names and cid < len(self._names):
                ys, xs = np.nonzero(m)
                self._draw.text((float(xs.mean()), float(ys.mean())),
                                self._names[cid],
                                fill=tuple(int(v) for v in color))
        return self

    def draw_dataset_dict(self, record):
        """Draw ground truth from a dataset-dict record's annotations
        (reference Visualizer.draw_dataset_dict; used by
        tools/visualize_data.py for pre-augmentation inspection)."""
        for ann in record.get("annotations", ()):
            cid = int(ann.get("category_id", 0))
            if "bbox" in ann:
                x, y, w, h = ann["bbox"]
                # dataset dicts carry XYWH (BoxMode.XYWH_ABS) unless
                # bbox_mode says otherwise
                if ann.get("bbox_mode", "xywh") in ("xywh", 1):
                    box = (x, y, x + w, y + h)
                else:
                    box = (x, y, w, h)
                self.draw_box(box, cid)
            seg = ann.get("segmentation")
            if isinstance(seg, list):
                for poly in seg:
                    pts = np.asarray(poly, np.float32).reshape(-1, 2)
                    self._draw.polygon(
                        [tuple(p) for p in pts],
                        outline=self._colors[cid % len(self._colors)])
            if "keypoints" in ann:
                self.draw_keypoints(
                    np.asarray(ann["keypoints"], np.float32).reshape(-1, 3),
                    cid)
        if "sem_seg" in record:
            self.draw_sem_seg(record["sem_seg"])
        return self

    def draw_sem_seg(self, seg, alpha: float = 0.45, ignore: int = 255):
        """(H, W) int class map alpha-blended with per-class colors
        (reference Visualizer.draw_sem_seg)."""
        seg = np.asarray(seg)
        base = np.asarray(self._img).astype(np.float32)
        for c in np.unique(seg):
            if c == ignore:
                continue
            m = seg == c
            over = np.asarray(self._colors[int(c) % len(self._colors)],
                              np.float32)
            base[m] = (1 - alpha) * base[m] + alpha * over
        self._img = Image.fromarray(base.astype(np.uint8))
        self._draw = ImageDraw.Draw(self._img)
        return self

    def draw_box(self, box, class_id: Optional[int] = 0,
                 score: Optional[float] = None):
        """``class_id=None`` draws an unlabeled neutral-color box (e.g. raw
        proposals); ids outside the name table fall back to the numeric id
        instead of raising (mismatched metadata is a visualization nuisance,
        not an error)."""
        if class_id is None:
            color = (180, 180, 180)
        else:
            color = self._colors[class_id % len(self._colors)]
        x1, y1, x2, y2 = [float(v) for v in box]
        self._draw.rectangle([x1, y1, x2, y2], outline=color, width=2)
        if class_id is not None and (self._names or score is not None):
            name = (self._names[class_id]
                    if self._names and 0 <= class_id < len(self._names)
                    else str(class_id))
            label = f"{name} {score:.2f}" if score is not None else name
            self._draw.text((x1 + 2, max(y1 - 11, 0)), label, fill=color)
        return self

    def get_image(self) -> np.ndarray:
        return np.asarray(self._img)

    def save(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._img.save(path)


def save_pgt_visualization(image_bgr, pgt_boxes, pgt_valid, class_names,
                           out_dir: str, prefix: str, suffix: str):
    """Dump mined pseudo-GT boxes for inspection (the reference's _vis_pgt
    event-storage images become files here)."""
    v = Visualizer(image_bgr, class_names)
    for c in range(len(pgt_valid)):
        if pgt_valid[c]:
            v.draw_box(pgt_boxes[c], c)
    v.save(os.path.join(out_dir, f"{prefix}{suffix}.png"))
