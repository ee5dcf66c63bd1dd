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

    def draw_mask(self, mask, class_id: int = 0, alpha: float = 0.45):
        """Alpha-blend a boolean (H, W) mask in the class color."""
        color = self._colors[class_id % len(self._colors)]
        base = np.asarray(self._img).astype(np.float32)
        m = np.asarray(mask, bool)
        over = np.asarray(color, np.float32)
        base[m] = (1 - alpha) * base[m] + alpha * over
        self._img = Image.fromarray(base.astype(np.uint8))
        self._draw = ImageDraw.Draw(self._img)
        return self

    def draw_keypoints(self, kpts, class_id: int = 0, radius: int = 2):
        """(K, 3) keypoints; visibility > 0 drawn as dots."""
        color = self._colors[class_id % len(self._colors)]
        for x, y, v in np.asarray(kpts):
            if v > 0:
                self._draw.ellipse([x - radius, y - radius,
                                    x + radius, y + radius], fill=color)
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

    def draw_box(self, box, class_id: int = 0, score: Optional[float] = None):
        color = self._colors[class_id % len(self._colors)]
        x1, y1, x2, y2 = [float(v) for v in box]
        self._draw.rectangle([x1, y1, x2, y2], outline=color, width=2)
        if self._names or score is not None:
            name = self._names[class_id] if self._names else str(class_id)
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
