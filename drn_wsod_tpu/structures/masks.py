"""Instance mask structures (array-first).

Capability equivalent of the reference detectron2/structures/masks.py
(PolygonMasks :166-424, BitMasks :14-165): segmentation carried either as
polygons (COCO json form) or dense boolean bitmasks, with the operations the
mask pipeline needs — area, bounding boxes, rasterization, and the fixed-size
``crop_and_resize`` that builds mask-head training targets. Host-side numpy:
masks enter the device only as fixed-size crops, so the structures stay off
the jit path (the reference keeps most of this on CPU too).
"""

from __future__ import annotations

from typing import List, Sequence, Union

import numpy as np
from PIL import Image, ImageDraw


class BitMasks:
    """(N, H, W) boolean masks."""

    def __init__(self, tensor: np.ndarray):
        t = np.asarray(tensor)
        assert t.ndim == 3, t.shape
        self.tensor = t.astype(bool)

    def __len__(self) -> int:
        return self.tensor.shape[0]

    @property
    def image_size(self):
        return self.tensor.shape[1:]

    def __getitem__(self, item) -> "BitMasks":
        if isinstance(item, int):
            return BitMasks(self.tensor[item:item + 1])
        return BitMasks(self.tensor[item])

    def area(self) -> np.ndarray:
        return self.tensor.reshape(len(self), -1).sum(-1).astype(np.float32)

    def nonempty(self) -> np.ndarray:
        return self.area() > 0

    def get_bounding_boxes(self) -> np.ndarray:
        """(N, 4) XYXY tight boxes (reference BitMasks.get_bounding_boxes);
        empty masks give zero boxes."""
        out = np.zeros((len(self), 4), np.float32)
        for i, m in enumerate(self.tensor):
            ys, xs = np.nonzero(m)
            if len(xs):
                out[i] = (xs.min(), ys.min(), xs.max() + 1, ys.max() + 1)
        return out

    def crop_and_resize(self, boxes: np.ndarray, mask_size: int) -> np.ndarray:
        """Crop each mask by its box and resize to (mask_size, mask_size)
        bool — the mask-head training targets (reference
        BitMasks.crop_and_resize / ROIAlign on masks)."""
        out = np.zeros((len(self), mask_size, mask_size), bool)
        for i, (m, b) in enumerate(zip(self.tensor, boxes)):
            x1, y1, x2, y2 = b
            x1i, y1i = int(np.floor(x1)), int(np.floor(y1))
            x2i, y2i = max(int(np.ceil(x2)), x1i + 1), max(int(np.ceil(y2)),
                                                           y1i + 1)
            H, W = m.shape
            crop = m[max(y1i, 0):min(y2i, H), max(x1i, 0):min(x2i, W)]
            if crop.size == 0:
                continue
            img = Image.fromarray(crop.astype(np.uint8) * 255)
            img = img.resize((mask_size, mask_size), Image.BILINEAR)
            out[i] = np.asarray(img) >= 128
        return out

    @staticmethod
    def from_polygon_masks(polygons: "PolygonMasks", height: int,
                           width: int) -> "BitMasks":
        return BitMasks(np.stack(
            [rasterize_polygons(p, height, width)
             for p in polygons.polygons])
            if len(polygons) else np.zeros((0, height, width), bool))


def rasterize_polygons(polys: Sequence[np.ndarray], height: int,
                       width: int) -> np.ndarray:
    """COCO polygon list ([x0, y0, x1, y1, ...] arrays) -> (H, W) bool."""
    img = Image.new("L", (width, height), 0)
    draw = ImageDraw.Draw(img)
    for p in polys:
        pts = np.asarray(p, np.float64).reshape(-1, 2)
        if len(pts) >= 3:
            draw.polygon([tuple(q) for q in pts], outline=1, fill=1)
    return np.asarray(img, bool)


class PolygonMasks:
    """Per-instance lists of COCO polygons."""

    def __init__(self, polygons: List[List[Union[np.ndarray, list]]]):
        self.polygons = [
            [np.asarray(p, np.float64).reshape(-1) for p in per_instance]
            for per_instance in polygons
        ]

    def __len__(self) -> int:
        return len(self.polygons)

    def __getitem__(self, item) -> "PolygonMasks":
        if isinstance(item, int):
            return PolygonMasks([self.polygons[item]])
        if isinstance(item, slice):
            return PolygonMasks(self.polygons[item])
        return PolygonMasks([self.polygons[int(i)] for i in np.nonzero(
            np.asarray(item))[0]] if np.asarray(item).dtype == bool
            else [self.polygons[int(i)] for i in item])

    def area(self) -> np.ndarray:
        """Shoelace area summed over an instance's polygons (reference
        PolygonMasks.area, masks.py:380-404)."""
        out = []
        for per_instance in self.polygons:
            a = 0.0
            for p in per_instance:
                pts = p.reshape(-1, 2)
                x, y = pts[:, 0], pts[:, 1]
                a += 0.5 * abs(np.dot(x, np.roll(y, -1))
                               - np.dot(y, np.roll(x, -1)))
            out.append(a)
        return np.asarray(out, np.float32)

    def nonempty(self) -> np.ndarray:
        return np.asarray([len(p) > 0 for p in self.polygons])

    def get_bounding_boxes(self) -> np.ndarray:
        out = np.zeros((len(self), 4), np.float32)
        for i, per_instance in enumerate(self.polygons):
            if not per_instance:
                continue
            pts = np.concatenate([p.reshape(-1, 2) for p in per_instance])
            out[i] = (pts[:, 0].min(), pts[:, 1].min(),
                      pts[:, 0].max(), pts[:, 1].max())
        return out

    def crop_and_resize(self, boxes: np.ndarray, mask_size: int) -> np.ndarray:
        """Rasterize each instance inside its box at mask_size resolution
        (reference PolygonMasks.crop_and_resize, masks.py:342-378)."""
        out = np.zeros((len(self), mask_size, mask_size), bool)
        for i, (per_instance, b) in enumerate(zip(self.polygons, boxes)):
            if not per_instance:
                continue
            x1, y1, x2, y2 = [float(v) for v in b]
            w = max(x2 - x1, 0.1)
            h = max(y2 - y1, 0.1)
            scaled = []
            for p in per_instance:
                q = p.reshape(-1, 2).copy()
                q[:, 0] = (q[:, 0] - x1) * (mask_size / w)
                q[:, 1] = (q[:, 1] - y1) * (mask_size / h)
                scaled.append(q.reshape(-1))
            out[i] = rasterize_polygons(scaled, mask_size, mask_size)
        return out
