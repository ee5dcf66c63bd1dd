"""Deterministic, invertible image/box transforms + random augmentations.

Host-side numpy/PIL re-implementation of the reference transform algebra
(detectron2/data/transforms/transform.py, augmentation_impl.py): every
``Transform`` maps images and boxes and knows its inverse, which is what the
TTA path uses to map per-view detections back to the original frame
(projects/WSL/wsl/modeling/test_time_augmentation_avg.py:283-323).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np
from PIL import Image


class Transform:
    def output_size(self, hw):
        """(h, w) -> post-transform (h, w); lets loaders plan size buckets
        from record metadata without decoding pixels (multi-host bucket
        agreement)."""
        return hw

    def apply_image(self, img: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def apply_segmentation(self, seg: np.ndarray) -> np.ndarray:
        """Label maps ride apply_image by default; transforms that
        interpolate override with nearest (reference transform.py
        register_type("segmentation"))."""
        return self.apply_image(seg)

    def apply_coords(self, coords: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def apply_box(self, boxes: np.ndarray) -> np.ndarray:
        """Transform XYXY boxes via their 4 corners (handles flips)."""
        boxes = np.asarray(boxes, dtype=np.float32)
        idx = np.array([(0, 1), (2, 1), (0, 3), (2, 3)]).flatten()
        corners = boxes[:, idx].reshape(-1, 2)
        corners = self.apply_coords(corners).reshape(-1, 4, 2)
        minxy = corners.min(axis=1)
        maxxy = corners.max(axis=1)
        return np.concatenate([minxy, maxxy], axis=1)

    def inverse(self) -> "Transform":
        raise NotImplementedError


class NoOpTransform(Transform):
    def apply_image(self, img):
        return img

    def apply_coords(self, coords):
        return coords

    def inverse(self):
        return self


class TransformList(Transform):
    def output_size(self, hw):
        for t in self.tfms:
            hw = t.output_size(hw)
        return hw

    def __init__(self, tfms: Sequence[Transform]):
        self.transforms: List[Transform] = list(tfms)

    def apply_image(self, img):
        for t in self.transforms:
            img = t.apply_image(img)
        return img

    def apply_coords(self, coords):
        for t in self.transforms:
            coords = t.apply_coords(coords)
        return coords

    def apply_segmentation(self, seg):
        for t in self.transforms:
            seg = t.apply_segmentation(seg)
        return seg

    def inverse(self):
        return TransformList([t.inverse() for t in reversed(self.transforms)])

    def __add__(self, other: "TransformList") -> "TransformList":
        others = other.transforms if isinstance(other, TransformList) else [other]
        return TransformList(self.transforms + list(others))


class ResizeTransform(Transform):
    def output_size(self, hw):
        return (self.new_h, self.new_w)

    def __init__(self, h: int, w: int, new_h: int, new_w: int):
        self.h, self.w, self.new_h, self.new_w = h, w, new_h, new_w

    def apply_image(self, img):
        if img.shape[:2] == (self.new_h, self.new_w):
            return img
        pil = Image.fromarray(img.astype(np.uint8) if img.dtype != np.uint8
                              else img)
        pil = pil.resize((self.new_w, self.new_h), Image.BILINEAR)
        return np.asarray(pil)

    def apply_coords(self, coords):
        coords = coords.astype(np.float32).copy()
        coords[:, 0] *= self.new_w / self.w
        coords[:, 1] *= self.new_h / self.h
        return coords

    def apply_segmentation(self, seg):
        if seg.shape[:2] == (self.new_h, self.new_w):
            return seg
        pil = Image.fromarray(seg)
        pil = pil.resize((self.new_w, self.new_h), Image.NEAREST)
        return np.asarray(pil)

    def inverse(self):
        return ResizeTransform(self.new_h, self.new_w, self.h, self.w)


class HFlipTransform(Transform):
    def __init__(self, width: int):
        self.width = width

    def apply_image(self, img):
        return np.ascontiguousarray(img[:, ::-1])

    def apply_coords(self, coords):
        coords = coords.astype(np.float32).copy()
        coords[:, 0] = self.width - coords[:, 0]
        return coords

    def inverse(self):
        return self


class CropTransform(Transform):
    def output_size(self, hw):
        return (self.h, self.w)

    def __init__(self, x0: int, y0: int, w: int, h: int,
                 orig_w: int = 0, orig_h: int = 0):
        self.x0, self.y0, self.w, self.h = x0, y0, w, h
        self.orig_w, self.orig_h = orig_w, orig_h

    def apply_image(self, img):
        return img[self.y0:self.y0 + self.h, self.x0:self.x0 + self.w]

    def apply_coords(self, coords):
        coords = coords.astype(np.float32).copy()
        coords[:, 0] -= self.x0
        coords[:, 1] -= self.y0
        return coords

    def inverse(self):
        raise NotImplementedError("crop inverse not needed (train only)")


# ---------------------------------------------------------------------------
# Random augmentations (return Transform given an image + rng)
# ---------------------------------------------------------------------------

class Augmentation:
    def get_transform(self, image: np.ndarray,
                      rng: np.random.RandomState) -> Transform:
        raise NotImplementedError


class ResizeShortestEdge(Augmentation):
    """Resize shortest edge to one of ``short_edge_lengths``, capping the
    longest at ``max_size`` (reference augmentation_impl.py:125-180)."""

    def __init__(self, short_edge_lengths, max_size: int = 1 << 30,
                 sample_style: str = "choice"):
        if isinstance(short_edge_lengths, int):
            short_edge_lengths = (short_edge_lengths,)
        self.short_edge_lengths = tuple(short_edge_lengths)
        self.max_size = max_size
        self.sample_style = sample_style

    @staticmethod
    def target_size(h: int, w: int, size: int, max_size: int) -> Tuple[int, int]:
        scale = size / min(h, w)
        if h < w:
            new_h, new_w = size, scale * w
        else:
            new_h, new_w = scale * h, size
        if max(new_h, new_w) > max_size:
            s = max_size / max(new_h, new_w)
            new_h, new_w = new_h * s, new_w * s
        return int(new_h + 0.5), int(new_w + 0.5)

    def get_transform(self, image, rng):
        h, w = image.shape[:2]
        if self.sample_style == "range":
            size = int(rng.randint(min(self.short_edge_lengths),
                                   max(self.short_edge_lengths) + 1))
        else:
            size = int(self.short_edge_lengths[
                rng.randint(len(self.short_edge_lengths))])
        if size == 0:
            return NoOpTransform()
        new_h, new_w = self.target_size(h, w, size, self.max_size)
        return ResizeTransform(h, w, new_h, new_w)


class RandomFlip(Augmentation):
    def __init__(self, prob: float = 0.5):
        self.prob = prob

    def get_transform(self, image, rng):
        if rng.uniform() < self.prob:
            return HFlipTransform(image.shape[1])
        return NoOpTransform()


class RandomCrop(Augmentation):
    """relative_range / relative / absolute crop
    (reference augmentation_impl.py:232-281)."""

    def __init__(self, crop_type: str, crop_size):
        assert crop_type in ("relative", "relative_range", "absolute")
        self.crop_type = crop_type
        self.crop_size = tuple(crop_size)

    def get_transform(self, image, rng):
        h, w = image.shape[:2]
        ch, cw = self._crop_hw(h, w, rng)
        y0 = int(rng.randint(h - ch + 1))
        x0 = int(rng.randint(w - cw + 1))
        return CropTransform(x0, y0, cw, ch, orig_w=w, orig_h=h)

    def _crop_hw(self, h, w, rng):
        if self.crop_type == "relative":
            ch, cw = self.crop_size
            return int(h * ch + 0.5), int(w * cw + 0.5)
        if self.crop_type == "relative_range":
            lo = np.asarray(self.crop_size, dtype=np.float32)
            ch, cw = lo + rng.rand(2) * (1 - lo)
            return int(h * ch + 0.5), int(w * cw + 0.5)
        return (min(int(self.crop_size[0]), h), min(int(self.crop_size[1]), w))


def apply_augmentations(augs: Sequence[Augmentation], image: np.ndarray,
                        rng: np.random.RandomState):
    tfms = []
    for a in augs:
        t = a.get_transform(image, rng)
        image = t.apply_image(image)
        tfms.append(t)
    return image, TransformList(tfms)
