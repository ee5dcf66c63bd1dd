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


class BlendTransform(Transform):
    """Photometric blend ``src_weight * src + dst_weight * img`` — geometry
    is untouched (reference transform.py BlendTransform)."""

    def __init__(self, src_image, src_weight: float, dst_weight: float):
        self.src_image = src_image
        self.src_weight = src_weight
        self.dst_weight = dst_weight

    def apply_image(self, img):
        out = self.src_weight * self.src_image + self.dst_weight * \
            img.astype(np.float32)
        if np.issubdtype(np.asarray(img).dtype, np.integer):
            return np.clip(out, 0, 255).astype(np.asarray(img).dtype)
        return out.astype(np.asarray(img).dtype)

    def apply_coords(self, coords):
        return coords

    def apply_segmentation(self, seg):
        return seg

    def inverse(self):
        raise NotImplementedError("photometric blends are not invertible")


class ExtentTransform(Transform):
    """Resample a sub-rect (possibly beyond the bounds, zero-padded) to a
    fixed output size (reference transform.py ExtentTransform)."""

    def output_size(self, hw):
        return self.out_hw

    def __init__(self, src_rect, output_size):
        self.src_rect = tuple(float(v) for v in src_rect)  # x0, y0, x1, y1
        self.out_hw = tuple(int(v) for v in output_size)   # (h, w)

    def apply_image(self, img):
        from PIL import Image

        h, w = self.out_hw
        pil = Image.fromarray(np.asarray(img))
        out = pil.transform((w, h), Image.EXTENT, self.src_rect,
                            Image.BILINEAR)
        return np.asarray(out)

    def apply_segmentation(self, seg):
        from PIL import Image

        h, w = self.out_hw
        pil = Image.fromarray(np.asarray(seg))
        out = pil.transform((w, h), Image.EXTENT, self.src_rect,
                            Image.NEAREST)
        return np.asarray(out)

    def apply_coords(self, coords):
        x0, y0, x1, y1 = self.src_rect
        h, w = self.out_hw
        coords = coords.astype(np.float32).copy()
        coords[:, 0] = (coords[:, 0] - x0) * (w / max(x1 - x0, 1e-6))
        coords[:, 1] = (coords[:, 1] - y0) * (h / max(y1 - y0, 1e-6))
        return coords

    def inverse(self):
        raise NotImplementedError("extent inverse not needed (train only)")


class RotationTransform(Transform):
    """Rotate by ``angle`` degrees counterclockwise around the image center,
    optionally expanding the canvas to fit (reference
    transform.py RotationTransform — cv2 there, PIL here)."""

    def output_size(self, hw):
        return (self.new_h, self.new_w)

    def __init__(self, h: int, w: int, angle: float, expand: bool = True):
        self.h, self.w, self.angle, self.expand = h, w, float(angle), expand
        rad = np.deg2rad(self.angle)
        self._cos, self._sin = np.cos(rad), np.sin(rad)
        # snap float fuzz at right angles so expanded sizes are exact
        if abs(self._cos) < 1e-12:
            self._cos = 0.0
        if abs(self._sin) < 1e-12:
            self._sin = 0.0
        if expand:
            self.new_w = int(np.ceil(abs(w * self._cos) + abs(h * self._sin)))
            self.new_h = int(np.ceil(abs(h * self._cos) + abs(w * self._sin)))
        else:
            self.new_h, self.new_w = h, w

    def _rotate_img(self, img, resample):
        from PIL import Image

        pil = Image.fromarray(np.asarray(img))
        out = pil.rotate(self.angle, resample=resample, expand=self.expand)
        return np.asarray(out)

    def apply_image(self, img):
        from PIL import Image

        return self._rotate_img(img, Image.BILINEAR)

    def apply_segmentation(self, seg):
        from PIL import Image

        return self._rotate_img(seg, Image.NEAREST)

    def apply_coords(self, coords):
        coords = coords.astype(np.float32).copy()
        cx, cy = self.w / 2, self.h / 2
        ncx, ncy = self.new_w / 2, self.new_h / 2
        x = coords[:, 0] - cx
        y = coords[:, 1] - cy
        # image-space y grows downward: CCW rotation by `angle`
        coords[:, 0] = x * self._cos + y * self._sin + ncx
        coords[:, 1] = -x * self._sin + y * self._cos + ncy
        return coords

    def inverse(self):
        assert self.expand, "inverse only defined for expand=True"
        inv = RotationTransform(self.new_h, self.new_w, -self.angle,
                                expand=True)
        # the inverse canvas of an expanded rotation is larger than the
        # original: crop back to (h, w) around the center
        crop = CropTransform(
            (inv.new_w - self.w) // 2, (inv.new_h - self.h) // 2,
            self.w, self.h, orig_w=inv.new_w, orig_h=inv.new_h)
        return TransformList([inv, crop])


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


class RandomRotation(Augmentation):
    """Rotate by an angle from ``angle`` (list = choice, 2-list w/
    sample_style='range' = uniform range; reference
    augmentation_impl.py RandomRotation)."""

    def __init__(self, angle, expand: bool = True,
                 sample_style: str = "range"):
        if isinstance(angle, (int, float)):
            angle = (angle,)
        self.angle = tuple(float(a) for a in angle)
        self.expand = expand
        self.sample_style = sample_style

    def get_transform(self, image, rng):
        if self.sample_style == "range" and len(self.angle) == 2:
            a = float(rng.uniform(self.angle[0], self.angle[1]))
        else:
            a = self.angle[int(rng.randint(len(self.angle)))]
        if a % 360 == 0:
            return NoOpTransform()
        h, w = image.shape[:2]
        return RotationTransform(h, w, a, expand=self.expand)


class RandomExtent(Augmentation):
    """Crop a random sub-rect (scaled and shifted, possibly out of bounds)
    and resample it to the original size (reference
    augmentation_impl.py RandomExtent)."""

    def __init__(self, scale_range, shift_range):
        self.scale_range = tuple(scale_range)
        self.shift_range = tuple(shift_range)

    def get_transform(self, image, rng):
        h, w = image.shape[:2]
        rect = np.array([-0.5 * w, -0.5 * h, 0.5 * w, 0.5 * h], np.float32)
        rect *= rng.uniform(self.scale_range[0], self.scale_range[1])
        rect[0::2] += self.shift_range[0] * w * (rng.rand() - 0.5)
        rect[1::2] += self.shift_range[1] * h * (rng.rand() - 0.5)
        rect[0::2] += 0.5 * w
        rect[1::2] += 0.5 * h
        return ExtentTransform(rect, (int(rect[3] - rect[1]),
                                      int(rect[2] - rect[0])))


class RandomBrightness(Augmentation):
    """Scale intensity by w in [intensity_min, intensity_max] (reference
    augmentation_impl.py RandomBrightness: blend against black)."""

    def __init__(self, intensity_min: float, intensity_max: float):
        self.intensity_min, self.intensity_max = intensity_min, intensity_max

    def get_transform(self, image, rng):
        w = rng.uniform(self.intensity_min, self.intensity_max)
        return BlendTransform(0.0, src_weight=1 - w, dst_weight=w)


class RandomContrast(Augmentation):
    """Blend against the mean intensity (reference RandomContrast)."""

    def __init__(self, intensity_min: float, intensity_max: float):
        self.intensity_min, self.intensity_max = intensity_min, intensity_max

    def get_transform(self, image, rng):
        w = rng.uniform(self.intensity_min, self.intensity_max)
        return BlendTransform(float(np.asarray(image, np.float32).mean()),
                              src_weight=1 - w, dst_weight=w)


class RandomSaturation(Augmentation):
    """Blend against the per-pixel grayscale (reference RandomSaturation;
    expects BGR like the data pipeline)."""

    def __init__(self, intensity_min: float, intensity_max: float):
        self.intensity_min, self.intensity_max = intensity_min, intensity_max

    def get_transform(self, image, rng):
        assert image.shape[-1] == 3, "RandomSaturation needs BGR"
        w = rng.uniform(self.intensity_min, self.intensity_max)
        # BGR weights (reference uses RGB [0.299, 0.587, 0.114] on its
        # RGB-ordered input; the pipeline here carries BGR)
        gray = (np.asarray(image, np.float32)
                @ np.array([0.114, 0.587, 0.299], np.float32))[..., None]
        return BlendTransform(gray, src_weight=1 - w, dst_weight=w)


class RandomLighting(Augmentation):
    """AlexNet-style PCA color jitter (reference RandomLighting; eigen
    vectors/values over ImageNet, BGR order)."""

    _EIGVEC = np.array([[-0.5675, 0.7192, 0.4009],
                        [-0.5808, -0.0045, -0.8140],
                        [-0.5836, -0.6948, 0.4203]], np.float32)[:, ::-1]
    _EIGVAL = np.array([0.2175, 0.0188, 0.0045], np.float32)

    def __init__(self, scale: float):
        self.scale = scale

    def get_transform(self, image, rng):
        assert image.shape[-1] == 3, "RandomLighting needs BGR"
        weights = rng.normal(scale=self.scale, size=3).astype(np.float32)
        shift = self._EIGVEC @ (weights * self._EIGVAL)
        return BlendTransform(shift[None, None, :], src_weight=1.0,
                              dst_weight=1.0)


def apply_augmentations(augs: Sequence[Augmentation], image: np.ndarray,
                        rng: np.random.RandomState):
    tfms = []
    for a in augs:
        t = a.get_transform(image, rng)
        image = t.apply_image(image)
        tfms.append(t)
    return image, TransformList(tfms)
