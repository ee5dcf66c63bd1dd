"""Array-first box utilities.

Functional equivalents of the reference's ``Boxes`` methods
(detectron2/structures/boxes.py:132-345) and of the WSL signed IoU
(projects/WSL/wsl/modeling/roi_heads/roi_heads.py:18-57), expressed as pure
jnp ops over ``(..., 4)`` arrays in XYXY (x1, y1, x2, y2) order so they
compose with vmap/jit and static-shape masking.
"""

from __future__ import annotations

import enum

import jax.numpy as jnp
import numpy as np


class BoxMode(enum.IntEnum):
    """Subset of the reference BoxMode (detectron2/structures/boxes.py:21)."""

    XYXY_ABS = 0
    XYWH_ABS = 1

    @staticmethod
    def convert(box, from_mode: "BoxMode", to_mode: "BoxMode"):
        if from_mode == to_mode:
            return box
        xp = jnp if isinstance(box, jnp.ndarray) else np
        box = xp.asarray(box)
        if from_mode == BoxMode.XYWH_ABS and to_mode == BoxMode.XYXY_ABS:
            x, y, w, h = box[..., 0], box[..., 1], box[..., 2], box[..., 3]
            return xp.stack([x, y, x + w, y + h], axis=-1)
        if from_mode == BoxMode.XYXY_ABS and to_mode == BoxMode.XYWH_ABS:
            x1, y1, x2, y2 = box[..., 0], box[..., 1], box[..., 2], box[..., 3]
            return xp.stack([x1, y1, x2 - x1, y2 - y1], axis=-1)
        raise NotImplementedError(f"{from_mode} -> {to_mode}")


def area(boxes):
    """Box areas; zero for degenerate boxes. boxes: (..., 4)."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return jnp.maximum(w, 0) * jnp.maximum(h, 0)


def clip(boxes, image_size):
    """Clip boxes to [0, w] x [0, h]. image_size: (h, w) tuple or (2,) array."""
    h, w = image_size[0], image_size[1]
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def nonempty(boxes, threshold: float = 0.0):
    """Mask of boxes with both sides > threshold
    (reference: detectron2/structures/boxes.py:235)."""
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return (w > threshold) & (h > threshold)


def pairwise_intersection(boxes1, boxes2):
    """Intersection areas between all pairs. (N,4),(M,4) -> (N,M)."""
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    return wh[..., 0] * wh[..., 1]


def pairwise_iou(boxes1, boxes2):
    """IoU between all pairs (reference: detectron2/structures/boxes.py:329).

    (N, 4), (M, 4) -> (N, M). Degenerate boxes give IoU 0.
    """
    inter = pairwise_intersection(boxes1, boxes2)
    a1 = area(boxes1)[:, None]
    a2 = area(boxes2)[None, :]
    union = a1 + a2 - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def pairwise_iou_wsl(boxes1, boxes2):
    """Signed inner/outer IoU used by the WSL head
    (projects/WSL/wsl/modeling/roi_heads/roi_heads.py:18-57): standard IoU,
    except a pair where one box contains the other gets inner-IoU, and a
    disjoint pair gets a negative outer penalty.
    """
    inter = pairwise_intersection(boxes1, boxes2)
    a1 = area(boxes1)[:, None]
    a2 = area(boxes2)[None, :]
    union = a1 + a2 - inter
    iou = jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)

    # inside: intersection equals one of the areas
    inside = (inter == a1) | (inter == a2)
    iou_inner = inter / jnp.maximum(jnp.minimum(a1, a2), 1e-12)

    # enclosing box area for disjoint penalty
    lt = jnp.minimum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.maximum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    enclosing = wh[..., 0] * wh[..., 1]
    iou_outer = jnp.where(enclosing > 0, -(enclosing - union) / jnp.maximum(enclosing, 1e-12), 0.0)

    out = jnp.where(inside, iou_inner, iou)
    out = jnp.where(inter > 0, out, iou_outer)
    return out


def unique_boxes_mask(boxes_np: np.ndarray, scale: float = 1.0) -> np.ndarray:
    """Host-side dedup mask, first-occurrence order (reference:
    detectron2/data/detection_utils.py:236 via Detectron1 unique_boxes)."""
    v = np.array([1, 1e3, 1e6, 1e9])
    hashes = np.round(boxes_np * scale) @ v
    _, index = np.unique(hashes, return_index=True)
    mask = np.zeros(len(boxes_np), dtype=bool)
    mask[np.sort(index)] = True
    return mask


# ---------------------------------------------------------------------------
# Box2Box transform (reference: detectron2/modeling/box_regression.py:16-108)
# ---------------------------------------------------------------------------

_DEFAULT_SCALE_CLAMP = float(np.log(1000.0 / 16))


def get_deltas(src_boxes, target_boxes, weights=(10.0, 10.0, 5.0, 5.0)):
    """Encode target boxes relative to source boxes as (dx, dy, dw, dh)."""
    src_w = src_boxes[..., 2] - src_boxes[..., 0]
    src_h = src_boxes[..., 3] - src_boxes[..., 1]
    src_cx = src_boxes[..., 0] + 0.5 * src_w
    src_cy = src_boxes[..., 1] + 0.5 * src_h

    tgt_w = target_boxes[..., 2] - target_boxes[..., 0]
    tgt_h = target_boxes[..., 3] - target_boxes[..., 1]
    tgt_cx = target_boxes[..., 0] + 0.5 * tgt_w
    tgt_cy = target_boxes[..., 1] + 0.5 * tgt_h

    wx, wy, ww, wh = weights
    eps = 1e-7
    dx = wx * (tgt_cx - src_cx) / jnp.maximum(src_w, eps)
    dy = wy * (tgt_cy - src_cy) / jnp.maximum(src_h, eps)
    dw = ww * jnp.log(jnp.maximum(tgt_w, eps) / jnp.maximum(src_w, eps))
    dh = wh * jnp.log(jnp.maximum(tgt_h, eps) / jnp.maximum(src_h, eps))
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def apply_deltas(deltas, boxes, weights=(10.0, 10.0, 5.0, 5.0),
                 scale_clamp: float = _DEFAULT_SCALE_CLAMP):
    """Decode deltas w.r.t. boxes.

    deltas: (..., K*4) or (..., 4); boxes: (..., 4). Returns same shape as
    deltas.
    """
    widths = boxes[..., 2] - boxes[..., 0]
    heights = boxes[..., 3] - boxes[..., 1]
    ctr_x = boxes[..., 0] + 0.5 * widths
    ctr_y = boxes[..., 1] + 0.5 * heights

    wx, wy, ww, wh = weights
    dx = deltas[..., 0::4] / wx
    dy = deltas[..., 1::4] / wy
    dw = deltas[..., 2::4] / ww
    dh = deltas[..., 3::4] / wh

    dw = jnp.minimum(dw, scale_clamp)
    dh = jnp.minimum(dh, scale_clamp)

    pred_cx = dx * widths[..., None] + ctr_x[..., None]
    pred_cy = dy * heights[..., None] + ctr_y[..., None]
    pred_w = jnp.exp(dw) * widths[..., None]
    pred_h = jnp.exp(dh) * heights[..., None]

    x1 = pred_cx - 0.5 * pred_w
    y1 = pred_cy - 0.5 * pred_h
    x2 = pred_cx + 0.5 * pred_w
    y2 = pred_cy + 0.5 * pred_h
    out = jnp.stack([x1, y1, x2, y2], axis=-1)  # (..., K, 4)
    return out.reshape(*deltas.shape)
