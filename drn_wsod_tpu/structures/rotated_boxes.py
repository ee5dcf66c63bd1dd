"""Rotated box ops (cx, cy, w, h, angle_deg).

Functional equivalent of the reference RotatedBoxes + native rotated IoU/NMS
(detectron2/structures/rotated_boxes.py, layers/csrc/box_iou_rotated/,
csrc/nms_rotated/). The CUDA polygon-clipping intersection is replaced by a
vectorized convex-intersection formula that maps to fixed shapes:

  candidate points = {vertices of A inside B} + {vertices of B inside A}
                   + {edge-edge intersections}       (24 slots, masked)
  area = fan/shoelace over the candidates sorted by angle about their mean.

Everything is jnp + vmap — no sequential clipping loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def rotated_to_corners(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 5) cx,cy,w,h,angle(deg, ccw) -> (..., 4, 2) corner points."""
    cx, cy, w, h, a = (boxes[..., i] for i in range(5))
    t = jnp.deg2rad(a)
    cos, sin = jnp.cos(t), jnp.sin(t)
    dx = jnp.stack([-w, w, w, -w], -1) / 2.0
    dy = jnp.stack([-h, -h, h, h], -1) / 2.0
    x = cx[..., None] + dx * cos[..., None] - dy * sin[..., None]
    y = cy[..., None] + dx * sin[..., None] + dy * cos[..., None]
    return jnp.stack([x, y], -1)


def _inside(points: jnp.ndarray, poly: jnp.ndarray) -> jnp.ndarray:
    """points (K, 2) inside convex poly (4, 2)? Sign-consistent half-plane
    tests against the centroid."""
    cen = jnp.mean(poly, axis=0)
    q0 = poly
    q1 = jnp.roll(poly, -1, axis=0)
    a = q1[:, 1] - q0[:, 1]
    b = q0[:, 0] - q1[:, 0]
    c = -(a * q0[:, 0] + b * q0[:, 1])
    sign = jnp.sign(a * cen[0] + b * cen[1] + c)
    f = (points[:, None, 0] * a[None] + points[:, None, 1] * b[None]
         + c[None]) * sign[None]
    return jnp.all(f >= -1e-9, axis=1)


def _segment_intersections(pa: jnp.ndarray, pb: jnp.ndarray):
    """All 16 edge-pair intersection points between quads pa and pb.

    Returns (16, 2) points + (16,) validity."""
    a0 = jnp.repeat(pa, 4, axis=0)                    # (16, 2)
    a1 = jnp.repeat(jnp.roll(pa, -1, axis=0), 4, axis=0)
    b0 = jnp.tile(pb, (4, 1))
    b1 = jnp.tile(jnp.roll(pb, -1, axis=0), (4, 1))

    d1 = a1 - a0
    d2 = b1 - b0
    denom = d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0]
    ok = jnp.abs(denom) > 1e-12
    denom = jnp.where(ok, denom, 1.0)
    diff = b0 - a0
    t = (diff[:, 0] * d2[:, 1] - diff[:, 1] * d2[:, 0]) / denom
    u = (diff[:, 0] * d1[:, 1] - diff[:, 1] * d1[:, 0]) / denom
    valid = ok & (t >= -1e-9) & (t <= 1 + 1e-9) & (u >= -1e-9) & (u <= 1 + 1e-9)
    return a0 + t[:, None] * d1, valid


def _convex_intersection_area(pa: jnp.ndarray, pb: jnp.ndarray) -> jnp.ndarray:
    """Exact intersection area of two convex quads (4, 2) each."""
    va = _inside(pa, pb)
    vb = _inside(pb, pa)
    pi, vi = _segment_intersections(pa, pb)
    pts = jnp.concatenate([pa, pb, pi], axis=0)        # (24, 2)
    valid = jnp.concatenate([va, vb, vi])

    n = jnp.sum(valid)
    cen = jnp.sum(jnp.where(valid[:, None], pts, 0.0), axis=0) / \
        jnp.maximum(n, 1)
    ang = jnp.arctan2(pts[:, 1] - cen[1], pts[:, 0] - cen[0])
    ang = jnp.where(valid, ang, jnp.inf)               # invalid sort last
    order = jnp.argsort(ang)
    sp = pts[order] - cen

    K = pts.shape[0]
    idx = jnp.arange(K)
    nxt = jnp.where(idx + 1 < n, idx + 1, 0)
    q = sp[nxt]
    cross = sp[:, 0] * q[:, 1] - sp[:, 1] * q[:, 0]
    area = jnp.abs(jnp.sum(jnp.where(idx < n, cross, 0.0))) / 2.0
    return jnp.where(n >= 3, area, 0.0)


def pairwise_iou_rotated(boxes1: jnp.ndarray,
                         boxes2: jnp.ndarray) -> jnp.ndarray:
    """(N, 5) x (M, 5) -> (N, M) IoU."""
    c1 = rotated_to_corners(boxes1)
    c2 = rotated_to_corners(boxes2)
    a1 = boxes1[:, 2] * boxes1[:, 3]
    a2 = boxes2[:, 2] * boxes2[:, 3]
    inter = jax.vmap(lambda p1: jax.vmap(
        lambda p2: _convex_intersection_area(p1, p2))(c2))(c1)
    union = a1[:, None] + a2[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def nms_rotated(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
                iou_threshold: float) -> jnp.ndarray:
    """Greedy NMS on rotated boxes via the shared fixed-point machinery
    (ops/nms.py), with the rotated IoU matrix."""
    from ..ops.nms import nms_mask

    iou = pairwise_iou_rotated(boxes, boxes)
    return nms_mask(boxes[:, :4], scores, valid, iou_threshold, iou=iou)


_DEFAULT_SCALE_CLAMP = float(np.log(1000.0 / 16))


def get_deltas_rotated(src: jnp.ndarray, target: jnp.ndarray,
                       weights=(1.0, 1.0, 1.0, 1.0, 1.0)) -> jnp.ndarray:
    """(N, 5) cx,cy,w,h,deg -> (dx, dy, dw, dh, da) deltas (reference
    Box2BoxTransformRotated.get_deltas, box_regression.py:139-175; box
    angles are degrees, delta angles radians)."""
    wx, wy, ww, wh, wa = weights
    dx = wx * (target[:, 0] - src[:, 0]) / src[:, 2]
    dy = wy * (target[:, 1] - src[:, 1]) / src[:, 3]
    dw = ww * jnp.log(target[:, 2] / src[:, 2])
    dh = wh * jnp.log(target[:, 3] / src[:, 3])
    da = (target[:, 4] - src[:, 4] + 180.0) % 360.0 - 180.0
    da = da * (wa * jnp.pi / 180.0)
    return jnp.stack([dx, dy, dw, dh, da], axis=-1)


def apply_deltas_rotated(deltas: jnp.ndarray, boxes: jnp.ndarray,
                         weights=(1.0, 1.0, 1.0, 1.0, 1.0),
                         scale_clamp: float = _DEFAULT_SCALE_CLAMP
                         ) -> jnp.ndarray:
    """Decode (..., K*5) deltas against (..., 5) boxes (reference
    Box2BoxTransformRotated.apply_deltas, box_regression.py:177-220)."""
    wx, wy, ww, wh, wa = weights
    dx = deltas[..., 0::5] / wx
    dy = deltas[..., 1::5] / wy
    dw = jnp.minimum(deltas[..., 2::5] / ww, scale_clamp)
    dh = jnp.minimum(deltas[..., 3::5] / wh, scale_clamp)
    da = deltas[..., 4::5] / wa
    cx = dx * boxes[..., 2:3] + boxes[..., 0:1]
    cy = dy * boxes[..., 3:4] + boxes[..., 1:2]
    w = jnp.exp(dw) * boxes[..., 2:3]
    h = jnp.exp(dh) * boxes[..., 3:4]
    ang = da * (180.0 / jnp.pi) + boxes[..., 4:5]
    ang = (ang + 180.0) % 360.0 - 180.0
    out = jnp.stack([cx, cy, w, h, ang], axis=-1)       # (..., K, 5)
    return out.reshape(*deltas.shape[:-1], deltas.shape[-1])
