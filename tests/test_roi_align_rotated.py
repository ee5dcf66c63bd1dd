"""Rotated RoIAlign vs an independent scalar reference + axis-aligned
cross-check against the (torchvision-parity-tested) plain roi_align."""

import numpy as np
import pytest

import jax.numpy as jnp

from drn_wsod_tpu.ops.roi_align import roi_align
from drn_wsod_tpu.ops.roi_align_rotated import roi_align_rotated


def _ref_rotated(feat, rois, scale, R, S):
    """Scalar re-implementation of the reference ROIAlignRotated semantics
    (detectron2 ROIAlignRotated_cpu.cpp): local grid rotated about the
    center, bilinear with zero outside [-1, size], average over S*S."""
    H, W, C = feat.shape
    out = np.zeros((len(rois), R, R, C), np.float64)
    for n, (cx, cy, w, h, ang) in enumerate(rois):
        cx = cx * scale - 0.5
        cy = cy * scale - 0.5
        rw = max(w * scale, 1e-6)
        rh = max(h * scale, 1e-6)
        t = ang * np.pi / 180.0
        ct, st = np.cos(t), np.sin(t)
        bh, bw = rh / R, rw / R
        for py in range(R):
            for px in range(R):
                acc = np.zeros(C)
                for iy in range(S):
                    yy = -rh / 2 + py * bh + (iy + 0.5) * bh / S
                    for ix in range(S):
                        xx = -rw / 2 + px * bw + (ix + 0.5) * bw / S
                        y = yy * ct - xx * st + cy
                        x = yy * st + xx * ct + cx
                        if y < -1.0 or y > H or x < -1.0 or x > W:
                            continue
                        y = min(max(y, 0.0), H - 1)
                        x = min(max(x, 0.0), W - 1)
                        y0, x0 = int(np.floor(y)), int(np.floor(x))
                        y1, x1 = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
                        ly, lx = y - y0, x - x0
                        acc += ((1 - ly) * (1 - lx) * feat[y0, x0]
                                + (1 - ly) * lx * feat[y0, x1]
                                + ly * (1 - lx) * feat[y1, x0]
                                + ly * lx * feat[y1, x1])
                out[n, py, px] = acc / (S * S)
    return out


@pytest.mark.parametrize("angle", [0.0, 30.0, -45.0, 90.0, 180.0])
def test_matches_scalar_reference(angle):
    rng = np.random.RandomState(0)
    feat = rng.randn(24, 20, 3).astype(np.float32)
    rois = np.array([
        [40.0, 36.0, 48.0, 32.0, angle],
        [12.0, 60.0, 90.0, 70.0, angle + 10.0],
        [70.0, 20.0, 16.0, 24.0, angle - 7.0],
    ], np.float32)
    got = np.asarray(roi_align_rotated(
        jnp.asarray(feat), jnp.asarray(rois), 0.25,
        resolution=5, sampling_ratio=2))
    want = _ref_rotated(feat, rois, 0.25, 5, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_angle_zero_equals_aligned_roi_align():
    rng = np.random.RandomState(1)
    feat = rng.randn(32, 32, 4).astype(np.float32)
    # (cx, cy, w, h, 0) == aligned XYXY RoIAlign on the same rectangle
    rot = np.array([[40.0, 52.0, 56.0, 40.0, 0.0],
                    [80.0, 60.0, 30.0, 70.0, 0.0]], np.float32)
    xyxy = np.stack([rot[:, 0] - rot[:, 2] / 2, rot[:, 1] - rot[:, 3] / 2,
                     rot[:, 0] + rot[:, 2] / 2, rot[:, 1] + rot[:, 3] / 2],
                    -1)
    got = np.asarray(roi_align_rotated(
        jnp.asarray(feat), jnp.asarray(rot), 0.25,
        resolution=7, sampling_ratio=2))
    want = np.asarray(roi_align(
        jnp.asarray(feat), jnp.asarray(xyxy), 0.25,
        resolution=7, sampling_ratio=2, aligned=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_chunked_matches_unchunked():
    rng = np.random.RandomState(2)
    feat = rng.randn(16, 16, 2).astype(np.float32)
    rois = np.stack([
        rng.uniform(8, 56, 40), rng.uniform(8, 56, 40),
        rng.uniform(4, 40, 40), rng.uniform(4, 40, 40),
        rng.uniform(-180, 180, 40)], -1).astype(np.float32)
    a = np.asarray(roi_align_rotated(jnp.asarray(feat), jnp.asarray(rois),
                                     0.25, resolution=3, chunk=16))
    b = np.asarray(roi_align_rotated(jnp.asarray(feat), jnp.asarray(rois),
                                     0.25, resolution=3, chunk=512))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
