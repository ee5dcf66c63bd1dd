"""Rotated RoIAlign as static-shape gathers.

TPU-native replacement for the reference's CUDA ROIAlignRotated
(detectron2/layers/csrc/ROIAlignRotated/ROIAlignRotated_cuda.cu,
detectron2/layers/roi_align_rotated.py) used by rotated-box detection
(RRPN / RROIHeads).

Semantics match the reference kernel:
  * rois are (cx, cy, w, h, angle_degrees), angle counter-clockwise.
  * continuous-coordinate convention is always "aligned": centers are
    scaled by ``spatial_scale`` then shifted by -0.5 (the reference kernel
    hard-codes this; ROIAlignRotated_cuda.cu:~"roi_center_w ... - 0.5").
  * every bin averages a fixed S x S grid of bilinear samples placed in
    the ROI's local (un-rotated) frame and rotated about the ROI center:
        y = yy*cos(t) - xx*sin(t) + cy
        x = yy*sin(t) + xx*cos(t) + cx
  * sample points outside [-1, size] contribute zero (same boundary rule
    as RoIAlign); the average divides by the full S*S count.

Like ops/roi_align.py, ``sampling_ratio`` is static (the reference's
adaptive ceil(bin) grid is a dynamic shape); the iteration is over the
S x S sub-grid so the peak intermediate is one (chunk, R, R, C) buffer
per bilinear corner.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .roi_align import _bilinear_1d


@partial(jax.jit, static_argnames=("resolution", "sampling_ratio", "chunk"))
def roi_align_rotated(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    spatial_scale: float,
    resolution: int = 7,
    sampling_ratio: int = 2,
    chunk: int = 512,
) -> jnp.ndarray:
    """Bilinear average pooling over rotated RoIs.

    Args:
      features: (H, W, C) one image's feature map (NHWC slice).
      boxes: (P, 5) (cx, cy, w, h, angle_deg) in input-image coordinates.
      spatial_scale: 1 / feature stride.

    Returns: (P, resolution, resolution, C), features.dtype.
    """
    H, W, C = features.shape
    P = boxes.shape[0]
    R, S = resolution, sampling_ratio

    b = boxes.astype(jnp.float32)
    cx = b[:, 0] * spatial_scale - 0.5
    cy = b[:, 1] * spatial_scale - 0.5
    roi_w = jnp.maximum(b[:, 2] * spatial_scale, 1e-6)
    roi_h = jnp.maximum(b[:, 3] * spatial_scale, 1e-6)
    theta = b[:, 4] * (jnp.pi / 180.0)
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)

    bin_h = roi_h / R
    bin_w = roi_w / R
    flat = features.reshape(H * W, C)

    # local-frame sample offsets from the ROI center, per (bin, sub-sample)
    ph = jnp.arange(R, dtype=jnp.float32)

    def pool_chunk(args):
        (cxc, cyc, bh, bw, rh, rw, cosc, sinc) = args
        N = cxc.shape[0]
        acc = jnp.zeros((N, R, R, C), jnp.float32)
        for iy in range(S):
            # yy: (N, R) local y of this sub-sample in every y-bin
            yy = (-rh[:, None] / 2.0 + ph[None, :] * bh[:, None]
                  + (iy + 0.5) * bh[:, None] / S)
            for ix in range(S):
                xx = (-rw[:, None] / 2.0 + ph[None, :] * bw[:, None]
                      + (ix + 0.5) * bw[:, None] / S)
                # rotate about the center: (N, R_y, R_x)
                y = (yy[:, :, None] * cosc[:, None, None]
                     - xx[:, None, :] * sinc[:, None, None]
                     + cyc[:, None, None])
                x = (yy[:, :, None] * sinc[:, None, None]
                     + xx[:, None, :] * cosc[:, None, None]
                     + cxc[:, None, None])
                ylo, yhi, wy_lo, wy_hi = _bilinear_1d(y.reshape(N, R * R), H)
                xlo, xhi, wx_lo, wx_hi = _bilinear_1d(x.reshape(N, R * R), W)
                # rotated sample points need independent (y, x) per point:
                # gather the 4 corners at matched flat indices (N, R*R)
                for y_i, wy in ((ylo, wy_lo), (yhi, wy_hi)):
                    for x_i, wx in ((xlo, wx_lo), (xhi, wx_hi)):
                        idx = (y_i * W + x_i).reshape(-1)
                        v = jnp.take(flat, idx, axis=0).reshape(N, R * R, C)
                        acc = acc + (v.astype(jnp.float32)
                                     * (wy * wx)[:, :, None]).reshape(
                                         N, R, R, C)
        return acc / (S * S)

    args = (cx, cy, bin_h, bin_w, roi_h, roi_w, cos_t, sin_t)
    if P <= chunk:
        out = pool_chunk(args)
    else:
        n_chunks = -(-P // chunk)
        pad = n_chunks * chunk - P
        args = tuple(jnp.pad(a, (0, pad)).reshape(n_chunks, chunk)
                     for a in args)
        out = jax.lax.map(pool_chunk, args).reshape(
            n_chunks * chunk, R, R, C)[:P]
    return out.astype(features.dtype)
