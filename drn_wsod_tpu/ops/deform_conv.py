"""Deformable convolution (v1/v2) as bilinear gathers + einsum.

TPU-native equivalent of the reference CUDA kernels
(detectron2/layers/csrc/deformable/, layers/deform_conv.py): each output
position samples its K*K receptive-field taps at learned offsets (bilinear),
optionally modulated (v2); the contraction with the kernel weights is a
single einsum on the MXU. All shapes static.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("kernel_size", "dilation"))
def deform_conv2d(x: jnp.ndarray, offsets: jnp.ndarray, weight: jnp.ndarray,
                  modulation: jnp.ndarray | None = None,
                  kernel_size: int = 3, dilation: int = 1) -> jnp.ndarray:
    """Single image deformable conv, stride 1, SAME padding.

    Args:
      x: (H, W, Cin).
      offsets: (H, W, 2*K*K) — (dy, dx) per tap, reference channel order.
      weight: (K, K, Cin, Cout).
      modulation: optional (H, W, K*K) sigmoid-activated scales (v2).

    Returns: (H, W, Cout).
    """
    H, W, Cin = x.shape
    K = kernel_size
    r = dilation * (K - 1) // 2

    ky, kx = jnp.meshgrid(jnp.arange(K), jnp.arange(K), indexing="ij")
    base_dy = (ky.reshape(-1) * dilation - r).astype(jnp.float32)  # (K*K,)
    base_dx = (kx.reshape(-1) * dilation - r).astype(jnp.float32)

    hh, ww = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    off = offsets.reshape(H, W, K * K, 2)
    ys = hh[:, :, None] + base_dy[None, None, :] + off[..., 0]
    xs = ww[:, :, None] + base_dx[None, None, :] + off[..., 1]

    # bilinear sample with zero padding outside
    def corner(yi, xi, wy, wx):
        inb = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        flat = x.reshape(H * W, Cin)
        v = jnp.take(flat, (yc * W + xc).reshape(-1), axis=0)
        v = v.reshape(H, W, K * K, Cin)
        w_ = (wy * wx * inb.astype(jnp.float32))[..., None]
        return v * w_.astype(v.dtype)

    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    fy = ys - y0
    fx = xs - x0
    sampled = (corner(y0, x0, 1 - fy, 1 - fx)
               + corner(y0, x0 + 1, 1 - fy, fx)
               + corner(y0 + 1, x0, fy, 1 - fx)
               + corner(y0 + 1, x0 + 1, fy, fx))       # (H, W, K*K, Cin)

    if modulation is not None:
        sampled = sampled * modulation[..., None].astype(sampled.dtype)

    w_flat = weight.reshape(K * K, Cin, -1)
    return jnp.einsum("hwkc,kco->hwo", sampled, w_flat,
                      preferred_element_type=jnp.float32).astype(x.dtype)
