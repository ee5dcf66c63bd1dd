"""Mean-field dense-CRF refinement, on device.

The reference wraps the external ``densecrf`` C++ library through a CPU-only
native op (projects/WSL/wsl/layers/csrc/crf/crf_cpu.cpp; the submodule is not
even vendored in the repo). Here mean-field inference runs as an XLA program:

  * the spatial (smoothness) Potts kernel is a separable Gaussian conv;
  * the bilateral (appearance) kernel is approximated by a box-guided
    Gaussian over a downsampled color embedding — a standard practical
    approximation of permutohedral filtering that stays fully on device.

API mirrors the reference wrapper (wsl/layers/csc.py-adjacent ``crf_forward``):
unaries + RGB image -> refined label probabilities.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _gaussian_kernel1d(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def _spatial_message(q: jnp.ndarray, sigma: float, radius: int) -> jnp.ndarray:
    """Mass-normalized Gaussian-filtered beliefs (normalization keeps the
    message a proper distribution at zero-padded borders)."""
    k = _gaussian_kernel1d(sigma, radius)
    H, W, C = q.shape

    def blur(x):
        xx = x.transpose(2, 0, 1)[:, None]                  # (C, 1, H, W)
        kr = k.reshape(1, 1, -1, 1)
        kc = k.reshape(1, 1, 1, -1)
        out = jax.lax.conv_general_dilated(
            xx, kr, (1, 1), [((len(k) - 1) // 2,) * 2, (0, 0)])
        out = jax.lax.conv_general_dilated(
            out, kc, (1, 1), [(0, 0), ((len(k) - 1) // 2,) * 2])
        return out[:, 0].transpose(1, 2, 0)

    mass = blur(jnp.ones((H, W, 1)))
    return blur(q) / jnp.maximum(mass, 1e-6)


def _bilateral_message(q: jnp.ndarray, image: jnp.ndarray,
                       sigma_spatial: float, sigma_color: float,
                       radius: int) -> jnp.ndarray:
    """Color-weighted local filtering: for each offset in a window, weight
    the shifted beliefs by a Gaussian in color distance."""
    H, W, C = q.shape
    img = image.astype(jnp.float32) / sigma_color
    msg = jnp.zeros_like(q)
    norm = jnp.zeros((H, W, 1))
    import math

    offsets = [(dy, dx) for dy in range(-radius, radius + 1)
               for dx in range(-radius, radius + 1)]
    spatial_k = {o: math.exp(-0.5 * (o[0] ** 2 + o[1] ** 2)
                             / sigma_spatial ** 2) for o in offsets}
    for dy, dx in offsets:
        shifted_q = jnp.roll(q, (dy, dx), axis=(0, 1))
        shifted_img = jnp.roll(img, (dy, dx), axis=(0, 1))
        w = jnp.exp(-0.5 * jnp.sum((img - shifted_img) ** 2, -1,
                                   keepdims=True)) * spatial_k[(dy, dx)]
        msg = msg + w * shifted_q
        norm = norm + w
    return msg / jnp.maximum(norm, 1e-6)


@partial(jax.jit, static_argnames=("num_iters", "spatial_radius",
                                   "bilateral_radius", "downsample"))
def crf_inference(unary: jnp.ndarray, image: jnp.ndarray,
                  num_iters: int = 5,
                  spatial_weight: float = 3.0, spatial_sigma: float = 3.0,
                  spatial_radius: int = 5,
                  bilateral_weight: float = 5.0,
                  bilateral_sigma_spatial: float = 10.0,
                  bilateral_sigma_color: float = 13.0,
                  bilateral_radius: int = 3,
                  downsample: int = 2,
                  compat: float = 1.0) -> jnp.ndarray:
    """Mean-field CRF.

    Args:
      unary: (H, W, L) class probabilities (will be renormalized).
      image: (H, W, 3) RGB/BGR pixels 0-255.

    Returns: (H, W, L) refined probabilities.
    """
    H, W, L = unary.shape
    log_unary = jnp.log(jnp.clip(unary, 1e-8))

    if downsample > 1:
        h2, w2 = H // downsample, W // downsample
        small_img = jax.image.resize(image.astype(jnp.float32),
                                     (h2, w2, image.shape[-1]), "linear")
    else:
        small_img = image.astype(jnp.float32)

    q = jax.nn.softmax(log_unary, axis=-1)
    for _ in range(num_iters):
        sp = _spatial_message(q, spatial_sigma, spatial_radius)
        if downsample > 1:
            q_small = jax.image.resize(q, (small_img.shape[0],
                                           small_img.shape[1], L), "linear")
            bl = _bilateral_message(q_small, small_img,
                                    bilateral_sigma_spatial,
                                    bilateral_sigma_color, bilateral_radius)
            bl = jax.image.resize(bl, (H, W, L), "linear")
        else:
            bl = _bilateral_message(q, small_img, bilateral_sigma_spatial,
                                    bilateral_sigma_color, bilateral_radius)
        # Potts model: exponent = log p(l) + w * (k * Q)(l) (+ const); both
        # messages are normalized distributions, so no drift at borders.
        pairwise = compat * (spatial_weight * sp + bilateral_weight * bl)
        q = jax.nn.softmax(log_unary + pairwise, axis=-1)
    return q
