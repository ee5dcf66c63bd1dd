"""Mean-field dense-CRF refinement, on device.

The reference wraps the external ``densecrf`` C++ library through a CPU-only
native op (projects/WSL/wsl/layers/csrc/crf/crf_cpu.cpp; the submodule is not
even vendored in the repo). Here mean-field inference runs as an XLA program:

  * the spatial (smoothness) Potts kernel is a separable Gaussian conv;
  * the bilateral (appearance) kernel is approximated by a truncated
    window of statically-enumerated taps (optionally dilated to cover wide
    sigmas at full-resolution colors) — static shifts keep everything
    XLA-compilable (no data-dependent shapes).

Two entry points:

``crf_inference``  — the framework-native API (log-prob unary semantics,
    explicit sigmas). Used by the WSJDS seg post-processing.
``crf_forward``    — REFERENCE-VERBATIM semantics and parameter surface of
    the reference's LIVE CRF path: ``dense_crf`` in
    projects/WSL/wsl/modeling/seg_heads/crf.py:6-85 (pydensecrf). Note the
    native op (wsl/layers/csrc/crf/crf_cpu.cpp), which passes raw
    probabilities as unary energies, is DEAD CODE in the reference — its
    import is commented out (seg_heads/seg_heads.py:12) and every seg head
    calls ``dense_crf`` instead. The live semantics:
    unary = -log(clip(p, 1e-5)) (pydensecrf ``unary_from_softmax``), kernel
    stds auto-scale with image size (scale_factor = size_std / max(H, W),
    seg_heads/crf.py:51), and the mean-field update is
    Q <- softmax(-U + pos_w*(Kg x Q) + bi_w*(Kb x Q)) with symmetrically-
    normalized kernels (densecrf NORMALIZE_SYMMETRIC default; Potts
    compatibility contributes +w through the double negation in
    stepInference). The approximation error vs an exact dense-kernel oracle
    is quantified in
    tests/test_seg_crf.py::test_crf_forward_matches_mean_field_oracle.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _gaussian_kernel1d(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def _spatial_message(q: jnp.ndarray, sigma: float, radius: int,
                     normalize: str = "pixel") -> jnp.ndarray:
    """Gaussian-filtered beliefs.

    ``normalize="pixel"``: divide by the filtered mass (keeps the message a
    proper distribution at zero-padded borders; crf_inference's historical
    behavior). ``normalize="sym"``: the densecrf library's symmetric
    normalization, out = n * (K x (n * q)) with n = 1/sqrt(K x 1) — identical
    in the interior, differs at borders."""
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
    if normalize == "sym":
        n = jax.lax.rsqrt(jnp.maximum(mass, 1e-20))
        return n * blur(n * q)
    return blur(q) / jnp.maximum(mass, 1e-6)


def _bilateral_raw_filter(q: jnp.ndarray, img: jnp.ndarray,
                          sigma_spatial: float, radius: int,
                          stride: int = 1) -> jnp.ndarray:
    """Unnormalized windowed bilateral filter: sum over window offsets of
    shifted beliefs weighted by a Gaussian in (spatial, color) distance.
    ``img`` is the color embedding already divided by sigma_color. Rolled
    windows wrap at borders; the out-of-window mask kills wrapped taps.

    ``stride`` > 1 dilates the window: taps at offsets
    {-radius..radius} * stride sample the kernel's support at full-resolution
    colors — a subsampled estimate of the dense message whose normalization
    (a ratio estimator) cancels the subsampling factor. This preserves
    per-pixel color detail that downsampling the guidance image destroys."""
    H, W, _ = q.shape
    import math

    yy = jnp.arange(H)[:, None, None]
    xx = jnp.arange(W)[None, :, None]
    msg = jnp.zeros_like(q)
    for ky in range(-radius, radius + 1):
        for kx in range(-radius, radius + 1):
            dy, dx = ky * stride, kx * stride
            sk = math.exp(-0.5 * (dy ** 2 + dx ** 2) / sigma_spatial ** 2)
            shifted_q = jnp.roll(q, (dy, dx), axis=(0, 1))
            shifted_img = jnp.roll(img, (dy, dx), axis=(0, 1))
            inside = (((yy - dy) >= 0) & ((yy - dy) < H)
                      & ((xx - dx) >= 0) & ((xx - dx) < W))
            w = jnp.exp(-0.5 * jnp.sum((img - shifted_img) ** 2, -1,
                                       keepdims=True)) * sk * inside
            msg = msg + w * shifted_q
    return msg


def _bilateral_message(q: jnp.ndarray, image: jnp.ndarray,
                       sigma_spatial: float, sigma_color: float,
                       radius: int, normalize: str = "pixel",
                       stride: int = 1) -> jnp.ndarray:
    """Color-weighted local filtering: for each offset in a (possibly
    dilated) window, weight the shifted beliefs by a Gaussian in color
    distance. ``normalize`` as in :func:`_spatial_message`."""
    H, W, C = q.shape
    img = image.astype(jnp.float32) / sigma_color
    if normalize == "sym":
        mass = _bilateral_raw_filter(jnp.ones((H, W, 1)), img,
                                     sigma_spatial, radius, stride)
        n = jax.lax.rsqrt(jnp.maximum(mass, 1e-20))
        return n * _bilateral_raw_filter(n * q, img, sigma_spatial, radius,
                                         stride)
    # single pass: filter beliefs and the all-ones mass channel together
    both = _bilateral_raw_filter(
        jnp.concatenate([q, jnp.ones((H, W, 1))], -1), img,
        sigma_spatial, radius, stride)
    return both[..., :C] / jnp.maximum(both[..., C:], 1e-6)


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


@partial(jax.jit, static_argnames=("max_iter", "size_std", "pos_w",
                                   "pos_xy_std", "bi_w", "bi_xy_std",
                                   "bi_rgb_std", "bilateral_radius",
                                   "spatial_radius"))
def crf_forward(probs: jnp.ndarray, image: jnp.ndarray,
                max_iter: int = 10, size_std: float = 500.0,
                pos_w: float = 3.0, pos_xy_std: float = 3.0,
                bi_w: float = 10.0, bi_xy_std: float = 80.0,
                bi_rgb_std: float = 13.0,
                bilateral_radius: int = 4,
                spatial_radius: int = 5) -> jnp.ndarray:
    """Reference-verbatim mean-field dense CRF — the LIVE reference path
    (``dense_crf``, projects/WSL/wsl/modeling/seg_heads/crf.py:6-85; the
    native crf_cpu.cpp op is dead code there, import commented at
    seg_heads/seg_heads.py:12).

    Verbatim semantics carried over:

      * unary energies U = -log(clip(p, 1e-5)) (pydensecrf
        ``unary_from_softmax``), so Q0 = softmax(-U) = renormalized p;
      * kernel stds auto-scale with image size: effective std =
        std / (size_std / max(H, W)) — i.e. bi_xy_std=80 means 16% of the
        long side regardless of resolution (seg_heads/crf.py:51);
      * update: Q <- softmax(-U + pos_w*(Kg x Q) + bi_w*(Kb x Q)) with
        symmetrically-normalized kernels (densecrf's default
        NORMALIZE_SYMMETRIC; PottsCompatibility contributes +w to the
        exponent through the double negation in stepInference);
      * Q is returned directly (seg_heads/crf.py:78-85 — no output clamp).

    TPU-native approximation (quantified vs an exact dense-kernel oracle in
    tests/test_seg_crf.py::test_crf_forward_matches_mean_field_oracle): the
    bilateral kernel is sampled by a DILATED static window — taps spaced
    ~sigma/2 apart covering +-2 sigma, weighted by exact full-resolution
    color distances. This plays the role of the permutohedral lattice's
    sigma-spaced sampling while preserving per-pixel color detail (a
    guidance-image downsample, the other standard trick, was measured 37x
    worse on high-frequency guidance).

    Args:
      probs: (H, W, L) label probabilities.
      image: (H, W, 3) pixels in 0..255 (the reference feeds u8 RGB; any
        consistent color space works — only color DISTANCES enter the
        kernel).
    Returns: (H, W, L) refined probabilities.
    """
    H, W, L = probs.shape
    scale = size_std / max(H, W)          # seg_heads/crf.py:51 auto-adjust
    sigma_pos = pos_xy_std / scale
    sigma_bi = bi_xy_std / scale

    log_p = jnp.log(jnp.clip(probs.astype(jnp.float32), 1e-5))
    q = jax.nn.softmax(log_p, axis=-1)

    # dilated bilateral window: taps spaced ~sigma/2 apart (stride) covering
    # +-2 sigma (radius 4) — 86% of the 2-D kernel mass — at FULL-resolution
    # guidance colors. Measured vs the dense oracle on a 48x48 noise-q
    # fixture: downsampling the guidance to sigma/2 grid costs mean |msg|
    # error 1.4e-1 per channel (the color detail is destroyed); the dilated
    # full-res window costs 3.7e-3 at the same tap budget.
    stride = max(1, int(round(sigma_bi / 2.0)))
    img_f = image.astype(jnp.float32)

    pos_radius = min(spatial_radius, max(1, int(2 * sigma_pos + 1)))

    for _ in range(max_iter):
        sp = _spatial_message(q, sigma_pos, pos_radius, normalize="sym")
        bl = _bilateral_message(q, img_f, sigma_bi, bi_rgb_std,
                                bilateral_radius, normalize="sym",
                                stride=stride)
        q = jax.nn.softmax(log_p + pos_w * sp + bi_w * bl, axis=-1)

    return q
