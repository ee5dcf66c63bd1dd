"""DiscriminativeAdaptionNeck (DAN) box head.

Re-implementation of the reference DAN
(projects/WSL/wsl/modeling/roi_heads/box_head.py:14-103): optional convs then
``NUM_FC`` fully-connected layers with ReLU + Dropout(0.5), FC weights
init normal(std=0.005), bias 0.1. Operates on (N, D) flattened pooled
features; the caller flattens (P, 7, 7, C) -> (P, 7*7*C).

Note on layout: the reference flattens NCHW (C, 7, 7); we flatten NHWC
(7, 7, C). The torch-checkpoint importer permutes FC1 weights accordingly.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class FastDropout(nn.Module):
    """Dropout with a fast exact path for rate=0.5 (the reference DAN's only
    rate): keep = the top bit of raw PRNG words — one shift + select instead
    of the bits->unit-float->compare chain (saves ~1 ms/step on the 50M-mask
    flagship DAN at B=2). Other rates fall back to ``nn.Dropout`` semantics.
    """
    rate: float = 0.5

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        if deterministic or self.rate == 0.0:
            return x
        rng = self.make_rng("dropout")
        if self.rate == 0.5:
            bits = jax.random.bits(rng, x.shape, jnp.uint32)
            return jnp.where(bits >> 31, x + x, jnp.zeros_like(x))
        keep = jax.random.bernoulli(rng, 1.0 - self.rate, x.shape)
        return jnp.where(keep, x / (1.0 - self.rate), jnp.zeros_like(x))


class DiscriminativeAdaptionNeck(nn.Module):
    dan_dims: Sequence[int] = (4096, 4096)
    dropout_rate: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        if x.ndim > 2:
            x = x.reshape(x.shape[0], -1)
        for i, dim in enumerate(self.dan_dims, start=1):
            x = nn.Dense(
                dim,
                kernel_init=nn.initializers.normal(stddev=0.005),
                bias_init=nn.initializers.constant(0.1),
                dtype=self.dtype,
                name=f"fc{i}",
            )(x)
            x = nn.relu(x)
            x = FastDropout(self.dropout_rate)(x, deterministic=not train)
        return x
