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
import jax.numpy as jnp


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
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return x
