"""Precise BatchNorm statistics recomputation.

Equivalent of the reference PreciseBN hook (detectron2/engine/hooks.py:357 /
fvcore update_bn_stats): before evaluation, replace the EMA running
statistics with the TRUE mean/var over N training batches. Functional: takes
and returns the variables pytree; only models with a ``batch_stats``
collection (norm="BN") are affected.
"""

from __future__ import annotations

import logging
from typing import Any, Callable, Iterator

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)


def update_bn_stats(apply_fn: Callable, variables: Any,
                    data_iter: Iterator, num_iters: int = 200) -> Any:
    """Run ``apply_fn(variables, batch, mutable=['batch_stats'])`` over
    ``num_iters`` batches and install the average statistics.

    The EMA form x_ema = m * x_ema + (1-m) * x is inverted by accumulating
    the per-batch stats directly (reference fvcore precise_bn: arithmetic
    mean of batch means/vars).
    """
    if "batch_stats" not in variables:
        logger.info("update_bn_stats: model has no batch_stats; skipping")
        return variables

    def zeros_like_stats(s):
        return jax.tree.map(jnp.zeros_like, s)

    acc = zeros_like_stats(variables["batch_stats"])
    n = 0
    for batch in data_iter:
        if n >= num_iters:
            break
        _, updated = apply_fn(variables, batch, mutable=["batch_stats"])
        # recover this batch's stats from one EMA step:
        # new = m * old + (1 - m) * batch  =>  batch = (new - m*old) / (1-m)
        m = 0.9
        batch_stats = jax.tree.map(
            lambda new, old: (new - m * old) / (1.0 - m),
            updated["batch_stats"], variables["batch_stats"])
        acc = jax.tree.map(lambda a, b: a + b, acc, batch_stats)
        n += 1
    if n == 0:
        return variables
    mean_stats = jax.tree.map(lambda a: a / n, acc)
    out = dict(variables)
    out["batch_stats"] = mean_stats
    logger.info(f"update_bn_stats: recomputed over {n} batches")
    return out
