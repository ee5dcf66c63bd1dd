"""Optimizer / LR schedule construction.

Re-implements the reference solver semantics
(detectron2/solver/build.py:94-160, solver/lr_scheduler.py:16-116) on optax:

  * SGD + momentum with torch update order (decoupled -> coupled L2: grad +=
    wd * param, then momentum, then lr);
  * per-parameter groups: biases get ``BASE_LR * BIAS_LR_FACTOR`` and
    ``WEIGHT_DECAY_BIAS``; (trainable) norm params get ``WEIGHT_DECAY_NORM``;
  * frozen parameters (FrozenBN statistics, backbone stages below FREEZE_AT)
    receive no update at all;
  * WarmupMultiStepLR / WarmupCosineLR as optax schedules.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Sequence

import jax
import jax.numpy as jnp
import optax

_FROZEN_BN_LEAVES = ("running_mean", "running_var")


def warmup_factor_at(it, method: str, warmup_iters: int, warmup_factor: float):
    """Reference _get_warmup_factor_at_iter (lr_scheduler.py:90-116)."""
    if warmup_iters <= 0:
        return jnp.asarray(1.0)
    if method == "constant":
        return jnp.where(it < warmup_iters, warmup_factor, 1.0)
    if method == "linear":
        alpha = jnp.minimum(it / warmup_iters, 1.0)
        return jnp.where(it < warmup_iters,
                         warmup_factor * (1 - alpha) + alpha, 1.0)
    raise ValueError(f"Unknown warmup method: {method}")


def warmup_multistep_schedule(base_lr: float, steps: Sequence[int],
                              gamma: float, warmup_factor: float,
                              warmup_iters: int, warmup_method: str
                              ) -> Callable[[jnp.ndarray], jnp.ndarray]:
    steps_arr = jnp.asarray(list(steps), dtype=jnp.int32) if len(steps) else None

    def sched(count):
        it = count.astype(jnp.float32) if hasattr(count, "astype") else jnp.asarray(count, jnp.float32)
        w = warmup_factor_at(it, warmup_method, warmup_iters, warmup_factor)
        if steps_arr is None:
            mult = 1.0
        else:
            mult = gamma ** jnp.sum(it >= steps_arr.astype(jnp.float32))
        return base_lr * w * mult

    return sched


def warmup_cosine_schedule(base_lr: float, max_iters: int, warmup_factor: float,
                           warmup_iters: int, warmup_method: str
                           ) -> Callable[[jnp.ndarray], jnp.ndarray]:
    def sched(count):
        it = jnp.asarray(count, jnp.float32)
        w = warmup_factor_at(it, warmup_method, warmup_iters, warmup_factor)
        cos = 0.5 * (1.0 + jnp.cos(math.pi * it / max_iters))
        return base_lr * w * cos

    return sched


def build_lr_schedule(cfg) -> Callable[[jnp.ndarray], jnp.ndarray]:
    s = cfg.SOLVER
    if s.LR_SCHEDULER_NAME == "WarmupMultiStepLR":
        return warmup_multistep_schedule(
            s.BASE_LR, tuple(s.STEPS), s.GAMMA, s.WARMUP_FACTOR,
            s.WARMUP_ITERS, s.WARMUP_METHOD)
    if s.LR_SCHEDULER_NAME == "WarmupCosineLR":
        return warmup_cosine_schedule(
            s.BASE_LR, s.MAX_ITER, s.WARMUP_FACTOR, s.WARMUP_ITERS,
            s.WARMUP_METHOD)
    raise ValueError(f"Unknown LR scheduler: {s.LR_SCHEDULER_NAME}")


# ---------------------------------------------------------------------------
# Parameter partitioning
# ---------------------------------------------------------------------------

def _backbone_frozen_prefixes(freeze_at: int) -> tuple:
    """Module-name prefixes inside ``backbone`` frozen at a given FREEZE_AT
    (reference ResNet.freeze, resnet_ws.py:530-552: 1 freezes the stem,
    k >= 2 freezes res_k / plain_k)."""
    prefixes = []
    if freeze_at >= 1:
        prefixes += ["stem", "plain1"]
    for k in range(2, freeze_at + 1):
        prefixes += [f"res{k}_", f"plain{k}"]
    return tuple(prefixes)


def make_param_labels(params: Dict[str, Any], freeze_at: int) -> Dict[str, Any]:
    """Label each param leaf 'frozen' | 'bias' | 'weight' by its path."""
    frozen_prefixes = _backbone_frozen_prefixes(freeze_at)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label_for(path) -> str:
        keys = [p.key for p in path if hasattr(p, "key")]
        leaf = keys[-1]
        # FrozenBN: statistics always frozen; its affine lives under *_norm
        # module names and is frozen too (it is never trained in detection).
        if leaf in _FROZEN_BN_LEAVES:
            return "frozen"
        if any("_norm" in k or k == "norm" for k in keys[:-1]):
            return "frozen"
        if "backbone" in keys:
            i = keys.index("backbone")
            module = keys[i + 1] if i + 1 < len(keys) else ""
            if any(module.startswith(p) for p in frozen_prefixes):
                return "frozen"
        return "bias" if leaf == "bias" else "weight"

    labels = {jax.tree_util.keystr(path): label_for(path) for path, _ in flat}
    return jax.tree_util.tree_map_with_path(
        lambda path, _: labels[jax.tree_util.keystr(path)], params)


def _sgd(lr_schedule, weight_decay, momentum, nesterov, clip=None,
         momentum_dtype=None):
    chain = []
    if clip is not None:
        chain.append(clip)
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    if momentum:
        # momentum_dtype="bfloat16" halves the optimizer's HBM traffic on
        # the 850MB momentum buffers (a TPU-side option; the reference is
        # f32 throughout — default unchanged)
        chain.append(optax.trace(decay=momentum, nesterov=nesterov,
                                 accumulator_dtype=momentum_dtype))
    chain.append(optax.scale_by_learning_rate(lr_schedule))
    return optax.chain(*chain)


def build_optimizer(cfg, params) -> optax.GradientTransformation:
    """SGD with reference param-group semantics. ``params`` is the init
    pytree used only to derive labels."""
    s = cfg.SOLVER
    sched = build_lr_schedule(cfg)
    if cfg.WSL.ITER_SIZE > 1:
        # The reference steps its LR scheduler every ITERATION while the
        # optimizer steps every ITER_SIZE iters (train_net.py:100-113 +
        # LRScheduler hook), so the n-th parameter update (0-based) uses the
        # lr of micro-iteration (n+1)*k - 1. optax's schedule count under
        # MultiSteps increments once per UPDATE — remap it, or warmup and
        # STEPS silently stretch by ITER_SIZE
        # (tests/test_solver_trajectory.py covers this end to end vs torch).
        k = int(cfg.WSL.ITER_SIZE)
        iter_sched = sched
        sched = lambda n: iter_sched((n + 1) * k - 1)  # noqa: E731
    bias_sched = lambda it: sched(it) * s.BIAS_LR_FACTOR  # noqa: E731

    clip = None
    if s.CLIP_GRADIENTS.ENABLED:
        if s.CLIP_GRADIENTS.CLIP_TYPE == "value":
            clip = optax.clip(s.CLIP_GRADIENTS.CLIP_VALUE)
        else:
            clip = optax.clip_by_global_norm(s.CLIP_GRADIENTS.CLIP_VALUE)

    mom_dtype = getattr(s, "MOMENTUM_DTYPE", "float32")
    mom_dtype = None if mom_dtype in ("", "float32") else mom_dtype
    labels = make_param_labels(params, cfg.MODEL.BACKBONE.FREEZE_AT)
    tx = optax.multi_transform(
        {
            "weight": _sgd(sched, s.WEIGHT_DECAY, s.MOMENTUM, s.NESTEROV,
                           clip, mom_dtype),
            "bias": _sgd(bias_sched, s.WEIGHT_DECAY_BIAS, s.MOMENTUM,
                         s.NESTEROV, clip, mom_dtype),
            "frozen": optax.set_to_zero(),
        },
        labels,
    )
    if cfg.WSL.ITER_SIZE > 1:
        # Gradient accumulation with the reference's ITER_SIZE semantics
        # (projects/WSL/tools/train_net.py:100-113): losses are averaged over
        # the accumulation window before stepping.
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.WSL.ITER_SIZE)
    return tx
