#!/usr/bin/env python
"""Measure how much of the flagship bench step is axon-tunnel dispatch
overhead vs device compute.

The bench (bench.py) enqueues 20 separate `step` dispatches and fences once.
If the remote-TPU tunnel's per-dispatch enqueue cost is a few ms and does NOT
fully overlap device execution, the measured step time overstates the true
device step. This probe separates the two:

  1. tunnel health: 1024^2 matmul latency
  2. dispatch-rate ceiling: N chained trivial ops, fence once -> ms/dispatch
  3. flagship step, bench-style (20 dispatches, fence once)
  4. flagship step, K steps inside ONE jitted lax.scan dispatch (device-only)

If (4) << (3)/K, the gap is tunnel artifact, not device time.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_default_prng_impl", "rbg")


def fence(x):
    return float(jax.device_get(jnp.sum(jax.tree.leaves(x)[0]).astype(jnp.float32)))


def main():
    t0 = time.perf_counter()
    x = jnp.ones((1024, 1024), jnp.bfloat16)
    fence(x @ x)
    print(f"health probe (compile+run): {time.perf_counter() - t0:.2f}s")
    t0 = time.perf_counter()
    fence(x @ x)
    print(f"health probe (warm):        {time.perf_counter() - t0:.3f}s")

    # ---- dispatch rate: data-dependent chained adds (each call consumes the
    # previous result, so dispatches cannot be elided or batched)
    @jax.jit
    def bump(v):
        return v + 1.0

    v = jnp.zeros((8, 128), jnp.float32)
    v = bump(v)
    fence(v)
    N = 100
    t0 = time.perf_counter()
    for _ in range(N):
        v = bump(v)
    fence(v)
    per = (time.perf_counter() - t0) / N * 1e3
    print(f"dispatch-rate ceiling: {per:.2f} ms/dispatch (trivial chained op)")

    # ---- flagship step
    from __graft_entry__ import _synthetic_batch
    from drn_wsod_tpu.config import get_cfg
    from drn_wsod_tpu.engine import create_train_state, make_train_step
    from drn_wsod_tpu.models import build_model
    from drn_wsod_tpu.solver import build_optimizer

    B, H, P = 2, 704, 4096
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "configs/PascalVOC-Detection/oicr_WSR_50_DC5_1x.yaml"))
    model = build_model(cfg)
    batch = _synthetic_batch(B=B, H=H, W=H, P=P,
                             C=cfg.MODEL.ROI_HEADS.NUM_CLASSES)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, batch, train=True)
    tx = build_optimizer(cfg, variables)
    state = create_train_state(variables, tx)
    raw_step = make_train_step(model, tx)
    step = jax.jit(raw_step, donate_argnums=(0,))

    state, metrics = step(state, batch, rng)
    fence(metrics["total_loss"])
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch, rng)
    fence(metrics["total_loss"])
    per_dispatched = (time.perf_counter() - t0) / iters * 1e3
    print(f"bench-style step (20 dispatches): {per_dispatched:.2f} ms/step "
          f"({B / per_dispatched * 1e3:.2f} img/s/chip)")

    # ---- K steps in one dispatch
    K = 20

    def multi(state, batch, rng):
        def body(st, _):
            st, m = raw_step(st, batch, rng)
            return st, m["total_loss"]
        return jax.lax.scan(body, state, None, length=K)

    mstep = jax.jit(multi, donate_argnums=(0,))
    state, losses = mstep(state, batch, rng)
    fence(losses)
    t0 = time.perf_counter()
    state, losses = mstep(state, batch, rng)
    fence(losses)
    per_scanned = (time.perf_counter() - t0) / K * 1e3
    print(f"scanned step ({K} steps / 1 dispatch): {per_scanned:.2f} ms/step "
          f"({B / per_scanned * 1e3:.2f} img/s/chip)")
    print(f"tunnel dispatch artifact: {per_dispatched - per_scanned:.2f} "
          "ms/step")


if __name__ == "__main__":
    main()
