#!/usr/bin/env python
"""Isolate the scan-dispatch gap on the flagship step (round-5 PERF work).

Round 3 recorded 74.75 ms/step for "20 steps in ONE lax.scan dispatch"
(tools/dispatch_probe.py) — but that scan used xs=None, i.e. ONE batch
reused for all 20 steps. The shipped Trainer scans over a 20-stacked batch
of FRESH per-step data (engine/trainer.py), which bench.py has matched
since round 4; it measured 86.5 ms/step on a degraded tunnel vs per-step
dispatch's 79.6. This probe separates the variables on one session:

  1. per-step dispatch x20 (fence once)
  2. scan over fresh stacked batches, f32 images (bench methodology)
  3. scan over fresh stacked batches, u8 images (the SHIPPED data format —
     the mapper ships uint8 pixels since round 4; preprocess casts in-graph)
  4. scan with xs=None, one batch reused (round-3 methodology)

Timing fence: value-dependent device_get (axon). Run on a HEALTHY tunnel
(probe <= 15s) or the numbers measure the tunnel.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    jax.config.update("jax_default_prng_impl", "rbg")

    from __graft_entry__ import _synthetic_batch
    from drn_wsod_tpu.config import get_cfg
    from drn_wsod_tpu.engine import (create_train_state, make_multi_train_step,
                                     make_train_step)
    from drn_wsod_tpu.models import build_model
    from drn_wsod_tpu.solver import build_optimizer

    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs/PascalVOC-Detection/oicr_WSR_50_DC5_1x.yaml"))
    B, H, P, K = 2, 704, 4096, 20

    model = build_model(cfg)
    batch = _synthetic_batch(B=B, H=H, W=H, P=P,
                             C=cfg.MODEL.ROI_HEADS.NUM_CLASSES)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, batch, train=True)
    tx = build_optimizer(cfg, variables)
    raw_step = make_train_step(model, tx)

    def fresh_state():
        # deep-copy: donated buffers from a previous variant's jit must not
        # alias the shared `variables` pytree
        fresh = jax.tree.map(lambda x: jnp.array(x, copy=True), variables)
        return create_train_state(fresh, tx)

    def fence(x):
        float(jax.device_get(jnp.asarray(x).reshape(-1)[-1].astype(jnp.float32)))

    def stacked_batches(as_u8):
        bs = [_synthetic_batch(B=B, H=H, W=H, P=P,
                               C=cfg.MODEL.ROI_HEADS.NUM_CLASSES, seed=i)
              for i in range(K)]
        st = jax.tree.map(lambda *xs: np.stack([np.asarray(x) for x in xs]),
                          *bs)
        if as_u8:
            st = st.replace(image=np.clip(st.image, 0, 255).astype(np.uint8))
        dev = jax.device_put(st)
        fence(dev.image[0].astype(jnp.float32)[0, 0, 0])
        return dev

    results = {}

    # 1. per-step
    step = jax.jit(raw_step, donate_argnums=(0,))
    st = fresh_state()
    st, m = step(st, batch, rng)
    fence(m["total_loss"])
    t0 = time.perf_counter()
    for _ in range(K):
        st, m = step(st, batch, rng)
    fence(m["total_loss"])
    results["per_step"] = (time.perf_counter() - t0) / K * 1e3

    multi = jax.jit(
        lambda s, xs, r: make_multi_train_step(raw_step)(s, xs, r),
        donate_argnums=(0,))

    # 2/3. scan over fresh stacked batches (f32 then u8 images)
    for name, as_u8 in (("scan_fresh_f32", False), ("scan_fresh_u8", True)):
        stacked = stacked_batches(as_u8)
        st = fresh_state()
        st, m = multi(st, stacked, rng)
        fence(m["total_loss"][-1])
        t0 = time.perf_counter()
        st, m = multi(st, stacked, rng)
        fence(m["total_loss"][-1])
        results[name] = (time.perf_counter() - t0) / K * 1e3
        del stacked, st

    # 4. scan with one reused batch (xs=None; round-3 methodology)
    def multi_reuse(state, batch, r):
        def body(s, _):
            s, m = raw_step(s, batch, r)
            return s, m["total_loss"]

        return jax.lax.scan(body, state, None, length=K)

    mr = jax.jit(multi_reuse, donate_argnums=(0,))
    st = fresh_state()
    st, losses = mr(st, batch, rng)
    fence(losses[-1])
    t0 = time.perf_counter()
    st, losses = mr(st, batch, rng)
    fence(losses[-1])
    results["scan_reused_batch"] = (time.perf_counter() - t0) / K * 1e3

    # 5. python-unrolled K steps in ONE jit, batches as SEPARATE args:
    # no scan slicing of a stacked array, no per-step enqueue — tests
    # whether the fresh-batch penalty is the scan's xs handling
    def unrolled(state, r, *batches):
        losses = []
        for b in batches:
            state, m = raw_step(state, b, r)
            losses.append(m["total_loss"])
        return state, jnp.stack(losses)

    un = jax.jit(unrolled, donate_argnums=(0,))
    bs = [_synthetic_batch(B=B, H=H, W=H, P=P,
                           C=cfg.MODEL.ROI_HEADS.NUM_CLASSES, seed=i)
          for i in range(K)]
    bs = jax.device_put(bs)
    fence(bs[-1].proposals[0, 0, 0])
    st = fresh_state()
    st, losses = un(st, rng, *bs)
    fence(losses[-1])
    t0 = time.perf_counter()
    st, losses = un(st, rng, *bs)
    fence(losses[-1])
    results["unrolled_fresh"] = (time.perf_counter() - t0) / K * 1e3

    for k, v in results.items():
        print(f"{k:20s} {v:7.2f} ms/step  {B / v * 1e3:6.2f} img/s/chip",
              flush=True)


if __name__ == "__main__":
    main()
