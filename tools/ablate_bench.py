#!/usr/bin/env python
"""Ablation microbenchmarks of the flagship train step (perf work tool).

Times jitted variants of the OICR WS-R50-DC5 workload to attribute the
step's milliseconds to components. Timing fence: value-dependent
jax.device_get of a scalar (block_until_ready does not fence on axon).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_default_prng_impl", "rbg")


def timeit(f, *args, iters=10, name=""):
    out = f(*args)
    leaf = jax.tree.leaves(out)[0]
    float(jax.device_get(jnp.sum(leaf).astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    leaf = jax.tree.leaves(out)[0]
    float(jax.device_get(jnp.sum(leaf).astype(jnp.float32)))
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:55s} {ms:8.2f} ms")
    return ms


def main():
    from __graft_entry__ import _synthetic_batch
    from drn_wsod_tpu.config import get_cfg
    from drn_wsod_tpu.engine import create_train_state, make_train_step
    from drn_wsod_tpu.models import build_model
    from drn_wsod_tpu.solver import build_optimizer

    B, H, P = 2, 704, 4096
    # the ACTUAL flagship config (DAN_DIM [2048, 4096]; the generic default's
    # [4096, 4096] doubles FC1 FLOPs and OOMs when two states are alive)
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

    # ---- full step
    step = jax.jit(make_train_step(model, tx))
    timeit(step, state, batch, rng, name=f"full train step (B={B})")

    # ---- forward-only loss
    @jax.jit
    def fwd_loss(variables, batch, rng):
        losses = model.apply(variables, batch, train=True,
                             rngs={"dropout": rng})
        return sum(jax.tree.leaves(losses))
    timeit(fwd_loss, state.params, batch, rng, name="forward loss only")

    # ---- fwd + bwd (no optimizer)
    @jax.jit
    def fwd_bwd(variables, batch, rng):
        return jax.grad(lambda v: fwd_loss.__wrapped__(v, batch, rng))(
            variables)
    timeit(fwd_bwd, state.params, batch, rng, name="forward+backward (no opt)")

    # ---- inference scores
    @jax.jit
    def infer(variables, batch):
        return model.apply(variables, batch, method="inference_scores")
    timeit(infer, state.params, batch, name="inference_scores fwd")

    # ---- K steps in ONE dispatch (no tunnel enqueue cost per step)
    raw_step = make_train_step(model, tx)
    K = 10

    def multi(state, batch, rng):
        def body(st, _):
            st, m = raw_step(st, batch, rng)
            return st, m["total_loss"]
        return jax.lax.scan(body, state, None, length=K)

    mstep = jax.jit(multi)
    ms = timeit(mstep, state, batch, rng,
                iters=2, name=f"scanned {K}-step dispatch (total)")
    print(f"{'  -> per step':55s} {ms / K:8.2f} ms")

    # ---- pool kernel alone (the shipped batch-in-grid path, flagship knobs)
    from drn_wsod_tpu.ops.roi_pool_pallas import (roi_pool_pallas,
                                                  roi_pool_pallas_grid)
    C = 2048
    Hf = H // 8
    feats = jax.random.normal(rng, (Hf, Hf, C), jnp.bfloat16)
    boxes = batch.proposals[0]
    scale = jnp.ones((P,), jnp.float32)

    @jax.jit
    def pool_grid(feats, boxes, scale):
        return roi_pool_pallas_grid(
            jnp.broadcast_to(feats, (B, Hf, Hf, C)),
            jnp.broadcast_to(boxes, (B, P, 4)), 0.125, 7,
            roi_scale=jnp.broadcast_to(scale, (B, P)), roi_block=16)
    timeit(pool_grid, feats, boxes, scale,
           name=f"pallas pool grid CT=1024 (B={B})")

    @jax.jit
    def pool_b(feats, boxes, scale):
        one = lambda f, bx, s: roi_pool_pallas(f, bx, 0.125, 7,
                                               roi_scale=s)
        return jax.vmap(one)(
            jnp.broadcast_to(feats, (B, Hf, Hf, C)),
            jnp.broadcast_to(boxes, (B, P, 4)),
            jnp.broadcast_to(scale, (B, P)))
    timeit(pool_b, feats, boxes, scale,
           name=f"pallas pool vmap CT=512 (B={B})")

    # ---- FC1 alone (fwd)
    D = 2048
    x = jax.random.normal(rng, (B * P, 49 * C), jnp.bfloat16)
    w = jax.random.normal(rng, (49 * C, D), jnp.bfloat16)

    @jax.jit
    def fc1(x, w):
        return x @ w
    timeit(fc1, x, w, name="FC1 fwd alone")

    @jax.jit
    def fc1_wgrad(x, dy):
        return x.T @ dy
    dy = jax.random.normal(rng, (B * P, D), jnp.bfloat16)
    timeit(fc1_wgrad, x, dy, name="FC1 wgrad alone")

    # ---- optimizer alone (moved before the WSDDN variant so the OICR
    # state can be freed before a second model's state is materialized)
    @jax.jit
    def opt_only(state):
        grads = jax.tree.map(jnp.zeros_like, state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        import optax
        params = optax.apply_updates(state.params, updates)
        return params
    timeit(opt_only, state, name="optimizer update alone")
    del state

    # ---- WSDDN-only variant (no refinement branches)
    cfg2 = get_cfg()
    cfg2.merge_from_file(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "configs/PascalVOC-Detection/oicr_WSR_50_DC5_1x.yaml"))
    cfg2.MODEL.ROI_HEADS.NAME = "WSDDNROIHeads"
    model2 = build_model(cfg2)
    variables2 = model2.init({"params": rng, "dropout": rng}, batch,
                             train=True)
    tx2 = build_optimizer(cfg2, variables2)
    state2 = create_train_state(variables2, tx2)
    step2 = jax.jit(make_train_step(model2, tx2))
    timeit(step2, state2, batch, rng, name="train step WSDDN-only (no OICR)")


if __name__ == "__main__":
    main()
