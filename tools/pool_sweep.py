#!/usr/bin/env python
"""Pool-kernel variant sweep on hardware (perf work tool).

Sweeps the batch-in-grid RoIPool kernel over epilogue/RB variants and two
box distributions:
  * "uniform": the flagship bench mix (widths/heights uniform 8..0.4*704px);
  * "voc": a selective-search-like mix (log-normal, median ~56px, heavy
    small-box mass) approximating real VOC proposal statistics — this is the
    distribution the row-share/degenerate-y tiers were designed for
    (VERDICT r2 ask #8: tier behavior on VOC-like mixes was unmeasured on
    hardware).

Timing fence: enqueue-N, value-dependent device_get once (axon tunnel).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *args, iters=10, name=""):
    out = f(*args)
    float(jax.device_get(jnp.sum(out[0, 0, 0, 0, :8].astype(jnp.float32))))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    float(jax.device_get(jnp.sum(out[0, 0, 0, 0, :8].astype(jnp.float32))))
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:58s} {ms:8.2f} ms", flush=True)
    return ms


def boxes_uniform(rs, B, P, S):
    x1 = rs.uniform(0, S * 0.6, (B, P)).astype(np.float32)
    y1 = rs.uniform(0, S * 0.6, (B, P)).astype(np.float32)
    w = rs.uniform(8, S * 0.4, (B, P)).astype(np.float32)
    h = rs.uniform(8, S * 0.4, (B, P)).astype(np.float32)
    return np.stack([x1, y1, np.minimum(x1 + w, S - 1),
                     np.minimum(y1 + h, S - 1)], -1)


def boxes_voc(rs, B, P, S):
    """Selective-search-like: log-normal side lengths, median ~56px at
    704px scale (the VOC ss proposal histogram is dominated by boxes under
    ~100px with a long large-box tail)."""
    w = np.exp(rs.normal(np.log(56.0), 0.9, (B, P))).astype(np.float32)
    h = np.exp(rs.normal(np.log(56.0), 0.9, (B, P))).astype(np.float32)
    w = np.clip(w, 8, S - 1)
    h = np.clip(h, 8, S - 1)
    x1 = rs.uniform(0, 1, (B, P)).astype(np.float32) * (S - 1 - w)
    y1 = rs.uniform(0, 1, (B, P)).astype(np.float32) * (S - 1 - h)
    return np.stack([x1, y1, x1 + w, y1 + h], -1)


def tier_histogram(boxes, scale, H, W, R):
    from drn_wsod_tpu.ops.roi_pool_pallas import _kernel_positions
    t = np.asarray(jax.vmap(lambda bx: _kernel_positions(
        bx, scale, H, W, R)[3])(jnp.asarray(boxes)))[..., 0].ravel()
    tot = t.size
    return " ".join(f"t{k}:{(t == k).sum() / tot:.0%}" for k in range(7))


def main():
    from drn_wsod_tpu.ops.roi_pool_pallas import roi_pool_pallas_grid

    B, P, S, C, R = 2, 4096, 704, 2048, 7
    Hf = S // 8
    rng = jax.random.PRNGKey(0)
    feats = jax.random.normal(rng, (B, Hf, Hf, C), jnp.bfloat16)
    scale_arr = jnp.ones((B, P), jnp.float32)
    rs = np.random.RandomState(0)

    for dist, gen in [("uniform", boxes_uniform), ("voc", boxes_voc)]:
        boxes = jnp.asarray(gen(rs, B, P, S))
        print(f"--- {dist}: {tier_histogram(boxes, 0.125, Hf, Hf, R)}",
              flush=True)
        for rb, je, rsh in [(16, False, True),   # shipped
                            (16, True, True),
                            (8, True, True),
                            (32, True, True),
                            (16, False, False)]:  # row-share off
            f = jax.jit(lambda ft, bx, sc, rb=rb, je=je, rsh=rsh:
                        roi_pool_pallas_grid(ft, bx, 0.125, R,
                                             roi_scale=sc, roi_block=rb,
                                             joint_emit=je, row_share=rsh))
            timeit(f, feats, boxes, scale_arr,
                   name=f"grid RB={rb} joint_emit={je} row_share={rsh}")


if __name__ == "__main__":
    main()
