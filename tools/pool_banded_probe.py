#!/usr/bin/env python
"""Hardware probe for the banded two-launch RoIPool (VERDICT r4 item 6).

At the large eval/TTA buckets (1280/1536) the classic batch-in-grid kernel's
full-height level stack collapses the channel tile to 256/128, multiplying
bin-passes 4-8x (PERF.md round-3 "remaining eval headroom"). The banded path
keeps short rois at CT=1024 against 48-row band stacks and runs only the
actual tall rois against the full stack.

Per bucket this probe:
  * times classic (allow_banded=False) vs banded on an eval-scaled VOC-like
    proposal mix (B=1, the eval batch shape, P=4096);
  * reports the short-roi fraction (what the win depends on);
  * checks banded vs classic exactness ON HARDWARE (same tiered samples,
    band-local tables — must match bit-for-bit in bf16).

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
    print(f"{name:52s} {ms:8.2f} ms", flush=True)
    return ms


def boxes_voc_eval(rs, B, P, img_hw):
    """VOC selective-search-like mix in EVAL view coordinates: log-normal
    side lengths with median ~56px at a 375px source image, scaled up by
    the view's resize factor (TTA views upscale small images ~2-4x, which
    is exactly what pushes rois past the band height)."""
    scale = img_hw / 375.0
    med = 56.0 * scale
    w = np.exp(rs.normal(np.log(med), 0.9, (B, P))).astype(np.float32)
    h = np.exp(rs.normal(np.log(med), 0.9, (B, P))).astype(np.float32)
    w = np.clip(w, 8, img_hw - 1)
    h = np.clip(h, 8, img_hw - 1)
    x1 = rs.uniform(0, 1, (B, P)).astype(np.float32) * (img_hw - 1 - w)
    y1 = rs.uniform(0, 1, (B, P)).astype(np.float32) * (img_hw - 1 - h)
    return np.stack([x1, y1, x1 + w, y1 + h], -1)


def main():
    import argparse

    from drn_wsod_tpu.ops.roi_pool_pallas import (roi_pool_pallas_banded,
                                                  roi_pool_pallas_grid)

    ap = argparse.ArgumentParser()
    ap.add_argument("--buckets", default="704,1088,1280,1536",
                    help="comma list; run one at a time to land results "
                         "through short tunnel-health windows")
    args = ap.parse_args()

    B, P, C, R = 1, 4096, 2048, 7
    rs = np.random.RandomState(0)
    rng = jax.random.PRNGKey(0)

    for S in (int(s) for s in args.buckets.split(",")):
        Hf = S // 8
        feats = jax.random.normal(rng, (B, Hf, Hf, C), jnp.bfloat16)
        scale_arr = jnp.ones((B, P), jnp.float32)
        boxes = jnp.asarray(boxes_voc_eval(rs, B, P, S))
        hcells = (np.asarray(boxes[..., 3] - boxes[..., 1] + 1) / 8.0)
        short_frac = float((hcells <= 24).mean())
        print(f"--- bucket {S} (map {Hf}): short-roi (<=24 cells) "
              f"fraction {short_frac:.0%}", flush=True)

        classic = jax.jit(lambda ft, bx, sc: roi_pool_pallas_grid(
            ft, bx, 0.125, R, roi_scale=sc, allow_banded=False))
        banded = jax.jit(lambda ft, bx, sc: roi_pool_pallas_banded(
            ft, bx, 0.125, R, roi_scale=sc))
        t_c = timeit(classic, feats, boxes, scale_arr,
                     name=f"  classic (full-height stack)")
        t_b = timeit(banded, feats, boxes, scale_arr,
                     name=f"  banded (48-row bands + tall rest)")
        print(f"  speedup {t_c / t_b:.2f}x", flush=True)

        a = classic(feats, boxes, scale_arr)
        b = banded(feats, boxes, scale_arr)
        diff = float(jax.device_get(
            jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))))
        print(f"  max |classic - banded| on hardware: {diff}", flush=True)


if __name__ == "__main__":
    main()
