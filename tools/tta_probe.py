#!/usr/bin/env python
"""Bisect the TTA-AVG per-image cost: host view-building vs per-bucket-group
device scoring vs finalize NMS (perf work tool; PERF.md TTA section).

Timing fence: value-dependent jax.device_get (block_until_ready does not
fence on axon).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def main():
    from drn_wsod_tpu.config import get_cfg
    from drn_wsod_tpu.data.mapper import pick_bucket
    from drn_wsod_tpu.engine.defaults import _init_variables
    from drn_wsod_tpu.models import build_model
    from drn_wsod_tpu.tta import (GeneralizedRCNNWithTTAAVG,
                                  build_view_batch, enumerate_views)
    from __graft_entry__ import _synthetic_batch

    cfg = get_cfg()
    cfg.merge_from_file(sys.argv[1] if len(sys.argv) > 1 else
                        "configs/PascalVOC-Detection/oicr_WSR_50_DC5_1x.yaml")
    P = cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE
    model = build_model(cfg)
    init_batch = _synthetic_batch(B=1, H=704, W=704, P=P,
                                  C=cfg.MODEL.ROI_HEADS.NUM_CLASSES)
    variables = _init_variables(model, cfg, init_batch)
    tta = GeneralizedRCNNWithTTAAVG(cfg, model, variables)

    rs = np.random.RandomState(0)
    H, W = 375, 500
    image = rs.randint(0, 255, (H, W, 3), np.uint8)
    n = P
    x1 = rs.uniform(0, 400, n).astype(np.float32)
    y1 = rs.uniform(0, 300, n).astype(np.float32)
    bw = rs.uniform(8, 100, n).astype(np.float32)
    bh = rs.uniform(8, 75, n).astype(np.float32)
    props = np.stack([x1, y1, x1 + bw, y1 + bh], 1)
    obj = rs.uniform(0, 1, n).astype(np.float32)
    labels = np.zeros((cfg.MODEL.ROI_HEADS.NUM_CLASSES,), np.float32)
    labels[3] = 1.0

    views = enumerate_views((H, W), tuple(cfg.TEST.AUG.MIN_SIZES),
                            cfg.TEST.AUG.MAX_SIZE, cfg.TEST.AUG.FLIP)
    groups = {}
    for v in views:
        groups.setdefault(pick_bucket(v[0], v[1], tuple(cfg.INPUT.BUCKETS)),
                          []).append(v)

    # --- host build per group
    built = {}
    for b, vs in sorted(groups.items()):
        t0 = time.perf_counter()
        batch, inv = build_view_batch(
            image, props, obj, labels, tuple(cfg.TEST.AUG.MIN_SIZES),
            cfg.TEST.AUG.MAX_SIZE, cfg.TEST.AUG.FLIP,
            tuple(cfg.INPUT.BUCKETS), P, views=vs)
        # force host->device completion
        float(jax.device_get(batch.image[0, 0, 0, 0]))
        dt = time.perf_counter() - t0
        mb = batch.image.size * 4 / 2**20
        print(f"host build+upload bucket {b} (V={len(vs)}): "
              f"{dt * 1e3:8.1f} ms  ({mb:.0f} MB images)")
        built[b] = (batch, inv, len(vs))

    # --- device score per group (compile, then timed)
    for b, (batch, inv, V) in sorted(built.items()):
        sc, bx = tta._score(tta.variables, batch, inv)
        float(jax.device_get(sc[0, 0]))
        t0 = time.perf_counter()
        iters = 3
        for _ in range(iters):
            sc, bx = tta._score(tta.variables, batch, inv)
        float(jax.device_get(sc[0, 0]))
        dt = (time.perf_counter() - t0) / iters
        print(f"device score bucket {b} (V={V}): {dt * 1e3:8.1f} ms "
              f"({dt * 1e3 / V:.1f} ms/view)")


if __name__ == "__main__":
    main()
