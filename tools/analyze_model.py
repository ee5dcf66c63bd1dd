#!/usr/bin/env python
"""Model analysis: parameter counts and per-step FLOPs
(equivalent of the reference tools/analyze_model.py).

FLOPs come from XLA's own cost analysis of the compiled forward, which is
exactly what runs on the TPU — more truthful than op-counting heuristics.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def main():
    from __graft_entry__ import _synthetic_batch
    from drn_wsod_tpu.config import get_cfg
    from drn_wsod_tpu.models import build_model

    p = argparse.ArgumentParser()
    p.add_argument("--config-file", default="")
    p.add_argument("--image-size", type=int, default=704)
    p.add_argument("opts", nargs=argparse.REMAINDER)
    args = p.parse_args()

    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)

    model = build_model(cfg)
    batch = _synthetic_batch(B=1, H=args.image_size, W=args.image_size,
                             P=cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE,
                             C=cfg.MODEL.ROI_HEADS.NUM_CLASSES)
    rng = jax.random.PRNGKey(0)
    variables = jax.eval_shape(
        lambda: model.init({"params": rng, "dropout": rng}, batch,
                           train=False))

    # parameter counts by top-level module
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    by_module = {}
    total = 0
    for path, leaf in flat:
        keys = [p.key for p in path if hasattr(p, "key")]
        n = int(np.prod(leaf.shape))
        by_module[keys[0]] = by_module.get(keys[0], 0) + n
        total += n
    print("Parameters:")
    for k, v in sorted(by_module.items(), key=lambda kv: -kv[1]):
        print(f"  {k:24s} {v / 1e6:10.2f} M")
    print(f"  {'TOTAL':24s} {total / 1e6:10.2f} M")

    variables = jax.tree.map(lambda s: jax.numpy.zeros(s.shape, s.dtype),
                             variables)
    lowered = jax.jit(
        lambda v, b: model.apply(v, b, method="inference_scores")
    ).lower(variables, batch)
    cost = lowered.compile().cost_analysis()
    if cost and "flops" in cost:
        print(f"Forward FLOPs (XLA cost analysis): {cost['flops'] / 1e9:.2f} G")
    mem = cost.get("bytes accessed", None) if cost else None
    if mem:
        print(f"Bytes accessed: {mem / 1e9:.2f} GB")


if __name__ == "__main__":
    main()
