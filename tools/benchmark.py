#!/usr/bin/env python
"""Benchmark dataloader / training / inference throughput separately
(equivalent of the reference tools/benchmark.py:44-130).

Usage:
  python tools/benchmark.py --task train --config-file configs/...yaml
  python tools/benchmark.py --task data  --config-file ...
  python tools/benchmark.py --task eval  --config-file ...
Without a config file, a synthetic flagship workload is used (no datasets
required).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def benchmark_train_synthetic(cfg, iters=20):
    from __graft_entry__ import _synthetic_batch
    from drn_wsod_tpu.engine import create_train_state, make_train_step
    from drn_wsod_tpu.models import build_model
    from drn_wsod_tpu.solver import build_optimizer

    B = max(cfg.SOLVER.IMS_PER_BATCH // jax.device_count(), 1)
    model = build_model(cfg)
    batch = _synthetic_batch(B=B, H=704, W=704,
                             P=cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE,
                             C=cfg.MODEL.ROI_HEADS.NUM_CLASSES)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, batch, train=True)
    tx = build_optimizer(cfg, variables)
    state = create_train_state(variables, tx)
    step = jax.jit(make_train_step(model, tx), donate_argnums=(0,))

    # value-dependent fence: block_until_ready does not synchronize on the
    # axon platform, and per-iteration fencing measures the ~100ms tunnel
    # dispatch latency instead of the kernel (PERF.md methodology note)
    state, m = step(state, batch, rng)
    float(jax.device_get(m["total_loss"]))
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch, rng)
    float(jax.device_get(m["total_loss"]))
    dt = time.perf_counter() - t0
    print(f"train: {dt / iters * 1000:.1f} ms/iter, "
          f"{B * iters / dt:.2f} img/s")


def benchmark_eval_synthetic(cfg, iters=20, batch_size=1):
    from __graft_entry__ import _synthetic_batch
    from drn_wsod_tpu.engine.defaults import _init_variables
    from drn_wsod_tpu.evaluation import make_detect_fn
    from drn_wsod_tpu.models import build_model

    model = build_model(cfg)
    batch = _synthetic_batch(B=batch_size, H=704, W=704,
                             P=cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE,
                             C=cfg.MODEL.ROI_HEADS.NUM_CLASSES)
    variables = _init_variables(model, cfg, batch)
    detect = make_detect_fn(model, cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST,
                            cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
                            cfg.TEST.DETECTIONS_PER_IMAGE)
    # enqueue all iters, fence once (device program order is sequential);
    # per-iteration device_get would time the tunnel, not the step
    d = detect(variables, batch)
    float(jax.device_get(d["scores"][0, 0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        d = detect(variables, batch)
    float(jax.device_get(d["scores"][0, 0]))
    dt = time.perf_counter() - t0
    n = iters * batch_size
    print(f"eval (B={batch_size}): {dt / n * 1000:.1f} ms/img, "
          f"{n / dt:.2f} img/s")


def benchmark_tta_synthetic(cfg, iters=10):
    """Time the reference's ACTUAL test protocol: TTA-AVG over
    TEST.AUG.MIN_SIZES x flip (default 8 scales x 2 = 16 views/img,
    reference oicr_WSR_50_DC5_1x.yaml:52-60) at the full proposal count.
    Times the whole host-facing pipeline (view building on host + bucketed
    view-batch scoring dispatches + finalize NMS), fencing once per image
    on the finalize output — the same accounting inference_on_dataset pays.
    """
    from drn_wsod_tpu.engine.defaults import _init_variables
    from drn_wsod_tpu.models import build_model
    from drn_wsod_tpu.tta import GeneralizedRCNNWithTTAAVG
    from __graft_entry__ import _synthetic_batch

    P = cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE
    model = build_model(cfg)
    init_batch = _synthetic_batch(B=1, H=704, W=704, P=P,
                                  C=cfg.MODEL.ROI_HEADS.NUM_CLASSES)
    variables = _init_variables(model, cfg, init_batch)
    tta = GeneralizedRCNNWithTTAAVG(cfg, model, variables)

    # synthetic 500x375 VOC-shaped record (median VOC07 test size) written
    # to disk so read_image's jpeg path is included, as in real eval
    import tempfile

    from PIL import Image

    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (375, 500, 3), dtype=np.uint8)
    f = tempfile.NamedTemporaryFile(suffix=".jpg", delete=False)
    Image.fromarray(img).save(f.name)
    n_prop = P
    x1 = rs.uniform(0, 400, n_prop).astype(np.float32)
    y1 = rs.uniform(0, 300, n_prop).astype(np.float32)
    w = rs.uniform(8, 100, n_prop).astype(np.float32)
    h = rs.uniform(8, 75, n_prop).astype(np.float32)
    record = {
        "file_name": f.name,
        "proposal_boxes": np.stack([x1, y1, x1 + w, y1 + h], 1),
        "proposal_objectness_logits": rs.uniform(0, 1, n_prop).astype(
            np.float32),
        "annotations": [{"category_id": 3}],
        "height": 375, "width": 500,
    }

    n_views = len(cfg.TEST.AUG.MIN_SIZES) * (2 if cfg.TEST.AUG.FLIP else 1)
    tta(record)  # compile every bucket group + finalize
    t0 = time.perf_counter()
    for _ in range(iters):
        tta(record)
    dt = time.perf_counter() - t0
    print(f"tta ({n_views} views, P={P}): {dt / iters * 1000:.1f} ms/img, "
          f"{iters / dt:.2f} img/s")
    os.unlink(f.name)


def benchmark_data(cfg, iters=100):
    from drn_wsod_tpu.data import DatasetMapper, build_detection_train_loader
    from drn_wsod_tpu.data.datasets.voc import register_all_pascal_voc

    register_all_pascal_voc(os.environ.get("DETECTRON2_DATASETS", "datasets"))
    loader = build_detection_train_loader(cfg, DatasetMapper(cfg, True))
    it = iter(loader)
    next(it)
    t0 = time.perf_counter()
    for _ in range(iters):
        next(it)
    dt = time.perf_counter() - t0
    total = iters * cfg.SOLVER.IMS_PER_BATCH
    print(f"data: {dt / iters * 1000:.1f} ms/batch, {total / dt:.1f} img/s")


def main():
    from drn_wsod_tpu.config import get_cfg

    p = argparse.ArgumentParser()
    p.add_argument("--task", default="train",
                   choices=["train", "eval", "tta", "data"])
    p.add_argument("--config-file", default="")
    p.add_argument("--batch", type=int, default=1,
                   help="images per eval batch (eval task)")
    p.add_argument("--iters", type=int, default=0)
    p.add_argument("opts", nargs=argparse.REMAINDER)
    args = p.parse_args()

    cfg = get_cfg()
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)

    kw = {"iters": args.iters} if args.iters else {}
    if args.task == "train":
        benchmark_train_synthetic(cfg, **kw)
    elif args.task == "eval":
        benchmark_eval_synthetic(cfg, batch_size=args.batch, **kw)
    elif args.task == "tta":
        benchmark_tta_synthetic(cfg, **kw)
    else:
        benchmark_data(cfg, **kw)


if __name__ == "__main__":
    main()
