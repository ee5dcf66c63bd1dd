#!/usr/bin/env python
"""Visualize training samples after augmentation (equivalent of the
reference tools/visualize_data.py): dumps images with GT boxes and the first
N proposals drawn.

Usage:
  python tools/visualize_data.py --config-file ... --output viz/ [--n 10]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from drn_wsod_tpu.config import get_cfg
    from drn_wsod_tpu.data import DatasetMapper, MetadataCatalog
    from drn_wsod_tpu.data.datasets.voc import register_all_pascal_voc
    from drn_wsod_tpu.data.loader import get_detection_dataset_dicts
    from drn_wsod_tpu.utils.visualizer import Visualizer

    p = argparse.ArgumentParser()
    p.add_argument("--config-file", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--n", type=int, default=10)
    p.add_argument("--show-proposals", type=int, default=20)
    p.add_argument("opts", nargs=argparse.REMAINDER)
    args = p.parse_args()

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    register_all_pascal_voc(os.environ.get("DETECTRON2_DATASETS", "datasets"))

    names = MetadataCatalog.get(cfg.DATASETS.TRAIN[0]).thing_classes
    records = get_detection_dataset_dicts(
        cfg.DATASETS.TRAIN,
        cfg.DATASETS.PROPOSAL_FILES_TRAIN if cfg.MODEL.LOAD_PROPOSALS else ())
    mapper = DatasetMapper(cfg, is_train=True)
    rng = np.random.RandomState(0)

    os.makedirs(args.output, exist_ok=True)
    for i, r in enumerate(records[:args.n]):
        s = mapper(r, rng, dataset_index=i)
        img = s["image"].astype(np.uint8)
        v = Visualizer(img, names)
        for g in range(int(s["gt_valid"].sum())):
            v.draw_box(s["gt_boxes"][g], int(s["gt_classes"][g]))
        for pi in range(min(args.show_proposals,
                            int(s["proposal_mask"].sum()))):
            v.draw_box(s["proposals"][pi], class_id=None)  # unlabeled
        v.save(os.path.join(args.output, f"sample_{i:04d}.png"))
    print(f"Wrote {min(args.n, len(records))} samples to {args.output}")


if __name__ == "__main__":
    main()
