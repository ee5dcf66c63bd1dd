#!/usr/bin/env python
"""Pack a registered dataset (+proposals, +decoded pixels) into a native
record shard for the fast training data path (data/record_dataset.py).

Usage:
  python tools/pack_dataset.py --dataset voc_2007_train \
      --proposals datasets/proposals/mcg_voc_2007_train_d2.pkl \
      --out datasets/packed/voc_2007_train.rec
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from drn_wsod_tpu.data.datasets.voc import register_all_pascal_voc
    from drn_wsod_tpu.data.loader import get_detection_dataset_dicts
    from drn_wsod_tpu.data.record_dataset import pack_dataset

    p = argparse.ArgumentParser()
    p.add_argument("--dataset", required=True)
    p.add_argument("--proposals", default="")
    p.add_argument("--out", required=True)
    p.add_argument("--no-images", action="store_true")
    args = p.parse_args()

    register_all_pascal_voc(os.environ.get("DETECTRON2_DATASETS", "datasets"))
    records = get_detection_dataset_dicts(
        [args.dataset], [args.proposals] if args.proposals else ())
    n = pack_dataset(records, args.out, decode_images=not args.no_images)
    size = os.path.getsize(args.out) / 1e6
    print(f"Packed {n} records ({size:.1f} MB) to {args.out}")


if __name__ == "__main__":
    main()
