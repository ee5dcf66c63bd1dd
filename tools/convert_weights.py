#!/usr/bin/env python
"""Convert reference (Detectron2/torch) WSOD checkpoints into this
framework's native orbax format (equivalent of the reference
convert_resnet_ws_{pth,c2}.py / convert_vgg*.py converters, generalized).

Usage:
  python tools/convert_weights.py --config-file configs/...yaml \
      --weights models/DRN-WSOD/resnet50_ws_model_120_d2.pkl \
      --out output/converted
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config-file", required=True)
    p.add_argument("--weights", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("opts", nargs=argparse.REMAINDER)
    args = p.parse_args()

    from drn_wsod_tpu.checkpoint import Checkpointer, load_reference_weights
    from drn_wsod_tpu.config import get_cfg
    from drn_wsod_tpu.engine import create_train_state
    from drn_wsod_tpu.engine.defaults import _init_variables
    from drn_wsod_tpu.models import build_model
    from drn_wsod_tpu.solver import build_optimizer

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)

    model = build_model(cfg)
    variables = _init_variables(model, cfg)
    variables = load_reference_weights(args.weights, variables)
    tx = build_optimizer(cfg, variables)
    Checkpointer(args.out).save(create_train_state(variables, tx), 0)
    print(f"Converted {args.weights} -> {args.out}")


if __name__ == "__main__":
    main()
