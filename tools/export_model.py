#!/usr/bin/env python
"""Export a trained model to a deployable StableHLO artifact.

CLI twin of the reference deploy converter
(/root/reference/tools/deploy/caffe2_converter.py: cfg + weights ->
traced Caffe2/TorchScript artifact + optional run-check). The TPU-native
artifact is a serialized ``jax.export`` StableHLO program
(drn_wsod_tpu/export.py) loadable from JAX, TF (tf.XlaCallModule) or IFRT
serving stacks.

Usage:
  python tools/export_model.py --config-file configs/...yaml \
      --output /tmp/model.stablehlo [--height 512 --width 512 \
      --proposals 2048] [--run-check] [opts ...]

The exported program is shape-specialized (static shapes are the TPU-native
contract); pick the padded bucket the serving path will use.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import numpy as np

    from drn_wsod_tpu.checkpoint import load_reference_weights
    from drn_wsod_tpu.config import get_cfg
    from drn_wsod_tpu.export import export_inference, load_exported
    from drn_wsod_tpu.models import build_model

    p = argparse.ArgumentParser()
    p.add_argument("--config-file", required=True)
    p.add_argument("--output", required=True,
                   help="path for the serialized StableHLO program")
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--proposals", type=int, default=2048,
                   help="padded proposal-slot count of the serving bucket")
    p.add_argument("--run-check", action="store_true",
                   help="deserialize the artifact and compare its output "
                        "against the live model on the example batch")
    p.add_argument("opts", nargs=argparse.REMAINDER)
    args = p.parse_args()

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)

    from __graft_entry__ import _synthetic_batch

    model = build_model(cfg)
    batch = _synthetic_batch(B=1, H=args.height, W=args.width,
                             P=args.proposals,
                             C=cfg.MODEL.ROI_HEADS.NUM_CLASSES)
    variables = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           batch, train=False))
    variables = jax.tree.map(
        lambda s: jax.numpy.zeros(s.shape, s.dtype), variables)
    if cfg.MODEL.WEIGHTS:
        variables = load_reference_weights(cfg.MODEL.WEIGHTS, variables)

    data = export_inference(model, variables, batch, path=args.output)
    print(f"wrote {args.output} ({len(data)} bytes)")

    if args.run_check:
        exported = load_exported(args.output)
        got = exported.call(variables, batch)
        want = model.apply(variables, batch, method="inference_scores")
        for g, w in zip(jax.tree.leaves(got), jax.tree.leaves(want)):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-5, atol=1e-5)
        print("run-check OK: exported program matches the live model")


if __name__ == "__main__":
    main()
