#!/usr/bin/env python
"""Minimal explicit-loop WSOD training script.

Equivalent of the reference tools/plain_train_net.py: the same capability as
tools/train_net.py but written against the library API directly — no
``Trainer``, no hook system — so users can see (and fork) the raw loop:
build model → optimizer → sharded step → iterate batches → print / save.

Use tools/train_net.py for real runs; this script is the documented
starting point for custom training logic.
"""

import logging
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_default_prng_impl", "rbg")

from drn_wsod_tpu.checkpoint import Checkpointer
from drn_wsod_tpu.config import add_wsl_config, get_cfg
from drn_wsod_tpu.data import DatasetMapper, build_detection_train_loader
from drn_wsod_tpu.data.datasets.voc import register_all_pascal_voc
from drn_wsod_tpu.engine import create_train_state
from drn_wsod_tpu.engine.defaults import (_init_variables,
                                          default_argument_parser,
                                          default_setup)
from drn_wsod_tpu.models import build_model
from drn_wsod_tpu.parallel import (create_mesh, make_sharded_train_step,
                                   state_shardings,
                                   replicated, shard_batch)
from drn_wsod_tpu.solver import build_lr_schedule, build_optimizer

logger = logging.getLogger("drn_wsod_tpu")


def main(args):
    cfg = get_cfg()
    add_wsl_config(cfg)
    if args.config_file:
        cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()
    default_setup(cfg, args)
    register_all_pascal_voc(os.environ.get("DETECTRON2_DATASETS", "datasets"))

    model = build_model(cfg)
    variables = _init_variables(model, cfg)
    tx = build_optimizer(cfg, variables)
    state = create_train_state(variables, tx)

    checkpointer = Checkpointer(os.path.join(cfg.OUTPUT_DIR, "checkpoints"))
    state, start_iter = checkpointer.resume_or_load(
        state, cfg.MODEL.WEIGHTS, resume=args.resume)

    mesh = create_mesh(tuple(cfg.PARALLEL.MESH_AXES),
                       tuple(cfg.PARALLEL.MESH_SHAPE))
    step = make_sharded_train_step(model, tx, mesh, state=state)
    state = jax.device_put(state, state_shardings(state, mesh))
    rng = jax.device_put(jax.random.PRNGKey(max(cfg.SEED, 0)),
                         replicated(mesh))
    lr_schedule = build_lr_schedule(cfg)

    loader = build_detection_train_loader(cfg, DatasetMapper(cfg, is_train=True))
    data_iter = iter(loader)

    max_iter = cfg.SOLVER.MAX_ITER
    t0 = time.perf_counter()
    for it in range(start_iter, max_iter):
        batch = shard_batch(next(data_iter), mesh)
        state, metrics = step(state, batch, jax.random.fold_in(rng, it))
        if (it + 1) % 20 == 0 or it + 1 == max_iter:
            # the device_get fences the async dispatch chain
            loss = float(jax.device_get(metrics["total_loss"]))
            dt = (time.perf_counter() - t0) / (it + 1 - start_iter)
            logger.info("iter %d/%d  total_loss %.4f  lr %.5f  %.3f s/it",
                        it + 1, max_iter, loss, lr_schedule(it), dt)
        if (it + 1) % cfg.SOLVER.CHECKPOINT_PERIOD == 0 or \
                it + 1 == max_iter:
            checkpointer.save(state, it + 1)
    return state


if __name__ == "__main__":
    main(default_argument_parser().parse_args())
