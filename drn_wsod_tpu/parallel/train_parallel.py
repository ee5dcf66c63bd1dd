"""Sharded train / eval steps over a device mesh.

Data parallelism the XLA way: the train step is jitted once with the global
batch sharded over the ``data`` mesh axis and the state replicated; GSPMD
inserts the gradient reductions (reference equivalent: DDP allreduce at
``losses.backward()``, projects/WSL/tools/train_net.py:103). Loss
normalizations are over the *global* batch, so numerics match single-device
training exactly.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
from jax.sharding import Mesh

from ..engine.trainer import (make_csc_train_step, make_multi_train_step,
                              make_train_step)
from .mesh import (batch_sharding, replicated, stacked_batch_sharding,
                   state_shardings)


def _state_in_shardings(model, tx, mesh, state=None):
    """Replicated state shardings, or DAN-tensor-parallel ones when the
    mesh carries a ``model`` axis of size > 1 (see mesh.dan_tp_spec)."""
    if "model" in mesh.shape and mesh.shape["model"] > 1:
        assert state is not None, \
            "tensor-parallel step needs the concrete/abstract state to " \
            "derive per-parameter shardings"
        return state_shardings(state, mesh)
    return replicated(mesh)


def make_sharded_train_step(model, tx, mesh: Mesh,
                            loss_weights=None, state=None) -> Callable:
    """Data-parallel step; with a ``("data", "model")`` mesh (model axis
    > 1) the DAN FC stack is additionally Megatron-split over ``model``
    (column fc1 / row fc2, psum inserted by GSPMD) — pass ``state`` (the
    TrainState or its eval_shape) so per-leaf shardings can be derived."""
    step = make_train_step(model, tx, loss_weights)
    repl = replicated(mesh)
    bsh = batch_sharding(mesh)
    ssh = _state_in_shardings(model, tx, mesh, state)
    return jax.jit(
        step,
        in_shardings=(ssh, bsh, repl),
        out_shardings=(ssh, repl),
        donate_argnums=(0,),
    )


def make_sharded_multi_train_step(model, tx, mesh: Mesh,
                                  loss_weights=None, state=None) -> Callable:
    """K-steps-per-dispatch variant of ``make_sharded_train_step``: a
    ``lax.scan`` over a K-stacked batch (leading steps axis unsharded, batch
    axis sharded over ``data``) with the state donated through the whole
    chunk. Feed it with ``stack_and_shard_batches``; K is inferred from the
    stacked leading axis, so one compile covers each distinct K."""
    multi = make_multi_train_step(make_train_step(model, tx, loss_weights))
    repl = replicated(mesh)
    bsh = stacked_batch_sharding(mesh)
    ssh = _state_in_shardings(model, tx, mesh, state)
    return jax.jit(
        multi,
        in_shardings=(ssh, bsh, repl),
        out_shardings=(ssh, repl),
        donate_argnums=(0,),
    )


def make_sharded_csc_train_step(model, tx, mesh: Mesh, loss_weights=None,
                                state=None, **csc_kwargs) -> Callable:
    """Sharded variant of the CSC/WSJDS step (CPG backprop-to-image +
    center-surround weights); same shardings as the plain step — the CPG
    pass is per-image so it shards cleanly over the data axis."""
    step = make_csc_train_step(model, tx, loss_weights, **csc_kwargs)
    repl = replicated(mesh)
    bsh = batch_sharding(mesh)
    ssh = _state_in_shardings(model, tx, mesh, state)
    return jax.jit(
        step,
        in_shardings=(ssh, bsh, repl),
        out_shardings=(ssh, repl),
        donate_argnums=(0,),
    )


def make_sharded_inference_fn(model, mesh: Optional[Mesh] = None) -> Callable:
    """Batched inference producing the full score/box matrices, images
    sharded over the mesh (reference: InferenceSampler shards by rank,
    detectron2/data/samplers/distributed_sampler.py:57)."""

    def infer(variables, batch):
        return model.apply(variables, batch, method="inference_scores")

    if mesh is None:
        return jax.jit(infer)
    return jax.jit(infer, in_shardings=(replicated(mesh), batch_sharding(mesh)),
                   out_shardings=batch_sharding(mesh))
