"""Device mesh construction and sharding rules.

TPU-native replacement for the reference's multi-process DDP launcher and
comm module (detectron2/engine/launch.py:24-89, detectron2/utils/comm.py):
a ``jax.sharding.Mesh`` over all devices with the batch dimension sharded on
the ``data`` axis and parameters replicated. Gradients are reduced by XLA
collectives inserted automatically by GSPMD (the psum rides ICI), instead of
NCCL all-reduce.

The mesh is general (axis list from config), so tensor/model axes can be
added later without touching call sites.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(axis_names: Sequence[str] = ("data",),
                shape: Optional[Sequence[int]] = None,
                devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = [-1] + [1] * (len(axis_names) - 1)
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1]))
        shape[shape.index(-1)] = n // known
    total = int(np.prod(shape))
    assert total <= n, f"mesh {shape} needs {total} devices, have {n}"
    dev_array = np.asarray(devices[:total]).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Leading-axis sharding for every leaf of a batch pytree."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a batch onto the mesh, sharded on the batch dimension.

    Single host: ``batch`` is the global batch. Multi-host: ``batch`` is
    this process's local shard (TrainLoader decodes rank::world of each
    global batch) and the global jax.Array is assembled from per-process
    data over DCN (the JAX-native analogue of DDP's per-rank loaders)."""
    sh = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), batch)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
