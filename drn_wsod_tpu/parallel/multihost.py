"""Multi-host helpers.

Equivalent of the reference comm object-collectives
(detectron2/utils/comm.py:139-263: pickled all_gather/gather over gloo, used
to collect per-rank eval predictions and reduce metric dicts). On TPU pods
these become DCN collectives via jax.experimental.multihost_utils; on a
single host they are no-ops — exactly the world_size==1 fast paths of the
reference.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import numpy as np


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def synchronize() -> None:
    """Barrier across hosts (reference comm.synchronize)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("drn_wsod_tpu.synchronize")


def all_gather_object(obj: Any) -> List[Any]:
    """Gather an arbitrary picklable object from every host
    (reference comm.all_gather)."""
    if jax.process_count() == 1:
        return [obj]
    import pickle

    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    # pad to the max length across hosts
    n = np.asarray([len(payload)], dtype=np.int32)
    all_n = multihost_utils.process_allgather(n).reshape(-1)
    m = int(all_n.max())
    padded = np.zeros(m, dtype=np.uint8)
    padded[: len(payload)] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [pickle.loads(gathered[i, : int(all_n[i])].tobytes())
            for i in range(jax.process_count())]


def reduce_dict(metrics: Dict[str, float], average: bool = True
                ) -> Dict[str, float]:
    """Mean/sum scalar metric dicts across hosts (reference comm.reduce_dict).
    Note: with a global-batch jit step this is rarely needed — losses are
    already global — but host-side timers etc. still use it."""
    if jax.process_count() == 1:
        return dict(metrics)
    gathered = all_gather_object(metrics)
    out: Dict[str, float] = {}
    for k in metrics:
        vals = [g[k] for g in gathered if k in g]
        out[k] = float(np.mean(vals) if average else np.sum(vals))
    return out
