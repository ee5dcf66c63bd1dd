"""Worker for the REAL 2-process multihost test (test_multihost_2proc.py).

Each process owns ONE virtual CPU device; the pair exercises the actual
multi-host code paths the shim test can only emulate:
  * shard_batch -> jax.make_array_from_process_local_data global assembly
  * the jit sharded train step over the cross-process mesh (psum over gloo)
  * multihost.all_gather_object / reduce_dict / synchronize
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ.pop("XLA_FLAGS", None)          # exactly one device per process

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert jax.process_index() == pid and jax.process_count() == nproc
    assert len(jax.local_devices()) == 1 and len(jax.devices()) == nproc

    # Establish the gloo context NOW, while both ranks are still in
    # lockstep: gloo's KV exchange has a hard 30s deadline, and on a
    # single-core host the later heavy jit compiles can skew rank arrival
    # at the first collective past it.
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("gloo_warmup")

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import numpy as np

    from __graft_entry__ import _synthetic_batch
    from drn_wsod_tpu.config import get_cfg
    from drn_wsod_tpu.engine import create_train_state
    from drn_wsod_tpu.models import build_model
    from drn_wsod_tpu.parallel import (create_mesh, make_sharded_train_step,
                                       multihost, replicated, shard_batch)
    from drn_wsod_tpu.solver import build_optimizer

    cfg = get_cfg()
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.ROI_BOX_HEAD.DAN_DIM = [32, 32]
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 32
    cfg.MODEL.ROI_HEADS.NAME = "WSDDNROIHeads"
    cfg.MODEL.DTYPE = "float32"

    mesh = create_mesh(("data",), (nproc,))
    model = build_model(cfg)
    # each process builds ONLY its local shard (rank-dependent seed), the
    # global batch is assembled across processes by shard_batch
    local = _synthetic_batch(B=1, H=64, W=64, P=32,
                             C=cfg.MODEL.ROI_HEADS.NUM_CLASSES, seed=pid)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           local, train=True)
    tx = build_optimizer(cfg, variables)
    state = create_train_state(variables, tx)
    state = jax.device_put(state, replicated(mesh))
    gbatch = shard_batch(local, mesh)
    assert gbatch.image.shape[0] == nproc          # global leading dim
    rng = jax.device_put(jax.random.PRNGKey(0), replicated(mesh))

    step = make_sharded_train_step(model, tx, mesh)
    state, metrics = step(state, gbatch, rng)
    metrics = {k: float(v) for k, v in jax.device_get(metrics).items()}
    assert all(np.isfinite(v) for v in metrics.values()), metrics

    # object collectives (reference comm.all_gather equivalents)
    gathered = multihost.all_gather_object({"rank": pid, "loss":
                                            metrics["total_loss"]})
    assert [g["rank"] for g in gathered] == list(range(nproc))
    # the jit loss is GLOBAL: every process must have the identical value
    assert len({round(g["loss"], 6) for g in gathered}) == 1
    red = multihost.reduce_dict({"x": float(pid)}, average=True)
    assert abs(red["x"] - (nproc - 1) / 2.0) < 1e-6
    multihost.synchronize()
    print(f"MH_OK rank={pid} loss={metrics['total_loss']:.6f}", flush=True)

    # ---- multi-host checkpoint save -> diverge -> restore (VERDICT r3 #7)
    ckpt_dir = os.environ.get("MH_CKPT_DIR")
    if not ckpt_dir:
        return
    from drn_wsod_tpu.checkpoint import Checkpointer

    def host_value(x):
        # replicated global array: every process holds a full local replica
        return np.asarray(x.addressable_data(0))

    ck = Checkpointer(ckpt_dir)
    ck.save(state, step=1)                        # ALL processes call save
    saved_params = jax.tree.map(host_value, state.params)

    # advance one more step so live state diverges from the checkpoint
    state2, _ = step(state, gbatch, rng)
    diverged = jax.tree.map(host_value, state2.params)
    assert any(
        float(np.abs(a - b).max()) > 0
        for a, b in zip(jax.tree.leaves(saved_params),
                        jax.tree.leaves(diverged)))

    restored = ck.load(state2)                    # template carries shardings
    assert int(host_value(restored.step)) == 1
    got = jax.tree.map(host_value, restored.params)
    for a, b in zip(jax.tree.leaves(saved_params), jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the restored tree must be bit-identical ACROSS processes
    checksum = float(sum(np.float64(np.abs(l).sum())
                         for l in jax.tree.leaves(got)))
    sums = multihost.all_gather_object(checksum)
    assert len(set(sums)) == 1, sums
    multihost.synchronize()
    print(f"MH_CKPT_OK rank={pid} checksum={checksum:.6f}", flush=True)


if __name__ == "__main__":
    main()
