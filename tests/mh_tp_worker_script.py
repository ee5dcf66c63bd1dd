"""Worker for the cross-process TENSOR-PARALLEL multihost test
(test_multihost_2proc.py::test_two_process_tensor_parallel_step).

Two processes x two virtual CPU devices each = a 4-device
("data", "model") = (2, 2) mesh laid out so the ``model`` axis CROSSES the
process boundary (device array transposed: data row i = [p0_di, p1_di]).
That makes the Megatron DAN split (parallel/mesh.py:dan_tp_spec) exercise
its hidden-dim psum over the inter-process (DCN-analog) link — the topology
a real multi-host TPU pod pays — and asserts the numerics match an
unsharded single-device step on the same inputs.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    assert len(jax.local_devices()) == 2 and len(jax.devices()) == 2 * nproc

    # Establish the gloo context NOW, while both ranks are still in
    # lockstep: gloo's KV exchange has a hard 30s deadline, and on a
    # single-core host the later heavy jit compiles can skew rank arrival
    # at the first collective past it.
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("gloo_warmup")

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from __graft_entry__ import _synthetic_batch
    from drn_wsod_tpu.config import get_cfg
    from drn_wsod_tpu.engine import (create_train_state, make_train_step)
    from drn_wsod_tpu.models import build_model
    from drn_wsod_tpu.parallel import (make_sharded_train_step, multihost,
                                       state_shardings)
    from drn_wsod_tpu.solver import build_optimizer

    cfg = get_cfg()
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.ROI_BOX_HEAD.DAN_DIM = [32, 32]
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 32
    cfg.MODEL.ROI_HEADS.NAME = "WSDDNROIHeads"
    cfg.MODEL.DTYPE = "float32"

    # model axis crosses processes: transpose the process-major device list
    devs = np.asarray(jax.devices()).reshape(nproc, 2).T
    mesh = Mesh(devs, ("data", "model"))
    tp_col = [d.process_index for d in devs[0]]
    assert sorted(tp_col) == list(range(nproc)), \
        f"model axis must span processes, got {tp_col}"

    model = build_model(cfg)
    # identical global inputs on every process (deterministic seed)
    gbatch = _synthetic_batch(B=2, H=64, W=64, P=32,
                              C=cfg.MODEL.ROI_HEADS.NUM_CLASSES, seed=3)
    gbatch = jax.tree.map(np.asarray, gbatch)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           jax.tree.map(lambda x: x[:1], gbatch), train=True)
    tx = build_optimizer(cfg, variables)
    rng = jax.random.PRNGKey(0)

    # --- unsharded single-device reference trajectory (local)
    step0 = jax.jit(make_train_step(model, tx))
    state0 = create_train_state(variables, tx)
    state0, metrics_ref = step0(state0, gbatch, rng)
    metrics_ref = {k: float(v) for k, v in jax.device_get(metrics_ref).items()}

    # --- cross-process TP step. Every process holds the identical global
    # host values, so make_array_from_callback can materialize each shard
    # locally for ANY sharding (incl. the non-process-aligned TP splits).
    def put_global(tree, shardings):
        return jax.tree.map(
            lambda x, sh: jax.make_array_from_callback(
                np.shape(x), sh, lambda idx: np.asarray(x)[idx]),
            tree, shardings)

    state1 = create_train_state(variables, tx)
    ssh = state_shardings(state1, mesh)
    state1 = put_global(jax.tree.map(np.asarray, jax.device_get(state1)),
                        ssh)
    fc1 = state1.params["params"]["box_head"]["fc1"]["kernel"]
    assert not fc1.sharding.is_fully_replicated  # TP actually active
    repl = NamedSharding(mesh, P())
    bsh = jax.tree.map(lambda _: NamedSharding(mesh, P("data")), gbatch)
    sbatch = put_global(gbatch, bsh)
    srng = put_global(np.asarray(rng), repl)

    sstep = make_sharded_train_step(model, tx, mesh, state=state1)
    state1, metrics_tp = sstep(state1, sbatch, srng)
    metrics_tp = {k: float(v) for k, v in jax.device_get(metrics_tp).items()}

    for k, v in metrics_ref.items():
        assert abs(v - metrics_tp[k]) <= 2e-5 * max(1.0, abs(v)), \
            (k, v, metrics_tp[k])
    # updated params keep the TP sharding and match the unsharded update
    fc1o = state1.params["params"]["box_head"]["fc1"]["kernel"]
    assert not fc1o.sharding.is_fully_replicated
    w_ref = np.asarray(jax.device_get(
        state0.params["params"]["box_head"]["fc1"]["kernel"]))
    # non-fully-addressable (model crosses processes): gather our local
    # shards and check them against the reference slice
    for shard in fc1o.addressable_shards:
        np.testing.assert_allclose(np.asarray(shard.data),
                                   w_ref[shard.index], rtol=1e-5, atol=1e-6)

    # every process computed the same global loss
    gathered = multihost.all_gather_object(
        {"rank": pid, "loss": metrics_tp["total_loss"]})
    assert len({round(g["loss"], 6) for g in gathered}) == 1
    multihost.synchronize()
    print(f"MHTP_OK rank={pid} loss={metrics_tp['total_loss']:.6f}",
          flush=True)


if __name__ == "__main__":
    main()
