"""Data-parallel correctness on the virtual 8-device CPU mesh: the sharded
global-batch step must reproduce single-device numerics (the design claim in
parallel/train_parallel.py)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from test_modeling import tiny_batch, tiny_cfg  # noqa: E402

from drn_wsod_tpu.engine import create_train_state, make_train_step  # noqa: E402
from drn_wsod_tpu.models import build_model  # noqa: E402
from drn_wsod_tpu.parallel import (batch_sharding, create_mesh,  # noqa: E402
                                   make_sharded_train_step, replicated,
                                   shard_batch)
from drn_wsod_tpu.solver import build_optimizer  # noqa: E402

pytestmark = pytest.mark.skipif(jax.device_count() < 8,
                                reason="needs 8 virtual devices")


def _setup(B):
    cfg = tiny_cfg("OICRROIHeads")
    cfg.MODEL.ROI_BOX_HEAD.DROPOUT = 0.0  # rng-order-independent comparison
    model = build_model(cfg)
    batch = tiny_batch(B=B)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           batch, train=True)
    tx = build_optimizer(cfg, variables)
    return model, tx, variables, batch


def test_mesh_creation():
    mesh = create_mesh(("data",), (8,))
    assert mesh.devices.size == 8
    mesh2 = create_mesh(("data",), (2,))
    assert mesh2.devices.size == 2


@pytest.mark.slow
def test_sharded_step_matches_single_device():
    model, tx, variables, batch = _setup(B=8)
    rng = jax.random.PRNGKey(42)

    # single-device reference
    step = jax.jit(make_train_step(model, tx))
    state0 = create_train_state(variables, tx)
    _, metrics_ref = step(state0, batch, rng)

    # 8-way sharded
    mesh = create_mesh(("data",), (8,))
    sstep = make_sharded_train_step(model, tx, mesh)
    state1 = jax.device_put(create_train_state(variables, tx),
                            replicated(mesh))
    sbatch = shard_batch(batch, mesh)
    srng = jax.device_put(rng, replicated(mesh))
    state_out, metrics_sh = sstep(state1, sbatch, srng)

    for k in metrics_ref:
        np.testing.assert_allclose(float(metrics_ref[k]),
                                   float(metrics_sh[k]), rtol=2e-5,
                                   err_msg=k)


@pytest.mark.slow
def test_sharded_params_stay_replicated_and_update():
    model, tx, variables, batch = _setup(B=8)
    mesh = create_mesh(("data",), (8,))
    sstep = make_sharded_train_step(model, tx, mesh)
    state = jax.device_put(create_train_state(variables, tx), replicated(mesh))
    sbatch = shard_batch(batch, mesh)
    rng = jax.device_put(jax.random.PRNGKey(0), replicated(mesh))

    w_before = np.asarray(
        jax.device_get(state.params["params"]["box_predictor"]["cls"]["kernel"]))
    state, _ = sstep(state, sbatch, rng)
    w = state.params["params"]["box_predictor"]["cls"]["kernel"]
    assert not w.sharding.is_fully_addressable or \
        w.sharding.is_fully_replicated
    w_after = np.asarray(jax.device_get(w))
    assert not np.allclose(w_before, w_after)  # actually trained
    assert int(state.step) == 1


@pytest.mark.slow
def test_tp_dp_step_matches_single_device():
    """(data=4, model=2) mesh with the DAN FC stack Megatron-split must
    reproduce single-device numerics (column fc1 / row fc2; GSPMD inserts
    the hidden-dim psum)."""
    from drn_wsod_tpu.parallel import state_shardings

    model, tx, variables, batch = _setup(B=8)
    rng = jax.random.PRNGKey(42)

    step = jax.jit(make_train_step(model, tx))
    state0 = create_train_state(variables, tx)
    _, metrics_ref = step(state0, batch, rng)

    mesh = create_mesh(("data", "model"), (4, 2))
    state1 = create_train_state(variables, tx)
    sstep = make_sharded_train_step(model, tx, mesh, state=state1)
    ssh = state_shardings(state1, mesh)
    state1 = jax.device_put(state1, ssh)
    # the fc1 kernel is actually column-sharded over the model axis
    fc1 = state1.params["params"]["box_head"]["fc1"]["kernel"]
    assert not fc1.sharding.is_fully_replicated
    sbatch = shard_batch(batch, mesh)
    srng = jax.device_put(rng, replicated(mesh))
    state_out, metrics_sh = sstep(state1, sbatch, srng)

    for k in metrics_ref:
        np.testing.assert_allclose(float(metrics_ref[k]),
                                   float(metrics_sh[k]), rtol=2e-5,
                                   err_msg=k)
    # updated params keep their tensor-parallel sharding
    fc1o = state_out.params["params"]["box_head"]["fc1"]["kernel"]
    assert not fc1o.sharding.is_fully_replicated


@pytest.mark.slow
def test_sharded_multi_step_matches_per_step():
    """K-steps-in-one-dispatch (make_sharded_multi_train_step + lax.scan,
    the Trainer's chunked execution mode) must reproduce the per-step
    sharded trajectory on the same mesh."""
    from drn_wsod_tpu.parallel import (make_sharded_multi_train_step,
                                       stack_and_shard_batches)

    model, tx, variables, batch = _setup(B=8)
    rng0 = jax.random.PRNGKey(7)
    mesh = create_mesh(("data",), (8,))
    K = 3
    batches = [jax.tree.map(lambda x: np.asarray(x), batch) for _ in range(K)]
    # host copies per trainer: device_put onto the mesh aliases the device-0
    # buffer, so donating one state would delete the shared `variables`
    host_vars = jax.tree.map(np.asarray, jax.device_get(variables))

    def fresh_state():
        return jax.device_put(
            create_train_state(jax.tree.map(jnp.asarray, host_vars), tx),
            replicated(mesh))

    sstep = make_sharded_train_step(model, tx, mesh)
    state_a = fresh_state()
    srng = jax.device_put(rng0, replicated(mesh))
    for b in batches:
        state_a, metrics_a = sstep(state_a, shard_batch(b, mesh), srng)

    mstep = make_sharded_multi_train_step(model, tx, mesh)
    state_b = fresh_state()
    stacked = stack_and_shard_batches(batches, mesh)
    state_b, metrics_b = mstep(state_b, stacked, srng)

    assert int(state_b.step) == K
    for k in metrics_a:
        np.testing.assert_allclose(
            float(metrics_a[k]), float(np.asarray(metrics_b[k])[-1]),
            rtol=2e-5, err_msg=k)
    wa = np.asarray(jax.device_get(
        state_a.params["params"]["box_head"]["fc1"]["kernel"]))
    wb = np.asarray(jax.device_get(
        state_b.params["params"]["box_head"]["fc1"]["kernel"]))
    np.testing.assert_allclose(wa, wb, rtol=1e-6, atol=1e-7)


def test_state_shardings_cover_multisteps_optimizer_mirrors():
    """ITER_SIZE>1 wraps the optimizer in optax.MultiSteps; the TP spec must
    reach the params AND every optimizer mirror (momentum trace, MultiSteps
    acc_grads) through the shared key paths (abstract state only — no jit)."""
    from jax.tree_util import keystr, tree_flatten_with_path

    from drn_wsod_tpu.parallel import state_shardings
    from test_modeling import tiny_batch, tiny_cfg

    cfg = tiny_cfg("WSDDNROIHeads")
    cfg.WSL.ITER_SIZE = 2
    model = build_model(cfg)
    batch = tiny_batch(B=2)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           batch, train=True)
    tx = build_optimizer(cfg, variables)
    state = jax.eval_shape(lambda: create_train_state(variables, tx))
    mesh = create_mesh(("data", "model"), (4, 2))
    sh = state_shardings(state, mesh)
    fc1_kernel_specs = [
        s.spec for path, s in tree_flatten_with_path(sh)[0]
        if "fc1" in keystr(path) and "kernel" in keystr(path)]
    # params + momentum trace + MultiSteps acc_grads
    assert len(fc1_kernel_specs) == 3
    assert all(spec == jax.sharding.PartitionSpec(None, "model")
               for spec in fc1_kernel_specs)
