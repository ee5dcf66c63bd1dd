import jax
import jax.numpy as jnp
import numpy as np

from drn_wsod_tpu.config import get_cfg
from drn_wsod_tpu.solver import (build_lr_schedule, build_optimizer,
                                 make_param_labels)

import pytest

pytestmark = pytest.mark.core


def test_warmup_multistep_schedule():
    cfg = get_cfg()
    cfg.SOLVER.BASE_LR = 1.0
    cfg.SOLVER.STEPS = (100, 200)
    cfg.SOLVER.GAMMA = 0.1
    cfg.SOLVER.WARMUP_ITERS = 10
    cfg.SOLVER.WARMUP_FACTOR = 0.1
    sched = build_lr_schedule(cfg)
    np.testing.assert_allclose(float(sched(jnp.asarray(0))), 0.1)
    np.testing.assert_allclose(float(sched(jnp.asarray(5))),
                               0.1 * 0.5 + 0.5, rtol=1e-6)
    np.testing.assert_allclose(float(sched(jnp.asarray(50))), 1.0)
    np.testing.assert_allclose(float(sched(jnp.asarray(150))), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(sched(jnp.asarray(250))), 0.01, rtol=1e-6)


def test_param_labels():
    params = {
        "params": {
            "backbone": {
                "stem": {"conv1": {"kernel": jnp.zeros((3, 3, 3, 8))},
                         "conv1_norm": {"weight": jnp.zeros(8),
                                        "running_mean": jnp.zeros(8)}},
                "res5_0": {"conv1": {"kernel": jnp.zeros((1, 1, 8, 8))}},
            },
            "box_head": {"fc1": {"kernel": jnp.zeros((8, 4)),
                                 "bias": jnp.zeros(4)}},
        }
    }
    labels = make_param_labels(params, freeze_at=5)
    p = labels["params"]
    assert p["backbone"]["stem"]["conv1"]["kernel"] == "frozen"
    assert p["backbone"]["stem"]["conv1_norm"]["weight"] == "frozen"
    assert p["backbone"]["res5_0"]["conv1"]["kernel"] == "frozen"
    assert p["box_head"]["fc1"]["kernel"] == "weight"
    assert p["box_head"]["fc1"]["bias"] == "bias"

    labels2 = make_param_labels(params, freeze_at=2)
    p2 = labels2["params"]
    assert p2["backbone"]["res5_0"]["conv1"]["kernel"] == "weight"
    assert p2["backbone"]["stem"]["conv1"]["kernel"] == "frozen"


def test_optimizer_respects_groups():
    cfg = get_cfg()
    cfg.SOLVER.BASE_LR = 1.0
    cfg.SOLVER.BIAS_LR_FACTOR = 2.0
    cfg.SOLVER.MOMENTUM = 0.0
    cfg.SOLVER.WEIGHT_DECAY = 0.0
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.STEPS = ()
    params = {
        "params": {
            "backbone": {"stem": {"conv1": {"kernel": jnp.ones((2,))}}},
            "head": {"kernel": jnp.ones((2,)), "bias": jnp.ones((2,))},
        }
    }
    tx = build_optimizer(cfg, params)
    state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    u = updates["params"]
    np.testing.assert_allclose(np.asarray(u["backbone"]["stem"]["conv1"]["kernel"]), 0.0)
    np.testing.assert_allclose(np.asarray(u["head"]["kernel"]), -1.0)
    np.testing.assert_allclose(np.asarray(u["head"]["bias"]), -2.0)


def test_iter_size_accumulation():
    cfg = get_cfg()
    cfg.WSL.ITER_SIZE = 2
    cfg.SOLVER.BASE_LR = 1.0
    cfg.SOLVER.MOMENTUM = 0.0
    cfg.SOLVER.WEIGHT_DECAY = 0.0
    cfg.SOLVER.BIAS_LR_FACTOR = 1.0
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.SOLVER.STEPS = ()
    params = {"params": {"head": {"kernel": jnp.zeros((1,))}}}
    tx = build_optimizer(cfg, params)
    state = tx.init(params)
    g1 = {"params": {"head": {"kernel": jnp.ones((1,))}}}
    u1, state = tx.update(g1, state, params)
    # first micro-step: no update yet
    np.testing.assert_allclose(np.asarray(u1["params"]["head"]["kernel"]), 0.0)
    u2, state = tx.update(g1, state, params)
    # second micro-step: mean grad applied
    np.testing.assert_allclose(np.asarray(u2["params"]["head"]["kernel"]), -1.0)
