"""Multi-step optimizer-TRAJECTORY parity vs torch.

Single-step gradient parity (test_reference_parity.py) cannot catch
integration bugs between the solver pieces; this runs ~50 steps with every
reference solver semantic active at once — SGD+momentum, coupled L2 weight
decay, BIAS_LR_FACTOR 2, WEIGHT_DECAY_BIAS 0, linear-warmup multistep LR,
ITER_SIZE=2 gradient accumulation — and asserts the per-step losses and the
final parameters match a faithful torch re-implementation of the reference
semantics (detectron2/solver/build.py:94-160, solver/lr_scheduler.py:16-116,
projects/WSL/tools/train_net.py:100-113: loss/iter_size backward each iter,
optimizer.step every iter_size iters, scheduler.step EVERY iter)."""

from bisect import bisect_right

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drn_wsod_tpu.config import get_cfg
from drn_wsod_tpu.engine import create_train_state, make_train_step
from drn_wsod_tpu.solver import build_optimizer

BASE_LR = 0.02
MOMENTUM = 0.9
WD = 1e-4
BIAS_LR_FACTOR = 2.0
WARMUP_ITERS = 10
WARMUP_FACTOR = 1.0 / 1000
STEPS = (20, 35)
GAMMA = 0.1
ITER_SIZE = 2
N_ITERS = 50


def _lr_factor(it: int) -> float:
    """Reference WarmupMultiStepLR factor at iteration ``it``
    (lr_scheduler.py:16-49 + _get_warmup_factor_at_iter :90-116)."""
    if it < WARMUP_ITERS:
        alpha = it / WARMUP_ITERS
        warm = WARMUP_FACTOR * (1 - alpha) + alpha
    else:
        warm = 1.0
    return warm * GAMMA ** bisect_right(list(STEPS), it)


def _data():
    rs = np.random.RandomState(0)
    xs = rs.randn(N_ITERS, 8, 4).astype(np.float32)
    ys = rs.randn(N_ITERS, 8, 3).astype(np.float32)
    w1 = (rs.randn(4, 16) * 0.5).astype(np.float32)
    b1 = rs.randn(16).astype(np.float32) * 0.1
    w2 = (rs.randn(16, 3) * 0.5).astype(np.float32)
    b2 = rs.randn(3).astype(np.float32) * 0.1
    return xs, ys, w1, b1, w2, b2


class _MLP:
    def apply(self, variables, batch, train=True, rngs=None):
        p = variables["params"]
        x, y = batch
        h = jnp.maximum(x @ p["fc1"]["kernel"] + p["fc1"]["bias"], 0.0)
        out = h @ p["fc2"]["kernel"] + p["fc2"]["bias"]
        return {"loss": jnp.mean((out - y) ** 2)}


def _run_ours(xs, ys, w1, b1, w2, b2):
    cfg = get_cfg()
    cfg.SOLVER.BASE_LR = BASE_LR
    cfg.SOLVER.MOMENTUM = MOMENTUM
    cfg.SOLVER.WEIGHT_DECAY = WD
    cfg.SOLVER.WEIGHT_DECAY_BIAS = 0.0
    cfg.SOLVER.BIAS_LR_FACTOR = BIAS_LR_FACTOR
    cfg.SOLVER.WARMUP_ITERS = WARMUP_ITERS
    cfg.SOLVER.WARMUP_FACTOR = WARMUP_FACTOR
    cfg.SOLVER.STEPS = STEPS
    cfg.SOLVER.GAMMA = GAMMA
    cfg.WSL.ITER_SIZE = ITER_SIZE

    variables = {"params": {
        "fc1": {"kernel": jnp.asarray(w1), "bias": jnp.asarray(b1)},
        "fc2": {"kernel": jnp.asarray(w2), "bias": jnp.asarray(b2)},
    }}
    model = _MLP()
    tx = build_optimizer(cfg, variables)
    state = create_train_state(variables, tx)
    step = jax.jit(make_train_step(model, tx))
    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(N_ITERS):
        state, metrics = step(state, (jnp.asarray(xs[i]), jnp.asarray(ys[i])),
                              rng)
        losses.append(float(metrics["loss"]))
    return np.asarray(losses), jax.device_get(state.params["params"])


def _run_torch(xs, ys, w1, b1, w2, b2):
    torch = pytest.importorskip("torch")

    W1 = torch.tensor(w1, requires_grad=True)
    B1 = torch.tensor(b1, requires_grad=True)
    W2 = torch.tensor(w2, requires_grad=True)
    B2 = torch.tensor(b2, requires_grad=True)
    opt = torch.optim.SGD(
        [{"params": [W1, W2], "lr": BASE_LR, "weight_decay": WD},
         {"params": [B1, B2], "lr": BASE_LR * BIAS_LR_FACTOR,
          "weight_decay": 0.0}],
        lr=BASE_LR, momentum=MOMENTUM)
    base_lrs = [BASE_LR, BASE_LR * BIAS_LR_FACTOR]

    losses = []
    for it in range(N_ITERS):
        # scheduler state at run_step time = factor(it) (the hook steps the
        # scheduler in after_step, so iteration it sees `it` prior steps)
        for g, bl in zip(opt.param_groups, base_lrs):
            g["lr"] = bl * _lr_factor(it)
        x = torch.tensor(xs[it])
        y = torch.tensor(ys[it])
        out = torch.relu(x @ W1 + B1) @ W2 + B2
        loss = ((out - y) ** 2).mean()
        losses.append(float(loss.detach()))
        (loss / ITER_SIZE).backward()
        if (it + 1) % ITER_SIZE == 0:
            opt.step()
            opt.zero_grad()
    return np.asarray(losses), {
        "fc1": {"kernel": W1.detach().numpy(), "bias": B1.detach().numpy()},
        "fc2": {"kernel": W2.detach().numpy(), "bias": B2.detach().numpy()},
    }


def test_optimizer_trajectory_matches_torch():
    xs, ys, w1, b1, w2, b2 = _data()
    ours_losses, ours_params = _run_ours(xs, ys, w1, b1, w2, b2)
    ref_losses, ref_params = _run_torch(xs, ys, w1, b1, w2, b2)

    # losses decreased and crossed the warmup + both LR drops
    assert ref_losses[-1] < ref_losses[0]
    np.testing.assert_allclose(ours_losses, ref_losses, rtol=2e-4, atol=1e-5)
    for mod in ("fc1", "fc2"):
        for leaf in ("kernel", "bias"):
            np.testing.assert_allclose(
                ours_params[mod][leaf], ref_params[mod][leaf],
                rtol=2e-4, atol=1e-5, err_msg=f"{mod}.{leaf}")


def test_optimizer_trajectory_matches_torch_no_accumulation():
    """Same joint semantics with ITER_SIZE=1 (pure per-step SGD) — isolates
    the accumulation remap so a failure localizes."""
    global ITER_SIZE
    xs, ys, w1, b1, w2, b2 = _data()
    old = ITER_SIZE
    try:
        ITER_SIZE = 1
        ours_losses, ours_params = _run_ours(xs, ys, w1, b1, w2, b2)
        ref_losses, ref_params = _run_torch(xs, ys, w1, b1, w2, b2)
    finally:
        ITER_SIZE = old
    np.testing.assert_allclose(ours_losses, ref_losses, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(ours_params["fc1"]["kernel"],
                               ref_params["fc1"]["kernel"], rtol=2e-4,
                               atol=1e-5)
