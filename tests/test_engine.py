import json

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from drn_wsod_tpu.engine import (EventStorage, JSONWriter,
                                 Trainer, create_train_state,
                                 get_event_storage, make_multi_train_step,
                                 make_train_step)
from drn_wsod_tpu.engine.hooks import EvalHook, HookBase, IterationTimer


def test_event_storage_scalars_and_smoothing():
    with EventStorage(0) as s:
        for i in range(30):
            s.put_scalar("loss", float(i))
            s.step()
        assert get_event_storage() is s
        assert s.history("loss").latest() == 29.0
        assert 0 < s.history("loss").median(20) < 29
        lat = s.latest_with_smoothing_hint()
        assert "loss" in lat


def test_json_writer(tmp_path):
    f = str(tmp_path / "metrics.json")
    w = JSONWriter(f)
    with EventStorage(5) as s:
        s.put_scalar("loss", 1.5)
        w.write(s)
    w.close()
    rec = json.loads(open(f).read().strip())
    assert rec["iteration"] == 5
    assert rec["loss"] == 1.5


class _ToyModel:
    """Quadratic bowl 'model' compatible with make_train_step."""

    def apply(self, variables, batch, train=True, rngs=None):
        w = variables["params"]["w"]
        return {"loss": jnp.sum((w - batch) ** 2)}


def _toy_setup():
    model = _ToyModel()
    variables = {"params": {"w": jnp.asarray(5.0)}}
    tx = optax.sgd(0.1)
    state = create_train_state(variables, tx)
    step = jax.jit(make_train_step(model, tx))
    return step, state


def test_trainer_loop_with_hooks():
    step, state = _toy_setup()
    batches = iter(lambda: jnp.asarray(1.0), None)

    events = []

    class Recorder(HookBase):
        def before_train(self):
            events.append("before_train")

        def before_step(self):
            events.append(("before", self.trainer.iter))

        def after_step(self):
            events.append(("after", self.trainer.iter))

        def after_train(self):
            events.append("after_train")

    tr = Trainer(step, state, batches, jax.random.PRNGKey(0), log_period=2)
    tr.register_hooks([IterationTimer(), Recorder()])
    tr.train(0, 5)
    assert events[0] == "before_train" and events[-1] == "after_train"
    assert ("before", 0) in events and ("after", 4) in events
    # loss decreased (w moved towards 1.0)
    w = float(tr.state.params["params"]["w"])
    assert abs(w - 1.0) < abs(5.0 - 1.0)
    assert int(tr.state.step) == 5


def test_trainer_nan_guard():
    model = _ToyModel()
    variables = {"params": {"w": jnp.asarray(jnp.nan)}}
    tx = optax.sgd(0.1)
    state = create_train_state(variables, tx)
    step = jax.jit(make_train_step(model, tx))
    tr = Trainer(step, state, iter(lambda: jnp.asarray(1.0), None),
                 jax.random.PRNGKey(0), log_period=1)
    with pytest.raises(FloatingPointError):
        tr.train(0, 2)


def test_eval_hook_runs_at_end():
    step, state = _toy_setup()
    calls = []

    tr = Trainer(step, state, iter(lambda: jnp.asarray(1.0), None),
                 jax.random.PRNGKey(0))
    tr.register_hooks([EvalHook(0, lambda: calls.append(1) or
                                {"bbox": {"AP50": 1.0}})])
    tr.train(0, 3)
    assert len(calls) == 1


def test_checkpoint_roundtrip(tmp_path):
    from drn_wsod_tpu.checkpoint import Checkpointer

    step, state = _toy_setup()
    ck = Checkpointer(str(tmp_path / "ck"))
    state2, metrics = step(state, jnp.asarray(1.0), jax.random.PRNGKey(0))
    ck.save(state2, 1)
    restored = ck.load(state)
    np.testing.assert_allclose(float(restored.params["params"]["w"]),
                               float(state2.params["params"]["w"]))
    assert ck.latest_step() == 1


def _chunked_setup():
    model = _ToyModel()
    tx = optax.sgd(0.1)
    raw = make_train_step(model, tx)
    state = create_train_state({"params": {"w": jnp.asarray(5.0)}}, tx)
    return jax.jit(raw), jax.jit(make_multi_train_step(raw)), state


class _Recorder(HookBase):
    def __init__(self):
        self.before, self.after, self.fired = [], [], []

    def before_step(self):
        self.before.append(self.trainer.iter)

    def after_step(self):
        self.after.append(self.trainer.iter)
        if (self.trainer.iter + 1) % 4 == 0:  # a period-4 periodic hook
            self.fired.append((self.trainer.iter,
                               int(self.trainer.state.step)))


def test_trainer_chunked_matches_eager():
    """The Trainer's K-steps-per-dispatch path (engine/trainer.py
    _run_chunked) must reproduce the eager per-step trajectory exactly,
    with hooks firing at the same iterations — including a non-multiple
    max_iter exercising the tail chunk."""
    max_iter = 10  # K=4 -> chunks of 4, 4, 2 (tail)

    def batches():
        return iter(float(i) for i in range(max_iter))

    step, multi, state_a = _chunked_setup()
    rec_a = _Recorder()
    tr_a = Trainer(step, state_a, batches(), jax.random.PRNGKey(0),
                   log_period=4)
    tr_a.register_hooks([IterationTimer(), rec_a])
    tr_a.train(0, max_iter)

    _, _, state_b = _chunked_setup()
    rec_b = _Recorder()
    tr_b = Trainer(step, state_b, batches(), jax.random.PRNGKey(0),
                   log_period=4, multi_step_fn=multi, steps_per_dispatch=4)
    tr_b.register_hooks([IterationTimer(), rec_b])
    tr_b.train(0, max_iter)

    np.testing.assert_array_equal(
        np.asarray(tr_a.state.params["params"]["w"]),
        np.asarray(tr_b.state.params["params"]["w"]))
    assert int(tr_b.state.step) == max_iter
    assert rec_a.after == rec_b.after == list(range(max_iter))
    assert sorted(rec_b.before) == list(range(max_iter))
    # the period-4 hook fired at the same iters and saw the same state.step
    # (4 and 8 are chunk boundaries, so chunked semantics are exact)
    assert rec_a.fired == rec_b.fired == [(3, 4), (7, 8)]
    # identical logged trajectory at flush points
    assert (tr_a.storage.history("total_loss").values()
            == tr_b.storage.history("total_loss").values())


def test_trainer_eager_prefetch_matches_unprefetched():
    """Eager mode's per-batch device_put prefetch thread (the round-5
    default eager data path) must reproduce the unprefetched trajectory,
    batch order, and hook schedule exactly."""
    max_iter = 7

    def batches():
        return iter(float(i) for i in range(max_iter))

    step, _, state_a = _chunked_setup()
    rec_a = _Recorder()
    tr_a = Trainer(step, state_a, batches(), jax.random.PRNGKey(0),
                   log_period=3, prefetch_chunks=0)
    tr_a.register_hooks([rec_a])
    tr_a.train(0, max_iter)

    _, _, state_b = _chunked_setup()
    rec_b = _Recorder()
    tr_b = Trainer(step, state_b, batches(), jax.random.PRNGKey(0),
                   log_period=3, prefetch_chunks=2)
    tr_b.register_hooks([rec_b])
    tr_b.train(0, max_iter)

    np.testing.assert_array_equal(
        np.asarray(tr_a.state.params["params"]["w"]),
        np.asarray(tr_b.state.params["params"]["w"]))
    assert rec_a.after == rec_b.after == list(range(max_iter))
    assert (tr_a.storage.history("total_loss").values()
            == tr_b.storage.history("total_loss").values())


def test_trainer_chunked_prefetch_matches_inline():
    """prefetch_chunks > 0 (the default: background thread stacks chunks and
    enqueues their device_put while the device computes) must reproduce the
    inline prefetch_chunks=0 trajectory and hook schedule exactly."""
    max_iter = 10

    def batches():
        return iter(float(i) for i in range(max_iter))

    step, multi, state_a = _chunked_setup()
    rec_a = _Recorder()
    tr_a = Trainer(step, state_a, batches(), jax.random.PRNGKey(0),
                   log_period=4, multi_step_fn=multi, steps_per_dispatch=4,
                   prefetch_chunks=0)
    tr_a.register_hooks([rec_a])
    tr_a.train(0, max_iter)

    _, _, state_b = _chunked_setup()
    rec_b = _Recorder()
    tr_b = Trainer(step, state_b, batches(), jax.random.PRNGKey(0),
                   log_period=4, multi_step_fn=multi, steps_per_dispatch=4,
                   prefetch_chunks=2)
    tr_b.register_hooks([rec_b])
    tr_b.train(0, max_iter)

    np.testing.assert_array_equal(
        np.asarray(tr_a.state.params["params"]["w"]),
        np.asarray(tr_b.state.params["params"]["w"]))
    assert rec_a.after == rec_b.after == list(range(max_iter))
    assert rec_a.fired == rec_b.fired
    assert (tr_a.storage.history("total_loss").values()
            == tr_b.storage.history("total_loss").values())


def test_trainer_chunked_prefetch_propagates_worker_error():
    """An exhausted/broken data iterator inside the prefetch worker must
    re-raise on the training thread, not hang the queue."""
    step, multi, state = _chunked_setup()
    tr = Trainer(step, state, iter([1.0, 2.0]), jax.random.PRNGKey(0),
                 log_period=4, multi_step_fn=multi, steps_per_dispatch=4,
                 prefetch_chunks=2)
    with pytest.raises(RuntimeError, match="exhausted"):
        tr.train(0, 8)


def test_trainer_chunked_nan_guard():
    step, multi, state = _chunked_setup()
    bad = iter([1.0, float("nan"), 1.0, 1.0])
    tr = Trainer(step, state, bad, jax.random.PRNGKey(0), log_period=4,
                 multi_step_fn=multi, steps_per_dispatch=4)
    with pytest.raises(FloatingPointError):
        tr.train(0, 4)


def test_scanned_multi_step_matches_dispatched():
    """bench.py's single-dispatch lax.scan of the train step must produce the
    same trajectory as per-step dispatches (same fold_in(rng, step) chain)."""
    model = _ToyModel()
    tx = optax.sgd(0.1)
    raw_step = make_train_step(model, tx)
    batch = jnp.asarray(1.0)
    rng = jax.random.PRNGKey(0)
    K = 5

    state_a = create_train_state({"params": {"w": jnp.asarray(5.0)}}, tx)
    step = jax.jit(raw_step)
    for _ in range(K):
        state_a, metrics = step(state_a, batch, rng)

    def multi(state, batch, rng):
        def body(st, _):
            st, m = raw_step(st, batch, rng)
            return st, m["total_loss"]
        return jax.lax.scan(body, state, None, length=K)

    state_b, losses = jax.jit(multi)(
        create_train_state({"params": {"w": jnp.asarray(5.0)}}, tx),
        batch, rng)
    assert losses.shape == (K,)
    assert jnp.allclose(state_a.params["params"]["w"],
                        state_b.params["params"]["w"])
    assert int(state_b.step) == K
