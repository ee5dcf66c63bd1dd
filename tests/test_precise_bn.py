import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from drn_wsod_tpu.engine.precise_bn import update_bn_stats


class TinyBN(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool = True):
        return nn.BatchNorm(momentum=0.9, use_running_average=not train)(x)


def test_update_bn_stats_recovers_true_statistics():
    model = TinyBN()
    rng = np.random.RandomState(0)
    data = [jnp.asarray(rng.normal(3.0, 2.0, (32, 4)).astype(np.float32))
            for _ in range(50)]
    variables = model.init(jax.random.PRNGKey(0), data[0])

    def apply_fn(v, batch, mutable):
        return model.apply(v, batch, train=True, mutable=mutable)

    out = update_bn_stats(apply_fn, variables, iter(data), num_iters=50)
    mean = np.asarray(out["batch_stats"]["BatchNorm_0"]["mean"])
    var = np.asarray(out["batch_stats"]["BatchNorm_0"]["var"])
    np.testing.assert_allclose(mean, 3.0, atol=0.2)
    np.testing.assert_allclose(var, 4.0, rtol=0.2)


def test_update_bn_stats_noop_without_bn():
    variables = {"params": {"w": jnp.zeros(3)}}
    out = update_bn_stats(lambda *a, **k: None, variables, iter([]), 10)
    assert out is variables


def test_precise_bn_hook_updates_trainer_state():
    """PreciseBNHook recomputes batch_stats on the live trainer state
    (reference PreciseBN hook, detectron2/engine/hooks.py:357)."""
    from functools import partial

    import flax.linen as nn
    import optax

    from drn_wsod_tpu.engine import (PreciseBNHook, Trainer,
                                     create_train_state)

    class M(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            return nn.BatchNorm(momentum=0.9, epsilon=1e-5,
                                use_running_average=not train)(x)

    m = M()
    rng = np.random.RandomState(0)
    batches = [jnp.asarray(rng.randn(8, 4).astype(np.float32) * 3 + 5)
               for _ in range(10)]
    variables = m.init(jax.random.PRNGKey(0), batches[0])
    tx = optax.sgd(0.0)
    state = create_train_state(variables, tx)

    def step(state, batch, rng):
        return state, {"total_loss": jnp.zeros(())}

    trainer = Trainer(step, state, iter(batches), jax.random.PRNGKey(0))
    hook = PreciseBNHook(
        period=1000,
        apply_fn=partial(m.apply, train=True),
        data_iter_fn=lambda: iter(batches),
        num_iters=8)
    trainer.register_hooks([hook])
    trainer.train(0, 1)

    mean = np.asarray(
        trainer.state.params["batch_stats"]["BatchNorm_0"]["mean"])
    # true data mean ~5 (init running mean is 0; one EMA step alone would
    # only reach ~0.5)
    assert np.all(np.abs(mean - 5.0) < 1.0), mean
