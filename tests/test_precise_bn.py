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
