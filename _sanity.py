import time, numpy as np, jax, jax.numpy as jnp
from drn_wsod_tpu.config import get_cfg
from drn_wsod_tpu.models.backbones import build_ws_resnet_backbone

def timeit(f, *a, name="", N=20):
    o = f(*a); float(jax.device_get(jnp.sum(jax.tree.leaves(o)[0]).astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(N): o = f(*a)
    float(jax.device_get(jnp.sum(jax.tree.leaves(o)[0]).astype(jnp.float32)))
    print(f"{name:34s} {(time.perf_counter()-t0)/N*1e3:8.2f} ms")

rng = np.random.RandomState(0)
cfg = get_cfg()
bb, strides, chans = build_ws_resnet_backbone(cfg)
x = jnp.asarray(rng.randn(2, 704, 704, 3).astype(np.float32), dtype=jnp.bfloat16)
v = bb.init(jax.random.PRNGKey(0), x)
f = jax.jit(lambda v, x: bb.apply(v, x))
timeit(f, v, x, name="full backbone (res5)")

z = jnp.asarray(rng.randn(2, 87, 87, 512).astype(np.float32), dtype=jnp.bfloat16)
kz = jnp.asarray(rng.randn(3, 3, 512, 512).astype(np.float32) * 0.02, dtype=jnp.bfloat16)
@jax.jit
def conv_dil(z):
    return jax.lax.conv_general_dilated(z, kz, (1, 1), [(2, 2), (2, 2)],
        rhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"))
timeit(conv_dil, z, name="512ch dil2 conv (87^2)")
