import time, numpy as np, jax, jax.numpy as jnp
from drn_wsod_tpu.config import get_cfg
from drn_wsod_tpu.models.backbones import build_ws_resnet_backbone

cfg = get_cfg()
print("dtype:", cfg.MODEL.DTYPE)
bb, strides, chans = build_ws_resnet_backbone(cfg)
x = jnp.asarray(np.random.RandomState(0).randn(2, 704, 704, 3).astype(np.float32), dtype=jnp.bfloat16)
v = bb.init(jax.random.PRNGKey(0), x)

def timeit(f, *a, name=""):
    o = f(*a); float(jax.device_get(jnp.sum(jax.tree.leaves(o)[0]).astype(jnp.float32)))
    N = 10; t0 = time.perf_counter()
    for _ in range(N): o = f(*a)
    float(jax.device_get(jnp.sum(jax.tree.leaves(o)[0]).astype(jnp.float32)))
    print(f"{name:30s} {(time.perf_counter()-t0)/N*1e3:8.2f} ms")

for feats_list in (("res2",), ("res3",), ("res4",), ("res5",)):
    bb2 = bb.clone(out_features=feats_list)
    f = jax.jit(lambda v, x: bb2.apply(v, x))
    timeit(f, v, x, name=f"through {feats_list[0]}")
