import time, numpy as np, jax, jax.numpy as jnp
import importlib
rp = importlib.import_module('drn_wsod_tpu.ops.roi_pool_pallas')
from drn_wsod_tpu.ops.roi_align import roi_pool

B, H, W, C, P = 2, 87, 87, 2048, 4096
rng = np.random.RandomState(0)
feats = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32), dtype=jnp.bfloat16)
# VOC-like: mostly small boxes + some large/whole-image
s = rng.uniform(0.02, 1.0, (B, P)) ** 2
w = s * 690 + 8; h = np.clip(w * rng.uniform(0.5, 2.0, (B, P)), 8, 700)
x1 = rng.uniform(0, np.maximum(700 - w, 1)); y1 = rng.uniform(0, np.maximum(700 - h, 1))
boxes = jnp.asarray(np.stack([x1, y1, np.minimum(x1+w, 703), np.minimum(y1+h, 703)], -1).astype(np.float32))
scale = jnp.asarray(rng.uniform(1, 2, (B, P)).astype(np.float32))

pool = jax.jit(jax.vmap(lambda f, b, sc: rp.roi_pool_pallas(f, b, 0.125, roi_scale=sc)))
out = pool(feats, boxes, scale)
float(jax.device_get(jnp.sum(out).astype(jnp.float32)))
N = 10; t0 = time.perf_counter()
for _ in range(N): out = pool(feats, boxes, scale)
float(jax.device_get(jnp.sum(out).astype(jnp.float32)))
print(f"predicated exact pool (B={B}): {(time.perf_counter()-t0)/N*1000:.1f} ms")
ref = jax.vmap(lambda f, bx: roi_pool(f, bx, 0.125))(feats, boxes) * scale[..., None, None, None].astype(jnp.bfloat16)
d = jnp.abs(out.reshape(ref.shape).astype(jnp.float32) - ref.astype(jnp.float32)).max()
print("max abs diff vs XLA exact:", float(jax.device_get(d)))
