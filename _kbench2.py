import time, sys, numpy as np, jax, jax.numpy as jnp
import importlib
rp = importlib.import_module('drn_wsod_tpu.ops.roi_pool_pallas')
B, H, W, C, P = 2, 87, 87, 2048, 4096
rng = np.random.RandomState(0)
feats = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32), dtype=jnp.bfloat16)
s = rng.uniform(0.02, 1.0, (B, P)) ** 2
w = s * 690 + 8; h = np.clip(w * rng.uniform(0.5, 2.0, (B, P)), 8, 700)
x1 = rng.uniform(0, np.maximum(700 - w, 1)); y1 = rng.uniform(0, np.maximum(700 - h, 1))
boxes = jnp.asarray(np.stack([x1, y1, np.minimum(x1+w, 703), np.minimum(y1+h, 703)], -1).astype(np.float32))
scale = jnp.asarray(rng.uniform(1, 2, (B, P)).astype(np.float32))
for RB in (8, 32, 64, 128):
    pool = jax.jit(jax.vmap(lambda f, b, sc: rp.roi_pool_pallas(f, b, 0.125, roi_scale=sc, roi_block=RB)))
    try:
        out = pool(feats, boxes, scale)
        float(jax.device_get(jnp.sum(out).astype(jnp.float32)))
        N = 10; t0 = time.perf_counter()
        for _ in range(N): out = pool(feats, boxes, scale)
        float(jax.device_get(jnp.sum(out).astype(jnp.float32)))
        print(f"RB={RB}: {(time.perf_counter()-t0)/N*1000:.1f} ms")
    except Exception as e:
        print(f"RB={RB}: FAIL {str(e)[:120]}")
