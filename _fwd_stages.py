import time, numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_default_prng_impl", "rbg")
from __graft_entry__ import _synthetic_batch
from drn_wsod_tpu.config import get_cfg
from drn_wsod_tpu.models import build_model

B, H, P = 2, 704, 4096
cfg = get_cfg()
model = build_model(cfg)
batch = _synthetic_batch(B=B, H=H, W=H, P=P, C=cfg.MODEL.ROI_HEADS.NUM_CLASSES)
rng = jax.random.PRNGKey(0)
variables = model.init({"params": rng, "dropout": rng}, batch, train=True)

def timeit(f, *a, name=""):
    o = f(*a); float(jax.device_get(jnp.sum(jax.tree.leaves(o)[0]).astype(jnp.float32)))
    N = 10; t0 = time.perf_counter()
    for _ in range(N): o = f(*a)
    float(jax.device_get(jnp.sum(jax.tree.leaves(o)[0]).astype(jnp.float32)))
    print(f"{name:40s} {(time.perf_counter()-t0)/N*1e3:8.2f} ms")

@jax.jit
def feats_only(v, b):
    return model.apply(v, b.image, method="features")
timeit(feats_only, variables, batch, name="features")

@jax.jit
def pooled(v, b):
    f = model.apply(v, b.image, method="features")
    return model.apply(v, f, b.proposals, b.proposal_mask, b.objectness,
                       train=True, method="pooled_features",
                       rngs={"dropout": rng})
timeit(pooled, variables, batch, name="features+pool+DAN (train)")

@jax.jit
def pooled_eval(v, b):
    f = model.apply(v, b.image, method="features")
    return model.apply(v, f, b.proposals, b.proposal_mask, b.objectness,
                       train=False, method="pooled_features")
timeit(pooled_eval, variables, batch, name="features+pool+DAN (eval)")

@jax.jit
def full_losses(v, b):
    return model.apply(v, b, train=True, rngs={"dropout": rng})
timeit(full_losses, variables, batch, name="full forward losses")
