"""Scan-length sweep on the flagship train step: how much per-step cost is
the single dispatch + final-fetch tunnel RTT amortized over K?

The scanned timing (bench.py headline) pays ONE dispatch enqueue and ONE
value-dependent device_get per K steps; both ride the axon tunnel (~100 ms
RTT class, PERF.md). If ms/step falls as K grows, the difference is pure
tunnel artifact and the asymptote is the true device step time — and the
shipped Trainer can actually run at larger K (SOLVER.STEPS_PER_DISPATCH)
whenever no state-reading hook period forces a smaller chunk.

Usage: python tools/scan_k_probe.py [K ...]   (default 10 20 40 80)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_default_prng_impl", "rbg")


def main():
    ks = [int(a) for a in sys.argv[1:]] or [10, 20, 40, 80]

    from __graft_entry__ import _synthetic_batch
    from drn_wsod_tpu.config import get_cfg
    from drn_wsod_tpu.engine import create_train_state, make_train_step
    from drn_wsod_tpu.models import build_model
    from drn_wsod_tpu.solver import build_optimizer

    B, H, P = 2, 704, 4096
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "configs/PascalVOC-Detection/oicr_WSR_50_DC5_1x.yaml"))
    model = build_model(cfg)
    batch = _synthetic_batch(B=B, H=H, W=H, P=P,
                             C=cfg.MODEL.ROI_HEADS.NUM_CLASSES)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, batch, train=True)
    tx = build_optimizer(cfg, variables)
    raw_step = make_train_step(model, tx)

    for K in ks:
        def multi(state, batch, rng, K=K):
            def body(st, _):
                st, m = raw_step(st, batch, rng)
                return st, m["total_loss"]
            return jax.lax.scan(body, state, None, length=K)

        mstep = jax.jit(multi, donate_argnums=(0,))
        state = create_train_state(variables, tx)
        state, losses = mstep(state, batch, rng)           # compile+warm
        float(jax.device_get(losses[-1]))
        reps = max(1, 40 // K)
        t0 = time.perf_counter()
        for _ in range(reps):
            state, losses = mstep(state, batch, rng)
            float(jax.device_get(losses[-1]))
        dt = (time.perf_counter() - t0) / reps
        print(f"K={K:3d}: {dt * 1e3 / K:7.2f} ms/step, "
              f"{B * K / dt:6.2f} img/s/chip", flush=True)
        del state


if __name__ == "__main__":
    main()
