"""Benchmark: flagship WSOD train-step throughput on the available chip.

Measures images/sec/chip for the DRN-WSOD headline workload: OICR ResNet50-WS
dilated-C5, 4096 proposals/image, 704px images (the data pipeline's bucket for
the reference TEST.MIN_SIZE of 688), full train step (fwd + bwd + SGD).

Baseline: the closest supervised analog the reference documents is Faster
R-CNN R50-DC5 at 0.38 s/iter for a 16-image batch on 8 V100 = 5.25
img/s/GPU (/root/reference/MODEL_ZOO.md:110-118; see BASELINE.md). The
north-star target is >= 5x that per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}. The
extra keys record both timing methodologies (per-step dispatch and
K-steps-in-one-lax.scan dispatch — the Trainer's shipped execution mode,
engine/trainer.py) so the headline is auditable.

Robustness (the axon TPU tunnel intermittently stalls or degrades — a stalled
``jax.device_get`` hangs the process forever, and round 2's official record
was an rc=2 watchdog abort for exactly that reason):
  * before touching the device from this process, a small-matmul health probe
    runs in a bounded SUBPROCESS (one TPU client at a time on this rig, so it
    must finish before the main process initializes its backend), retried
    with backoff while the tunnel recovers;
  * the watchdog is progress-based: each completed phase re-arms it, so a
    slow-but-moving run is never killed mid-measurement;
  * if the watchdog does fire after a measurement exists, the best partial
    result is emitted on stdout (rc=0) instead of nothing.
"""

import json
import os
import subprocess
import sys
import threading
import time

BASELINE_IMG_PER_SEC_PER_GPU = 42.1 / 8  # MODEL_ZOO.md R50-DC5, 8xV100

_PROBE_CODE = (
    "import time, jax, jax.numpy as jnp\n"
    "t0 = time.perf_counter()\n"
    "x = jnp.ones((1024, 1024), jnp.bfloat16)\n"
    "v = float(jax.device_get((x @ x).sum()))\n"
    "print('PROBE_OK', time.perf_counter() - t0)\n"
)


def _log(msg: str) -> None:
    print(f"bench: {msg}", file=sys.stderr, flush=True)


class _Watchdog:
    """Progress-based abort guard. ``kick(phase)`` re-arms the timer; if no
    progress happens for ``phase_timeout`` seconds the process exits — with
    the best partial result on stdout (rc=0) when one exists, rc=2 otherwise."""

    def __init__(self, phase_timeout: float = 360.0):
        self._timeout = phase_timeout
        self._last = time.monotonic()
        self._phase = "startup"
        self._lock = threading.Lock()
        self._cancelled = False
        self.partial = None  # dict: best result so far, emitted on abort
        t = threading.Thread(target=self._watch, daemon=True)
        t.start()

    def kick(self, phase: str) -> None:
        with self._lock:
            self._last = time.monotonic()
            self._phase = phase
        _log(f"phase: {phase}")

    def cancel(self) -> None:
        with self._lock:
            self._cancelled = True

    def _watch(self) -> None:
        while True:
            time.sleep(5)
            with self._lock:
                if self._cancelled:
                    return
                stalled = time.monotonic() - self._last > self._timeout
                phase = self._phase
                partial = self.partial
            if stalled:
                _log(f"watchdog: no progress for {self._timeout:.0f}s in "
                     f"phase '{phase}' — TPU tunnel stalled")
                if partial is not None:
                    _log("watchdog: emitting best partial measurement")
                    print(json.dumps(partial), flush=True)
                    os._exit(0)
                os._exit(2)


def _probe_once(timeout_s: float) -> float:
    """Run the matmul health probe in a bounded subprocess.
    Returns elapsed seconds, or -1.0 on failure/timeout."""
    try:
        r = subprocess.run([sys.executable, "-c", _PROBE_CODE],
                           timeout=timeout_s, capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        return -1.0
    if r.returncode != 0:
        return -1.0
    for line in r.stdout.splitlines():
        if line.startswith("PROBE_OK"):
            return float(line.split()[1])
    return -1.0


def _wait_for_tunnel(wd: _Watchdog, budget_s: float = 1200.0) -> bool:
    """Probe the tunnel until healthy or the budget runs out. Each probe is
    subprocess-bounded so a full stall can't hang us; backoff between
    attempts gives a degraded tunnel time to recover (STATUS.md: observed
    recoveries after minutes)."""
    start = time.monotonic()
    attempt = 0
    backoff = 10.0
    while True:
        attempt += 1
        wd.kick(f"tunnel-probe attempt {attempt}")
        dt = _probe_once(timeout_s=150.0)
        if dt >= 0:
            # any completion within the subprocess deadline means the tunnel
            # is alive (a cold probe pays backend dial + compile, ~60s; the
            # failure mode being guarded is a FULL stall where device_get
            # never returns — STATUS.md, round-2 rc=2)
            _log(f"tunnel alive: probe matmul completed in {dt:.1f}s")
            return True
        left = budget_s - (time.monotonic() - start)
        _log(f"tunnel probe failed/stalled; "
             f"{left:.0f}s of probe budget left")
        if left <= 0:
            _log("probe budget exhausted — proceeding anyway (the run may "
                 "still succeed; the watchdog bounds the downside)")
            return False
        time.sleep(min(backoff, max(left, 1.0)))
        backoff = min(backoff * 1.6, 60.0)


def main():
    wd = _Watchdog(phase_timeout=360.0)
    _wait_for_tunnel(wd)

    wd.kick("imports + model build")
    import jax
    import numpy as np  # noqa: F401  (kept: synthetic batch uses host RNG)

    # Faster on-device PRNG for dropout masks (threefry costs ~5ms/step at
    # this batch; rbg is the standard TPU choice for throughput).
    jax.config.update("jax_default_prng_impl", "rbg")

    from __graft_entry__ import _synthetic_batch
    from drn_wsod_tpu.config import get_cfg
    from drn_wsod_tpu.engine import create_train_state, make_train_step
    from drn_wsod_tpu.models import build_model
    from drn_wsod_tpu.solver import build_optimizer

    # The ACTUAL flagship config (reference oicr_WSR_50_DC5_1x.yaml):
    # R50-WS DC5, DAN_DIM [2048, 4096] — not the [4096, 4096] generic-base
    # default, which doubles FC1 FLOPs vs the reference R50 workload.
    cfg = get_cfg()
    cfg.merge_from_file(os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "configs/PascalVOC-Detection/oicr_WSR_50_DC5_1x.yaml"))
    # B=2/chip matches the baseline's per-device batch (Faster R-CNN R50-DC5
    # trains 16 images over 8 V100s = 2 img/GPU, MODEL_ZOO.md:110-118);
    # H padded to the 704 bucket as the data pipeline would.
    B, H, P = 2, 704, 4096
    iters = 20

    model = build_model(cfg)
    batch = _synthetic_batch(B=B, H=H, W=H, P=P,
                             C=cfg.MODEL.ROI_HEADS.NUM_CLASSES)
    rng = jax.random.PRNGKey(0)

    wd.kick("params init (first device dispatch)")
    variables = model.init({"params": rng, "dropout": rng}, batch, train=True)
    tx = build_optimizer(cfg, variables)
    state = create_train_state(variables, tx)
    raw_step = make_train_step(model, tx)
    n_chips = jax.device_count()

    def result(img_s, timing, extra):
        out = {
            "metric": "train_images_per_sec_per_chip_oicr_r50ws_dc5_4kprops",
            "value": round(img_s, 3),
            "unit": "img/s/chip",
            "vs_baseline": round(img_s / BASELINE_IMG_PER_SEC_PER_GPU, 3),
            "timing": timing,
        }
        out.update(extra)
        return out

    # --- headline: `iters` steps inside ONE dispatch — the Trainer's
    # SHIPPED execution path (engine/trainer.py:make_multi_train_step,
    # lax.scan over the donated state and a K-STACKED batch, so every
    # scanned step consumes FRESH per-step data from HBM exactly like the
    # CLI trainer does — not one cached batch). Through the remote-TPU
    # tunnel a per-step dispatch additionally pays ~5ms/step of enqueue
    # bookkeeping that a locally-attached host would not (PERF.md dispatch
    # bisect); trajectory parity between the two is tested
    # (tests/test_engine.py::test_scanned_multi_step_matches_dispatched).
    import jax.numpy as jnp

    from drn_wsod_tpu.engine import make_multi_train_step

    wd.kick("stacked-batch build")
    step_batches = [batch] + [
        _synthetic_batch(B=B, H=H, W=H, P=P,
                         C=cfg.MODEL.ROI_HEADS.NUM_CLASSES, seed=i + 1)
        for i in range(iters - 1)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *step_batches)
    del step_batches

    def multi(state, stacked_batch, rng):
        st, metrics = make_multi_train_step(raw_step)(state, stacked_batch,
                                                      rng)
        return st, metrics["total_loss"]

    mstep = jax.jit(multi, donate_argnums=(0,))
    # NOTE: jax.block_until_ready does NOT synchronize on the axon platform
    # (STATUS.md) — a value-dependent jax.device_get of a scalar is the only
    # reliable fence, and the donated state chain forces every intermediate
    # step to have completed.
    wd.kick("scan compile + warmup")
    state, losses = mstep(state, stacked, rng)
    float(jax.device_get(losses[-1]))
    wd.kick("scan timed run")
    t0 = time.perf_counter()
    state, losses = mstep(state, stacked, rng)
    float(jax.device_get(losses[-1]))
    dt_scan = time.perf_counter() - t0
    scan_img_s = B * iters / dt_scan / n_chips
    wd.partial = result(scan_img_s, "scanned_dispatch_only",
                        {"scanned_dispatch_img_s": round(scan_img_s, 3)})
    _log(f"scanned dispatch: {dt_scan * 1e3 / iters:.2f} ms/step, "
         f"{scan_img_s:.2f} img/s/chip")

    # --- secondary: the same step dispatched once per iteration (includes
    # the tunnel's per-dispatch enqueue cost; reported for auditability).
    step = jax.jit(raw_step, donate_argnums=(0,))
    wd.kick("per-step compile + warmup")
    state, metrics = step(state, batch, rng)
    float(jax.device_get(metrics["total_loss"]))
    wd.kick("per-step timed run")
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch, rng)
    float(jax.device_get(metrics["total_loss"]))
    dt = time.perf_counter() - t0
    disp_img_s = B * iters / dt / n_chips
    _log(f"per-step dispatch: {dt * 1e3 / iters:.2f} ms/step, "
         f"{disp_img_s:.2f} img/s/chip")

    best = max(scan_img_s, disp_img_s)
    out = result(
        best,
        "scanned_dispatch" if scan_img_s >= disp_img_s else "per_step_dispatch",
        {"scanned_dispatch_img_s": round(scan_img_s, 3),
         "per_step_dispatch_img_s": round(disp_img_s, 3)})
    wd.partial = out
    wd.cancel()
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
