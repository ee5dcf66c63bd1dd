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
``jax.device_get`` hangs the process forever; round 2's AND round 4's official
records were rc=2 watchdog aborts for exactly that reason). Four defenses,
each motivated by a previous failure:
  * before touching the device from this process, a small-matmul health probe
    runs in a bounded SUBPROCESS (one TPU client at a time on this rig, so it
    must finish before the main process initializes its backend), retried
    with backoff while the tunnel recovers;
  * the measured probe latency SCALES the watchdog budget: round 4's probe
    took 126.6s (vs 12.8s healthy) and the run then died in a 360s phase —
    the degradation signal was available and unused. Now a 10x-degraded
    tunnel gets a 10x phase budget (clamped to [360s, 2700s]);
  * the CHEAPEST measurement runs FIRST: single-step compile -> warmup ->
    a 5-iteration timed run, emitted as the partial result before anything
    expensive (stacked-batch upload, scan compile) is attempted. Round 4
    aborted with *nothing* because the expensive scan phase came first.
    Phases are also finer-grained (upload fence / compile / warmup are
    separately kicked) so slow-but-moving runs keep re-arming the watchdog;
  * a persistent compilation cache (jax_compilation_cache_dir) so retries
    after a stall skip recompiling through the slow tunnel, when the
    backend supports it.
"""

import json
import os
import subprocess
import sys
import threading
import time

BASELINE_IMG_PER_SEC_PER_GPU = 42.1 / 8  # MODEL_ZOO.md R50-DC5, 8xV100
HEALTHY_PROBE_S = 13.0  # round-3 healthy-tunnel probe latency (STATUS.md)

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

    def set_timeout(self, timeout_s: float) -> None:
        with self._lock:
            self._timeout = timeout_s
        _log(f"watchdog: phase budget set to {timeout_s:.0f}s")

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


def _wait_for_tunnel(wd: _Watchdog, budget_s: float = 1200.0) -> float:
    """Probe the tunnel until healthy or the budget runs out. Each probe is
    subprocess-bounded so a full stall can't hang us; backoff between
    attempts gives a degraded tunnel time to recover (STATUS.md: observed
    recoveries after minutes). Returns the measured probe latency (seconds),
    or -1.0 if no probe ever completed."""
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
            return dt
        left = budget_s - (time.monotonic() - start)
        _log(f"tunnel probe failed/stalled; "
             f"{left:.0f}s of probe budget left")
        if left <= 0:
            _log("probe budget exhausted — proceeding anyway (the run may "
                 "still succeed; the watchdog bounds the downside)")
            return -1.0
        time.sleep(min(backoff, max(left, 1.0)))
        backoff = min(backoff * 1.6, 60.0)


def main():
    wd = _Watchdog(phase_timeout=360.0)
    probe_dt = _wait_for_tunnel(wd)

    # Round-4 lesson: a 126.6s probe (10x the healthy 12.8s) predicted the
    # stall that killed the run inside a 360s phase budget. Scale the budget
    # by the measured degradation so a slow-but-alive tunnel finishes.
    if probe_dt > 0:
        degradation = max(1.0, probe_dt / HEALTHY_PROBE_S)
        wd.set_timeout(min(2700.0, max(360.0, 360.0 * degradation)))
    else:
        wd.set_timeout(2700.0)  # never-probed tunnel: maximum patience

    wd.kick("imports + model build")
    import jax
    import numpy as np  # noqa: F401  (kept: synthetic batch uses host RNG)

    # Persistent compilation cache: a retry after a watchdog abort (or the
    # driver re-running bench) skips recompiling through the slow tunnel.
    # Harmless no-op if the axon backend doesn't support executable
    # serialization.
    try:
        cache_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception as e:  # pragma: no cover - config name drift
        _log(f"compilation cache unavailable: {e}")

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

    # NOTE: jax.block_until_ready does NOT synchronize on the axon platform
    # (STATUS.md) — a value-dependent jax.device_get of a scalar is the only
    # reliable fence, and the donated state chain forces every intermediate
    # step to have completed.

    # --- CHEAPEST FIRST: single-step dispatch path — ALSO the Trainer's
    # shipped default since round 5 (SOLVER.STEPS_PER_DISPATCH=1 + eager
    # per-batch device_put prefetch; see config/defaults.py for the
    # measurement that flipped it). One step's compile is the smallest
    # program that yields a defensible number; a 5-iteration timed run
    # lands a partial result before anything expensive runs.
    step = jax.jit(raw_step, donate_argnums=(0,))
    wd.kick("per-step compile + warmup (1 dispatch)")
    state, metrics = step(state, batch, rng)
    float(jax.device_get(metrics["total_loss"]))
    wd.kick("per-step short timed run (5 iters)")
    t0 = time.perf_counter()
    for _ in range(5):
        state, metrics = step(state, batch, rng)
    float(jax.device_get(metrics["total_loss"]))
    dt5 = time.perf_counter() - t0
    short_img_s = B * 5 / dt5 / n_chips
    wd.partial = result(short_img_s, "per_step_dispatch_5it",
                        {"per_step_dispatch_img_s": round(short_img_s, 3)})
    _log(f"per-step short run: {dt5 * 1e3 / 5:.2f} ms/step, "
         f"{short_img_s:.2f} img/s/chip (partial result banked)")

    wd.kick("per-step timed run (20 iters)")
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch, rng)
    float(jax.device_get(metrics["total_loss"]))
    dt = time.perf_counter() - t0
    disp_img_s = B * iters / dt / n_chips
    wd.partial = result(disp_img_s, "per_step_dispatch",
                        {"per_step_dispatch_img_s": round(disp_img_s, 3)})
    _log(f"per-step dispatch: {dt * 1e3 / iters:.2f} ms/step, "
         f"{disp_img_s:.2f} img/s/chip")

    # --- secondary: `iters` steps inside ONE dispatch — the Trainer's
    # OPTIONAL chunked path (SOLVER.STEPS_PER_DISPATCH > 1;
    # engine/trainer.py:make_multi_train_step, lax.scan over the donated
    # state and a K-STACKED batch, so every scanned step consumes FRESH
    # per-step data from HBM — not one cached batch, which would let XLA
    # hoist the frozen backbone and inflate the number ~16%, PERF.md
    # round-5 scan-variants bisect). Trajectory parity between the two is
    # tested (tests/test_engine.py::test_scanned_multi_step_matches_dispatched).
    import jax.numpy as jnp

    from drn_wsod_tpu.engine import make_multi_train_step

    wd.kick("stacked-batch host build")
    step_batches = [batch] + [
        _synthetic_batch(B=B, H=H, W=H, P=P,
                         C=cfg.MODEL.ROI_HEADS.NUM_CLASSES, seed=i + 1)
        for i in range(iters - 1)]
    stacked_host = jax.tree.map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *step_batches)
    del step_batches

    wd.kick("stacked-batch upload (≈240 MB through the tunnel)")
    stacked = jax.device_put(stacked_host)
    # fence the upload so it cannot be conflated with the compile phase
    float(jax.device_get(stacked.image[0].reshape(-1)[0]))
    del stacked_host

    def multi(state, stacked_batch, rng):
        st, metrics = make_multi_train_step(raw_step)(state, stacked_batch,
                                                      rng)
        return st, metrics["total_loss"]

    mstep = jax.jit(multi, donate_argnums=(0,))
    wd.kick("scan compile + warmup dispatch")
    state, losses = mstep(state, stacked, rng)
    float(jax.device_get(losses[-1]))
    wd.kick("scan timed run")
    t0 = time.perf_counter()
    state, losses = mstep(state, stacked, rng)
    float(jax.device_get(losses[-1]))
    dt_scan = time.perf_counter() - t0
    scan_img_s = B * iters / dt_scan / n_chips
    _log(f"scanned dispatch: {dt_scan * 1e3 / iters:.2f} ms/step, "
         f"{scan_img_s:.2f} img/s/chip")

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
