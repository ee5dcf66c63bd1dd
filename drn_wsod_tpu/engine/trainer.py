"""Functional train loop.

Replaces the reference's object-oriented trainer stack
(detectron2/engine/train_loop.py:84-289, projects/WSL/tools/train_net.py:65-117)
with a jit-compiled pure train step over an explicit TrainState, plus a thin
host loop that runs hooks and drains metrics.

TPU specifics:
  * the whole step (fwd, bwd, optimizer) is one XLA program; state buffers
    are donated, so parameters update in-place in HBM;
  * metrics stay on device and are only fetched when a writer fires, so the
    loop never blocks on a host sync per step;
  * gradient accumulation (WSL.ITER_SIZE) is inside the optimizer
    (optax.MultiSteps), not the host loop;
  * optionally, K steps execute inside ONE dispatch (``lax.scan`` over the
    donated state and a K-stacked batch — ``make_multi_train_step``):
    per-dispatch enqueue bookkeeping (~5 ms/step through a remote-TPU
    tunnel, PERF.md dispatch bisect) is paid once per K steps instead of
    per step. Hook semantics are exact when K divides every hook period
    (the CLI picks K = gcd(SOLVER.STEPS_PER_DISPATCH, all active periods),
    tools/train_net.py), because then every firing hook observes the same
    end-of-chunk state it would have seen eagerly;
  * data moves to the device on a background prefetch thread in both loop
    modes (chunk-level stacking+device_put, or per-batch in eager mode),
    so upload streams while the device computes. Eager per-step dispatch
    is the fastest fresh-data execution on DEVICE time (PERF.md round-5
    scan-variants bisect: 79.7 vs 86.5 ms/step — the scan's apparent
    advantage was XLA hoisting the frozen backbone over a reused
    benchmark batch); chunking trades ~7 ms/step of scan overhead for
    robustness to per-dispatch latency on remote links.
"""

from __future__ import annotations

import logging
import time
import weakref
from typing import Any, Callable, Dict, Iterator, List, Optional

import chex
import jax
import jax.numpy as jnp
import optax

from .events import EventStorage
from .hooks import HookBase

logger = logging.getLogger(__name__)

_STOP = object()  # eager-prefetch end-of-stream sentinel


@chex.dataclass
class TrainState:
    step: jnp.ndarray        # int32 scalar
    params: Any              # flax variables ({"params": ...})
    opt_state: Any


def create_train_state(variables, tx) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=variables,
                      opt_state=tx.init(variables))


def make_train_step(model, tx, loss_weights: Optional[Dict[str, float]] = None
                    ) -> Callable:
    """Build the pure (state, batch, rng) -> (state, metrics) step."""

    def train_step(state: TrainState, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(variables):
            losses = model.apply(variables, batch, train=True,
                                 rngs={"dropout": step_rng})
            if loss_weights:
                losses = {k: v * loss_weights.get(k, 1.0)
                          for k, v in losses.items()}
            return sum(jax.tree.leaves(losses)), losses

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["total_loss"] = total
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state)
        return new_state, metrics

    return train_step


def make_multi_train_step(raw_step: Callable) -> Callable:
    """Scan ``raw_step`` over a K-stacked batch pytree: one XLA dispatch
    executes K train steps back to back.

    ``stacked_batch`` leaves carry a leading steps axis; ``lax.scan`` infers
    K from it, so one compile covers each distinct K. The per-step RNG chain
    is identical to eager dispatch (``fold_in(rng, state.step)`` inside
    ``raw_step``), so the trajectory matches per-step dispatching bit for bit
    (tests/test_engine.py::test_scanned_multi_step_matches_dispatched and
    ::test_trainer_chunked_matches_eager)."""

    def multi_step(state: TrainState, stacked_batch, rng):
        def body(st, batch):
            st, m = raw_step(st, batch, rng)
            return st, m

        return jax.lax.scan(body, state, stacked_batch)

    return multi_step


def make_csc_train_step(model, tx, loss_weights: Optional[Dict[str, float]] = None,
                        tau: float = 0.7, fg_threshold: float = 0.1,
                        context_scale: float = 1.8) -> Callable:
    """Train step with the CSC constraint active (iter < WSL.CSC_MAX_ITER):
    compute class-peak-gradient maps by backprop-to-image, derive
    center-surround weights on device, and train with the CSC-weighted
    positive/negative image BCE (reference CSCROIHeads,
    projects/WSL/wsl/modeling/roi_heads/roi_heads_csc.py)."""
    import jax.numpy as jnp

    from ..models.heads.wsddn import image_probs
    from ..ops import csc as csc_lib

    def train_step(state: TrainState, batch, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        # CPG maps differentiate THROUGH the image — promote uint8-shipped
        # pixels to float before taking image gradients
        batch = batch.replace(image=batch.image.astype(jnp.float32))

        def score_fn(img):
            return model.apply(state.params, batch.replace(image=img),
                               method="proposal_scores")

        scores0 = model.apply(state.params, batch, method="proposal_scores")
        preds = image_probs(scores0)
        cpg = csc_lib.compute_cpg_batched(score_fn, batch.image, batch.labels,
                                          preds, tau)
        W, PL, NL = jax.vmap(
            lambda c, l, p, r, m: csc_lib.csc_forward(
                c, l, p, r, m, fg_threshold=fg_threshold,
                context_scale=context_scale)
        )(cpg, batch.labels, preds, batch.proposals, batch.proposal_mask)
        csc_w = jax.lax.stop_gradient((W, PL, NL))

        def loss_fn(variables):
            # cpg also supervises the WSJDS semantic branch when with_seg
            losses = model.apply(variables, batch, train=True,
                                 rngs={"dropout": step_rng}, csc_w=csc_w,
                                 cpg=jax.lax.stop_gradient(cpg))
            if loss_weights:
                losses = {k: v * loss_weights.get(k, 1.0)
                          for k, v in losses.items()}
            return sum(jax.tree.leaves(losses)), losses

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(losses)
        metrics["total_loss"] = total
        # CSC weight statistics (reference cpg_stats tracker,
        # projects/WSL/wsl/third_party/cpg_stats.py): polar weight masses +
        # the image evidence driving them.
        present = batch.labels > 0.5
        w_present = jnp.where(present[:, None, :], W, 0.0)
        n_present = jnp.maximum(jnp.sum(present), 1)
        metrics["csc/W_pos_mean"] = (jnp.sum(jnp.clip(w_present, 0, None))
                                     / (n_present * W.shape[1]))
        metrics["csc/W_neg_mean"] = (jnp.sum(-jnp.clip(w_present, None, 0))
                                     / (n_present * W.shape[1]))
        metrics["csc/pred_mean"] = jnp.sum(
            jnp.where(present, preds, 0.0)) / n_present
        return TrainState(step=state.step + 1, params=params,
                          opt_state=opt_state), metrics

    return train_step


class Trainer:
    """Hook-driven loop over a jitted train step (reference TrainerBase +
    SimpleTrainer, train_loop.py:84-250)."""

    def __init__(self, step_fn: Callable, state: TrainState,
                 data_iter: Iterator, rng: jax.Array,
                 lr_schedule: Optional[Callable] = None,
                 log_period: int = 20,
                 multi_step_fn: Optional[Callable] = None,
                 steps_per_dispatch: int = 1,
                 stack_fn: Optional[Callable] = None,
                 prefetch_chunks: int = 2):
        """``multi_step_fn(state, stacked_batch, rng)`` (see
        ``make_multi_train_step``) + ``steps_per_dispatch`` K > 1 switch the
        loop to chunked execution: K batches are pulled, stacked by
        ``stack_fn`` (default: host ``np.stack`` per leaf), and dispatched as
        ONE scan. Hooks still fire per iteration; a hook firing at a
        non-chunk-final iteration observes the end-of-chunk state, so pick K
        dividing every hook period for exact parity with eager stepping (the
        CLI does, tools/train_net.py).

        ``prefetch_chunks`` > 0 moves chunk building OFF the dispatch
        thread: a background thread pulls + stacks the next chunks and
        enqueues their host->device upload (``jax.device_put``) while the
        device is still computing the current chunk, double-buffered up to
        ``prefetch_chunks`` in flight. Through a serial tunnel this removes
        the host-stacking term from the critical path and keeps the upload
        stream fed back-to-back with compute (PERF.md round-5; round-4
        decomposition: ~39 ms/iter host stacking + ~105 ms/iter upload were
        serialized with 74.6 ms compute). 0 restores fully-inline behavior
        (useful for deterministic single-thread debugging)."""
        self._step_fn = step_fn
        self.state = state
        self._data_iter = data_iter
        self._rng = rng
        self._lr_schedule = lr_schedule
        self._log_period = log_period
        self._multi_step_fn = multi_step_fn
        self._steps_per_dispatch = max(int(steps_per_dispatch), 1)
        self._stack_fn = stack_fn
        self._prefetch_chunks = max(int(prefetch_chunks), 0)
        self._hooks: List[HookBase] = []
        self.iter = 0
        self.start_iter = 0
        self.max_iter = 0
        self.storage: Optional[EventStorage] = None
        self.last_batch = None
        self.last_chunk_step_time = None  # set at fences (both loop modes)
        self.last_prefetch_profile = None  # set by the prefetch worker
        self._last_fence_time = None
        self._last_fence_iter = None
        self._pending_metrics = None
        self._pending_data_time = 0.0

    def register_hooks(self, hooks: List[HookBase]):
        for h in hooks:
            h.trainer = weakref.proxy(self)
        self._hooks.extend(hooks)

    def train(self, start_iter: int, max_iter: int):
        self.iter = self.start_iter = start_iter
        self.max_iter = max_iter
        logger.info(f"Starting training from iteration {start_iter}")
        chunked = (self._multi_step_fn is not None
                   and self._steps_per_dispatch > 1)
        if not chunked and self._prefetch_chunks > 0:
            # eager mode: device_put each batch ahead of its dispatch on a
            # background thread, so upload overlaps the previous steps'
            # compute. Measured (PERF.md round-5): eager per-step dispatch
            # is the fastest FRESH-data execution (79.7 ms/step flagship vs
            # 86.5 for the K-step scan — the scan's reused-batch advantage
            # was frozen-backbone hoisting, which fresh data removes).
            self._data_iter = self._eager_prefetch_iter(
                self._data_iter, max_iter - start_iter)
        with EventStorage(start_iter) as self.storage:
            try:
                for h in self._hooks:
                    h.before_train()
                if chunked:
                    self._run_chunked(start_iter, max_iter)
                else:
                    for self.iter in range(start_iter, max_iter):
                        for h in self._hooks:
                            h.before_step()
                        self.run_step()
                        for h in self._hooks:
                            h.after_step()
                        self.storage.step()
                # reference semantics: self.iter == max_iter - 1 at the end
            finally:
                for h in self._hooks:
                    h.after_train()

    def _eager_prefetch_iter(self, data_iter, n: int):
        """Background thread pulls up to ``2 * prefetch_chunks`` batches
        ahead and enqueues their host->device copies; exceptions re-raise on
        the training thread. Bounded to ``n`` pulls so a finite iterator is
        not over-consumed past the training horizon."""
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=2 * self._prefetch_chunks)

        def worker():
            try:
                for _ in range(n):
                    try:
                        batch = next(data_iter)
                    except StopIteration:
                        q.put(RuntimeError(
                            "data iterator exhausted mid-training; train "
                            "loaders must be infinite (data/loader.py "
                            "TrainLoader)"))
                        return
                    batch = jax.tree.map(
                        lambda x: x if isinstance(x, jax.Array)
                        else jax.device_put(x), batch)
                    q.put(batch)
                q.put(_STOP)
            except BaseException as e:  # noqa: BLE001 - re-raised below
                q.put(e)

        threading.Thread(target=worker, daemon=True,
                         name="batch-prefetch").start()
        while True:
            item = q.get()
            if item is _STOP:
                return
            if isinstance(item, BaseException):
                raise item
            yield item

    def run_step(self):
        t0 = time.perf_counter()
        batch = next(self._data_iter)
        data_time = time.perf_counter() - t0

        self.state, metrics = self._step_fn(self.state, batch, self._rng)
        self.last_batch = batch   # for visualization hooks (pgt dumps)
        self._pending_metrics = metrics
        self._pending_data_time = data_time

        if (self.iter + 1) % self._log_period == 0 or \
                self.iter == self.max_iter - 1:
            # the flush's device_get FENCES every step enqueued since the
            # previous flush; dispatches are async, so per-step wall time
            # is meaningless and the fenced window / steps is the true
            # per-step cost (published as last_chunk_step_time for
            # IterationTimer, same contract as the chunked path)
            self._flush_metrics()
            now = time.perf_counter()
            if self._last_fence_iter is not None:
                steps = self.iter - self._last_fence_iter
                if steps > 0:
                    self.last_chunk_step_time = \
                        (now - self._last_fence_time) / steps
            self._last_fence_time, self._last_fence_iter = now, self.iter

    def _chunk_iter(self, start_iter: int, max_iter: int):
        """Yield (stacked_chunk, last_host_batch, k, per_step_data_time).

        With prefetching, chunks are built AND device_put-enqueued by a
        background thread up to ``prefetch_chunks`` ahead, so stacking and
        upload overlap the device's compute of the previous chunk;
        data_time then measures the wait for a ready chunk (~0 when the
        pipeline keeps up). Worker exceptions re-raise on the loop thread."""
        import numpy as np

        K = self._steps_per_dispatch
        stack = self._stack_fn or (lambda bs: jax.tree.map(
            lambda *xs: np.stack([np.asarray(x) for x in xs]), *bs))

        def build(k):
            try:
                batches = [next(self._data_iter) for _ in range(k)]
            except StopIteration:
                # explicit error (PEP 479 would otherwise surface this as an
                # opaque "generator raised StopIteration")
                raise RuntimeError(
                    "data iterator exhausted mid-training; train loaders "
                    "must be infinite (data/loader.py TrainLoader)") from None
            return stack(batches), batches[-1]

        sizes = []
        it = start_iter
        while it < max_iter:
            sizes.append(min(K, max_iter - it))
            it += sizes[-1]

        if self._prefetch_chunks <= 0:
            for k in sizes:
                t0 = time.perf_counter()
                stacked, last = build(k)
                yield stacked, last, k, (time.perf_counter() - t0) / k
            return

        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=self._prefetch_chunks)

        def worker():
            try:
                for k in sizes:
                    t0 = time.perf_counter()
                    stacked, last = build(k)
                    t1 = time.perf_counter()
                    # enqueue the host->device copy NOW, while the device
                    # is (typically) still busy with an earlier chunk;
                    # leaves a sharding-aware stack_fn already placed
                    # (stack_and_shard_batches) stay exactly where they are
                    stacked = jax.tree.map(
                        lambda x: x if isinstance(x, jax.Array)
                        else jax.device_put(x), stacked)
                    t2 = time.perf_counter()
                    # worker-side bottleneck profile, drained by
                    # IterationTimer/cli_throughput for decomposition
                    self.last_prefetch_profile = {
                        "pull_stack_s": t1 - t0, "device_put_s": t2 - t1}
                    q.put((stacked, last, k))
                q.put(None)
            except BaseException as e:  # noqa: BLE001 - re-raised on loop
                q.put(e)

        t = threading.Thread(target=worker, daemon=True,
                             name="chunk-prefetch")
        t.start()
        while True:
            t0 = time.perf_counter()
            item = q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            stacked, last, k = item
            yield stacked, last, k, (time.perf_counter() - t0) / k

    def _run_chunked(self, start_iter: int, max_iter: int):
        """K steps per dispatch via ``multi_step_fn`` (lax.scan). Hook
        before_steps for the chunk fire before the dispatch (with the
        correct ``self.iter``), after_steps per iteration after it."""
        it = start_iter
        for stacked, last, k, data_time in self._chunk_iter(start_iter,
                                                            max_iter):
            for j in range(k):
                self.iter = it + j
                for h in self._hooks:
                    h.before_step()
            self._pending_data_time = data_time
            t0 = time.perf_counter()
            # tail chunks (k < K) reuse the same scan fn: lax.scan infers
            # the length from the stacked leading axis (one extra compile,
            # and only when max_iter % K != 0).
            self.state, metrics = self._multi_step_fn(
                self.state, stacked, self._rng)
            self.last_batch = last
            for j in range(k):
                self.iter = it + j
                if (self.iter + 1) % self._log_period == 0 or \
                        self.iter == max_iter - 1:
                    # NaN-check steps [0, j]; record step j's values. The
                    # device_get fences the whole chunk, so the wall time
                    # since dispatch is the true device time of k steps.
                    self._pending_metrics = jax.tree.map(
                        lambda x: x[:j + 1], metrics)
                    self._flush_metrics()
                    self.last_chunk_step_time = \
                        (time.perf_counter() - t0) / k
                for h in self._hooks:
                    h.after_step()
                self.storage.step()
            it += k
        self.iter = max_iter - 1

    def _flush_metrics(self):
        """Fetch pending metrics and write them to storage. Leaves may be
        scalars (eager path) or step-stacked 1-D arrays (chunked path): the
        finiteness guard covers every element, the recorded value is the
        latest step's."""
        if self._pending_metrics is None:
            return
        host = jax.device_get(self._pending_metrics)
        bad = {k: jnp.asarray(v).tolist() for k, v in host.items()
               if not jnp.isfinite(jnp.asarray(v)).all()}
        if bad:
            # NaN guard (reference _detect_anomaly, train_loop.py:252-258).
            raise FloatingPointError(
                f"Loss became non-finite at iteration {self.iter}: {bad}")
        self.storage.put_scalars(
            **{k: float(jnp.asarray(v).reshape(-1)[-1])
               for k, v in host.items()}, smoothing_hint=True)
        self.storage.put_scalar("data_time", self._pending_data_time,
                                smoothing_hint=True)
        if self._lr_schedule is not None:
            self.storage.put_scalar(
                "lr", float(self._lr_schedule(self.iter)), smoothing_hint=False)
