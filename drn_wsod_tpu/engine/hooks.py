"""Trainer hooks.

The 4-phase hook protocol of the reference
(detectron2/engine/train_loop.py:26-81, engine/hooks.py): before_train /
before_step / after_step / after_train, with IterationTimer, PeriodicWriter,
PeriodicCheckpointer, LRScheduler (metric logging only — the schedule itself
is functional, inside the optimizer) and EvalHook.
"""

from __future__ import annotations

import logging
import time
from typing import Callable, Optional

from .events import get_event_storage

logger = logging.getLogger(__name__)


class HookBase:
    trainer = None  # set by Trainer.register_hooks

    def before_train(self):
        pass

    def after_train(self):
        pass

    def before_step(self):
        pass

    def after_step(self):
        pass


class IterationTimer(HookBase):
    """Tracks seconds per iteration, excluding warmup
    (reference hooks.py:75-144)."""

    def __init__(self, warmup_iter: int = 3):
        self._warmup_iter = warmup_iter
        self._start_time = time.perf_counter()
        self._step_start = None

    def before_train(self):
        self._start_time = time.perf_counter()

    def after_train(self):
        total = time.perf_counter() - self._start_time
        logger.info(f"Total training time: {total:.2f}s")
        # reference hooks.py:109-127 "Overall training speed" line — scraped
        # by dev/parse_results.sh
        try:
            hist = get_event_storage().history("time")
            vals = [v for v, _ in hist.values()]
            if vals:
                logger.info(
                    f"Overall training speed: {len(vals)} iterations in "
                    f"{sum(vals):.1f}s ({sum(vals) / len(vals):.4f} s / it)")
        except KeyError:
            pass

    def before_step(self):
        self._step_start = time.perf_counter()

    def after_step(self):
        storage = get_event_storage()
        it = self.trainer.iter - self.trainer.start_iter
        if it < self._warmup_iter:
            return
        # chunked (K-steps-per-dispatch) trainer: per-step wall clock is
        # meaningless (the dispatch is async); the trainer publishes the
        # fenced chunk time / K instead.
        # Both loop modes publish fenced time-per-step at flush points
        # (trainer.last_chunk_step_time). Per-step wall clock is NEVER a
        # valid fallback: dispatches are async on every backend this runs
        # on, so wall time between steps measures enqueue, not execution
        # (it polluted the eager-mode throughput probe with 0.04 s/it
        # readings against a 0.08 s/it device floor, round-5).
        chunk = getattr(self.trainer, "last_chunk_step_time", None)
        if chunk is not None:
            storage.put_scalar("time", chunk, smoothing_hint=True)
        prof = getattr(self.trainer, "last_prefetch_profile", None)
        if prof:
            # worker-side chunk build profile (prefetch thread): where the
            # data pipeline spends its time when data_time > 0
            storage.put_scalars(smoothing_hint=True, **{
                f"prefetch/{k}": float(v) for k, v in prof.items()})


class PeriodicWriter(HookBase):
    def __init__(self, writers, period: int = 20):
        self._writers = writers
        self._period = period

    def after_step(self):
        if (self.trainer.iter + 1) % self._period == 0 or (
                self.trainer.iter == self.trainer.max_iter - 1):
            for w in self._writers:
                w.write(get_event_storage())

    def after_train(self):
        for w in self._writers:
            w.write(get_event_storage())
            w.close()


class PeriodicCheckpointer(HookBase):
    def __init__(self, checkpointer, period: int):
        self._checkpointer = checkpointer
        self._period = period

    def after_step(self):
        it = self.trainer.iter
        if (it + 1) % self._period == 0 or it == self.trainer.max_iter - 1:
            self._checkpointer.save(self.trainer.state, it + 1)


class ProfilerHook(HookBase):
    """Captures a jax.profiler trace for a window of iterations
    (equivalent of the reference AutogradProfiler hook,
    detectron2/engine/hooks.py:236-298: chrome-trace dumps to OUTPUT_DIR;
    here the artifact is a TensorBoard/Perfetto-compatible XPlane trace)."""

    def __init__(self, output_dir: str, start_iter: int = 10,
                 num_iters: int = 5):
        self._dir = output_dir
        self._start = start_iter
        self._stop = start_iter + num_iters
        self._active = False

    def before_step(self):
        if self.trainer.iter == self._start and not self._active:
            import jax

            jax.profiler.start_trace(self._dir)
            self._active = True

    def after_step(self):
        if self.trainer.iter + 1 >= self._stop and self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
            logger.info(f"Saved profiler trace to {self._dir}")

    def after_train(self):
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False


class EvalHook(HookBase):
    """Runs ``eval_fn`` every ``period`` iters and at the end
    (reference hooks.py:300-356)."""

    def __init__(self, period: int, eval_fn: Callable[[], Optional[dict]]):
        self._period = period
        self._fn = eval_fn

    def _do_eval(self):
        results = self._fn()
        if results:
            storage = get_event_storage()
            flat = {}

            def _flatten(d, prefix=""):
                for k, v in d.items():
                    key = f"{prefix}{k}"
                    if isinstance(v, dict):
                        _flatten(v, key + "/")
                    elif isinstance(v, (int, float)):
                        flat[key] = float(v)

            _flatten(results)
            storage.put_scalars(smoothing_hint=False, **flat)

    def after_step(self):
        if self._period > 0 and (self.trainer.iter + 1) % self._period == 0 \
                and self.trainer.iter != self.trainer.max_iter - 1:
            self._do_eval()

    def after_train(self):
        if self.trainer.iter >= self.trainer.max_iter - 1:
            self._do_eval()


class PGTVisualization(HookBase):
    """Periodically dump the pseudo-GT boxes OICR mines on the current
    training batch (reference _vis_pgt + visualize_training,
    wsl/modeling/roi_heads/roi_heads_oicr.py:569-625,
    wsl/modeling/meta_arch/rcnn.py:103-136): WSOD's characteristic failure
    mode is mined boxes drifting to context, so seeing them is a debugging
    capability, not a luxury.

    Runs a separate jitted scores+mining pass on ``trainer.last_batch``
    (mining inside the donated train step can't be fetched), saves PNGs to
    OUTPUT_DIR/pgt_vis and put_image()s them for the TensorBoard writer.
    """

    def __init__(self, period: int, model, output_dir: str,
                 class_names=None, max_images: int = 2):
        import jax

        from ..models.heads import oicr as oicr_lib
        from ..models.heads.wsddn import image_probs

        self._period = max(int(period), 1)
        self._out = output_dir
        self._names = class_names
        self._max = max_images

        @jax.jit
        def mine(params, batch):
            scores = model.apply(params, batch, method="proposal_scores")
            ev = image_probs(scores)
            pgt = jax.vmap(oicr_lib.mine_pgt)(
                scores, batch.proposals, batch.proposal_mask, batch.labels,
                ev)
            return pgt.boxes, pgt.valid

        self._mine = mine

    def after_step(self):
        it = self.trainer.iter
        if (it + 1) % self._period or self.trainer.last_batch is None:
            return
        import os

        import jax
        import numpy as np

        from ..utils.visualizer import save_pgt_visualization

        batch = self.trainer.last_batch
        boxes, valid = jax.device_get(
            self._mine(self.trainer.state.params, batch))
        imgs = np.asarray(jax.device_get(batch.image))
        storage = self.trainer.storage
        for i in range(min(imgs.shape[0], self._max)):
            img = np.clip(imgs[i], 0, 255).astype(np.uint8)
            save_pgt_visualization(
                img, boxes[i], valid[i], self._names,
                os.path.join(self._out, "pgt_vis"),
                prefix=f"iter{it + 1:07d}_im{i}", suffix="")
            if storage is not None:
                rgb = img[:, :, ::-1]  # pipeline is BGR
                storage.put_image(f"pgt/im{i}", rgb)


class PreciseBNHook(HookBase):
    """Recompute true BatchNorm statistics before each evaluation
    (reference PreciseBN hook, detectron2/engine/hooks.py:357): replaces
    the EMA running stats in the train state with arithmetic means over
    ``num_iters`` training batches. No-op for FrozenBN models (no
    batch_stats collection)."""

    def __init__(self, period: int, apply_fn, data_iter_fn,
                 num_iters: int = 200):
        """apply_fn(variables, batch, mutable=['batch_stats']) — typically
        a partial of model.apply running the forward in train mode;
        data_iter_fn() returns a fresh batch iterator."""
        self._period = max(int(period), 1)
        self._apply_fn = apply_fn
        self._data_iter_fn = data_iter_fn
        self._num_iters = num_iters

    def _run(self):
        from .precise_bn import update_bn_stats

        state = self.trainer.state
        params = update_bn_stats(self._apply_fn, state.params,
                                 self._data_iter_fn(), self._num_iters)
        self.trainer.state = state.replace(params=params)

    def after_step(self):
        if (self.trainer.iter + 1) % self._period == 0 and \
                self.trainer.iter != self.trainer.max_iter - 1:
            self._run()

    def after_train(self):
        self._run()
