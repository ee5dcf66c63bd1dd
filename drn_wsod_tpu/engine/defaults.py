"""Default setup / predictor / high-level train & test drivers.

Equivalent of the reference defaults (detectron2/engine/defaults.py:50-395):
argument parser, environment setup, ``DefaultPredictor`` single-image API and
the config-driven train/test orchestration used by tools/train_net.py.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
from typing import Dict, Optional

import jax
import numpy as np

logger = logging.getLogger(__name__)


def default_argument_parser():
    parser = argparse.ArgumentParser(description="drn_wsod_tpu training")
    parser.add_argument("--config-file", default="", metavar="FILE")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--eval-only", action="store_true")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER,
                        help="dotted-key config overrides")
    return parser


def setup_logger(output_dir: Optional[str] = None, name: str = "drn_wsod_tpu"):
    fmt = "[%(asctime)s %(name)s]: %(message)s"
    handlers = [logging.StreamHandler(sys.stdout)]
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        handlers.append(logging.FileHandler(os.path.join(output_dir, "log.txt")))
    logging.basicConfig(level=logging.INFO, format=fmt, handlers=handlers,
                        force=True)
    return logging.getLogger(name)


def auto_scale_workers(cfg, num_workers: int):
    """Rescale batch size / LR / schedule to the actual chip count so the
    per-chip batch stays what ``SOLVER.REFERENCE_WORLD_SIZE`` defined
    (reference DefaultTrainer.auto_scale_workers, engine/defaults.py:536:
    LR scales linearly per the ImageNet-in-1h rule, iteration counts scale
    inversely). Returns cfg unchanged when REFERENCE_WORLD_SIZE is 0 or
    already equals ``num_workers``."""
    old = cfg.SOLVER.REFERENCE_WORLD_SIZE
    if old == 0 or old == num_workers:
        return cfg
    assert cfg.SOLVER.IMS_PER_BATCH % old == 0, \
        "Invalid REFERENCE_WORLD_SIZE in config!"
    frozen = cfg.is_frozen()
    cfg = cfg.clone()
    cfg.defrost()
    scale = num_workers / old
    cfg.SOLVER.IMS_PER_BATCH = int(round(cfg.SOLVER.IMS_PER_BATCH * scale))
    cfg.SOLVER.BASE_LR = cfg.SOLVER.BASE_LR * scale
    cfg.SOLVER.MAX_ITER = int(round(cfg.SOLVER.MAX_ITER / scale))
    cfg.SOLVER.WARMUP_ITERS = int(round(cfg.SOLVER.WARMUP_ITERS / scale))
    cfg.SOLVER.STEPS = tuple(int(round(s / scale))
                             for s in cfg.SOLVER.STEPS)
    cfg.TEST.EVAL_PERIOD = int(round(cfg.TEST.EVAL_PERIOD / scale))
    cfg.SOLVER.REFERENCE_WORLD_SIZE = num_workers
    logger.info(
        "Auto-scaled config to batch_size=%d, lr=%g, max_iter=%d, warmup=%d",
        cfg.SOLVER.IMS_PER_BATCH, cfg.SOLVER.BASE_LR, cfg.SOLVER.MAX_ITER,
        cfg.SOLVER.WARMUP_ITERS)
    if frozen:
        cfg.freeze()
    return cfg


def default_setup(cfg, args=None):
    """Create output dir, set up logging, seed, dump config
    (reference defaults.py:106-154)."""
    output_dir = cfg.OUTPUT_DIR
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
    setup_logger(output_dir)
    seed = cfg.SEED if cfg.SEED >= 0 else int.from_bytes(os.urandom(4), "little")
    np.random.seed(seed)
    logger.info(f"Seed: {seed}; devices: {jax.devices()}")
    if output_dir:
        with open(os.path.join(output_dir, "config.yaml"), "w") as f:
            f.write(cfg.dump())
    return seed


class DefaultPredictor:
    """Single-image inference API (reference defaults.py:155-220): takes a
    raw image (+ its precomputed proposals — WSOD has no RPN), resizes with
    TEST settings and returns detections in original-image coordinates."""

    def __init__(self, cfg, variables=None):
        from ..models import build_model
        from ..checkpoint import load_reference_weights
        from ..evaluation.evaluator import make_detect_fn
        from ..data.mapper import DatasetMapper

        self.cfg = cfg.clone() if hasattr(cfg, "clone") else cfg
        self.model = build_model(cfg)
        self.mapper = DatasetMapper(cfg, is_train=False)
        if variables is None:
            variables = _init_variables(self.model, cfg)
            if cfg.MODEL.WEIGHTS:
                variables = load_reference_weights(cfg.MODEL.WEIGHTS, variables)
        self.variables = variables
        self._detect = make_detect_fn(
            self.model, cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST,
            cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
            cfg.TEST.DETECTIONS_PER_IMAGE)

    def __call__(self, original_image: np.ndarray, proposal_boxes: np.ndarray,
                 objectness: Optional[np.ndarray] = None) -> Dict:
        """original_image: (H, W, 3) in cfg.INPUT.FORMAT channel order."""
        from ..data.loader import _collate

        record = {
            "proposal_boxes": proposal_boxes,
            "proposal_objectness_logits":
                objectness if objectness is not None
                else np.zeros(len(proposal_boxes), np.float32),
            "annotations": [],
        }
        rng = np.random.RandomState(0)
        h, w = original_image.shape[:2]
        # map in-memory: reuse mapper internals without file IO
        from ..data import transforms as T
        from ..data.mapper import pick_bucket
        from ..data.proposals import transform_proposals

        image, tfms = T.apply_augmentations(self.mapper.augmentations,
                                            original_image, rng)
        nh, nw = image.shape[:2]
        boxes, logits = transform_proposals(record, (nh, nw), tfms,
                                            topk=self.mapper.topk)
        P = self.mapper.num_proposals
        n = min(len(boxes), P)
        sample = {
            "image": np.zeros((pick_bucket(nh, nw, self.mapper.buckets),) * 2
                              + (3,), np.float32),
            "image_hw": np.asarray([nh, nw], np.int32),
            "orig_hw": np.asarray([h, w], np.int32),
            "proposals": np.zeros((P, 4), np.float32),
            "proposal_mask": np.zeros((P,), bool),
            "objectness": np.zeros((P,), np.float32),
            "labels": np.zeros((self.mapper.num_classes,), np.float32),
            "image_id": np.asarray(0, np.int32),
        }
        sample["image"][:nh, :nw] = image.astype(np.float32)
        sample["proposals"][:n] = boxes[:n]
        sample["objectness"][:n] = logits[:n]
        sample["proposal_mask"][:n] = True
        batch = _collate([sample])
        dets = jax.device_get(self._detect(self.variables, batch))
        keep = dets["valid"][0]
        return {
            "boxes": dets["boxes"][0][keep],
            "scores": dets["scores"][0][keep],
            "classes": dets["classes"][0][keep],
        }


class AsyncPredictor:
    """Pipelined predictor (reference demo/predictor.py:132-220
    AsyncPredictor): a worker thread keeps the device busy while the caller
    prepares the next input. On TPU a thread (not a process pool) is the
    right shape — dispatch is async and compute happens on the device."""

    def __init__(self, cfg, variables=None, queue_depth: int = 3):
        import queue as _queue
        import threading

        self._pred = DefaultPredictor(cfg, variables)
        self._tasks: "_queue.Queue" = _queue.Queue(maxsize=queue_depth)
        self._results: "_queue.Queue" = _queue.Queue()
        self._seq_put = 0
        self._seq_got = 0

        def worker():
            while True:
                item = self._tasks.get()
                if item is None:
                    return
                idx, args = item
                try:
                    self._results.put((idx, self._pred(*args)))
                except Exception as e:  # surface errors to the consumer
                    self._results.put((idx, e))

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def put(self, image, proposal_boxes, objectness=None):
        self._tasks.put((self._seq_put, (image, proposal_boxes, objectness)))
        self._seq_put += 1

    def get(self):
        idx, out = self._results.get()
        self._seq_got += 1
        if isinstance(out, Exception):
            raise out
        return out

    def __call__(self, image, proposal_boxes, objectness=None):
        self.put(image, proposal_boxes, objectness)
        return self.get()

    def shutdown(self):
        self._tasks.put(None)


def _init_variables(model, cfg, batch=None):
    """Initialize model variables with a minimal synthetic batch."""
    import jax.numpy as jnp

    from ..structures import WSODBatch

    if batch is None:
        P = cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE
        C = cfg.MODEL.ROI_HEADS.NUM_CLASSES
        batch = WSODBatch(
            image=jnp.zeros((1, 64, 64, 3)),
            image_hw=jnp.full((1, 2), 64, jnp.int32),
            orig_hw=jnp.full((1, 2), 64, jnp.int32),
            proposals=jnp.tile(jnp.asarray([[0., 0., 16., 16.]]), (1, P, 1)),
            proposal_mask=jnp.ones((1, P), bool),
            objectness=jnp.zeros((1, P)),
            labels=jnp.zeros((1, C)).at[0, 0].set(1.0),
            image_id=jnp.zeros((1,), jnp.int32),
        )
    rng = jax.random.PRNGKey(0)
    return model.init({"params": rng, "dropout": rng}, batch, train=True)
