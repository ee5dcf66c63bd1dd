"""Dataset inference loop.

Equivalent of the reference ``inference_on_dataset``
(detectron2/evaluation/evaluator.py:101-184): drives a jitted inference +
NMS step over a test loader with warmup-aware timing, feeding an evaluator.
The NMS/top-k runs on device with static shapes; only the final (topk, ...)
detections cross to the host.
"""

from __future__ import annotations

import logging
import time
from functools import partial
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nms import multiclass_nms
from ..postprocessing import rescale_boxes

logger = logging.getLogger(__name__)


def make_detect_fn(model, score_thresh: float, nms_thresh: float,
                   topk: int) -> Callable:
    """Build a jitted (variables, batch) -> per-image detections function:
    inference scores -> per-class NMS -> topk -> rescale to original frame
    (reference fast_rcnn_inference + detector_postprocess)."""

    @jax.jit
    def detect(variables, batch):
        scores, boxes = model.apply(variables, batch,
                                    method="inference_scores")
        C = scores.shape[-1] - 1
        fg_scores = scores[..., :C]
        if boxes.shape[-1] == 4:
            nms_boxes = boxes
        else:
            nms_boxes = boxes.reshape(*boxes.shape[:-1], C, 4)

        nms_one = partial(multiclass_nms, iou_threshold=nms_thresh,
                          score_threshold=score_thresh, topk=topk)
        # dense detectors (RetinaNet) emit their own candidate set, not the
        # batch's proposal slots — every candidate row is live then
        mask = batch.proposal_mask
        if mask is None or mask.shape[1] != scores.shape[1]:
            mask = jnp.ones(scores.shape[:2], bool)
        dets = jax.vmap(nms_one)(nms_boxes, fg_scores, mask)
        dets["boxes"] = rescale_boxes(dets["boxes"], batch.image_hw,
                                      batch.orig_hw)
        dets["all_scores"] = scores
        dets["all_boxes"] = boxes
        return dets

    return detect


def inference_on_dataset(detect_fn: Callable, variables, loader,
                         evaluator, records) -> Dict:
    """Run inference over a TestLoader and evaluate.

    ``records`` is the loader's dataset list (for image_id lookup).
    """
    evaluator.reset()
    total_images = 0
    total_time = 0.0
    warmup = 1
    n_batches = 0
    for batch, n_real in loader:
        t0 = time.perf_counter()
        dets = detect_fn(variables, batch)
        # jax.block_until_ready does not synchronize on the axon platform:
        # the value-dependent device_get below is the timing fence.
        host = jax.device_get(
            {k: dets[k] for k in ("boxes", "scores", "classes", "valid")})
        dt = time.perf_counter() - t0
        n_batches += 1
        if n_batches > warmup:
            total_time += dt
            total_images += n_real
        ids = np.asarray(jax.device_get(batch.image_id))
        for i in range(n_real):
            record = records[int(ids[i])]
            evaluator.process_single(
                str(record["image_id"]), host["boxes"][i], host["scores"][i],
                host["classes"][i], host["valid"][i])

    if total_images:
        logger.info(
            f"Inference: {total_time / total_images:.4f} s/img "
            f"({total_images / max(total_time, 1e-9):.2f} img/s)")
    return gather_and_evaluate(evaluator)


def gather_and_evaluate(evaluator) -> Dict:
    """Multi-host: all-gather per-host prediction state over DCN and
    evaluate on the main process only (reference rank gather,
    pascal_voc_evaluation.py:66-77; comm.gather). Single host: plain
    evaluate()."""
    from ..parallel import multihost

    if multihost.get_world_size() > 1:
        states = multihost.all_gather_object(evaluator.state_dict())
        if not multihost.is_main_process():
            return {}
        evaluator.reset()
        evaluator.merge_states(states)
    return evaluator.evaluate()
