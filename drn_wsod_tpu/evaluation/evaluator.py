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
                   topk: int, mask_on: bool = False,
                   keypoint_on: bool = False) -> Callable:
    """Build a jitted (variables, batch) -> per-image detections function:
    inference scores -> per-class NMS -> topk -> rescale to original frame
    (reference fast_rcnn_inference + detector_postprocess).

    With ``mask_on``/``keypoint_on``, the post-NMS detections additionally
    carry per-detection box-relative mask probabilities ("mask_probs",
    reference mask_rcnn_inference) and decoded keypoints in the ORIGINAL
    image frame ("keypoints", reference keypoint_rcnn_inference)."""
    mask_method = None
    if mask_on:
        mask_method = ("predict_masks"
                       if hasattr(type(model), "predict_masks")
                       else "mask_probs")

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
        img_boxes = dets["boxes"]          # resized-frame boxes
        if mask_method is not None:
            dets["mask_probs"] = model.apply(
                variables, batch, img_boxes, dets["classes"],
                method=mask_method)
        if keypoint_on:
            kps = model.apply(variables, batch, img_boxes,
                              method="predict_keypoints")
            sx = batch.orig_hw[:, 1] / jnp.maximum(batch.image_hw[:, 1], 1)
            sy = batch.orig_hw[:, 0] / jnp.maximum(batch.image_hw[:, 0], 1)
            dets["keypoints"] = jnp.stack(
                [kps[..., 0] * sx[:, None, None],
                 kps[..., 1] * sy[:, None, None],
                 kps[..., 2]], axis=-1)
        dets["boxes"] = rescale_boxes(img_boxes, batch.image_hw,
                                      batch.orig_hw)
        dets["all_scores"] = scores
        dets["all_boxes"] = boxes
        return dets

    return detect


def inference_on_dataset(detect_fn: Callable, variables, loader,
                         evaluator, records) -> Dict:
    """Run inference over a EvalLoader and evaluate.

    ``records`` is the loader's dataset list (for image_id lookup).
    """
    import inspect

    accepted = set(inspect.signature(evaluator.process_single).parameters)
    evaluator.reset()
    total_images = 0
    total_time = 0.0
    warmup = 1
    n_batches = 0
    for batch, n_real in loader:
        t0 = time.perf_counter()
        dets = detect_fn(variables, batch)
        keys = ["boxes", "scores", "classes", "valid"]
        keys += [k for k in ("mask_probs", "keypoints") if k in dets]
        # jax.block_until_ready does not synchronize on the axon platform:
        # the value-dependent device_get below is the timing fence.
        host = jax.device_get({k: dets[k] for k in keys})
        dt = time.perf_counter() - t0
        n_batches += 1
        if n_batches > warmup:
            total_time += dt
            total_images += n_real
        ids = np.asarray(jax.device_get(batch.image_id))
        for i in range(n_real):
            record = records[int(ids[i])]
            kwargs = {}
            if "mask_probs" in host and "masks" in accepted:
                from ..ops.mask_ops import paste_masks_in_image

                kwargs["masks"] = paste_masks_in_image(
                    np.asarray(host["mask_probs"][i], np.float32),
                    np.asarray(host["boxes"][i]),
                    (record["height"], record["width"]))
            if "keypoints" in host and "keypoints" in accepted:
                kwargs["keypoints"] = np.asarray(host["keypoints"][i])
            evaluator.process_single(
                str(record["image_id"]), host["boxes"][i], host["scores"][i],
                host["classes"][i], host["valid"][i], **kwargs)

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


# --------------------------------------------------------------- dense eval
def make_sem_seg_fn(model) -> Callable:
    """Jitted (variables, batch) -> (B, H, W) int32 per-pixel class map at
    canvas resolution (reference SemanticSegmentor inference /
    sem_seg_postprocess)."""

    @jax.jit
    def sem(variables, batch):
        logits = model.apply(variables, batch, method="semantic_logits")
        B, Hf, Wf, C = logits.shape
        H, W = batch.image.shape[1:3]
        up = jax.image.resize(logits.astype(jnp.float32), (B, H, W, C),
                              "bilinear")
        return jnp.argmax(up, axis=-1).astype(jnp.int32)

    return sem


def _resize_nearest(labels: np.ndarray, oh: int, ow: int) -> np.ndarray:
    h, w = labels.shape
    if (h, w) == (oh, ow):
        return labels
    yi = np.minimum((np.arange(oh) * h) // max(oh, 1), h - 1)
    xi = np.minimum((np.arange(ow) * w) // max(ow, 1), w - 1)
    return labels[np.ix_(yi, xi)]


def sem_seg_inference_on_dataset(sem_fn: Callable, variables, loader,
                                 evaluator, records) -> Dict:
    """Semantic-segmentation eval loop: per-pixel argmax cropped to the
    valid canvas, NN-resized to the original resolution, compared against
    the GT label map from ``sem_seg_file_name`` (reference SemSegEvaluator
    process loop)."""
    from PIL import Image

    evaluator.reset()
    for batch, n_real in loader:
        pred = np.asarray(jax.device_get(sem_fn(variables, batch)))
        ids = np.asarray(jax.device_get(batch.image_id))
        hw = np.asarray(jax.device_get(batch.image_hw))
        for i in range(n_real):
            record = records[int(ids[i])]
            h, w = int(hw[i, 0]), int(hw[i, 1])
            oh, ow = int(record["height"]), int(record["width"])
            p = _resize_nearest(pred[i, :h, :w], oh, ow)
            gt = np.asarray(Image.open(record["sem_seg_file_name"]),
                            np.int32)
            evaluator.process_single(p, gt)
    return gather_and_evaluate(evaluator)


def decode_panoptic_png(path: str) -> np.ndarray:
    """COCO panoptic PNG -> (H, W) int32 segment-id map
    (id = R + 256*G + 256^2*B, panopticapi rgb2id)."""
    from PIL import Image

    rgb = np.asarray(Image.open(path).convert("RGB"), np.int64)
    return (rgb[..., 0] + 256 * rgb[..., 1]
            + 256 * 256 * rgb[..., 2]).astype(np.int32)


def panoptic_inference_on_dataset(
        detect_fn: Callable, sem_fn: Callable, variables, loader,
        evaluator, records, num_thing_classes: int,
        overlap_threshold: float = 0.5, stuff_area_limit: int = 4096,
        conf_threshold: float = 0.5) -> Dict:
    """Panoptic eval loop (reference COCOPanopticEvaluator + panopticapi):
    detections + pasted masks + semantic map are fused host-side with
    ``combine_semantic_and_instance_outputs`` at the original resolution;
    PQ/SQ/RQ against the GT panoptic map from ``pan_seg_file_name`` +
    ``segments_info``.

    Category space: thing class c -> c; semantic stuff label l (>0, 0 being
    the special "thing" class) -> num_thing_classes + l - 1. GT
    segments_info must use the same contiguous space (the dataset loaders
    construct it so)."""
    from ..ops.mask_ops import paste_masks_in_image
    from .panoptic_eval import combine_semantic_and_instance_outputs

    evaluator.reset()
    for batch, n_real in loader:
        dets = detect_fn(variables, batch)
        host = jax.device_get({k: dets[k] for k in
                               ("boxes", "scores", "classes", "valid",
                                "mask_probs")})
        sem = np.asarray(jax.device_get(sem_fn(variables, batch)))
        ids = np.asarray(jax.device_get(batch.image_id))
        hw = np.asarray(jax.device_get(batch.image_hw))
        for i in range(n_real):
            record = records[int(ids[i])]
            oh, ow = int(record["height"]), int(record["width"])
            h, w = int(hw[i, 0]), int(hw[i, 1])
            valid = np.asarray(host["valid"][i], bool)
            boxes = np.asarray(host["boxes"][i])[valid]
            scores = np.asarray(host["scores"][i])[valid]
            classes = np.asarray(host["classes"][i])[valid]
            probs = np.asarray(host["mask_probs"][i], np.float32)[valid]
            masks = paste_masks_in_image(probs, boxes, (oh, ow))
            sem_full = _resize_nearest(sem[i, :h, :w], oh, ow)
            pan, infos = combine_semantic_and_instance_outputs(
                masks, scores, classes, sem_full,
                overlap_threshold=overlap_threshold,
                stuff_area_limit=stuff_area_limit,
                instances_confidence_threshold=conf_threshold)
            for s in infos:
                if not s.get("isthing", False):
                    s["category_id"] = (num_thing_classes
                                        + s["category_id"] - 1)
            gt_map = decode_panoptic_png(record["pan_seg_file_name"])
            evaluator.process_single(pan, infos, gt_map,
                                     record.get("segments_info", []))
    return gather_and_evaluate(evaluator)
