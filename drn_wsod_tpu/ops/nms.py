"""Static-shape NMS for TPU.

The reference delegates to torchvision ``batched_nms``
(detectron2/layers/nms.py:10-29) with dynamic candidate counts. On TPU,
suppression is re-derived as a fixed-point computation over masks:

greedy NMS is the unique solution of

    keep[i] = valid[i] and not any_j( keep[j] and rank[j] < rank[i]
                                      and IoU(i, j) > thresh )

(rank = descending score order). Jacobi iteration of this recurrence from
``keep = valid`` converges in depth-of-suppression-DAG steps (typically < 16);
we iterate inside ``lax.while_loop`` until the mask stops changing. All shapes
static; no host round-trips.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..structures import boxes as box_ops


def _rank_desc(scores: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Dense rank of each element under descending score, invalid last.

    Stable: ties broken by index, matching torch.sort semantics used by
    torchvision NMS.
    """
    s = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-s, stable=True)          # rank -> index
    n = scores.shape[0]
    ranks = jnp.zeros(n, dtype=jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32))            # index -> rank
    return ranks


def nms_mask(boxes: jnp.ndarray, scores: jnp.ndarray, valid: jnp.ndarray,
             iou_threshold: float, iou: jnp.ndarray | None = None,
             max_iters: int | None = None) -> jnp.ndarray:
    """Greedy NMS keep-mask over one set of boxes.

    Jacobi iteration of the greedy fixed point; after t iterations entries
    with suppression-DAG depth <= t are exact. Runs a FIXED iteration count
    (compiler-friendly: no while_loop/convergence check — data-dependent
    loops compile poorly on TPU): 32 by default, far beyond real suppression
    chain depths. The matrix-vector step runs as a bf16 matmul on the MXU.

    Args:
      boxes: (N, 4) XYXY.
      scores: (N,).
      valid: (N,) bool — candidates; padded slots False.
      iou_threshold: suppression threshold (strictly-greater suppresses,
        matching torchvision).
      iou: optional precomputed (N, N) IoU matrix to share across calls.
      max_iters: Jacobi iterations (defaults to min(32, N)).

    Returns: (N,) bool keep mask.
    """
    if iou is None:
        iou = box_ops.pairwise_iou(boxes, boxes)
    n = boxes.shape[0]
    iters = max_iters if max_iters is not None else min(32, n)
    rank = _rank_desc(scores, valid)
    earlier = rank[None, :] < rank[:, None]          # j strictly before i
    sup = ((iou > iou_threshold) & earlier & valid[None, :]
           & valid[:, None]).astype(jnp.bfloat16)

    def body(_, keep):
        suppressed = (sup @ keep.astype(jnp.bfloat16)
                      ).astype(jnp.float32) > 0.5
        return valid & ~suppressed

    return jax.lax.fori_loop(0, iters, body, valid)


@partial(jax.jit, static_argnames=("iou_threshold", "score_threshold", "topk"))
def multiclass_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    score_threshold: float,
    topk: int,
):
    """Per-class NMS over all classes, then global top-k.

    Equivalent of the reference inference path ``fast_rcnn_inference_single_
    image`` (projects/WSL/wsl/modeling/roi_heads/fast_rcnn.py:88-141):
    score-threshold -> per-class NMS -> topk. Shares one (P, P) IoU matrix
    across classes and scans classes to bound memory.

    Args:
      boxes: (P, 4) class-agnostic or (P, C, 4) class-specific boxes.
      scores: (P, C) class scores WITHOUT background column.
      valid: (P,) bool proposal mask.
      topk: static number of output slots.

    Returns: dict with boxes (topk, 4), scores (topk,), classes (topk,),
      valid (topk,) — padded entries have score 0 and valid False.
    """
    P, C = scores.shape
    class_specific = boxes.ndim == 3

    shared_iou = None if class_specific else box_ops.pairwise_iou(boxes, boxes)

    def per_class(c):
        s = scores[:, c]
        v = valid & (s > score_threshold) & jnp.isfinite(s)
        if class_specific:
            b = boxes[:, c, :]
            v = v & jnp.all(jnp.isfinite(b), axis=-1)
            return nms_mask(b, s, v, iou_threshold)
        return nms_mask(boxes, s, v, iou_threshold, iou=shared_iou)

    keep = jax.lax.map(per_class, jnp.arange(C))     # (C, P)
    keep = keep.T                                     # (P, C)

    kept_scores = jnp.where(keep, scores, -jnp.inf).reshape(-1)  # (P*C,)
    k = min(topk, P * C)
    top_scores, top_idx = jax.lax.top_k(kept_scores, k)
    if k < topk:
        top_scores = jnp.pad(top_scores, (0, topk - k),
                             constant_values=-jnp.inf)
        top_idx = jnp.pad(top_idx, (0, topk - k))
    top_p = top_idx // C
    top_c = (top_idx % C).astype(jnp.int32)
    if class_specific:
        top_boxes = boxes[top_p, top_c]
    else:
        top_boxes = boxes[top_p]
    out_valid = jnp.isfinite(top_scores)
    return {
        "boxes": jnp.where(out_valid[:, None], top_boxes, 0.0),
        "scores": jnp.where(out_valid, top_scores, 0.0),
        "classes": top_c,
        "valid": out_valid,
    }
