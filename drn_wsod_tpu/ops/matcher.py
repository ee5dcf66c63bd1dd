"""IoU matcher as a pure masked tensor op.

Functional equivalent of the reference ``Matcher``
(detectron2/modeling/matcher.py:9-127): assigns each predicted box the
best-overlapping ground-truth index plus a label derived from IoU thresholds.
Ground-truth validity is a mask (padded GT slots) instead of a variable-length
list.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def match(
    quality: jnp.ndarray,
    gt_valid: jnp.ndarray,
    thresholds: Sequence[float],
    labels: Sequence[int],
    allow_low_quality: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Match predictions to (padded) ground truth.

    Args:
      quality: (M, N) pairwise quality (e.g. IoU), gt x predictions.
      gt_valid: (M,) bool mask of real GT rows.
      thresholds: ascending IoU thresholds, e.g. [0.5].
      labels: len(thresholds)+1 labels in {-1, 0, 1} per threshold bin,
        e.g. [0, 1] (below 0.5 -> background, above -> foreground).
      allow_low_quality: also label as foreground every prediction that
        achieves some GT's maximum quality (ties included), regardless of
        threshold (reference Matcher.set_low_quality_matches_,
        detectron2/modeling/matcher.py:95-127) — used by RPN/RetinaNet so
        every GT has at least one positive anchor.

    Returns:
      matched_idx: (N,) int32 — argmax GT index per prediction (0 if no valid
        GT, mirroring the reference's zeros fallback).
      matched_label: (N,) int32 — bin label per prediction; all `labels[0]`
        (background) when there is no valid GT.
    """
    assert len(labels) == len(thresholds) + 1
    neg = jnp.asarray(-1.0, dtype=quality.dtype)
    q = jnp.where(gt_valid[:, None], quality, neg)
    matched_vals = jnp.max(q, axis=0)
    matched_idx = jnp.argmax(q, axis=0).astype(jnp.int32)

    matched_label = jnp.full(matched_vals.shape, labels[0], dtype=jnp.int32)
    for thr, lab in zip(thresholds, labels[1:]):
        matched_label = jnp.where(matched_vals >= thr, jnp.int32(lab), matched_label)

    if allow_low_quality:
        per_gt_max = jnp.max(q, axis=1, keepdims=True)        # (M, 1)
        is_best = (q >= per_gt_max) & (per_gt_max > 0)
        best_any = jnp.any(is_best & gt_valid[:, None], axis=0)
        matched_label = jnp.where(best_any, jnp.int32(labels[-1]),
                                  matched_label)

    any_gt = jnp.any(gt_valid)
    matched_idx = jnp.where(any_gt, matched_idx, 0)
    matched_label = jnp.where(any_gt, matched_label, jnp.int32(labels[0]))
    return matched_idx, matched_label
