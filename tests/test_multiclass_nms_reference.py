"""multiclass_nms vs a plain numpy per-class greedy + global topk reference
(the full reference inference semantics, fast_rcnn.py:88-141)."""

import jax.numpy as jnp
import numpy as np

from drn_wsod_tpu.ops import multiclass_nms
import pytest

pytestmark = pytest.mark.core


def _iou(a, b):
    xx1 = np.maximum(a[0], b[0]); yy1 = np.maximum(a[1], b[1])
    xx2 = np.minimum(a[2], b[2]); yy2 = np.minimum(a[3], b[3])
    inter = max(0, xx2 - xx1) * max(0, yy2 - yy1)
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / ua if ua > 0 else 0.0


def ref_multiclass(boxes, scores, thr, score_thr, topk):
    dets = []
    P, C = scores.shape
    for c in range(C):
        cand = [(scores[p, c], p) for p in range(P)
                if scores[p, c] > score_thr]
        cand.sort(key=lambda t: (-t[0], t[1]))
        kept = []
        for s, p in cand:
            if all(_iou(boxes[p], boxes[q]) <= thr for _, q in kept):
                kept.append((s, p))
        dets += [(s, p, c) for s, p in kept]
    dets.sort(key=lambda t: -t[0])
    return dets[:topk]


def test_multiclass_nms_matches_reference():
    rng = np.random.RandomState(0)
    P, C = 48, 4
    cx = rng.uniform(0, 100, P); cy = rng.uniform(0, 100, P)
    w = rng.uniform(10, 40, P); h = rng.uniform(10, 40, P)
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                     1).astype(np.float32)
    scores = (rng.rand(P, C) ** 3).astype(np.float32)  # sparse-ish

    out = multiclass_nms(jnp.asarray(boxes), jnp.asarray(scores),
                         jnp.ones(P, bool), iou_threshold=0.4,
                         score_threshold=0.05, topk=20)
    got = [(round(float(s), 5), int(c))
           for s, c, v in zip(np.asarray(out["scores"]),
                              np.asarray(out["classes"]),
                              np.asarray(out["valid"])) if v]
    want = [(round(float(s), 5), int(c))
            for s, p, c in ref_multiclass(boxes, scores, 0.4, 0.05, 20)]
    assert got == want


def test_multiclass_nms_trim_does_not_change_top_outputs():
    rng = np.random.RandomState(1)
    P, C = 128, 3
    cx = rng.uniform(0, 200, P); cy = rng.uniform(0, 200, P)
    w = rng.uniform(10, 50, P); h = rng.uniform(10, 50, P)
    boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                     1).astype(np.float32)
    scores = rng.rand(P, C).astype(np.float32)

    full = multiclass_nms(jnp.asarray(boxes), jnp.asarray(scores),
                          jnp.ones(P, bool), iou_threshold=0.5,
                          score_threshold=0.01, topk=10, per_class_topk=128)
    trim = multiclass_nms(jnp.asarray(boxes), jnp.asarray(scores),
                          jnp.ones(P, bool), iou_threshold=0.5,
                          score_threshold=0.01, topk=10, per_class_topk=64)
    np.testing.assert_allclose(np.asarray(full["scores"]),
                               np.asarray(trim["scores"]), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(full["classes"]),
                                  np.asarray(trim["classes"]))
