import pytest
import jax.numpy as jnp
import numpy as np

from drn_wsod_tpu.ops import multiclass_nms, nms_mask

pytestmark = pytest.mark.core


def ref_nms(boxes, scores, thresh):
    """Plain greedy NMS in numpy (torchvision semantics: > thresh suppresses)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        for j in order:
            if suppressed[j] or j == i:
                continue
            xx1 = max(boxes[i, 0], boxes[j, 0]); yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2]); yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0.0, xx2 - xx1) * max(0.0, yy2 - yy1)
            a_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            a_j = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            iou = inter / (a_i + a_j - inter) if a_i + a_j - inter > 0 else 0.0
            if iou > thresh:
                suppressed[j] = True
    return sorted(keep)


def test_nms_mask_simple():
    boxes = jnp.array([
        [0, 0, 10, 10],
        [1, 1, 11, 11],    # overlaps box 0 heavily
        [20, 20, 30, 30],
    ], dtype=jnp.float32)
    scores = jnp.array([0.9, 0.8, 0.7])
    valid = jnp.ones(3, dtype=bool)
    keep = np.asarray(nms_mask(boxes, scores, valid, 0.5))
    np.testing.assert_array_equal(keep, [True, False, True])


def test_nms_mask_chain():
    # A suppression chain: 0 kills 1; since 1 is dead, 2 survives; 2 kills 3.
    boxes = jnp.array([
        [0, 0, 10, 10],
        [3, 0, 13, 10],   # IoU with prev = 7/13 > 0.5
        [6, 0, 16, 10],
        [9, 0, 19, 10],
    ], dtype=jnp.float32)
    scores = jnp.array([0.9, 0.8, 0.7, 0.6])
    valid = jnp.ones(4, dtype=bool)
    keep = np.asarray(nms_mask(boxes, scores, valid, 0.5))
    np.testing.assert_array_equal(keep, [True, False, True, False])


@pytest.mark.slow
def test_nms_vs_reference_random():
    rng = np.random.RandomState(0)
    for trial in range(5):
        n = 64
        cx = rng.uniform(0, 100, n); cy = rng.uniform(0, 100, n)
        w = rng.uniform(5, 40, n); h = rng.uniform(5, 40, n)
        boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=1)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        keep = np.asarray(nms_mask(jnp.asarray(boxes, dtype=jnp.float32),
                                   jnp.asarray(scores), jnp.ones(n, dtype=bool), 0.5))
        got = sorted(np.nonzero(keep)[0].tolist())
        want = ref_nms(boxes, scores, 0.5)
        assert got == want, f"trial {trial}: {got} vs {want}"


def test_nms_respects_valid_mask():
    boxes = jnp.array([[0, 0, 10, 10], [0, 0, 10, 10]], dtype=jnp.float32)
    scores = jnp.array([0.9, 0.8])
    valid = jnp.array([False, True])
    keep = np.asarray(nms_mask(boxes, scores, valid, 0.5))
    np.testing.assert_array_equal(keep, [False, True])


def test_multiclass_nms():
    P, C = 8, 3
    boxes = jnp.array([[0, 0, 10, 10]] * 4 + [[20, 20, 30, 30]] * 4,
                      dtype=jnp.float32)
    scores = np.zeros((P, C), dtype=np.float32)
    scores[0, 0] = 0.9   # kept, class 0
    scores[1, 0] = 0.8   # suppressed by 0 (same box, same class)
    scores[1, 1] = 0.7   # kept: different class
    scores[4, 2] = 0.6   # kept: different location
    out = multiclass_nms(boxes, jnp.asarray(scores), jnp.ones(P, dtype=bool),
                         iou_threshold=0.5, score_threshold=0.01, topk=5)
    v = np.asarray(out["valid"])
    s = np.asarray(out["scores"])
    c = np.asarray(out["classes"])
    assert v.sum() == 3
    np.testing.assert_allclose(s[:3], [0.9, 0.7, 0.6], rtol=1e-6)
    np.testing.assert_array_equal(c[:3], [0, 1, 2])


def test_multiclass_nms_score_threshold():
    P, C = 4, 2
    boxes = jnp.arange(P * 4, dtype=jnp.float32).reshape(P, 4)
    boxes = boxes.at[:, 2:].add(50.0)
    scores = jnp.full((P, C), 1e-7)
    out = multiclass_nms(boxes, scores, jnp.ones(P, dtype=bool),
                         iou_threshold=0.5, score_threshold=1e-5, topk=4)
    assert np.asarray(out["valid"]).sum() == 0
