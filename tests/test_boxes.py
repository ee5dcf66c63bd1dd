import jax.numpy as jnp
import numpy as np
import pytest

from drn_wsod_tpu.structures import (
    BoxMode, area, apply_deltas, clip, get_deltas, nonempty,
    pairwise_iou, unique_boxes_mask,
)

pytestmark = pytest.mark.core


def test_area():
    b = jnp.array([[0, 0, 10, 10], [5, 5, 5, 9], [2, 2, 1, 1]], dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(area(b)), [100.0, 0.0, 0.0])


def test_clip():
    b = jnp.array([[-5, -5, 20, 30]], dtype=jnp.float32)
    out = clip(b, (10, 15))  # h=10, w=15
    np.testing.assert_allclose(np.asarray(out), [[0, 0, 15, 10]])


def test_nonempty():
    b = jnp.array([[0, 0, 10, 10], [0, 0, 0, 10], [0, 0, 10, 0]], dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(nonempty(b)), [True, False, False])


def test_pairwise_iou_values():
    # Hand-computed IoUs (pattern of the reference unit tests,
    # tests/structures/test_boxes.py).
    a = jnp.array([[0, 0, 10, 10]], dtype=jnp.float32)
    b = jnp.array([[0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30],
                   [0, 0, 5, 10]], dtype=jnp.float32)
    iou = np.asarray(pairwise_iou(a, b))[0]
    np.testing.assert_allclose(iou, [1.0, 25 / 175, 0.0, 50 / 100], rtol=1e-6)


def test_pairwise_iou_degenerate():
    a = jnp.array([[0, 0, 0, 0]], dtype=jnp.float32)
    b = jnp.array([[0, 0, 10, 10]], dtype=jnp.float32)
    assert float(pairwise_iou(a, b)[0, 0]) == 0.0


def test_boxmode_roundtrip():
    xywh = np.array([[2.0, 3.0, 4.0, 5.0]])
    xyxy = BoxMode.convert(xywh, BoxMode.XYWH_ABS, BoxMode.XYXY_ABS)
    np.testing.assert_allclose(xyxy, [[2, 3, 6, 8]])
    back = BoxMode.convert(xyxy, BoxMode.XYXY_ABS, BoxMode.XYWH_ABS)
    np.testing.assert_allclose(back, xywh)


def test_deltas_roundtrip():
    src = jnp.array([[10, 10, 50, 60], [0, 0, 100, 100]], dtype=jnp.float32)
    tgt = jnp.array([[12, 8, 48, 66], [10, 20, 80, 90]], dtype=jnp.float32)
    d = get_deltas(src, tgt)
    rec = apply_deltas(d, src)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(tgt), rtol=1e-3, atol=5e-3)


def test_apply_deltas_multiclass_shape():
    src = jnp.array([[10, 10, 50, 60]], dtype=jnp.float32)
    deltas = jnp.zeros((1, 3 * 4))
    out = apply_deltas(deltas, src)
    assert out.shape == (1, 12)
    np.testing.assert_allclose(np.asarray(out).reshape(3, 4),
                               np.tile(np.asarray(src), (3, 1)), rtol=1e-5)


def test_unique_boxes_mask():
    b = np.array([[0, 0, 10, 10], [0, 0, 10, 10], [1, 1, 5, 5]], dtype=np.float32)
    m = unique_boxes_mask(b)
    np.testing.assert_array_equal(m, [True, False, True])
