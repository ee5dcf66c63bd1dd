import numpy as np

from drn_wsod_tpu.data import transforms as T
import pytest

pytestmark = pytest.mark.core


def test_resize_transform_boxes_and_inverse():
    t = T.ResizeTransform(100, 200, 50, 100)
    boxes = np.array([[20, 10, 60, 40]], dtype=np.float32)
    out = t.apply_box(boxes)
    np.testing.assert_allclose(out, [[10, 5, 30, 20]])
    back = t.inverse().apply_box(out)
    np.testing.assert_allclose(back, boxes)


def test_hflip_boxes_and_inverse():
    t = T.HFlipTransform(100)
    boxes = np.array([[10, 5, 30, 20]], dtype=np.float32)
    out = t.apply_box(boxes)
    np.testing.assert_allclose(out, [[70, 5, 90, 20]])
    np.testing.assert_allclose(t.inverse().apply_box(out), boxes)


def test_hflip_image():
    img = np.arange(12).reshape(1, 4, 3).astype(np.uint8)
    t = T.HFlipTransform(4)
    out = t.apply_image(img)
    np.testing.assert_array_equal(out[0, :, 0], img[0, ::-1, 0])


def test_transform_list_inverse_roundtrip():
    tl = T.TransformList([T.ResizeTransform(100, 100, 60, 60),
                          T.HFlipTransform(60)])
    boxes = np.array([[10, 20, 40, 80]], dtype=np.float32)
    fwd = tl.apply_box(boxes)
    back = tl.inverse().apply_box(fwd)
    np.testing.assert_allclose(back, boxes, rtol=1e-5)


def test_resize_shortest_edge_sizes():
    h, w = T.ResizeShortestEdge.target_size(480, 640, 600, 1000)
    assert h == 600 and w == 800
    h, w = T.ResizeShortestEdge.target_size(480, 640, 900, 1000)
    assert w == 1000  # capped by max_size
    np.testing.assert_allclose(h / w, 480 / 640, atol=1e-2)


def test_random_crop_bounds():
    rng = np.random.RandomState(0)
    img = np.zeros((100, 80, 3), dtype=np.uint8)
    aug = T.RandomCrop("relative_range", [0.5, 0.5])
    for _ in range(10):
        t = aug.get_transform(img, rng)
        out = t.apply_image(img)
        assert out.shape[0] >= 50 and out.shape[1] >= 40
        assert out.shape[0] <= 100 and out.shape[1] <= 80


def test_apply_augmentations_pipeline():
    rng = np.random.RandomState(1)
    img = np.zeros((100, 200, 3), dtype=np.uint8)
    out, tfms = T.apply_augmentations(
        [T.ResizeShortestEdge(50, 1000), T.RandomFlip(1.0)], img, rng)
    assert out.shape == (50, 100, 3)
    boxes = np.array([[0, 0, 200, 100]], dtype=np.float32)
    tb = tfms.apply_box(boxes)
    np.testing.assert_allclose(tb, [[0, 0, 100, 50]])
