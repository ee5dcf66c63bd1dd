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


def test_rotation_transform_coords_and_inverse():
    """90-degree expanded rotation maps corners exactly and round-trips
    through inverse() (reference RotationTransform semantics)."""
    from drn_wsod_tpu.data.transforms import RotationTransform

    h, w = 20, 40
    t = RotationTransform(h, w, 90, expand=True)
    assert (t.new_h, t.new_w) == (w, h)
    img = np.arange(h * w * 3, dtype=np.uint8).reshape(h, w, 3)
    out = t.apply_image(img)
    assert out.shape[:2] == (w, h)
    # CCW 90: (x, y) -> (y, new_h - x) in image coords
    pts = np.array([[0.0, 0.0], [w, 0.0], [w, h], [5.0, 7.0]])
    got = t.apply_coords(pts.copy())
    want = np.stack([pts[:, 1], w - pts[:, 0]], -1)
    np.testing.assert_allclose(got, want, atol=1e-4)
    inv = t.inverse()
    back = inv.apply_coords(got.copy())
    np.testing.assert_allclose(back, pts, atol=1e-4)


def test_random_rotation_zero_angle_noop():
    from drn_wsod_tpu.data.transforms import NoOpTransform, RandomRotation

    rng = np.random.RandomState(0)
    img = np.zeros((8, 8, 3), np.uint8)
    t = RandomRotation([0.0], sample_style="choice").get_transform(img, rng)
    assert isinstance(t, NoOpTransform)


def test_photometric_blends_match_formulas():
    from drn_wsod_tpu.data import transforms as T

    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, (16, 16, 3)).astype(np.uint8)

    bt = T.RandomBrightness(0.7, 0.7).get_transform(img, rng)
    np.testing.assert_allclose(bt.apply_image(img),
                               np.clip(img * 0.7, 0, 255).astype(np.uint8),
                               atol=1)  # f32 vs f64 rounding at the cast
    # geometry untouched
    pts = np.array([[1.0, 2.0]])
    np.testing.assert_array_equal(bt.apply_coords(pts.copy()), pts)

    ct = T.RandomContrast(1.2, 1.2).get_transform(img, rng)
    want = np.clip(img.astype(np.float32).mean() * -0.2 + img * 1.2,
                   0, 255).astype(np.uint8)
    np.testing.assert_allclose(ct.apply_image(img), want, atol=1)

    st = T.RandomSaturation(0.0, 0.0).get_transform(img, rng)
    gray = img.astype(np.float32) @ np.array([0.114, 0.587, 0.299],
                                             np.float32)
    np.testing.assert_allclose(
        st.apply_image(img).astype(np.float32),
        np.clip(gray[..., None], 0, 255).astype(np.uint8)
        .astype(np.float32).repeat(3, -1), atol=1.0)

    lt = T.RandomLighting(0.1).get_transform(img, rng)
    out = lt.apply_image(img)
    assert out.shape == img.shape and out.dtype == img.dtype


def test_random_extent_coords():
    """ExtentTransform maps the sub-rect linearly onto the output frame."""
    from drn_wsod_tpu.data.transforms import ExtentTransform

    t = ExtentTransform((10.0, 5.0, 30.0, 25.0), (40, 40))
    got = t.apply_coords(np.array([[10.0, 5.0], [30.0, 25.0], [20.0, 15.0]]))
    np.testing.assert_allclose(got, [[0, 0], [40, 40], [20, 20]], atol=1e-5)
    img = np.random.RandomState(0).randint(
        0, 255, (28, 36, 3)).astype(np.uint8)
    assert t.apply_image(img).shape == (40, 40, 3)
