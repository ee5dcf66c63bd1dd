"""Mask/keypoint structures + visualizer drawing (reference
detectron2/structures/{masks,keypoints}.py, utils/visualizer.py)."""

import numpy as np

from drn_wsod_tpu.structures import BitMasks, Keypoints, PolygonMasks
from drn_wsod_tpu.utils.visualizer import Visualizer

SQUARE = [np.asarray([10.0, 10, 30, 10, 30, 30, 10, 30])]  # 20x20 box


def test_polygon_area_and_boxes():
    pm = PolygonMasks([SQUARE, []])
    np.testing.assert_allclose(pm.area(), [400.0, 0.0])
    np.testing.assert_allclose(pm.get_bounding_boxes()[0], [10, 10, 30, 30])
    assert pm.nonempty().tolist() == [True, False]
    assert len(pm[0:1]) == 1


def test_rasterize_and_bitmasks_roundtrip():
    bm = BitMasks.from_polygon_masks(PolygonMasks([SQUARE]), 40, 40)
    assert len(bm) == 1
    area = bm.area()[0]
    assert 380 <= area <= 450  # rasterized square ~ 20x20 (+boundary)
    box = bm.get_bounding_boxes()[0]
    np.testing.assert_allclose(box, [10, 10, 31, 31], atol=1.0)


def test_bitmask_crop_and_resize():
    m = np.zeros((2, 40, 40), bool)
    m[0, 10:30, 10:30] = True   # fills its box entirely
    m[1, 10:20, 10:30] = True   # fills top half of its box
    bm = BitMasks(m)
    boxes = np.asarray([[10, 10, 30, 30], [10, 10, 30, 30]], np.float32)
    crops = bm.crop_and_resize(boxes, 14)
    assert crops[0].all()
    frac = crops[1].mean()
    assert 0.4 < frac < 0.6


def test_polygon_crop_and_resize():
    pm = PolygonMasks([SQUARE])
    crops = pm.crop_and_resize(np.asarray([[10, 10, 30, 30]], np.float32), 8)
    assert crops[0].mean() > 0.9  # polygon fills its own bbox


def test_keypoints_to_heatmap():
    k = np.zeros((1, 3, 3), np.float32)
    k[0, 0] = [15, 15, 2]     # center of the box below
    k[0, 1] = [10, 10, 2]     # top-left corner
    k[0, 2] = [50, 50, 0]     # unlabeled
    kp = Keypoints(k)
    boxes = np.asarray([[10, 10, 20, 20]], np.float32)
    t, v = kp.to_heatmap(boxes, heatmap_size=4)
    assert v[0].tolist() == [True, True, False]
    assert t[0, 0] == 2 * 4 + 2   # center cell
    assert t[0, 1] == 0
    assert len(kp[0:1]) == 1


def test_visualizer_masks_and_keypoints():
    img = np.zeros((40, 40, 3), np.uint8)
    v = Visualizer(img, ["a"])
    masks = np.zeros((1, 40, 40), bool)
    masks[0, 5:15, 5:15] = True
    kpts = np.asarray([[[20.0, 20.0, 2.0]]])
    out = v.draw_instance_predictions(
        np.asarray([[5.0, 5, 15, 15]]), np.asarray([0.9]), np.asarray([0]),
        masks=masks, keypoints=kpts).get_image()
    assert out[10, 10].sum() > 0   # mask blended
    assert out[20, 20].sum() > 0   # keypoint dot
    v2 = Visualizer(img)
    seg = np.zeros((40, 40), np.int32)
    seg[:20] = 1
    out2 = v2.draw_sem_seg(seg).get_image()
    assert out2[5, 5].sum() > 0
