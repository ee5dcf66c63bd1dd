"""Visualizer capability parity: rotated boxes, keypoint skeletons,
panoptic segments, mask contours, dataset-dict GT drawing (reference
detectron2/utils/visualizer.py draw_rotated_box_with_label,
draw_and_connect_keypoints, draw_panoptic_seg, draw_dataset_dict)."""

import numpy as np
import pytest

from drn_wsod_tpu.utils.visualizer import (
    COCO_PERSON_SKELETON, Visualizer, _mask_contour)

pytestmark = pytest.mark.core


def _img(h=64, w=64):
    return np.full((h, w, 3), 127, np.uint8)


def test_mask_contour_is_boundary_only():
    m = np.zeros((20, 20), bool)
    m[5:15, 5:15] = True
    c = _mask_contour(m)
    assert c[5, 5] and c[5, 14] and c[14, 5]      # corners on boundary
    assert not c[10, 10]                          # interior excluded
    assert c.sum() == 4 * 10 - 4                  # perimeter of a 10x10 square


def test_draw_mask_outline_paints_solid_boundary():
    m = np.zeros((64, 64), bool)
    m[10:30, 10:30] = True
    v = Visualizer(_img(), ["a"]).draw_mask(m, 0, alpha=0.4)
    out = v.get_image()
    color = np.asarray(v._colors[0])
    assert np.array_equal(out[10, 10], color)     # boundary = solid color
    assert not np.array_equal(out[20, 20], color)  # interior = blended
    assert not np.array_equal(out[20, 20], [127, 127, 127])


def test_rotated_box_90deg_marks_swapped_extent():
    # a 40x10 box rotated 90deg occupies a 10-wide, 40-tall region
    v = Visualizer(_img(128, 128)).draw_rotated_box((64, 64, 40, 10, 90))
    out = v.get_image()
    changed = np.nonzero((out != 127).any(-1))
    ys, xs = changed
    assert ys.max() - ys.min() >= 38
    assert xs.max() - xs.min() <= 30  # label text may widen it slightly


def test_keypoints_default_coco_skeleton_draws_limbs():
    kpts = np.zeros((17, 3), np.float32)
    kpts[:, 2] = 2
    # place joints 5 (shoulder) and 7 (elbow) far apart; rest clustered
    kpts[:, 0], kpts[:, 1] = 5, 5
    kpts[5] = (10, 50, 2)
    kpts[7] = (50, 50, 2)
    out = Visualizer(_img()).draw_keypoints(kpts).get_image()
    # the (5,7) connection rule paints the midpoint between them
    assert (out[50, 30] != 127).any()
    assert (5, 7) in COCO_PERSON_SKELETON


def test_keypoints_invisible_joints_not_connected():
    kpts = np.zeros((17, 3), np.float32)
    kpts[5] = (10, 50, 2)
    kpts[7] = (50, 50, 0)  # invisible
    out = Visualizer(_img()).draw_keypoints(kpts).get_image()
    assert not (out[50, 30] != 127).any()


def test_panoptic_seg_colors_stuff_and_things_differently():
    pan = np.zeros((64, 64), np.int32)
    pan[:, :32] = 1   # stuff, class 0
    pan[:, 32:] = 2   # thing, class 0 -> jittered color
    infos = [{"id": 1, "category_id": 0, "isthing": False},
             {"id": 2, "category_id": 0, "isthing": True}]
    out = Visualizer(_img(), ["road"]).draw_panoptic_seg(pan, infos)
    img = out.get_image()
    assert (img[40, 10] != 127).any() and (img[40, 54] != 127).any()
    assert not np.array_equal(img[40, 10], img[40, 54])


def test_draw_dataset_dict_gt_boxes_polygons_keypoints():
    rec = {"annotations": [
        {"bbox": [10, 10, 20, 20], "bbox_mode": "xywh", "category_id": 0,
         "segmentation": [[12, 12, 28, 12, 28, 28, 12, 28]],
         "keypoints": [20, 20, 2] * 17},
    ]}
    out = Visualizer(_img(), ["cat"]).draw_dataset_dict(rec).get_image()
    assert (out[10, 15] != 127).any()   # box top edge (xywh -> xyxy)
    assert (out[12, 20] != 127).any()   # polygon edge
    assert (out != 127).any(-1).sum() > 50


def test_draw_dataset_dict_sem_seg():
    seg = np.full((64, 64), 255, np.uint8)
    seg[:8, :8] = 3
    out = Visualizer(_img()).draw_dataset_dict({"sem_seg": seg}).get_image()
    assert (out[4, 4] != 127).any()
    assert np.array_equal(out[40, 40], [127, 127, 127])  # ignore untouched
