"""VideoVisualizer: temporally consistent instance colors across frames
(reference detectron2/utils/video_visualizer.py behavior)."""

import numpy as np

from drn_wsod_tpu.utils.video_visualizer import VideoVisualizer, _iou_matrix


def test_iou_matrix():
    a = np.asarray([[0, 0, 10, 10]], np.float32)
    b = np.asarray([[0, 0, 10, 10], [5, 0, 15, 10], [20, 20, 30, 30]],
                   np.float32)
    iou = _iou_matrix(a, b)
    np.testing.assert_allclose(iou[0], [1.0, 1 / 3, 0.0], atol=1e-6)


def test_track_keeps_color_across_frames():
    vv = VideoVisualizer(["cat", "dog"])
    frame = np.zeros((64, 64, 3), np.uint8)
    vv.draw_frame(frame, [[10, 10, 30, 30]], [0.9], [0])
    c0 = vv._tracks[0].color
    # slightly moved box, same class -> matched, same color
    vv.draw_frame(frame, [[12, 11, 32, 31]], [0.8], [0])
    assert vv._tracks[0].color == c0
    # far away box -> new track, (almost surely) different color
    vv.draw_frame(frame, [[40, 40, 60, 60]], [0.8], [0])
    assert vv._tracks[0].color != c0


def test_same_box_different_class_is_new_track():
    vv = VideoVisualizer(["cat", "dog"])
    frame = np.zeros((64, 64, 3), np.uint8)
    vv.draw_frame(frame, [[10, 10, 30, 30]], [0.9], [0])
    c0 = vv._tracks[0].color
    vv.draw_frame(frame, [[10, 10, 30, 30]], [0.9], [1])
    assert vv._tracks[0].color != c0


def test_draw_frame_returns_image():
    vv = VideoVisualizer(["cat"])
    frame = np.zeros((32, 32, 3), np.uint8)
    out = vv.draw_frame(frame, [[4, 4, 20, 20]], [0.9], [0],
                        score_thresh=0.5)
    assert out.shape == (32, 32, 3)
    assert out.sum() > 0  # something was drawn
