"""Keypoint R-CNN branch on the supervised FastRCNN path (reference
roi_heads.py:_forward_keypoint + keypoint_head.py)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from test_modeling import tiny_batch, tiny_cfg  # noqa: E402

from drn_wsod_tpu.models import build_model  # noqa: E402


def _kp_batch(K=5):
    batch = tiny_batch()
    B, G = batch.gt_boxes.shape[:2]
    rng = np.random.RandomState(0)
    boxes = np.asarray(batch.gt_boxes)
    cx = (boxes[..., 0] + boxes[..., 2]) / 2
    cy = (boxes[..., 1] + boxes[..., 3]) / 2
    kps = np.zeros((B, G, K, 3), np.float32)
    kps[..., 0] = cx[..., None] + rng.uniform(-3, 3, (B, G, K))
    kps[..., 1] = cy[..., None] + rng.uniform(-3, 3, (B, G, K))
    kps[..., 2] = 2.0            # visible
    return batch.replace(gt_keypoints=jnp.asarray(kps))


@pytest.mark.slow
def test_keypoint_rcnn_e2e():
    cfg = tiny_cfg("StandardROIHeads")
    cfg.MODEL.KEYPOINT_ON = True
    cfg.MODEL.ROI_KEYPOINT_HEAD.NUM_KEYPOINTS = 5
    model = build_model(cfg)
    batch = _kp_batch(K=5)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, batch, train=True)
    losses = model.apply(params, batch, train=True,
                         rngs={"dropout": jax.random.PRNGKey(2)})
    assert set(losses) == {"loss_cls", "loss_box_reg", "loss_keypoint"}
    for v in losses.values():
        assert np.isfinite(float(v))

    B = batch.image.shape[0]
    boxes = batch.gt_boxes[:, :2]             # (B, 2, 4)
    kps = model.apply(params, batch, boxes, method="predict_keypoints")
    assert kps.shape == (B, 2, 5, 3)
    b = np.asarray(boxes)
    k = np.asarray(kps)
    # decoded keypoints land inside their boxes; scores are probabilities
    assert (k[..., 0] >= b[..., None, 0] - 1e-3).all()
    assert (k[..., 0] <= b[..., None, 2] + 1e-3).all()
    assert (k[..., 2] >= 0).all() and (k[..., 2] <= 1).all()
