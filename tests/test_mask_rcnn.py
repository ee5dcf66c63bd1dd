"""Mask R-CNN branch on the supervised FastRCNN / CascadeRCNN paths
(reference detectron2/modeling/roi_heads/mask_head.py +
StandardROIHeads._forward_mask)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from test_modeling import tiny_batch, tiny_cfg  # noqa: E402

from drn_wsod_tpu.models import build_model  # noqa: E402


def _mask_batch():
    """GT masks = filled GT boxes at image resolution."""
    batch = tiny_batch()
    B, G = batch.gt_boxes.shape[:2]
    H, W = batch.image.shape[1:3]
    boxes = np.asarray(batch.gt_boxes)
    masks = np.zeros((B, G, H, W), np.float32)
    for b in range(B):
        for g in range(G):
            x1, y1, x2, y2 = boxes[b, g].astype(int)
            masks[b, g, y1:y2, x1:x2] = 1.0
    return batch.replace(gt_masks=jnp.asarray(masks))


@pytest.mark.parametrize("head", ["StandardROIHeads", "CascadeROIHeads"])
@pytest.mark.slow
def test_mask_rcnn_e2e(head):
    cfg = tiny_cfg(head)
    cfg.MODEL.MASK_ON = True
    model = build_model(cfg)
    batch = _mask_batch()
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, batch, train=True)
    losses = model.apply(params, batch, train=True,
                         rngs={"dropout": jax.random.PRNGKey(2)})
    assert "loss_mask" in losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), f"{k} not finite"

    B = batch.image.shape[0]
    boxes = batch.gt_boxes[:, :2]                      # (B, 2, 4)
    classes = jnp.zeros((B, 2), jnp.int32)
    probs = model.apply(params, batch, boxes, classes,
                        method="predict_masks")
    assert probs.shape == (B, 2, 28, 28)
    p = np.asarray(probs)
    assert np.isfinite(p).all() and (p >= 0).all() and (p <= 1).all()


def test_mask_loss_learns_box_interior():
    """One gradient signal check: with a box-filled GT mask, the BCE target
    cropped to the matched GT box is all-ones -> loss of all-ones logits is
    lower than all-minus-ones logits."""
    from drn_wsod_tpu.models.heads.seg import mask_loss

    N, m, C = 4, 8, 3
    gt_class = jnp.zeros((N,), jnp.int32)
    tgt = jnp.ones((N, m, m))
    fg = jnp.ones((N,), bool)
    good = mask_loss(jnp.full((N, m, m, C), 5.0), gt_class, tgt, fg)
    bad = mask_loss(jnp.full((N, m, m, C), -5.0), gt_class, tgt, fg)
    assert float(good) < float(bad)
