"""PanopticFPN meta-arch e2e: joint instance + semantic losses, inference
contracts, and host-side panoptic fusion (reference
detectron2/modeling/meta_arch/panoptic_fpn.py)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from test_modeling import tiny_batch  # noqa: E402

from drn_wsod_tpu.config import get_cfg  # noqa: E402
from drn_wsod_tpu.models import build_model  # noqa: E402


def _cfg():
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "PanopticFPN"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.FPN.OUT_CHANNELS = 32
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["p2", "p3", "p4", "p5"]
    cfg.MODEL.SEM_SEG_HEAD.NUM_CLASSES = 6
    cfg.MODEL.SEM_SEG_HEAD.CONVS_DIM = 16
    cfg.MODEL.MASK_ON = True
    cfg.MODEL.DTYPE = "float32"
    return cfg


def _batch_with_dense_gt():
    batch = tiny_batch()
    B, H = batch.image.shape[0], batch.image.shape[1]
    G = batch.gt_boxes.shape[1]
    rng = np.random.RandomState(0)
    masks = np.zeros((B, G, H, H), np.float32)
    for b in range(B):
        for g in range(G):
            x1, y1, x2, y2 = np.asarray(batch.gt_boxes[b, g]).astype(int)
            masks[b, g, y1:y2, x1:x2] = 1.0
    sem = rng.randint(0, 6, (B, H, H)).astype(np.int32)
    sem[:, :4, :4] = 255          # some ignore pixels
    return batch.replace(gt_masks=jnp.asarray(masks),
                         sem_seg=jnp.asarray(sem))


@pytest.mark.slow
def test_panoptic_fpn_train_and_inference():
    cfg = _cfg()
    model = build_model(cfg)
    batch = _batch_with_dense_gt()
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, batch, train=True)
    losses = model.apply(params, batch, train=True,
                         rngs={"dropout": jax.random.PRNGKey(2)})
    assert set(losses) == {"loss_sem_seg", "loss_cls", "loss_box_reg",
                           "loss_mask"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), k

    scores, boxes = model.apply(params, batch, method="inference_scores")
    B, P = batch.proposals.shape[:2]
    C = cfg.MODEL.ROI_HEADS.NUM_CLASSES
    assert scores.shape == (B, P, C + 1)
    assert boxes.shape == (B, P, C * 4)

    sem = model.apply(params, batch, method="semantic_logits")
    H = batch.image.shape[1]
    assert sem.shape == (B, H // 4, H // 4, 6)

    dets = jnp.asarray([[[4.0, 4.0, 30.0, 30.0]]] * B)     # (B, 1, 4)
    cls = jnp.zeros((B, 1), jnp.int32)
    mp = model.apply(params, batch, dets, cls, method="mask_probs")
    assert mp.shape == (B, 1, 28, 28)
    assert float(mp.min()) >= 0.0 and float(mp.max()) <= 1.0
