"""End-to-end model smoke tests on tiny shapes (pattern of the reference
tests/modeling/test_model_e2e.py:51-91: random inputs, loss runs, finite)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drn_wsod_tpu.config import get_cfg
from drn_wsod_tpu.models import build_model
from drn_wsod_tpu.structures import WSODBatch


def tiny_cfg(head="OICRROIHeads", depth=18, backbone="build_ws_resnet_backbone"):
    cfg = get_cfg()
    cfg.MODEL.BACKBONE.NAME = backbone
    cfg.MODEL.RESNETS.DEPTH = depth
    if depth in (18, 34):
        cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.ROI_HEADS.NAME = head
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 4
    cfg.MODEL.ROI_BOX_HEAD.DAN_DIM = [32, 32]
    cfg.MODEL.DTYPE = "float32"
    return cfg


def tiny_batch(B=2, P=8, H=64, W=64, C=4, seed=0):
    rng = np.random.RandomState(seed)
    x1 = rng.uniform(0, W // 2, (B, P)); y1 = rng.uniform(0, H // 2, (B, P))
    w = rng.uniform(8, W // 2, (B, P)); h = rng.uniform(8, H // 2, (B, P))
    proposals = np.stack([x1, y1, x1 + w, y1 + h], axis=-1).astype(np.float32)
    labels = np.zeros((B, C), dtype=np.float32)
    labels[:, :2] = 1.0
    mask = np.ones((B, P), dtype=bool)
    mask[:, -2:] = False
    G = 4
    return WSODBatch(
        image=jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32)),
        image_hw=jnp.full((B, 2), H, dtype=jnp.int32),
        orig_hw=jnp.full((B, 2), H, dtype=jnp.int32),
        proposals=jnp.asarray(proposals),
        proposal_mask=jnp.asarray(mask),
        objectness=jnp.asarray(rng.uniform(0, 1, (B, P)).astype(np.float32)),
        labels=jnp.asarray(labels),
        image_id=jnp.arange(B, dtype=jnp.int32),
        gt_boxes=jnp.asarray(proposals[:, :G]),
        gt_classes=jnp.zeros((B, G), dtype=jnp.int32),
        gt_valid=jnp.ones((B, G), dtype=bool),
    )


@pytest.mark.parametrize("head,expected_losses", [
    ("WSDDNROIHeads", {"loss_cls"}),
    ("OICRROIHeads", {"loss_cls", "loss_cls_r0", "loss_cls_r1", "loss_cls_r2"}),
])
def test_train_losses_finite(head, expected_losses):
    cfg = tiny_cfg(head)
    model = build_model(cfg)
    batch = tiny_batch()
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, batch, train=True)
    losses = model.apply(params, batch, train=True,
                         rngs={"dropout": jax.random.PRNGKey(2)})
    assert set(losses) == expected_losses
    for k, v in losses.items():
        assert np.isfinite(float(v)), f"{k} not finite"


def test_oicr_reg_branch_adds_box_loss():
    cfg = tiny_cfg("OICRROIHeads")
    cfg.WSL.REFINE_NUM = 2
    cfg.WSL.REFINE_REG = [False, True]
    model = build_model(cfg)
    batch = tiny_batch()
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, batch, train=True)
    losses = model.apply(params, batch, train=True,
                         rngs={"dropout": jax.random.PRNGKey(2)})
    assert "loss_box_reg_r1" in losses
    assert np.isfinite(float(losses["loss_box_reg_r1"]))


@pytest.mark.slow
def test_grads_flow_to_head_not_backbone():
    cfg = tiny_cfg("OICRROIHeads")
    model = build_model(cfg)
    batch = tiny_batch()
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, batch, train=True)

    def loss_fn(p):
        losses = model.apply(p, batch, train=True,
                             rngs={"dropout": jax.random.PRNGKey(2)})
        return sum(losses.values())

    grads = jax.grad(loss_fn)(params)["params"]
    head_norm = sum(float(jnp.abs(g).sum())
                    for k in grads if k != "backbone"
                    for g in jax.tree.leaves(grads[k]))
    bb_norm = sum(float(jnp.abs(g).sum())
                  for g in jax.tree.leaves(grads.get("backbone", {})))
    assert head_norm > 0
    assert bb_norm == 0  # frozen backbone: stop_gradient cuts the tower


def test_inference_scores_shapes():
    cfg = tiny_cfg("OICRROIHeads")
    model = build_model(cfg)
    batch = tiny_batch()
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, batch, train=True)
    scores, boxes = model.apply(params, batch, method="inference_scores")
    B, P = batch.proposals.shape[:2]
    assert scores.shape == (B, P, cfg.MODEL.ROI_HEADS.NUM_CLASSES + 1)
    assert boxes.shape == (B, P, 4)
    s = np.asarray(scores)
    assert np.isfinite(s).all()
    # padded proposals have zero scores
    np.testing.assert_allclose(s[:, -2:, :], 0.0)


def test_vgg_backbone_e2e():
    cfg = tiny_cfg("WSDDNROIHeads", backbone="build_vgg_backbone")
    cfg.MODEL.VGG.OUT_FEATURES = ["plain5"]
    cfg.MODEL.ROI_HEADS.IN_FEATURES = ["plain5"]
    model = build_model(cfg)
    batch = tiny_batch()
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, batch, train=True)
    losses = model.apply(params, batch, train=True,
                         rngs={"dropout": jax.random.PRNGKey(2)})
    assert np.isfinite(float(losses["loss_cls"]))
