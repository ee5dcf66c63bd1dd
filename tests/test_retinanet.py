"""RetinaNet meta-arch: focal loss math, low-quality matching, and e2e
train/inference shapes (reference detectron2 meta_arch/retinanet.py)."""

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
from drn_wsod_tpu.models.retinanet import sigmoid_focal_loss  # noqa: E402
from drn_wsod_tpu.ops.matcher import match  # noqa: E402


def test_focal_loss_matches_torch_reference():
    """Against torchvision.ops.sigmoid_focal_loss (independent impl)."""
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(0)
    logits = rng.randn(16, 5).astype(np.float32) * 3
    targets = (rng.rand(16, 5) > 0.8).astype(np.float32)

    got = np.asarray(sigmoid_focal_loss(
        jnp.asarray(logits), jnp.asarray(targets), 0.25, 2.0))

    t_logits = torch.tensor(logits)
    t_targets = torch.tensor(targets)
    p = torch.sigmoid(t_logits)
    ce = torch.nn.functional.binary_cross_entropy_with_logits(
        t_logits, t_targets, reduction="none")
    p_t = p * t_targets + (1 - p) * (1 - t_targets)
    want = ce * ((1 - p_t) ** 2.0)
    want = want * (0.25 * t_targets + 0.75 * (1 - t_targets))
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-5, atol=1e-6)


def test_low_quality_match_forces_positive():
    # one GT whose best anchor IoU is below every threshold
    quality = jnp.asarray([[0.3, 0.2, 0.1]])
    gt_valid = jnp.ones(1, bool)
    _, lab_plain = match(quality, gt_valid, [0.4, 0.5], [0, -1, 1])
    assert int(lab_plain[0]) == 0
    _, lab_lq = match(quality, gt_valid, [0.4, 0.5], [0, -1, 1],
                      allow_low_quality=True)
    assert int(lab_lq[0]) == 1        # best anchor of the GT forced fg
    assert int(lab_lq[1]) == 0
    # padded (invalid) GT must not force anything
    _, lab_inv = match(quality, jnp.zeros(1, bool), [0.4, 0.5], [0, -1, 1],
                       allow_low_quality=True)
    assert (np.asarray(lab_inv) == 0).all()


def _retina_cfg():
    cfg = get_cfg()
    cfg.MODEL.META_ARCHITECTURE = "RetinaNet"
    cfg.MODEL.BACKBONE.NAME = "build_resnet_fpn_backbone"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.FPN.OUT_CHANNELS = 32
    cfg.MODEL.RETINANET.NUM_CLASSES = 4
    cfg.MODEL.RETINANET.IN_FEATURES = ["p3", "p4", "p5"]
    cfg.MODEL.ANCHOR_GENERATOR.SIZES = [
        [16.0, 20.0], [32.0, 40.0], [64.0, 80.0]]
    cfg.MODEL.RETINANET.TOPK_CANDIDATES_TEST = 16
    cfg.MODEL.DTYPE = "float32"
    return cfg


@pytest.mark.slow
def test_retinanet_e2e():
    cfg = _retina_cfg()
    model = build_model(cfg)
    batch = tiny_batch()
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, batch, train=True)
    losses = model.apply(params, batch, train=True,
                         rngs={"dropout": jax.random.PRNGKey(2)})
    assert set(losses) == {"loss_cls", "loss_box_reg"}
    for v in losses.values():
        assert np.isfinite(float(v))

    scores, boxes = model.apply(params, batch, method="inference_scores")
    B = batch.image.shape[0]
    C = cfg.MODEL.RETINANET.NUM_CLASSES
    # per-level top-k: 64x64 image -> p3 8x8, p4 4x4, p5 2x2 cells x 6
    # anchors = 384/96/24, trimmed to k=16 each
    assert scores.shape == (B, 48, C + 1)
    assert (np.asarray(scores[..., -1]) == 0).all()   # bg column zeros
    assert boxes.shape == (B, 48, 4)
    # boxes clipped to the image
    assert float(boxes.min()) >= 0.0
    assert float(boxes.max()) <= 64.0


@pytest.mark.slow
def test_retinanet_perfect_prediction_low_loss():
    """Anchors exactly on GT with confident logits -> near-zero losses."""
    cfg = _retina_cfg()
    model = build_model(cfg)
    batch = tiny_batch()
    params = model.init({"params": jax.random.PRNGKey(0),
                         "dropout": jax.random.PRNGKey(1)}, batch, train=True)
    l1 = model.apply(params, batch, train=True,
                     rngs={"dropout": jax.random.PRNGKey(2)})
    # prior_prob init keeps initial cls loss moderate (the focal-bias
    # property the reference initializes for)
    assert float(l1["loss_cls"]) < 50.0
