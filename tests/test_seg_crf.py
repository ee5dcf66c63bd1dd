import jax
import jax.numpy as jnp
import numpy as np

from drn_wsod_tpu.models.heads.seg import (ASPPSegHead, MaskRCNNHead,
                                           mask_loss, seg_loss_from_cpg)
from drn_wsod_tpu.ops.crf import crf_inference


def test_aspp_seg_head_shapes():
    head = ASPPSegHead(num_classes=4)
    x = jnp.zeros((2, 16, 16, 32))
    params = head.init(jax.random.PRNGKey(0), x)
    out = head.apply(params, x)
    assert out.shape == (2, 16, 16, 5)


def test_mask_head_shapes():
    head = MaskRCNNHead(num_classes=4, num_conv=2, conv_dim=16)
    x = jnp.zeros((6, 14, 14, 32))
    params = head.init(jax.random.PRNGKey(0), x)
    out = head.apply(params, x)
    assert out.shape == (6, 28, 28, 4)


def test_seg_loss_from_cpg_supervision():
    B, Hf, Wf, C = 1, 8, 8, 2
    cpg = np.zeros((B, C, 32, 32), dtype=np.float32)
    cpg[0, 0, :16, :16] = 1.0   # class 0 activates top-left quadrant
    labels = jnp.asarray([[1.0, 0.0]])
    hw = jnp.asarray([[32, 32]])

    # logits perfectly matching the pseudo labels -> small loss
    good = np.full((B, Hf, Wf, C + 1), -5.0, dtype=np.float32)
    good[0, :4, :4, 1] = 5.0
    good[0, :, :, 0] = np.where(good[0, :, :, 1] > 0, -5.0, 5.0)
    bad = -np.asarray(good)

    l_good = float(seg_loss_from_cpg(jnp.asarray(good), jnp.asarray(cpg),
                                     labels, hw))
    l_bad = float(seg_loss_from_cpg(jnp.asarray(bad), jnp.asarray(cpg),
                                    labels, hw))
    assert l_good < 0.01
    assert l_bad > 1.0


def test_mask_loss():
    N, m, C = 4, 8, 3
    logits = jnp.full((N, m, m, C), -8.0)
    logits = logits.at[0, :, :, 1].set(8.0)
    targets = jnp.zeros((N, m, m)).at[0].set(1.0)
    fg = jnp.asarray([True, False, False, False])
    l = float(mask_loss(logits, jnp.asarray([1, 0, 0, 0]), targets, fg))
    assert l < 1e-3


def test_crf_sharpens_noisy_unary():
    # Clean two-region image; noisy unaries. CRF should increase agreement
    # with the true partition.
    rng = np.random.RandomState(0)
    H = W = 32
    img = np.zeros((H, W, 3), dtype=np.float32)
    img[:, :16] = 220.0
    img[:, 16:] = 30.0
    true = np.zeros((H, W), dtype=np.int32)
    true[:, 16:] = 1

    unary = np.zeros((H, W, 2), dtype=np.float32)
    conf = np.where(true == 0, 0.7, 0.3)
    unary[..., 0] = conf
    unary[..., 1] = 1 - conf
    noise = rng.rand(H, W) < 0.15          # flip 15% of pixels
    unary[noise] = unary[noise][:, ::-1]

    before = (unary.argmax(-1) == true).mean()
    q = np.asarray(crf_inference(jnp.asarray(unary), jnp.asarray(img),
                                 num_iters=3, downsample=1))
    after = (q.argmax(-1) == true).mean()
    assert after >= before
    assert after > 0.95
