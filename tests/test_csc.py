import pytest
import jax
import jax.numpy as jnp
import numpy as np

from drn_wsod_tpu.ops.csc import (compute_cpg_batched, csc_forward, csc_loss,
                                  csc_pool_class, integral_image)


def test_integral_image():
    x = jnp.ones((3, 4))
    ii = np.asarray(integral_image(x))
    assert ii[0, 0] == 1 and ii[2, 3] == 12 and ii[1, 1] == 4


def test_csc_pool_contrast_sign():
    # A bright blob centered in the image: a RoI tightly on the blob gets a
    # positive center-surround score; a RoI far away gets ~0; a RoI around
    # the blob with the blob as context goes negative.
    H = W = 40
    m = np.zeros((H, W), dtype=np.float32)
    m[15:25, 15:25] = 1.0
    ii = integral_image(jnp.asarray(m))
    rois = jnp.asarray(np.array([
        [14, 14, 26, 26],   # frame hugs the blob boundary -> positive
        [0, 0, 8, 8],       # empty corner -> 0
    ], dtype=np.float32))
    s = np.asarray(csc_pool_class(ii, rois))
    assert s[0] > 0
    np.testing.assert_allclose(s[1], 0.0, atol=1e-5)


def test_csc_forward_shapes_and_absent_class():
    C, H, W, P = 3, 16, 16, 5
    cpgs = jnp.zeros((C, H, W)).at[0, 4:12, 4:12].set(1.0)
    labels = jnp.asarray([1.0, 0.0, 1.0])
    preds = jnp.asarray([0.9, 0.1, 0.8])
    rois = jnp.asarray(np.array([[3, 3, 13, 13]] * P, dtype=np.float32))
    mask = jnp.ones(P, bool)
    Wm, PL, NL = csc_forward(cpgs, labels, preds, rois, mask)
    assert Wm.shape == (P, C)
    np.testing.assert_array_equal(np.asarray(PL), np.asarray(labels))
    np.testing.assert_allclose(np.asarray(NL), 0.0)
    # absent class keeps weight 1 (reference initializes W = ones)
    np.testing.assert_allclose(np.asarray(Wm[:, 1]), 1.0)


def test_csc_loss_reduces_to_bce_when_w_one():
    from drn_wsod_tpu.models.heads.wsddn import wsddn_loss

    B, P, C = 2, 4, 3
    rng = np.random.RandomState(0)
    scores = jnp.asarray(rng.uniform(0, 0.2, (B, P, C)).astype(np.float32))
    labels = jnp.asarray(np.array([[1, 0, 1], [0, 1, 0]], np.float32))
    W = jnp.ones((B, P, C))
    pos, neg = csc_loss(scores, W, labels, jnp.zeros_like(labels))
    # W == 1 -> positive term equals plain WSDDN BCE (up to clamp eps)
    np.testing.assert_allclose(float(pos),
                               float(wsddn_loss(scores, labels)), rtol=1e-4)


def test_compute_cpg_batched():
    # score_fn: proposal scores depend on a patch of the image.
    B, H, W, P, C = 1, 8, 8, 2, 2

    def score_fn(img):
        patch0 = img[:, :4, :4, :].sum(axis=(1, 2, 3))
        patch1 = img[:, 4:, 4:, :].sum(axis=(1, 2, 3))
        per_img = jnp.stack([patch0, patch1], axis=-1)   # (B, C)
        return jnp.tile(per_img[:, None, :], (1, P, 1)) / P

    image = jnp.ones((B, H, W, 3))
    labels = jnp.asarray([[1.0, 1.0]])
    preds = jnp.asarray([[0.9, 0.5]])
    cpg = compute_cpg_batched(score_fn, image, labels, preds, tau=0.7)
    assert cpg.shape == (B, C, H, W)
    c0 = np.asarray(cpg[0, 0])
    assert c0[:4, :4].min() > 0.99          # class-0 gradient on its patch
    np.testing.assert_allclose(c0[4:, 4:], 0.0)
    # class 1 pred < tau -> zeroed
    np.testing.assert_allclose(np.asarray(cpg[0, 1]), 0.0)


@pytest.mark.slow
def test_csc_train_step_e2e_tiny():
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_modeling import tiny_batch, tiny_cfg

    from drn_wsod_tpu.engine import create_train_state, make_csc_train_step
    from drn_wsod_tpu.models import build_model
    from drn_wsod_tpu.solver import build_optimizer

    cfg = tiny_cfg("CSCROIHeads")
    model = build_model(cfg)
    batch = tiny_batch()
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           batch, train=True)
    tx = build_optimizer(cfg, variables)
    state = create_train_state(variables, tx)
    step = make_csc_train_step(model, tx, tau=0.0)
    state, metrics = step(state, batch, jax.random.PRNGKey(2))
    assert "loss_cls_pos" in metrics and "loss_cls_neg" in metrics
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
