import pytest
import numpy as np
import jax
import jax.numpy as jnp

from drn_wsod_tpu.tta import _invert_boxes, build_view_batch


def test_build_view_batch_shapes_and_alignment():
    H, W = 60, 80
    image = np.zeros((H, W, 3), dtype=np.uint8)
    proposals = np.array([[10, 10, 30, 40], [0, 0, 80, 60]], dtype=np.float32)
    objectness = np.array([0.5, 0.2], dtype=np.float32)
    labels = np.zeros(3, dtype=np.float32)

    batch, inv = build_view_batch(image, proposals, objectness, labels,
                                  min_sizes=(30, 60), max_size=200, flip=True,
                                  buckets=(64, 128), num_proposals=4)
    V = 4  # 2 scales x (orig + flip)
    assert batch.image.shape[0] == V
    assert batch.proposals.shape == (V, 4, 4)
    # every view has the same number of valid proposals
    np.testing.assert_array_equal(np.asarray(batch.proposal_mask.sum(1)),
                                  [2] * V)

    # inverse transform maps every view's proposals back to the originals
    back = np.asarray(_invert_boxes(batch.proposals, inv))
    for v in range(V):
        np.testing.assert_allclose(back[v, :2], proposals, atol=0.5)


def test_invert_boxes_flip():
    boxes = jnp.asarray([[[10.0, 5.0, 30.0, 25.0]]])
    inv = {"scale": jnp.asarray([[1.0, 1.0]]),
           "flip": jnp.asarray([1.0]),
           "width": jnp.asarray([100.0])}
    out = np.asarray(_invert_boxes(boxes, inv))
    np.testing.assert_allclose(out[0, 0], [70.0, 5.0, 90.0, 25.0])


@pytest.mark.slow
def test_tta_avg_on_identical_views_matches_single():
    """With one scale and no flip, TTA-AVG must equal the plain detector."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_modeling import tiny_cfg

    from drn_wsod_tpu.models import build_model
    from drn_wsod_tpu.tta import make_tta_detect_fn
    from drn_wsod_tpu.structures import WSODBatch

    cfg = tiny_cfg("WSDDNROIHeads")
    model = build_model(cfg)

    H = W = 64
    P = 8
    rng = np.random.RandomState(0)
    image = rng.uniform(0, 255, (H, W, 3)).astype(np.float32)
    proposals = np.zeros((P, 4), dtype=np.float32)
    proposals[:, 0] = rng.uniform(0, 30, P)
    proposals[:, 1] = rng.uniform(0, 30, P)
    proposals[:, 2] = proposals[:, 0] + rng.uniform(10, 30, P)
    proposals[:, 3] = proposals[:, 1] + rng.uniform(10, 30, P)

    def mk_batch(V):
        return WSODBatch(
            image=jnp.asarray(np.tile(image[None], (V, 1, 1, 1))),
            image_hw=jnp.full((V, 2), H, jnp.int32),
            orig_hw=jnp.full((V, 2), H, jnp.int32),
            proposals=jnp.asarray(np.tile(proposals[None], (V, 1, 1))),
            proposal_mask=jnp.ones((V, P), bool),
            objectness=jnp.zeros((V, P)),
            labels=jnp.zeros((V, 4)),
            image_id=jnp.zeros((V,), jnp.int32),
        )

    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           mk_batch(1), train=True)
    detect = make_tta_detect_fn(model, 1e-5, 0.5, 8)
    inv1 = {"scale": jnp.ones((1, 2)), "flip": jnp.zeros(1),
            "width": jnp.full((1,), float(W))}
    inv2 = {"scale": jnp.ones((2, 2)), "flip": jnp.zeros(2),
            "width": jnp.full((2,), float(W))}
    d1 = detect(variables, mk_batch(1), inv1)
    d2 = detect(variables, mk_batch(2), inv2)
    np.testing.assert_allclose(np.asarray(d1["scores"]),
                               np.asarray(d2["scores"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(d1["boxes"]),
                               np.asarray(d2["boxes"]), rtol=1e-5)
