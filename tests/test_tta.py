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


@pytest.mark.core
def test_device_view_batch_matches_host():
    """The traced device-side view builder (_device_view_batch) must agree
    with the host build_view_batch it replaces: images within PIL's
    fixed-point rounding (~1.5/255) and boxes/masks/inv exactly."""
    from drn_wsod_tpu.tta import _device_view_batch, enumerate_views

    rs = np.random.RandomState(3)
    H0, W0 = 47, 61
    image = rs.randint(0, 255, (H0, W0, 3), np.uint8)
    P = 8
    n = 5
    boxes = np.zeros((P, 4), np.float32)
    x1 = rs.uniform(0, 40, n); y1 = rs.uniform(0, 30, n)
    boxes[:n] = np.stack([x1, y1, x1 + rs.uniform(4, 20, n),
                          y1 + rs.uniform(4, 15, n)], 1)
    mask = np.zeros((P,), bool); mask[:n] = True
    obj = np.zeros((P,), np.float32); obj[:n] = rs.uniform(0, 1, n)
    labels = np.array([1, 0, 1], np.float32)

    min_sizes, max_size, buckets = (60, 90), 300, (96, 128)
    views = enumerate_views((H0, W0), min_sizes, max_size, True)
    # one group: all views in the largest bucket for a single comparison
    bucket = 128
    host_batch, host_inv = build_view_batch(
        image, boxes[:n], obj[:n], labels, min_sizes, max_size, True,
        (bucket,), P, views=views)

    rb = 64
    raw = np.pad(image, ((0, rb - H0), (0, rb - W0), (0, 0)), mode="edge")
    flips = tuple(bool(f) for _, _, f in views)
    new_hw = jnp.asarray([[nh, nw] for nh, nw, _ in views], jnp.int32)
    dev_batch, dev_inv = jax.jit(
        lambda raw, hw0, new_hw, b, m, o, l: _device_view_batch(
            raw, hw0, new_hw, flips, bucket, b, m, o, l)
    )(jnp.asarray(raw), jnp.asarray([H0, W0], jnp.int32), new_hw,
      jnp.asarray(boxes), jnp.asarray(mask), jnp.asarray(obj),
      jnp.asarray(labels))

    np.testing.assert_allclose(np.asarray(dev_batch.image),
                               np.asarray(host_batch.image), atol=1.6)
    np.testing.assert_allclose(np.asarray(dev_batch.proposals),
                               np.asarray(host_batch.proposals), atol=1e-3)
    np.testing.assert_array_equal(np.asarray(dev_batch.proposal_mask),
                                  np.asarray(host_batch.proposal_mask))
    np.testing.assert_allclose(np.asarray(dev_batch.objectness),
                               np.asarray(host_batch.objectness), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(dev_batch.image_hw),
                                  np.asarray(host_batch.image_hw))
    for k in ("scale", "flip", "width"):
        np.testing.assert_allclose(np.asarray(dev_inv[k]),
                                   np.asarray(host_inv[k]), atol=1e-6)


@pytest.mark.slow
def test_tta_device_path_matches_host_path(tmp_path):
    """End-to-end GeneralizedRCNNWithTTAAVG: the fused device-side view
    build (DEVICE_VIEWS=True, default) must reproduce the host-built path's
    detections on the same record (scores loosely — the resize kernels
    differ by PIL fixed-point rounding)."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_modeling import tiny_cfg

    from PIL import Image
    from drn_wsod_tpu.engine.defaults import _init_variables
    from drn_wsod_tpu.models import build_model
    from drn_wsod_tpu.structures import WSODBatch
    from drn_wsod_tpu.tta import GeneralizedRCNNWithTTAAVG

    cfg = tiny_cfg("WSDDNROIHeads")
    cfg.TEST.AUG.MIN_SIZES = (48, 64)
    cfg.TEST.AUG.MAX_SIZE = 200
    cfg.TEST.AUG.FLIP = True
    cfg.INPUT.BUCKETS = [64, 96, 128]
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 8
    model = build_model(cfg)

    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (40, 56, 3), np.uint8)
    f = tmp_path / "im.jpg"
    Image.fromarray(img).save(f, quality=95)

    n = 6
    x1 = rs.uniform(0, 30, n).astype(np.float32)
    y1 = rs.uniform(0, 20, n).astype(np.float32)
    record = {
        "file_name": str(f),
        "proposal_boxes": np.stack(
            [x1, y1, x1 + rs.uniform(6, 20, n).astype(np.float32),
             y1 + rs.uniform(6, 15, n).astype(np.float32)], 1),
        "proposal_objectness_logits": rs.uniform(0, 1, n).astype(np.float32),
        "annotations": [{"category_id": 1}],
        "height": 40, "width": 56,
    }

    from __graft_entry__ import _synthetic_batch
    init_batch = _synthetic_batch(B=1, H=64, W=64, P=8, C=4)
    variables = _init_variables(model, cfg, init_batch)

    tta_dev = GeneralizedRCNNWithTTAAVG(cfg, model, variables)
    assert tta_dev.device_views
    dets_dev = tta_dev(record)

    cfg2 = cfg.clone()
    cfg2.TEST.AUG.DEVICE_VIEWS = False
    tta_host = GeneralizedRCNNWithTTAAVG(cfg2, model, variables)
    assert not tta_host.device_views
    dets_host = tta_host(record)

    np.testing.assert_allclose(dets_dev["all_scores"],
                               dets_host["all_scores"], atol=2e-3)
    np.testing.assert_allclose(dets_dev["all_boxes"],
                               dets_host["all_boxes"], rtol=1e-3, atol=0.2)
