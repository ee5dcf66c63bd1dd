import jax
import jax.numpy as jnp
import numpy as np

from drn_wsod_tpu.models.heads.keypoint import (
    KRCNNConvDeconvUpsampleHead, heatmaps_to_keypoints, keypoint_rcnn_loss,
    keypoints_to_heatmap_targets)


def test_head_shapes():
    head = KRCNNConvDeconvUpsampleHead(num_keypoints=5, conv_dims=(16, 16))
    x = jnp.zeros((3, 14, 14, 8))
    p = head.init(jax.random.PRNGKey(0), x)
    out = head.apply(p, x)
    assert out.shape == (3, 56, 56, 5)


def test_heatmap_targets_and_decode_roundtrip():
    boxes = jnp.asarray([[10.0, 10.0, 30.0, 30.0]])
    kps = jnp.asarray([[[15.0, 25.0, 2.0], [50.0, 50.0, 2.0],
                        [12.0, 12.0, 0.0]]])  # in-box, out-of-box, invisible
    t, v = keypoints_to_heatmap_targets(kps, boxes, 8)
    np.testing.assert_array_equal(np.asarray(v), [[True, False, False]])
    # decode that cell center back: should land within a cell of the input
    S = 8
    logits = jnp.full((1, S, S, 3), -10.0)
    logits = logits.at[0, int(t[0, 0]) // S, int(t[0, 0]) % S, 0].set(10.0)
    dec = np.asarray(heatmaps_to_keypoints(logits, boxes))
    assert abs(dec[0, 0, 0] - 15.0) <= 20 / S
    assert abs(dec[0, 0, 1] - 25.0) <= 20 / S


def test_keypoint_loss_perfect_vs_wrong():
    S, K, N = 8, 2, 1
    t = jnp.asarray([[10, 20]])
    v = jnp.asarray([[True, True]])
    good = jnp.full((N, S, S, K), -8.0)
    good = good.at[0, 10 // S, 10 % S, 0].set(8.0)
    good = good.at[0, 20 // S, 20 % S, 1].set(8.0)
    bad = jnp.zeros((N, S, S, K))
    lg = float(keypoint_rcnn_loss(good, t, v))
    lb = float(keypoint_rcnn_loss(bad, t, v))
    assert lg < 0.01 < lb
