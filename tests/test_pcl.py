import pytest
import jax.numpy as jnp
import numpy as np

from drn_wsod_tpu.ops.pcl import mine_pcl_clusters, pcl_branch_loss, pcl_loss


def _props():
    # two spatial groups of boxes
    g1 = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [2, 0, 12, 10]],
                  dtype=np.float32)
    g2 = np.array([[30, 30, 40, 40], [31, 31, 41, 41]], dtype=np.float32)
    far = np.array([[60, 60, 70, 70]], dtype=np.float32)
    return np.concatenate([g1, g2, far])


def test_mine_pcl_clusters_finds_groups():
    props = _props()
    P = len(props)
    scores = np.zeros((P, 2), dtype=np.float32)
    scores[:3, 0] = [0.9, 0.85, 0.8]   # class 0 hot on group 1
    scores[3:5, 0] = [0.7, 0.65]       # and group 2
    labels = np.array([1.0, 0.0], dtype=np.float32)
    clusters = mine_pcl_clusters(jnp.asarray(scores), jnp.asarray(props),
                                 jnp.ones(P, bool), jnp.asarray(labels),
                                 top_k=6, max_centers=3)
    v = np.asarray(clusters.center_valid)
    assert v[0].sum() >= 2      # two spatial groups -> >= 2 centers
    assert v[1].sum() == 0      # absent class masked out


def test_pcl_loss_decreases_with_correct_probs():
    props = _props()
    P = len(props)
    scores = np.zeros((P, 2), dtype=np.float32)
    scores[:3, 0] = [0.9, 0.85, 0.8]
    labels = np.array([1.0, 0.0], dtype=np.float32)
    clusters = mine_pcl_clusters(jnp.asarray(scores), jnp.asarray(props),
                                 jnp.ones(P, bool), jnp.asarray(labels),
                                 top_k=6, max_centers=3)

    # logits favoring the right assignment (class 1 col = class 0 fg)
    good = np.full((P, 3), -5.0, dtype=np.float32)
    good[:3, 1] = 5.0   # group-1 proposals -> class 0 (col 1)
    good[3:, 0] = 5.0   # rest -> background (col 0)
    bad = np.full((P, 3), -5.0, dtype=np.float32)
    bad[:, 2] = 5.0     # everything -> wrong class

    l_good = float(pcl_loss(jnp.asarray(good), clusters, jnp.asarray(props),
                            jnp.ones(P, bool)))
    l_bad = float(pcl_loss(jnp.asarray(bad), clusters, jnp.asarray(props),
                           jnp.ones(P, bool)))
    assert np.isfinite(l_good) and np.isfinite(l_bad)
    assert l_good < l_bad


@pytest.mark.slow
def test_pcl_branch_loss_batched_finite():
    import jax

    props = _props()
    P = len(props)
    B, C = 2, 2
    prev = np.random.RandomState(0).rand(B, P, C).astype(np.float32)
    logits = np.random.RandomState(1).randn(B, P, C + 1).astype(np.float32)
    labels = np.tile(np.array([[1.0, 1.0]], np.float32), (B, 1))
    loss = pcl_branch_loss(jnp.asarray(logits), jnp.asarray(prev),
                           jnp.asarray(np.tile(props[None], (B, 1, 1))),
                           jnp.ones((B, P), bool), jnp.asarray(labels))
    assert np.isfinite(float(loss))

    # gradient flows
    g = jax.grad(lambda l: pcl_branch_loss(
        l, jnp.asarray(prev), jnp.asarray(np.tile(props[None], (B, 1, 1))),
        jnp.ones((B, P), bool), jnp.asarray(labels)))(jnp.asarray(logits))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0
