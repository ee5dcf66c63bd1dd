"""PCL tests: self-consistency of the on-device re-formulation, plus a
round-4 oracle comparison against a verbatim-semantics host port of the
reference clustering (projects/WSL/wsl/modeling/roi_heads/third_party/
pcl.py:24-200 + wsl/layers/csrc/pcl_loss/pcl_loss_cpu.cpp:36-56), using the
same sklearn KMeans the reference calls."""

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
    # Reference greedy semantics stop once <= 5 candidates remain after a
    # pick (pcl.py:118-120), so finding BOTH spatial groups needs enough
    # hot singletons to keep the pool above 5 after the first pick.
    g1 = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [2, 0, 12, 10]],
                  dtype=np.float32)
    g2 = np.array([[30, 30, 40, 40], [31, 31, 41, 41]], dtype=np.float32)
    singles = np.array([[60 + 20 * k, 60, 70 + 20 * k, 70] for k in range(4)],
                       dtype=np.float32)
    cold = np.array([[200 + 15 * k, 200, 210 + 15 * k, 210] for k in range(3)],
                    dtype=np.float32)
    props = np.concatenate([g1, g2, singles, cold])
    P = len(props)
    scores = np.zeros((P, 2), dtype=np.float32)
    # 9 VERY tightly-packed hot scores -> one top 3-means interval; the cold
    # scores are spread so the optimum can't afford to split the hot group
    scores[:9, 0] = 0.9 - 0.001 * np.arange(9)
    scores[9:, 0] = [0.5, 0.25, 0.0]
    labels = np.array([1.0, 0.0], dtype=np.float32)
    clusters = mine_pcl_clusters(jnp.asarray(scores), jnp.asarray(props),
                                 jnp.ones(P, bool), jnp.asarray(labels),
                                 top_k=P, max_centers=3)
    v = np.asarray(clusters.center_valid)
    c = np.asarray(clusters.centers)
    # greedy: g1 center (deg 3, count 9->6), g2 center (deg 2, count->4, stop)
    assert v[0].sum() == 2
    got = {tuple(b) for b, ok in zip(c[0], v[0]) if ok}
    assert any(tuple(b) in got for b in g1)
    assert any(tuple(b) in got for b in g2)
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


# --------------------------------------------------------------------------
# reference-clustering oracle (host, sklearn — exactly what the reference
# calls at third_party/pcl.py:61-72)
# --------------------------------------------------------------------------

FG_T, BG_T, GRAPH_T, MAX_PC = 0.5, 0.1, 0.4, 5


def _np_iou(a, b):
    """detectron2 pairwise_iou convention (no +1)."""
    area_a = np.maximum(a[:, 2] - a[:, 0], 0) * np.maximum(a[:, 3] - a[:, 1], 0)
    area_b = np.maximum(b[:, 2] - b[:, 0], 0) * np.maximum(b[:, 3] - b[:, 1], 0)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def sklearn_top_members(s):
    """The reference's exact candidate pick (pcl.py:61-72): sklearn KMeans
    k=3, random_state=3 (best of 10 k-means++ restarts)."""
    from sklearn.cluster import KMeans

    km = KMeans(n_clusters=min(3, len(s)), random_state=3).fit(
        s.reshape(-1, 1))
    return np.where(km.labels_ == np.argmax(km.cluster_centers_))[0]


def exact_top_members(s, with_sse=False):
    """Host mirror of the device-side exact 1-D 3-means (pcl.py
    _kmeans3_top_members): global SSE optimum by interval boundary search.
    Never worse than sklearn's restarts on the same objective."""
    n = len(s)
    if n < 3:
        idx = np.array([np.argmax(s)])
        return (idx, 0.0) if with_sse else idx
    order = np.argsort(-s, kind="stable")
    xs = s[order].astype(np.float64)
    p1 = np.concatenate([[0.0], np.cumsum(xs)])
    p2 = np.concatenate([[0.0], np.cumsum(xs * xs)])

    def sse(a, b):
        m = max(b - a, 1)
        t = p1[b] - p1[a]
        return p2[b] - p2[a] - t * t / m

    best = (1, 2, np.inf)
    for i in range(1, n - 1):
        head = sse(0, i)
        for j in range(i + 1, n):
            tot = head + sse(i, j) + sse(j, n)
            if tot < best[2]:
                best = (i, j, tot)
    idx = np.sort(order[:best[0]])
    return (idx, best[2]) if with_sse else idx


def oracle_graph_centers(boxes, cls_prob, present, member_fn=sklearn_top_members,
                         tie_break="numpy"):
    """Host port of _get_graph_centers (pcl.py:86-146): k-means candidate
    pick (pluggable), greedy max-degree centers with the count<=5 stop,
    top-5 by max-neighbor score, chosen centers deleted from the pool.

    tie_break: 'numpy' is the verbatim reference — ``np.argsort(deg)[::-1]
    [0]`` with default (unstable quicksort) order, so equal-degree ties
    resolve arbitrarily; 'largest' picks the largest index among the
    max-degree candidates (the device convention), for isolating the rest
    of the pipeline from that arbitrary choice."""
    pool_b = boxes.copy()
    pool_p = np.clip(cls_prob.copy(), 1e-9, 1 - 1e-9)
    gt_boxes, gt_classes, gt_scores = [], [], []
    for c in range(cls_prob.shape[1]):
        if not present[c]:
            continue
        s = pool_p[:, c]
        idx = member_fn(s)
        if len(idx) == 0:
            idx = np.array([np.argmax(s)])
        b, sc = pool_b[idx], s[idx]
        g = (_np_iou(b, b) > GRAPH_T).astype(np.float32)
        keep, kscores, count = [], [], len(idx)
        while True:
            d = g.sum(1)
            if tie_break == "largest":
                tmp = int(np.where(d == d.max())[0][-1])
            else:
                tmp = np.argsort(d)[::-1][0]
            keep.append(tmp)
            inds = np.where(g[tmp] > 0)[0]
            kscores.append(sc[inds].max())
            g[:, inds] = 0
            g[inds, :] = 0
            count -= len(inds)
            if count <= 5:
                break
        kscores = np.array(kscores)
        sel = np.argsort(kscores)[-1:(-1 - min(len(kscores), MAX_PC)):-1]
        chosen = np.array(keep)[sel]
        gt_boxes.append(b[chosen])
        gt_scores.append(kscores[sel])
        gt_classes.append(np.full(len(sel), c + 1, np.int32))
        rm = idx[chosen]
        pool_b = np.delete(pool_b, rm, axis=0)
        pool_p = np.delete(pool_p, rm, axis=0)
    return (np.concatenate(gt_boxes), np.concatenate(gt_classes),
            np.concatenate(gt_scores))


def oracle_loss(all_boxes, probs_new, gt_boxes, gt_classes, gt_scores):
    """_get_proposal_clusters (pcl.py:149-200) + pcl_loss_cpu.cpp:36-56."""
    ov = _np_iou(all_boxes, gt_boxes)
    assign = ov.argmax(1)
    maxov = ov.max(1)
    labels = gt_classes[assign].copy()
    w = gt_scores[assign].copy()
    w[maxov < BG_T] = 0.0
    bg = maxov < FG_T
    labels[bg] = 0
    assign = np.where(bg, -1, assign)

    P = len(all_boxes)
    out = 0.0
    # background column (pcl_loss_cpu.cpp:38-44)
    out -= np.sum(w[labels == 0] * np.log(np.maximum(
        probs_new[labels == 0, 0], 1e-6)))
    # cluster terms (pcl_loss_cpu.cpp:45-52)
    for k in range(len(gt_boxes)):
        members = assign == k
        if members.sum() == 0:
            continue
        img_w = w[members].sum()
        pc_prob = probs_new[members, gt_classes[k]].mean()
        out -= img_w * np.log(np.maximum(pc_prob, 1e-6))
    return out / P


def _random_config(rng, P=48, C=4):
    """Clustered proposal geometry + class scores peaked on 1-2 objects."""
    n_obj = rng.randint(1, 4)
    present = np.zeros(C, bool)
    objs = []
    for _ in range(n_obj):
        c = rng.randint(C)
        present[c] = True
        cx, cy = rng.uniform(20, 80, 2)
        w, h = rng.uniform(15, 40, 2)
        objs.append((c, cx, cy, w, h))
    boxes = np.zeros((P, 4), np.float32)
    scores = rng.uniform(0, 0.05, (P, C)).astype(np.float32)
    for i in range(P):
        if i < P * 2 // 3:
            c, cx, cy, w, h = objs[i % n_obj]
            jx, jy = rng.uniform(-8, 8, 2)
            jw, jh = rng.uniform(0.7, 1.4, 2)
            x1, y1 = cx + jx - w * jw / 2, cy + jy - h * jh / 2
            x2, y2 = cx + jx + w * jw / 2, cy + jy + h * jh / 2
            # score falls off with jitter
            q = np.exp(-(jx * jx + jy * jy) / 60) * rng.uniform(0.4, 1.0)
            scores[i, c] = max(scores[i, c], q)
        else:
            x1, y1 = rng.uniform(0, 80, 2)
            x2, y2 = x1 + rng.uniform(8, 40), y1 + rng.uniform(8, 40)
        boxes[i] = (x1, y1, x2, y2)
    logits = rng.randn(P, C + 1).astype(np.float32)
    return boxes, np.clip(scores, 0, 1), present, logits


def _center_f1(ours_b, ours_v, oracle_b):
    """Set agreement of center boxes (exact coordinates; both sides pick
    from the same proposal list)."""
    got = {tuple(np.round(b, 3)) for b, v in zip(
        ours_b.reshape(-1, 4), ours_v.reshape(-1)) if v}
    want = {tuple(np.round(b, 3)) for b in oracle_b}
    if not got and not want:
        return 1.0
    inter = len(got & want)
    prec = inter / max(len(got), 1)
    rec = inter / max(len(want), 1)
    return 2 * prec * rec / max(prec + rec, 1e-9)


def _run_oracle_comparison(member_fn, N=60, P=48, C=4, tie_break="numpy"):
    """Run the device PCL against the host oracle (with pluggable candidate
    selection) over N random clustered configs; returns (f1s, deltas)."""
    import jax
    from scipy.special import softmax

    rng = np.random.RandomState(7)
    # top_k=P: the reference has no candidate cap; validate the uncapped
    # algorithm (the shipped default caps at 32 for the padded-4096 case)
    mine = jax.jit(lambda s, b, m, l: mine_pcl_clusters(
        s, b, m, l, top_k=P, max_centers=MAX_PC, graph_iou=GRAPH_T))
    loss_fn = jax.jit(lambda lg, cl, b, m: pcl_loss(
        lg, cl, b, m, fg_iou=FG_T, bg_thresh=BG_T))

    f1s, deltas = [], []
    for _ in range(N):
        boxes, scores, present, logits = _random_config(rng, P, C)
        labels = present.astype(np.float32)
        probs_new = softmax(logits, axis=-1)

        gt_b, gt_c, gt_s = oracle_graph_centers(boxes, scores, present,
                                                member_fn, tie_break)
        want = oracle_loss(boxes, probs_new, gt_b, gt_c, gt_s)

        clusters = mine(jnp.asarray(scores), jnp.asarray(boxes),
                        jnp.ones(P, bool), jnp.asarray(labels))
        got = float(loss_fn(jnp.asarray(logits), clusters,
                            jnp.asarray(boxes), jnp.ones(P, bool)))

        f1s.append(_center_f1(np.asarray(clusters.centers),
                              np.asarray(clusters.center_valid), gt_b))
        deltas.append(abs(got - want) / max(abs(want), 1e-6))
    return np.asarray(f1s), np.asarray(deltas)


@pytest.mark.slow
def test_matches_reference_clustering():
    """VERDICT r3 item 5, part 1: with candidate selection held identical
    (both sides use the exact 1-D 3-means optimum), the device graph-center
    greedy, cluster assignment and loss must match a verbatim host port of
    the reference (pcl.py:86-200 + pcl_loss_cpu.cpp:36-56) essentially
    exactly — this isolates and validates every step downstream of k-means
    and of the reference's arbitrary (unstable-quicksort) degree tie-break,
    which the oracle is pinned to the device convention for."""
    f1s, deltas = _run_oracle_comparison(exact_top_members,
                                         tie_break="largest")
    exact = float(np.mean(f1s == 1.0))
    print(f"\nPCL vs oracle (identical candidates + tie-break): center F1 "
          f"mean {f1s.mean():.4f} exact-set rate {exact:.2f}, loss rel-delta "
          f"median {np.median(deltas):.2e} max {deltas.max():.2e}")
    assert f1s.min() == 1.0, (f1s.mean(), exact)
    assert float(deltas.max()) <= 1e-4


@pytest.mark.slow
def test_sklearn_kmeans_divergence_quantified():
    """VERDICT r3 item 5, part 2: quantify the end-to-end divergence that
    is attributable purely to candidate selection — the reference uses
    sklearn k-means++ best-of-10 restarts (a randomized local search), the
    device side computes the EXACT global optimum of the same objective.
    Asserts the device selection is never worse on sklearn's own inertia,
    and that the realized loss difference is statistically small."""
    from sklearn.cluster import KMeans

    # (a) objective comparison: exact DP never loses to sklearn's restarts
    rng = np.random.RandomState(7)
    n_better = n_equal = 0
    for _ in range(30):
        _, scores, present, _ = _random_config(rng)
        c = int(np.where(present)[0][0])
        s = np.clip(scores[:, c], 1e-9, 1 - 1e-9)
        km = KMeans(n_clusters=3, random_state=3).fit(
            s.astype(np.float64).reshape(-1, 1))
        _, sse = exact_top_members(s.astype(np.float64), with_sse=True)
        assert sse <= km.inertia_ + 1e-9, (sse, km.inertia_)
        if sse < km.inertia_ - 1e-9:
            n_better += 1
        else:
            n_equal += 1

    # (b) end-to-end divergence vs the sklearn-candidates oracle
    f1s, deltas = _run_oracle_comparison(sklearn_top_members)
    exact = float(np.mean(f1s == 1.0))
    print(f"\nPCL vs sklearn-oracle: inertia equal {n_equal} / DP-better "
          f"{n_better}; center F1 mean {f1s.mean():.3f} exact-set rate "
          f"{exact:.2f}, loss rel-delta median {np.median(deltas):.4f} "
          f"mean {deltas.mean():.4f}")
    assert f1s.mean() >= 0.70
    assert float(np.median(deltas)) <= 0.01
    assert float(deltas.mean()) <= 0.10
