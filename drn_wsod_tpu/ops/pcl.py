"""Proposal Cluster Learning (PCL) as on-device masked tensor ops.

The reference implements PCL with host-side graph clustering (sklearn KMeans
+ IoU-graph greedy centers, projects/WSL/wsl/modeling/roi_heads/third_party/
pcl.py:24-200) feeding a native C++ loss
(wsl/layers/csrc/pcl_loss/pcl_loss_cpu.cpp:36-56), with explicit CPU<->GPU
ping-pong (wsl/layers/pcl_loss.py:23-51).

TPU-native re-formulation (everything stays on device, static shapes),
round-4: validated against a verbatim host port of the reference clustering
(tests/test_pcl.py::test_matches_reference_clustering) and aligned with it
step by step:

  * candidate selection (_get_top_ranking_propoals, pcl.py:61-72): EXACT
    1-D 3-means over each present class' scores. In 1-D every k-means
    optimum partitions the sorted values into contiguous intervals, so the
    global optimum of the objective sklearn's KMeans approximates is found
    by an exhaustive (P+1, P+1) boundary search with prefix sums — fully
    on device, deterministic, no host round-trip. Candidates are the
    members of the top interval, capped at the ``top_k`` highest scores
    (static shape); the reference has no cap, but the "high" 1-D cluster
    is small in practice.
  * graph centers (_get_graph_centers, pcl.py:86-146): greedy max-degree
    selection on the IoU > graph_iou adjacency, with the reference's exact
    semantics: a center's recorded score is the max score among its graph
    neighbors, consumed neighbors leave the pool, the loop stops once <= 5
    candidates remain, and the final centers are the top ``max_centers`` by
    recorded score (not pick order). Chosen centers are deleted from the
    proposal pool for subsequent classes (pcl.py:137-140), threaded through
    a lax.scan over classes.
  * cluster assignment + loss (_get_proposal_clusters + pcl_loss_cpu.cpp):
    proposals with IoU >= fg_iou to their best center form that cluster;
    cluster term -count_k * score_k * log(mean prob of cluster members);
    background term -w_i * log(p_bg) with w_i = matched center score,
    zeroed where max IoU < bg_thresh (the reference's ignore band,
    pcl.py:176-180); normalized by the number of proposals.

Known deviations from the host oracle (quantified in tests/test_pcl.py):
the exact DP can find a strictly better 3-means optimum than sklearn's
best-of-10 k-means++ restarts (in which case the top clusters differ), and
boundary assignment of exactly-equidistant scores can differ.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..structures import boxes as box_ops


class PCLClusters(NamedTuple):
    centers: jnp.ndarray        # (C, M, 4) center boxes per class slot
    center_scores: jnp.ndarray  # (C, M)
    center_valid: jnp.ndarray   # (C, M) bool


def _kmeans3_top_members(scores: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Exact 1-D 3-means over the valid scores; returns the bool membership
    mask of the cluster with the highest center (reference
    _get_top_ranking_propoals, pcl.py:61-72, which calls sklearn KMeans).

    In 1-D, any k-means optimum partitions the SORTED values into contiguous
    intervals, so the global SSE optimum is found exactly by searching the
    two interval boundaries (i, j) over a (P+1, P+1) grid with prefix sums —
    one fused elementwise pass, no Lloyd iterations, no local optima.
    """
    P = scores.shape[0]
    n = jnp.sum(valid)                               # participating scores
    order = jnp.argsort(jnp.where(valid, -scores, jnp.inf))  # desc, invalid last
    xv = jnp.where(valid[order], scores[order], 0.0)
    z = jnp.zeros((1,), scores.dtype)
    p1 = jnp.concatenate([z, jnp.cumsum(xv)])                 # (P+1,)
    p2 = jnp.concatenate([z, jnp.cumsum(xv * xv)])

    def sse(a, b):  # within-SSE of sorted interval [a, b)
        m = jnp.maximum(b - a, 1)
        s = p1[b] - p1[a]
        return p2[b] - p2[a] - s * s / m

    i = jnp.arange(P + 1)[:, None]                   # top cluster = [0, i)
    j = jnp.arange(P + 1)[None, :]                   # mid = [i, j), low = [j, n)
    total = sse(jnp.zeros_like(i), i) + sse(i, j) + \
        sse(j, jnp.broadcast_to(n, j.shape))
    feasible = (i >= 1) & (j >= i + 1) & (j <= n - 1)
    total = jnp.where(feasible, total, jnp.inf)
    best_i = jnp.argmin(total.reshape(-1)) // (P + 1)
    # n < 3: the reference runs k = min(3, n) means — every point its own
    # cluster, the top one is the max score (pcl.py:63,69-71)
    top_count = jnp.where(n >= 3, best_i, jnp.minimum(n, 1))
    members = jnp.zeros((P,), bool).at[order].set(jnp.arange(P) < top_count)
    return members & valid


def _class_graph_centers(scores_c: jnp.ndarray, proposals: jnp.ndarray,
                         pool_mask: jnp.ndarray, iou: jnp.ndarray,
                         top_k: int, max_centers: int, graph_iou: float):
    """Greedy IoU-graph centers for one class (single image), mirroring
    _get_graph_centers (pcl.py:86-146).

    scores_c: (P,); proposals: (P, 4); iou: (P, P) precomputed; pool_mask
    excludes padded slots and centers consumed by earlier classes.
    Returns (centers (M, 4), scores (M,), valid (M,), picked (P,) bool).
    """
    P = scores_c.shape[0]
    top_k = min(top_k, P)
    members = _kmeans3_top_members(scores_c, pool_mask)
    ms = jnp.where(members, scores_c, -jnp.inf)
    top_vals, top_idx = jax.lax.top_k(ms, top_k)             # score desc
    cand_ok = jnp.isfinite(top_vals)
    # reference candidate order is ascending original index (np.where);
    # reorder so degree tie-breaks see the same order
    slot = jnp.where(cand_ok, top_idx, P + jnp.arange(top_k))
    order = jnp.argsort(slot)
    cand_idx = top_idx[order]                                 # (K,)
    cand_ok = cand_ok[order]
    cand_scores = scores_c[cand_idx]

    sub_iou = iou[cand_idx][:, cand_idx]                      # (K, K)
    adj = (sub_iou > graph_iou) & cand_ok[:, None] & cand_ok[None, :]

    def body(carry, _):
        alive, cont = carry
        degree = jnp.sum(adj & alive[None, :], axis=1)
        degree = jnp.where(alive, degree, -1)
        # reference tie-break (argsort[::-1]): max degree, then the LARGEST
        # index — encode both in one argmax key
        key = degree * (top_k + 1) + jnp.arange(top_k)
        center = jnp.argmax(key)
        ok = cont & (degree[center] >= 1)   # alive nodes self-loop: deg >= 1
        member = adj[center] & alive
        score = jnp.max(jnp.where(member, cand_scores, -jnp.inf))
        alive_next = jnp.where(ok, alive & ~member, alive)
        # reference stop rule (pcl.py:119-121): break once <= 5 remain
        cont_next = ok & (jnp.sum(alive_next) > 5)
        return (alive_next, cont_next), (center, ok, score)

    (_, _), (centers_k, ok_k, scores_k) = jax.lax.scan(
        body, (cand_ok, jnp.asarray(True)), None, length=top_k)

    # reference keeps the top max_centers picks BY SCORE (pcl.py:126-129)
    pick_scores = jnp.where(ok_k, scores_k, -jnp.inf)
    sel_vals, sel = jax.lax.top_k(pick_scores, max_centers)
    valid_m = jnp.isfinite(sel_vals)
    centers_p = cand_idx[centers_k[sel]]                      # (M,) in P
    picked = jnp.zeros((P,), bool).at[centers_p].max(valid_m)
    return (proposals[centers_p],
            jnp.where(valid_m, sel_vals, 0.0),
            valid_m,
            picked)


def mine_pcl_clusters(prev_scores: jnp.ndarray, proposals: jnp.ndarray,
                      prop_mask: jnp.ndarray, labels: jnp.ndarray,
                      top_k: int = 32, max_centers: int = 5,
                      graph_iou: float = 0.4) -> PCLClusters:
    """Per-image cluster centers for every class slot (masked by labels).

    Classes are processed sequentially (lax.scan) because the reference
    deletes chosen centers from the proposal pool before mining the next
    class (pcl.py:137-140)."""
    C = prev_scores.shape[1]
    iou = box_ops.pairwise_iou(proposals, proposals)
    eps = 1e-9
    prev_scores = jnp.clip(prev_scores, eps, 1.0 - eps)       # pcl.py:31-35

    def scan_body(consumed, c):
        present = labels[c] > 0.5
        boxes, scores, valid, picked = _class_graph_centers(
            prev_scores[:, c], proposals, prop_mask & ~consumed,
            iou, top_k, max_centers, graph_iou)
        valid = valid & present
        consumed = consumed | (picked & present)
        return consumed, (boxes, scores, valid)

    _, (centers, scores, valid) = jax.lax.scan(
        scan_body, jnp.zeros(prop_mask.shape, bool), jnp.arange(C))
    return PCLClusters(centers=centers,
                       center_scores=jnp.where(valid, scores, 0.0),
                       center_valid=valid)


def pcl_loss(cls_logits: jnp.ndarray, clusters: PCLClusters,
             proposals: jnp.ndarray, prop_mask: jnp.ndarray,
             fg_iou: float = 0.5, bg_thresh: float = 0.1) -> jnp.ndarray:
    """PCL branch loss for one image.

    cls_logits: (P, C+1) with background in column 0 (PCL convention,
    reference fast_rcnn.py:1463-1465). Returns scalar.
    """
    P, C1 = cls_logits.shape
    C, M = clusters.center_valid.shape
    probs = jax.nn.softmax(cls_logits, axis=-1)

    flat_centers = clusters.centers.reshape(C * M, 4)
    flat_valid = clusters.center_valid.reshape(C * M)
    flat_scores = clusters.center_scores.reshape(C * M)
    iou = box_ops.pairwise_iou(flat_centers, proposals)      # (C*M, P)
    iou = jnp.where(flat_valid[:, None], iou, -1.0)
    best = jnp.argmax(iou, axis=0)                           # (P,)
    best_iou = jnp.max(iou, axis=0)
    fg = (best_iou >= fg_iou) & prop_mask

    # background term: -w log p_bg over non-fg proposals; w = matched center
    # score (pcl_loss_cpu.cpp:36-44), zeroed in the ignore band
    # max IoU < bg_thresh (reference _get_proposal_clusters, pcl.py:176-180);
    # plain CE fallback when no centers exist at all
    w = jnp.where(best_iou >= bg_thresh, flat_scores[best], 0.0)
    w = jnp.where(flat_valid.any(), w, 1.0)
    bg_ll = -jnp.log(jnp.clip(probs[:, 0], 1e-9))
    bg_mask = prop_mask & ~fg
    bg_loss = jnp.sum(jnp.where(bg_mask, w * bg_ll, 0.0))

    # foreground cluster terms: -W_k log(mean prob of members for class k),
    # W_k = count_k * score_k (pcl_loss_cpu.cpp:45-52)
    member = (jax.lax.broadcasted_iota(jnp.int32, (C * M, P), 0) ==
              best[None, :]) & fg[None, :]                    # (C*M, P)
    cls_of_center = jax.lax.broadcasted_iota(jnp.int32, (C, M), 0).reshape(-1)
    member_probs = probs[:, 1:][:, cls_of_center].T           # (C*M, P)
    count = jnp.sum(member, axis=1)
    mean_prob = jnp.sum(jnp.where(member, member_probs, 0.0), axis=1) / \
        jnp.maximum(count, 1)
    has_members = (count > 0) & flat_valid
    fg_loss = jnp.sum(jnp.where(
        has_members,
        -count * flat_scores * jnp.log(jnp.clip(mean_prob, 1e-9)), 0.0))

    denom = jnp.maximum(jnp.sum(prop_mask.astype(jnp.float32)), 1.0)
    return (bg_loss + fg_loss) / denom


def pcl_branch_loss(cls_logits: jnp.ndarray, prev_scores: jnp.ndarray,
                    proposals: jnp.ndarray, prop_mask: jnp.ndarray,
                    labels: jnp.ndarray, graph_iou: float = 0.4,
                    max_centers: int = 5) -> jnp.ndarray:
    """Batched PCL loss: mine clusters from previous-branch scores, then
    cluster-supervised CE. All (B, ...) leading dims."""
    def one(cls_l, prev, props, mask, lab):
        clusters = mine_pcl_clusters(prev, props, mask, lab,
                                     max_centers=max_centers,
                                     graph_iou=graph_iou)
        return pcl_loss(cls_l, clusters, props, mask)

    return jnp.mean(jax.vmap(one)(cls_logits, prev_scores, proposals,
                                  prop_mask, labels))
