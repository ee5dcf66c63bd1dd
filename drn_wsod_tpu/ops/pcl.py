"""Proposal Cluster Learning (PCL) as on-device masked tensor ops.

The reference implements PCL with host-side graph clustering (sklearn KMeans
+ IoU-graph greedy centers, projects/WSL/wsl/third_party/pcl.py:24-200)
feeding a native C++ loss (wsl/layers/csrc/pcl_loss/pcl_loss_cpu.cpp:36-56),
with explicit CPU<->GPU ping-pong (wsl/layers/pcl_loss.py:23-51).

TPU-native re-formulation (everything stays on device, static shapes):
  * candidate selection: instead of KMeans over scores, take the top-K
    scoring proposals of each present class whose score exceeds half the
    class maximum (KMeans with k=3 over 1-D scores selects the same
    "high-score cluster" in practice);
  * graph centers: greedy max-degree selection on the IoU > graph_iou
    adjacency over candidates, unrolled ``max_centers`` times with masking —
    same algorithm as _get_graph_centers, fixed iteration count;
  * cluster assignment + loss: proposals with IoU >= fg_iou to their best
    center form that cluster; cluster term -w_k * log(mean prob of cluster
    members), background term -w_i * log(p_bg); normalized per the
    reference's mean semantics.
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


def _class_graph_centers(scores_c: jnp.ndarray, proposals: jnp.ndarray,
                         prop_mask: jnp.ndarray, iou: jnp.ndarray,
                         top_k: int, max_centers: int, graph_iou: float):
    """Greedy IoU-graph centers for one class (single image).

    scores_c: (P,); proposals: (P, 4); iou: (P, P) precomputed.
    Returns (centers (M, 4), scores (M,), valid (M,)).
    """
    P = scores_c.shape[0]
    top_k = min(top_k, P)
    s = jnp.where(prop_mask, scores_c, -jnp.inf)
    top_vals, top_idx = jax.lax.top_k(s, top_k)
    # keep candidates within half of the class max (the "high" KMeans cluster)
    cand_valid = (top_vals > jnp.maximum(top_vals[0] * 0.5, 0.0)) & \
        jnp.isfinite(top_vals)

    sub_iou = iou[top_idx][:, top_idx]                       # (K, K)
    adj = (sub_iou > graph_iou)

    def body(state, _):
        alive, = state
        degree = jnp.sum(adj & alive[None, :], axis=1)
        degree = jnp.where(alive, degree, -1)
        center = jnp.argmax(degree)
        ok = degree[center] >= 0
        member = adj[center] & alive
        alive_next = jnp.where(ok, alive & ~member & (jnp.arange(top_k) != center),
                               alive)
        return (alive_next,), (center, ok)

    (_,), (centers_k, ok_k) = jax.lax.scan(
        body, (cand_valid,), None, length=max_centers)
    centers_p = top_idx[centers_k]                           # (M,) indices in P
    return (proposals[centers_p],
            jnp.where(ok_k, scores_c[centers_p], 0.0),
            ok_k)


def mine_pcl_clusters(prev_scores: jnp.ndarray, proposals: jnp.ndarray,
                      prop_mask: jnp.ndarray, labels: jnp.ndarray,
                      top_k: int = 32, max_centers: int = 5,
                      graph_iou: float = 0.4) -> PCLClusters:
    """Per-image cluster centers for every class slot (masked by labels)."""
    C = prev_scores.shape[1]
    iou = box_ops.pairwise_iou(proposals, proposals)

    def per_class(c):
        return _class_graph_centers(prev_scores[:, c], proposals, prop_mask,
                                    iou, top_k, max_centers, graph_iou)

    centers, scores, valid = jax.lax.map(per_class, jnp.arange(C))
    valid = valid & (labels > 0.5)[:, None]
    return PCLClusters(centers=centers, center_scores=scores,
                       center_valid=valid)


def pcl_loss(cls_logits: jnp.ndarray, clusters: PCLClusters,
             proposals: jnp.ndarray, prop_mask: jnp.ndarray,
             fg_iou: float = 0.5) -> jnp.ndarray:
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
    # score (reference pcl_loss_cpu.cpp:36-44)
    w = jnp.where(flat_valid.any(), flat_scores[best], 1.0)
    bg_ll = -jnp.log(jnp.clip(probs[:, 0], 1e-9))
    bg_mask = prop_mask & ~fg
    bg_loss = jnp.sum(jnp.where(bg_mask, w * bg_ll, 0.0))

    # foreground cluster terms: -W_k log(mean prob of members for class k)
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
