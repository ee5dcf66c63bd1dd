"""Numerical parity with the reference loss math, checked against an
independent torch implementation of the published formulas (reference:
projects/WSL/wsl/modeling/roi_heads/fast_rcnn.py — WSDDN predictor/BCE and
OICR weighted CE; formulas re-derived here, not ported code)."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from drn_wsod_tpu.models.heads import oicr, wsddn
import pytest

pytestmark = pytest.mark.core


def torch_wsddn(cls_logits, det_logits, labels, mean_loss=True):
    """Two-stream WSDDN scores + image BCE in torch (single image)."""
    scores = F.softmax(cls_logits, dim=1) * F.softmax(det_logits, dim=0)
    img = scores.sum(dim=0, keepdim=True).clamp(1e-6, 1 - 1e-6)
    red = "mean" if mean_loss else "sum"
    loss = F.binary_cross_entropy(img, labels[None], reduction=red) / 1
    return scores, loss


def test_wsddn_scores_and_loss_parity():
    rng = np.random.RandomState(0)
    P, C, D = 24, 20, 16
    feats = rng.randn(P, D).astype(np.float32)
    w_cls = rng.randn(D, C).astype(np.float32) * 0.1
    w_det = rng.randn(D, C).astype(np.float32) * 0.1
    labels = np.zeros(C, dtype=np.float32)
    labels[[2, 7, 11]] = 1.0

    # torch side
    t_scores, t_loss = torch_wsddn(
        torch.from_numpy(feats @ w_cls), torch.from_numpy(feats @ w_det),
        torch.from_numpy(labels))

    # our side: apply the WSDDN layer with the same weights
    layer = wsddn.WSDDNOutputLayers(num_classes=C)
    params = {"params": {"cls": {"kernel": jnp.asarray(w_cls),
                                 "bias": jnp.zeros(C)},
                         "det": {"kernel": jnp.asarray(w_det),
                                 "bias": jnp.zeros(C)}}}
    scores = layer.apply(params, jnp.asarray(feats[None]),
                         jnp.ones((1, P), bool))
    np.testing.assert_allclose(np.asarray(scores[0]), t_scores.numpy(),
                               rtol=2e-4, atol=1e-7)

    loss = wsddn.wsddn_loss(scores, jnp.asarray(labels[None]), mean_loss=True)
    np.testing.assert_allclose(float(loss), float(t_loss), rtol=2e-4)


def torch_oicr_branch(logits, gt_classes, weights):
    """Reference branch loss formula: CE(ignore -1) * w, sum / #(w>1e-12)."""
    loss = F.cross_entropy(logits, gt_classes, reduction="none",
                           ignore_index=-1)
    loss = loss * weights
    valid = (weights > 1e-12).float()
    return loss.sum() / valid.sum()


def test_oicr_branch_loss_parity():
    rng = np.random.RandomState(1)
    P, C1 = 32, 21
    logits = rng.randn(P, C1).astype(np.float32)
    gt = rng.randint(0, C1, P).astype(np.int64)
    gt[:4] = -1
    w = rng.uniform(0, 1, P).astype(np.float32)
    w[gt == -1] = 0.0
    w[10:12] = 0.0

    t_loss = torch_oicr_branch(torch.from_numpy(logits),
                               torch.from_numpy(gt), torch.from_numpy(w))

    targets = oicr.ProposalTargets(
        gt_class=jnp.asarray(gt.astype(np.int32))[None],
        weight=jnp.asarray(w)[None],
        gt_box=jnp.zeros((1, P, 4)))
    loss = oicr.refinement_loss(jnp.asarray(logits)[None], targets)
    np.testing.assert_allclose(float(loss), float(t_loss), rtol=2e-4)


def test_oicr_mining_matches_reference_semantics():
    """get_pgt semantics (roi_heads_oicr.py:491-567): per PRESENT class, the
    argmax proposal; weight = image evidence of the matched class."""
    rng = np.random.RandomState(2)
    P, C = 16, 5
    prev = rng.uniform(0, 1, (P, C)).astype(np.float32)
    boxes = rng.uniform(0, 50, (P, 4)).astype(np.float32)
    boxes[:, 2:] = boxes[:, :2] + rng.uniform(5, 20, (P, 2))
    labels = np.array([1, 0, 1, 0, 1], dtype=np.float32)
    evid = rng.uniform(0.1, 0.9, C).astype(np.float32)

    pgt = oicr.mine_pgt(jnp.asarray(prev), jnp.asarray(boxes),
                        jnp.ones(P, bool), jnp.asarray(labels),
                        jnp.asarray(evid))
    # torch reference computation
    for c in range(C):
        if labels[c] > 0.5:
            idx = int(torch.from_numpy(prev[:, c]).argmax())
            np.testing.assert_allclose(np.asarray(pgt.boxes[c]), boxes[idx])
            np.testing.assert_allclose(float(pgt.weights[c]), evid[c])


def test_box_deltas_match_torch_formula():
    """Box2BoxTransform parity (detectron2/modeling/box_regression.py)."""
    rng = np.random.RandomState(3)
    src = rng.uniform(0, 50, (8, 4)).astype(np.float32)
    src[:, 2:] = src[:, :2] + rng.uniform(5, 30, (8, 2))
    tgt = src + rng.uniform(-3, 3, (8, 4)).astype(np.float32)

    from drn_wsod_tpu.structures import apply_deltas, get_deltas

    wts = (10.0, 10.0, 5.0, 5.0)
    s = torch.from_numpy(src); t = torch.from_numpy(tgt)
    sw = s[:, 2] - s[:, 0]; sh = s[:, 3] - s[:, 1]
    sx = s[:, 0] + 0.5 * sw; sy = s[:, 1] + 0.5 * sh
    tw = t[:, 2] - t[:, 0]; th = t[:, 3] - t[:, 1]
    tx = t[:, 0] + 0.5 * tw; ty = t[:, 1] + 0.5 * th
    t_d = torch.stack([10 * (tx - sx) / sw, 10 * (ty - sy) / sh,
                       5 * torch.log(tw / sw), 5 * torch.log(th / sh)], 1)

    d = get_deltas(jnp.asarray(src), jnp.asarray(tgt), wts)
    np.testing.assert_allclose(np.asarray(d), t_d.numpy(), rtol=1e-4,
                               atol=1e-5)
    rec = apply_deltas(d, jnp.asarray(src), wts)
    np.testing.assert_allclose(np.asarray(rec), tgt, rtol=1e-3, atol=1e-2)


def test_wsddn_oicr_gradient_parity_vs_torch():
    """END-TO-END GRADIENT parity: d(total WSOD loss)/d(head weights) matches
    torch autograd on an independent re-implementation of the reference's
    training objective (WSDDN image BCE + one OICR refinement branch with
    detached mining, reference fast_rcnn.py:317-368, 1128-1144 and
    roi_heads_oicr.py:356-397). Exercises the parity-critical gradient paths
    the loss-value tests don't: masked per-image det-stream softmax, the
    [1e-6, 1-1e-6] clamp, stop-gradient mining weights, and weighted-CE
    normalization. Includes PADDED proposal slots (mask False)."""
    import jax

    from drn_wsod_tpu.models.heads import oicr as oicr_lib

    rng = np.random.RandomState(1)
    P, V, C, D = 32, 24, 20, 16          # P slots, V valid
    feats = rng.randn(P, D).astype(np.float32)
    w_cls = (rng.randn(D, C) * 0.1).astype(np.float32)
    w_det = (rng.randn(D, C) * 0.1).astype(np.float32)
    w_ref = (rng.randn(D, C + 1) * 0.1).astype(np.float32)
    labels = np.zeros(C, dtype=np.float32)
    labels[[3, 8]] = 1.0
    mask = np.zeros(P, bool)
    mask[:V] = True
    x1 = rng.uniform(0, 60, P).astype(np.float32)
    y1 = rng.uniform(0, 60, P).astype(np.float32)
    boxes = np.stack([x1, y1, x1 + rng.uniform(8, 40, P),
                      y1 + rng.uniform(8, 40, P)], -1).astype(np.float32)

    # ---- JAX side: the actual library composition (mirrors meta_arch)
    def jax_loss(params):
        wc, wd, wr = params
        layer = wsddn.WSDDNOutputLayers(num_classes=C)
        p = {"params": {"cls": {"kernel": wc, "bias": jnp.zeros(C)},
                        "det": {"kernel": wd, "bias": jnp.zeros(C)}}}
        scores = layer.apply(p, jnp.asarray(feats)[None],
                             jnp.asarray(mask)[None])      # (1, P, C)
        loss = wsddn.wsddn_loss(scores, jnp.asarray(labels)[None],
                                mean_loss=True)
        ev = jax.lax.stop_gradient(wsddn.image_probs(scores))[0]
        prev = jax.lax.stop_gradient(scores)[0]
        pgt = oicr_lib.mine_pgt(prev, jnp.asarray(boxes), jnp.asarray(mask),
                                jnp.asarray(labels), ev)
        tg = oicr_lib.label_proposals(pgt, jnp.asarray(boxes),
                                      jnp.asarray(mask))
        tg = jax.tree.map(lambda x: x[None], tg)           # batch dim
        logits = (jnp.asarray(feats) @ wr)[None]           # (1, P, C+1)
        return loss + oicr_lib.refinement_loss(logits, tg), tg

    (jl, targets), grads = jax.value_and_grad(jax_loss, has_aux=True)(
        (jnp.asarray(w_cls), jnp.asarray(w_det), jnp.asarray(w_ref)))
    gt_class = np.asarray(targets.gt_class[0] if targets.gt_class.ndim == 2
                          else targets.gt_class)
    weight = np.asarray(targets.weight[0] if targets.weight.ndim == 2
                        else targets.weight)

    # ---- torch side: independent formulas over the VALID rows only,
    # reusing the (integer, gradient-free) mined assignment from above
    tw_cls = torch.tensor(w_cls, requires_grad=True)
    tw_det = torch.tensor(w_det, requires_grad=True)
    tw_ref = torch.tensor(w_ref, requires_grad=True)
    f = torch.from_numpy(feats[:V])
    scores = (F.softmax(f @ tw_cls, dim=1)
              * F.softmax(f @ tw_det, dim=0))               # (V, C)
    img = scores.sum(dim=0, keepdim=True).clamp(1e-6, 1 - 1e-6)
    tl = F.binary_cross_entropy(img, torch.from_numpy(labels)[None],
                                reduction="mean")
    logits = torch.from_numpy(feats) @ tw_ref               # (P, C+1)
    ce = F.cross_entropy(logits, torch.from_numpy(gt_class.copy()).long(),
                         reduction="none", ignore_index=-1)
    w = torch.from_numpy(weight)
    tl = tl + (ce * w).sum() / (w > 1e-12).float().sum()
    tl.backward()

    np.testing.assert_allclose(float(jl), float(tl.detach()), rtol=2e-4)
    for got, want, name in [(grads[0], tw_cls.grad, "w_cls"),
                            (grads[1], tw_det.grad, "w_det"),
                            (grads[2], tw_ref.grad, "w_ref")]:
        np.testing.assert_allclose(np.asarray(got), want.numpy(),
                                   rtol=5e-4, atol=1e-7, err_msg=name)
