"""Full-model multi-step TRAINING-TRAJECTORY parity vs torch.

The strongest composition check available without real VOC data: train the
REAL model (WS-R18 backbone -> exact RoIPool -> (objectness+1) scaling ->
DAN -> WSDDN + K OICR refinement branches) for ~20 steps from an imported
reference-layout checkpoint, with every reference solver semantic active
(SGD+momentum, BIAS_LR_FACTOR 2, WEIGHT_DECAY_BIAS 0, warmup-multistep LR,
ITER_SIZE=2, FREEZE_AT=2), against a faithful torch re-implementation of
the same math, and assert per-step losses and FINAL PARAMETERS match.

This catches composition/layout bugs no head-level or solver-level parity
test can: a silently transposed import, a wrong flatten order feeding fc1's
gradient, mining drifting on the wrong branch's detached scores, frozen
groups receiving updates, or accumulation interacting badly with warmup.

Reference semantics: projects/WSL/tools/train_net.py:65-117 (loss/iter_size
backward each iter, optimizer.step every iter_size iters, scheduler.step
every iter), detectron2/solver/build.py:94-160 (param groups),
projects/WSL/wsl/modeling/roi_heads/roi_heads_oicr.py:491-567 (mining),
fast_rcnn.py:317-368 + 1128-1240 (losses).

The torch oracle reuses the reference-layout fabricated checkpoint and the
NCHW forward helpers of tests/test_import_forward_parity.py, promoted to
trainable tensors; the final-parameter comparison round-trips the torch
result through ``load_reference_weights`` so every layout permutation the
importer performs is covered by the same equality check.
"""

import pickle
from bisect import bisect_right

import jax
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from drn_wsod_tpu.checkpoint.torch_import import load_reference_weights
from drn_wsod_tpu.config import get_cfg
from drn_wsod_tpu.engine import create_train_state, make_train_step
from drn_wsod_tpu.models import build_model
from drn_wsod_tpu.solver import build_optimizer
from drn_wsod_tpu.structures import WSODBatch

from test_import_forward_parity import (
    C_CLS, DAN, H, W, K, make_state_dict, t, torch_backbone_r18,
    torch_roi_pool)

P = 14            # proposal slots (last 2 padded)
N_STEPS = 20
ITER_SIZE = 2
BASE_LR = 5e-3
MOMENTUM = 0.9
WD = 1e-4
BIAS_LR_FACTOR = 2.0
WARMUP_ITERS = 5
WARMUP_FACTOR = 1.0 / 100
LR_STEPS = (12,)
GAMMA = 0.1
FREEZE_AT = 2     # stem + res2 frozen, res3..res5 + heads train
FG_IOU = 0.5


# --------------------------------------------------------------------------
# data: a fixed sequence of N_STEPS single-image batches
# --------------------------------------------------------------------------

def _make_batches(seed=11):
    rng = np.random.RandomState(seed)
    batches = []
    for _ in range(N_STEPS):
        img = rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32)
        x1 = rng.uniform(0, W - 20, P)
        y1 = rng.uniform(0, H - 20, P)
        x2 = np.minimum(x1 + rng.uniform(10, W, P), W - 1)
        y2 = np.minimum(y1 + rng.uniform(10, H, P), H - 1)
        proposals = np.stack([x1, y1, x2, y2], -1).astype(np.float32)
        mask = np.ones((1, P), bool)
        mask[:, -2:] = False
        objectness = rng.uniform(0, 1, (1, P)).astype(np.float32)
        labels = np.zeros((1, C_CLS), np.float32)
        labels[0, rng.choice(C_CLS, 2, replace=False)] = 1
        batches.append(WSODBatch(
            image=img, image_hw=np.full((1, 2), H, np.int32),
            orig_hw=np.full((1, 2), H, np.int32),
            proposals=proposals[None], proposal_mask=mask,
            objectness=objectness, labels=labels,
            image_id=np.zeros(1, np.int32),
            gt_boxes=np.zeros((1, 4, 4), np.float32),
            gt_classes=np.zeros((1, 4), np.int32),
            gt_valid=np.zeros((1, 4), bool)))
    return batches


def _lr_factor(it):
    """WarmupMultiStepLR factor at iteration it (lr_scheduler.py:16-116)."""
    if it < WARMUP_ITERS:
        alpha = it / WARMUP_ITERS
        warm = WARMUP_FACTOR * (1 - alpha) + alpha
    else:
        warm = 1.0
    return warm * GAMMA ** bisect_right(list(LR_STEPS), it)


# --------------------------------------------------------------------------
# our side
# --------------------------------------------------------------------------

def _cfg(refine_reg):
    cfg = get_cfg()
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.BACKBONE.FREEZE_AT = FREEZE_AT
    cfg.MODEL.ROI_HEADS.NAME = "OICRROIHeads"
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = C_CLS
    cfg.MODEL.ROI_BOX_HEAD.DAN_DIM = [DAN, DAN]
    cfg.MODEL.ROI_BOX_HEAD.DROPOUT = 0.0
    cfg.MODEL.DTYPE = "float32"
    cfg.WSL.REFINE_NUM = K
    cfg.WSL.REFINE_REG = [refine_reg] * K
    cfg.SOLVER.BASE_LR = BASE_LR
    cfg.SOLVER.MOMENTUM = MOMENTUM
    cfg.SOLVER.WEIGHT_DECAY = WD
    cfg.SOLVER.WEIGHT_DECAY_BIAS = 0.0
    cfg.SOLVER.BIAS_LR_FACTOR = BIAS_LR_FACTOR
    cfg.SOLVER.WARMUP_ITERS = WARMUP_ITERS
    cfg.SOLVER.WARMUP_FACTOR = WARMUP_FACTOR
    cfg.SOLVER.STEPS = LR_STEPS
    cfg.SOLVER.GAMMA = GAMMA
    cfg.WSL.ITER_SIZE = ITER_SIZE
    return cfg


def _run_ours(sd_path, batches, refine_reg):
    cfg = _cfg(refine_reg)
    model = build_model(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           batches[0], train=True)
    variables = load_reference_weights(str(sd_path), variables)
    tx = build_optimizer(cfg, variables)
    state = create_train_state(variables, tx)
    step = jax.jit(make_train_step(model, tx))
    rng = jax.random.PRNGKey(0)
    losses = []
    for b in batches:
        state, metrics = step(state, b, rng)
        losses.append({k: float(v) for k, v in metrics.items()})
    return losses, jax.device_get(state.params)


# --------------------------------------------------------------------------
# torch side: trainable reference-layout tensors + functional forward
# --------------------------------------------------------------------------

_FROZEN_SUFFIXES = (".running_mean", ".running_var")


def _is_trainable(name):
    """Reference trainability: FrozenBN stats+affine never train; stem/res2
    frozen at FREEZE_AT=2 (resnet_ws.py:530-552); everything else trains."""
    if name.endswith(_FROZEN_SUFFIXES) or ".norm." in name:
        return False
    for stage in ("backbone.stem.", "backbone.res2."):
        if name.startswith(stage):
            return False
    return True


def _np_iou(a, b):
    area_a = (a[:, 2] - a[:, 0]).clamp(min=0) * (a[:, 3] - a[:, 1]).clamp(min=0)
    area_b = (b[:, 2] - b[:, 0]).clamp(min=0) * (b[:, 3] - b[:, 1]).clamp(min=0)
    lt = torch.maximum(a[:, None, :2], b[None, :, :2])
    rb = torch.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return torch.where(union > 0, inter / union.clamp(min=1e-12),
                       torch.zeros(()))


def _torch_mine_and_label(prev_scores, boxes, mask, labels, evidence):
    """mine_pgt + label_proposals mirror (roi_heads_oicr.py:491-567 +
    detectron2 Matcher, thresholds [0.5], labels [0, 1]); all detached."""
    C = prev_scores.shape[1]
    masked = torch.where(mask[:, None] > 0, prev_scores,
                         torch.tensor(float("-inf")))
    seed = masked.argmax(0)                              # (C,)
    pgt_boxes = boxes[seed]                              # (C, 4)
    valid = labels > 0.5
    iou = _np_iou(pgt_boxes, boxes)                      # (C, P)
    q = torch.where(valid[:, None], iou, torch.tensor(-1.0))
    mval, midx = q.max(0)
    gt_class = torch.where(mval >= FG_IOU, midx, torch.tensor(C))
    gt_class = torch.where(mask > 0, gt_class, torch.tensor(-1))
    w = evidence[midx]
    w = torch.where(gt_class >= 0, w, torch.zeros(()))
    return gt_class, w, pgt_boxes[midx]


def _torch_get_deltas(src, tgt, wts=(10.0, 10.0, 5.0, 5.0)):
    sw = src[:, 2] - src[:, 0]
    sh = src[:, 3] - src[:, 1]
    sx = src[:, 0] + 0.5 * sw
    sy = src[:, 1] + 0.5 * sh
    tw = tgt[:, 2] - tgt[:, 0]
    th = tgt[:, 3] - tgt[:, 1]
    tx = tgt[:, 0] + 0.5 * tw
    ty = tgt[:, 1] + 0.5 * th
    return torch.stack([wts[0] * (tx - sx) / sw, wts[1] * (ty - sy) / sh,
                        wts[2] * torch.log(tw / sw),
                        wts[3] * torch.log(th / sh)], 1)


def _torch_losses(sd, batch, refine_reg):
    """One full training forward returning the loss dict (torch autograd)."""
    img = torch.from_numpy(np.asarray(batch.image)).permute(0, 3, 1, 2)
    fmap = torch_backbone_r18(img, sd)
    boxes = torch.from_numpy(np.asarray(batch.proposals)[0])
    mask = torch.from_numpy(
        np.asarray(batch.proposal_mask)[0].astype(np.float32))
    labels = torch.from_numpy(np.asarray(batch.labels)[0])
    obj = torch.from_numpy(np.asarray(batch.objectness)[0])

    pooled = torch_roi_pool(fmap, boxes, 1.0 / 8)        # (P, C, 7, 7)
    pooled = pooled * ((obj + 1.0) * mask)[:, None, None, None]
    x = pooled.reshape(P, -1)
    x = F.relu(F.linear(x, t(sd, "roi_heads.box_head.fc1.weight"),
                        t(sd, "roi_heads.box_head.fc1.bias")))
    x = F.relu(F.linear(x, t(sd, "roi_heads.box_head.fc2.weight"),
                        t(sd, "roi_heads.box_head.fc2.bias")))

    cls = F.linear(x, t(sd, "roi_heads.box_predictor.cls.weight"),
                   t(sd, "roi_heads.box_predictor.cls.bias"))
    det = F.linear(x, t(sd, "roi_heads.box_predictor.det.weight"),
                   t(sd, "roi_heads.box_predictor.det.bias"))
    cls_sm = F.softmax(cls, dim=1)
    det_sm = F.softmax(det.masked_fill(mask[:, None] == 0, float("-inf")),
                       dim=0) * mask[:, None]
    scores = cls_sm * det_sm                             # (P, C)
    img_p = scores.sum(0).clamp(1e-6, 1 - 1e-6)
    losses = {"loss_cls": F.binary_cross_entropy(img_p, labels,
                                                 reduction="mean")}

    evidence = img_p.detach()
    prev = scores.detach()
    for k in range(K):
        logits = F.linear(
            x, t(sd, f"roi_heads.box_refinery.{k}.cls_score.weight"),
            t(sd, f"roi_heads.box_refinery.{k}.cls_score.bias"))
        gt_class, w, gt_box = _torch_mine_and_label(
            prev, boxes, mask, labels, evidence)
        ce = F.cross_entropy(logits, gt_class.long(), reduction="none",
                             ignore_index=-1)
        losses[f"loss_cls_r{k}"] = (ce * w).sum() / (w > 1e-12).float().sum()
        if refine_reg:
            deltas = F.linear(
                x, t(sd, f"roi_heads.box_refinery.{k}.bbox_pred.weight"),
                t(sd, f"roi_heads.box_refinery.{k}.bbox_pred.bias"))
            gt_d = _torch_get_deltas(boxes, gt_box)
            d = deltas.reshape(P, C_CLS, 4)
            idx = gt_class.clamp(0, C_CLS - 1)
            pred = d[torch.arange(P), idx]
            fg = ((gt_class >= 0) & (gt_class < C_CLS)).float()
            l1 = (pred - gt_d).abs() * fg[:, None]
            losses[f"loss_box_reg_r{k}"] = l1.sum() / mask.sum().clamp(min=1)
        prev = F.softmax(logits, dim=-1)[:, :C_CLS].detach()
    return losses


def _run_torch(sd_np, batches, refine_reg):
    sd = {k: torch.tensor(v, requires_grad=_is_trainable(k))
          for k, v in sd_np.items()}
    weights = [v for k, v in sd.items()
               if _is_trainable(k) and not k.endswith(".bias")]
    biases = [v for k, v in sd.items()
              if _is_trainable(k) and k.endswith(".bias")]
    opt = torch.optim.SGD(
        [{"params": weights, "lr": BASE_LR, "weight_decay": WD},
         {"params": biases, "lr": BASE_LR * BIAS_LR_FACTOR,
          "weight_decay": 0.0}],
        lr=BASE_LR, momentum=MOMENTUM)
    base_lrs = [BASE_LR, BASE_LR * BIAS_LR_FACTOR]

    per_step = []
    for it, batch in enumerate(batches):
        for g, bl in zip(opt.param_groups, base_lrs):
            g["lr"] = bl * _lr_factor(it)
        losses = _torch_losses(sd, batch, refine_reg)
        per_step.append({k: float(v.detach()) for k, v in losses.items()})
        total = sum(losses.values())
        (total / ITER_SIZE).backward()
        if (it + 1) % ITER_SIZE == 0:
            opt.step()
            opt.zero_grad()
    final = {k: v.detach().numpy() for k, v in sd.items()}
    return per_step, final


# --------------------------------------------------------------------------
# the test
# --------------------------------------------------------------------------

@pytest.mark.slow
@pytest.mark.parametrize("refine_reg", [False, True])
def test_full_model_training_trajectory_matches_torch(refine_reg, tmp_path):
    sd_np, _ = make_state_dict("r18", refine=True)
    path = tmp_path / "ref_model.pkl"
    with open(path, "wb") as f:
        pickle.dump({"model": sd_np}, f)

    batches = _make_batches()
    ours_losses, ours_params = _run_ours(path, batches, refine_reg)
    ref_losses, ref_final = _run_torch(sd_np, batches, refine_reg)

    # per-step loss parity, every key, all N_STEPS steps
    for it, (got, want) in enumerate(zip(ours_losses, ref_losses)):
        for key, wv in want.items():
            np.testing.assert_allclose(
                got[key], wv, rtol=5e-3, atol=1e-5,
                err_msg=f"step {it} loss {key}")

    # the trajectory moved (training actually happened, warmup crossed,
    # one LR drop crossed)
    assert ref_losses[-1]["loss_cls"] != ref_losses[0]["loss_cls"]

    # final-parameter parity: round-trip the torch result through the
    # importer so both sides live in the same (jax) layout, then compare
    # the whole tree leaf by leaf
    fin_path = tmp_path / "ref_final.pkl"
    with open(fin_path, "wb") as f:
        pickle.dump({"model": ref_final}, f)
    want_params = load_reference_weights(str(fin_path), ours_params)

    flat_got = jax.tree_util.tree_leaves_with_path(ours_params["params"])
    flat_want = dict(jax.tree_util.tree_flatten_with_path(
        want_params["params"])[0])
    assert len(flat_got) == len(flat_want)
    for keypath, got in flat_got:
        name = jax.tree_util.keystr(keypath)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(flat_want[keypath]),
            rtol=5e-3, atol=2e-6, err_msg=name)
