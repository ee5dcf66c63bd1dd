"""End-to-end imported-weights forward parity vs an independent torch NCHW
re-implementation of the reference stack.

This is the strongest accuracy-parity proxy available without real VOC data
(zero-egress container): fabricate a reference-layout (Detectron2-name)
checkpoint, import it through ``load_reference_weights``, and assert that the
full inference pipeline — image -> preprocess -> WS-ResNet18-DC5 -> RoIPool ->
(objectness+1) scaling -> DAN -> WSDDN / OICR heads -> per-proposal scores —
matches a from-scratch torch NCHW implementation of the same math.

It jointly covers the conv OIHW->HWIO transpose, FrozenBN affine import
(weight/bias/running_mean/running_var leaf names), the DAN fc1 input-axis
permutation (torch flattens (C, 7, 7), we flatten (7, 7, C)), and the
two-stream / refinement head weights.

Reference layouts: detectron2/checkpoint/c2_model_loading.py:211-313 (names),
projects/WSL/wsl/modeling/backbone/resnet_ws.py (WS-R18 structure),
wsl/modeling/roi_heads/fast_rcnn.py:453-517,1316-1596 (heads).
"""

import pickle

import jax
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from drn_wsod_tpu.checkpoint.torch_import import load_reference_weights
from drn_wsod_tpu.config import get_cfg
from drn_wsod_tpu.models import build_model
from drn_wsod_tpu.structures import WSODBatch

C_CLS = 4          # classes
DAN = 64           # DAN fc width
H = W = 64         # image size; stride 8 -> 8x8 map -> 7x7 after res3 s1 pool
P = 12             # proposals (last 2 padded)
K = 3              # OICR refinement branches
EPS = 1e-5

PIXEL_MEAN = (102.9801, 115.9465, 122.7717)


# --------------------------------------------------------------------------
# reference-layout random checkpoint
# --------------------------------------------------------------------------

def _conv_w(rng, o, i, k):
    # half He std: keeps activations O(1) through 8 residual blocks so the
    # comparison is not dominated by saturated softmaxes / fp blowup
    std = 0.5 * np.sqrt(2.0 / (i * k * k))
    return (rng.randn(o, i, k, k) * std).astype(np.float32)


def _norm_params(rng, c, prefix, sd):
    sd[f"{prefix}.weight"] = rng.uniform(0.4, 0.8, c).astype(np.float32)
    sd[f"{prefix}.bias"] = (rng.randn(c) * 0.1).astype(np.float32)
    sd[f"{prefix}.running_mean"] = (rng.randn(c) * 0.1).astype(np.float32)
    sd[f"{prefix}.running_var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)


def make_state_dict(seed=0):
    """WS-ResNet18-DC5 + DAN + WSDDN + 3 OICR branches, Detectron2 names."""
    rng = np.random.RandomState(seed)
    sd = {}
    # stem: 3 convs at 64ch
    in_c = 3
    for i in (1, 2, 3):
        sd[f"backbone.stem.conv{i}.weight"] = _conv_w(rng, 64, in_c, 3)
        _norm_params(rng, 64, f"backbone.stem.conv{i}.norm", sd)
        in_c = 64
    # stages: (name, out_channels); R18 = 2 BasicBlocks per stage
    stages = [("res2", 64), ("res3", 128), ("res4", 256), ("res5", 512)]
    prev = 64
    for name, out in stages:
        for b in range(2):
            pre = f"backbone.{name}.{b}"
            sd[f"{pre}.conv1.weight"] = _conv_w(rng, out, prev, 3)
            _norm_params(rng, out, f"{pre}.conv1.norm", sd)
            sd[f"{pre}.conv2.weight"] = _conv_w(rng, out, out, 3)
            _norm_params(rng, out, f"{pre}.conv2.norm", sd)
            if prev != out:
                sd[f"{pre}.shortcut.weight"] = _conv_w(rng, out, prev, 1)
                _norm_params(rng, out, f"{pre}.shortcut.norm", sd)
            prev = out
    # DAN: fc1 consumes flattened (C=512, 7, 7) torch-order features
    d_in = 512 * 7 * 7
    sd["roi_heads.box_head.fc1.weight"] = (
        rng.randn(DAN, d_in).astype(np.float32) * 0.005)
    sd["roi_heads.box_head.fc1.bias"] = np.full(DAN, 0.1, np.float32)
    sd["roi_heads.box_head.fc2.weight"] = (
        rng.randn(DAN, DAN).astype(np.float32) * 0.02)
    sd["roi_heads.box_head.fc2.bias"] = np.full(DAN, 0.1, np.float32)
    # WSDDN two streams
    for s in ("cls", "det"):
        sd[f"roi_heads.box_predictor.{s}.weight"] = (
            rng.randn(C_CLS, DAN).astype(np.float32) * 0.02)
        sd[f"roi_heads.box_predictor.{s}.bias"] = (
            rng.randn(C_CLS).astype(np.float32) * 0.01)
    # OICR refinement branches: (C+1)-way cls + box deltas
    for k in range(K):
        pre = f"roi_heads.box_refinery.{k}"
        sd[f"{pre}.cls_score.weight"] = (
            rng.randn(C_CLS + 1, DAN).astype(np.float32) * 0.02)
        sd[f"{pre}.cls_score.bias"] = (
            rng.randn(C_CLS + 1).astype(np.float32) * 0.01)
        sd[f"{pre}.bbox_pred.weight"] = (
            rng.randn(C_CLS * 4, DAN).astype(np.float32) * 0.001)
        sd[f"{pre}.bbox_pred.bias"] = np.zeros(C_CLS * 4, np.float32)
    return sd


# --------------------------------------------------------------------------
# independent torch NCHW forward of the reference math
# --------------------------------------------------------------------------

def t(sd, name):
    return torch.from_numpy(sd[name])


def frozen_bn(x, sd, prefix):
    w, b = t(sd, f"{prefix}.weight"), t(sd, f"{prefix}.bias")
    m, v = t(sd, f"{prefix}.running_mean"), t(sd, f"{prefix}.running_var")
    scale = w / torch.sqrt(v + EPS)
    shift = b - m * scale
    return x * scale[None, :, None, None] + shift[None, :, None, None]


def conv_bn_relu(x, sd, prefix, stride=1, dilation=1, relu=True):
    w = t(sd, f"{prefix}.weight")
    pad = dilation * (w.shape[-1] // 2)
    x = F.conv2d(x, w, stride=stride, padding=pad, dilation=dilation)
    x = frozen_bn(x, sd, f"{prefix}.norm")
    return F.relu(x) if relu else x


def basic_block(x, sd, prefix, dilation=1, pool_stride=None):
    out = conv_bn_relu(x, sd, f"{prefix}.conv1", dilation=dilation)
    out = conv_bn_relu(out, sd, f"{prefix}.conv2", dilation=dilation,
                       relu=False)
    if f"{prefix}.shortcut.weight" in sd:
        sc = F.conv2d(x, t(sd, f"{prefix}.shortcut.weight"))
        sc = frozen_bn(sc, sd, f"{prefix}.shortcut.norm")
    else:
        sc = x
    out = F.relu(out + sc)
    if pool_stride is not None:
        out = F.max_pool2d(out, 2, stride=pool_stride)
    return out


def torch_backbone(img_nchw, sd):
    """WS-R18-DC5: 3-conv stem + pool, res2 (trailing s2 pool), res3
    (trailing s1 pool), res4/res5 dilation 2 (resnet_ws.py:671-678)."""
    x = img_nchw - torch.tensor(PIXEL_MEAN)[None, :, None, None]
    for i in (1, 2, 3):
        x = conv_bn_relu(x, sd, f"backbone.stem.conv{i}",
                         stride=2 if i == 1 else 1)
    x = F.max_pool2d(x, 2, stride=2)
    for b in range(2):
        x = basic_block(x, sd, f"backbone.res2.{b}",
                        pool_stride=2 if b == 1 else None)
    for b in range(2):
        x = basic_block(x, sd, f"backbone.res3.{b}",
                        pool_stride=1 if b == 1 else None)
    for b in range(2):
        x = basic_block(x, sd, f"backbone.res4.{b}", dilation=2)
    for b in range(2):
        x = basic_block(x, sd, f"backbone.res5.{b}", dilation=2)
    return x


def torch_roi_pool(fmap, boxes, scale, R=7):
    """Reference RoIPool (quantized bins, max; torchvision semantics)."""
    _, C, Hf, Wf = fmap.shape
    out = torch.zeros(boxes.shape[0], C, R, R)
    for n, box in enumerate(boxes):
        x1, y1, x2, y2 = [int(round(float(v) * scale)) for v in box]
        rw = max(x2 - x1 + 1, 1)
        rh = max(y2 - y1 + 1, 1)
        for ph in range(R):
            hs = min(max(ph * rh // R + y1, 0), Hf)
            he = min(max(-((-(ph + 1) * rh) // R) + y1, 0), Hf)
            for pw in range(R):
                ws = min(max(pw * rw // R + x1, 0), Wf)
                we = min(max(-((-(pw + 1) * rw) // R) + x1, 0), Wf)
                if he > hs and we > ws:
                    out[n, :, ph, pw] = fmap[
                        0, :, hs:he, ws:we].amax(dim=(1, 2))
    return out


def torch_heads(pooled_flat, sd, head):
    """DAN (eval mode: no dropout) + WSDDN / OICR scores."""
    x = F.relu(F.linear(pooled_flat, t(sd, "roi_heads.box_head.fc1.weight"),
                        t(sd, "roi_heads.box_head.fc1.bias")))
    x = F.relu(F.linear(x, t(sd, "roi_heads.box_head.fc2.weight"),
                        t(sd, "roi_heads.box_head.fc2.bias")))
    if head == "WSDDN":
        cls = F.linear(x, t(sd, "roi_heads.box_predictor.cls.weight"),
                       t(sd, "roi_heads.box_predictor.cls.bias"))
        det = F.linear(x, t(sd, "roi_heads.box_predictor.det.weight"),
                       t(sd, "roi_heads.box_predictor.det.bias"))
        return cls, det
    probs = []
    for k in range(K):
        logits = F.linear(x, t(sd, f"roi_heads.box_refinery.{k}.cls_score.weight"),
                          t(sd, f"roi_heads.box_refinery.{k}.cls_score.bias"))
        probs.append(F.softmax(logits, dim=-1))
    return torch.stack(probs).mean(0)


# --------------------------------------------------------------------------
# the test
# --------------------------------------------------------------------------

def _cfg(head):
    cfg = get_cfg()
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.ROI_HEADS.NAME = head
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = C_CLS
    cfg.MODEL.ROI_BOX_HEAD.DAN_DIM = [DAN, DAN]
    cfg.MODEL.DTYPE = "float32"
    return cfg


def _batch(seed=1):
    rng = np.random.RandomState(seed)
    img = rng.uniform(0, 255, (1, H, W, 3)).astype(np.float32)
    x1 = rng.uniform(0, W - 16, P)
    y1 = rng.uniform(0, H - 16, P)
    x2 = np.minimum(x1 + rng.uniform(8, W, P), W - 1)
    y2 = np.minimum(y1 + rng.uniform(8, H, P), H - 1)
    proposals = np.stack([x1, y1, x2, y2], -1).astype(np.float32)
    mask = np.ones((1, P), bool)
    mask[:, -2:] = False
    objectness = rng.uniform(0, 1, (1, P)).astype(np.float32)
    labels = np.zeros((1, C_CLS), np.float32)
    labels[0, :2] = 1
    return WSODBatch(
        image=img, image_hw=np.full((1, 2), H, np.int32),
        orig_hw=np.full((1, 2), H, np.int32),
        proposals=proposals[None], proposal_mask=mask,
        objectness=objectness, labels=labels,
        image_id=np.zeros(1, np.int32),
        gt_boxes=np.zeros((1, 4, 4), np.float32),
        gt_classes=np.zeros((1, 4), np.int32),
        gt_valid=np.zeros((1, 4), bool))


@pytest.mark.slow
@pytest.mark.parametrize("head", ["WSDDNROIHeads", "OICRROIHeads"])
def test_imported_weights_forward_parity(head, tmp_path):
    sd = make_state_dict()
    if head == "WSDDNROIHeads":
        # pure WSDDN carries no refinement branches
        sd = {k: v for k, v in sd.items() if "box_refinery" not in k}
    path = tmp_path / "ref_model.pkl"
    with open(path, "wb") as f:
        pickle.dump({"model": sd}, f)

    cfg = _cfg(head)
    model = build_model(cfg)
    batch = _batch()
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           batch, train=True)
    variables = load_reference_weights(str(path), variables)

    # every checkpoint tensor must have landed in the param tree (and the
    # model must have no extra params the checkpoint doesn't cover)
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    assert len(flat) == len(sd), (len(flat), len(sd))

    scores, boxes = model.apply(variables, batch, method="inference_scores")
    scores = np.asarray(scores)[0]                       # (P, C+1)

    # --- independent torch pipeline ---
    img = torch.from_numpy(np.asarray(batch.image)).permute(0, 3, 1, 2)
    fmap = torch_backbone(img, sd)
    assert fmap.shape[1] == 512
    tboxes = torch.from_numpy(np.asarray(batch.proposals)[0])
    pooled = torch_roi_pool(fmap, tboxes, 1.0 / 8)        # (P, C, 7, 7)
    obj = torch.from_numpy(np.asarray(batch.objectness)[0])
    m = torch.from_numpy(np.asarray(batch.proposal_mask)[0].astype(np.float32))
    pooled = pooled * ((obj + 1.0) * m)[:, None, None, None]
    pooled_flat = pooled.reshape(P, -1)                  # torch (C,7,7) order

    if head == "WSDDNROIHeads":
        cls, det = torch_heads(pooled_flat, sd, "WSDDN")
        cls_sm = F.softmax(cls, dim=1)
        det_masked = det.masked_fill(m[:, None] == 0, float("-inf"))
        det_sm = F.softmax(det_masked, dim=0) * m[:, None]
        want = (cls_sm * det_sm).numpy()
        got = scores[:, :C_CLS]
        np.testing.assert_allclose(scores[:, C_CLS], 0.0)  # bg column
    else:
        want = torch_heads(pooled_flat, sd, "OICR").numpy()
        want = want * m[:, None].numpy()
        got = scores

    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-5)
    # sanity: the comparison is not vacuous (scores have real mass)
    assert want.max() > 1e-3
    # valid slots only: padded proposal slots are zeroed at model entry
    # (inf/NaN poisoning guard), so they intentionally differ from the
    # raw batch.proposals content
    valid = np.asarray(batch.proposal_mask)[0]
    np.testing.assert_allclose(np.asarray(boxes)[0][valid],
                               np.asarray(batch.proposals)[0][valid],
                               atol=1e-4)
