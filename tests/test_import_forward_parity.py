"""End-to-end imported-weights forward parity vs an independent torch NCHW
re-implementation of the reference stack.

This is the strongest accuracy-parity proxy available without real VOC data
(zero-egress container): fabricate a reference-layout (Detectron2-name)
checkpoint, import it through ``load_reference_weights``, and assert that the
full inference pipeline — image -> preprocess -> backbone -> RoIPool ->
(objectness+1) scaling -> DAN -> WSDDN / OICR heads -> per-proposal scores —
matches a from-scratch torch NCHW implementation of the same math.

Three backbone import paths are covered (round-4: the flagship config loads
WS-R50 bottleneck weights, which previously had no torch cross-check):

  * WS-R18 (BasicBlock; reference resnet_ws.py:32-112)
  * WS-R50 (BottleneckBlock: 1x1 -> 3x3 -> 1x1 + projection shortcuts;
    reference resnet_ws.py:113-240, builder :616-703)
  * VGG16 (biased convs, plain4 stride-1 pool + dilated plain5;
    reference projects/WSL/wsl/modeling/backbone/vgg.py:100-244)

It jointly covers the conv OIHW->HWIO transpose, conv bias import (VGG),
FrozenBN affine import (weight/bias/running_mean/running_var leaf names), the
DAN fc1 input-axis permutation (torch flattens (C, 7, 7), we flatten
(7, 7, C)), and the two-stream / refinement head weights.

Reference layouts: detectron2/checkpoint/c2_model_loading.py:211-313 (names),
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
H = W = 64         # image size; stride 8 -> 8x8 map
P = 12             # proposals (last 2 padded)
K = 3              # OICR refinement branches
EPS = 1e-5

PIXEL_MEAN = (102.9801, 115.9465, 122.7717)

# WS-R50 test width (structure-identical to the flagship, narrower for CPU):
# stem 16ch, res2 out 32 / bottleneck 8, doubling per stage -> res5 out 256.
R50_STEM = 16
R50_RES2_OUT = 32
R50_BC = 8
R50_BLOCKS = [3, 4, 6, 3]


# --------------------------------------------------------------------------
# reference-layout random checkpoint
# --------------------------------------------------------------------------

def _conv_w(rng, o, i, k):
    # half He std: keeps activations O(1) through deep towers so the
    # comparison is not dominated by saturated softmaxes / fp blowup
    std = 0.5 * np.sqrt(2.0 / (i * k * k))
    return (rng.randn(o, i, k, k) * std).astype(np.float32)


def _norm_params(rng, c, prefix, sd):
    sd[f"{prefix}.weight"] = rng.uniform(0.4, 0.8, c).astype(np.float32)
    sd[f"{prefix}.bias"] = (rng.randn(c) * 0.1).astype(np.float32)
    sd[f"{prefix}.running_mean"] = (rng.randn(c) * 0.1).astype(np.float32)
    sd[f"{prefix}.running_var"] = rng.uniform(0.5, 1.5, c).astype(np.float32)


def _stem_sd(rng, sd, out_c):
    in_c = 3
    for i in (1, 2, 3):
        sd[f"backbone.stem.conv{i}.weight"] = _conv_w(rng, out_c, in_c, 3)
        _norm_params(rng, out_c, f"backbone.stem.conv{i}.norm", sd)
        in_c = out_c


def make_backbone_sd_r18(rng):
    """WS-ResNet18-DC5, Detectron2 names. Returns (sd, feature_channels)."""
    sd = {}
    _stem_sd(rng, sd, 64)
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
    return sd, 512


def make_backbone_sd_r50(rng):
    """WS-ResNet50-DC5 (BottleneckBlock), Detectron2 names, narrow width."""
    sd = {}
    _stem_sd(rng, sd, R50_STEM)
    prev = R50_STEM
    out, bc = R50_RES2_OUT, R50_BC
    for stage_i, nblocks in enumerate(R50_BLOCKS):
        name = f"res{stage_i + 2}"
        for b in range(nblocks):
            pre = f"backbone.{name}.{b}"
            sd[f"{pre}.conv1.weight"] = _conv_w(rng, bc, prev, 1)
            _norm_params(rng, bc, f"{pre}.conv1.norm", sd)
            sd[f"{pre}.conv2.weight"] = _conv_w(rng, bc, bc, 3)
            _norm_params(rng, bc, f"{pre}.conv2.norm", sd)
            sd[f"{pre}.conv3.weight"] = _conv_w(rng, out, bc, 1)
            _norm_params(rng, out, f"{pre}.conv3.norm", sd)
            if prev != out:
                sd[f"{pre}.shortcut.weight"] = _conv_w(rng, out, prev, 1)
                _norm_params(rng, out, f"{pre}.shortcut.norm", sd)
            prev = out
        out, bc = out * 2, bc * 2
    return sd, R50_RES2_OUT * 8


def make_backbone_sd_vgg16(rng):
    """VGG16 (biased convs, no norms), Detectron2 names with the
    nn.Sequential stage index: backbone.plain1.0.conv1.weight ..."""
    sd = {}
    stages = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
    prev = 3
    for i, (out, nconv) in enumerate(stages, start=1):
        for j in range(1, nconv + 1):
            pre = f"backbone.plain{i}.0.conv{j}"
            sd[f"{pre}.weight"] = _conv_w(rng, out, prev, 3)
            sd[f"{pre}.bias"] = (rng.randn(out) * 0.05).astype(np.float32)
            prev = out
    return sd, 512


def make_heads_sd(rng, sd, feat_c, refine=True):
    """DAN + WSDDN two-stream (+ optional OICR refinement branches)."""
    d_in = feat_c * 7 * 7
    sd["roi_heads.box_head.fc1.weight"] = (
        rng.randn(DAN, d_in).astype(np.float32) * 0.005)
    sd["roi_heads.box_head.fc1.bias"] = np.full(DAN, 0.1, np.float32)
    sd["roi_heads.box_head.fc2.weight"] = (
        rng.randn(DAN, DAN).astype(np.float32) * 0.02)
    sd["roi_heads.box_head.fc2.bias"] = np.full(DAN, 0.1, np.float32)
    for s in ("cls", "det"):
        sd[f"roi_heads.box_predictor.{s}.weight"] = (
            rng.randn(C_CLS, DAN).astype(np.float32) * 0.02)
        sd[f"roi_heads.box_predictor.{s}.bias"] = (
            rng.randn(C_CLS).astype(np.float32) * 0.01)
    if not refine:
        return
    for k in range(K):
        pre = f"roi_heads.box_refinery.{k}"
        sd[f"{pre}.cls_score.weight"] = (
            rng.randn(C_CLS + 1, DAN).astype(np.float32) * 0.02)
        sd[f"{pre}.cls_score.bias"] = (
            rng.randn(C_CLS + 1).astype(np.float32) * 0.01)
        sd[f"{pre}.bbox_pred.weight"] = (
            rng.randn(C_CLS * 4, DAN).astype(np.float32) * 0.001)
        sd[f"{pre}.bbox_pred.bias"] = np.zeros(C_CLS * 4, np.float32)


def make_state_dict(backbone, refine, seed=0):
    rng = np.random.RandomState(seed)
    gen = {"r18": make_backbone_sd_r18,
           "r50": make_backbone_sd_r50,
           "vgg16": make_backbone_sd_vgg16}[backbone]
    sd, feat_c = gen(rng)
    make_heads_sd(rng, sd, feat_c, refine=refine)
    return sd, feat_c


# --------------------------------------------------------------------------
# independent torch NCHW forward of the reference math
# --------------------------------------------------------------------------

def t(sd, name):
    v = sd[name]
    return v if isinstance(v, torch.Tensor) else torch.from_numpy(v)


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


def _shortcut(x, sd, prefix):
    if f"{prefix}.shortcut.weight" in sd:
        sc = F.conv2d(x, t(sd, f"{prefix}.shortcut.weight"))
        return frozen_bn(sc, sd, f"{prefix}.shortcut.norm")
    return x


def basic_block(x, sd, prefix, dilation=1, pool_stride=None):
    out = conv_bn_relu(x, sd, f"{prefix}.conv1", dilation=dilation)
    out = conv_bn_relu(out, sd, f"{prefix}.conv2", dilation=dilation,
                       relu=False)
    out = F.relu(out + _shortcut(x, sd, prefix))
    if pool_stride is not None:
        out = F.max_pool2d(out, 2, stride=pool_stride)
    return out


def bottleneck_block(x, sd, prefix, dilation=1, pool_stride=None):
    """Reference WS BottleneckBlock (resnet_ws.py:113-240): all convs stride
    1, dilation only on the 3x3, trailing pool on the last stage block."""
    out = conv_bn_relu(x, sd, f"{prefix}.conv1")
    out = conv_bn_relu(out, sd, f"{prefix}.conv2", dilation=dilation)
    out = conv_bn_relu(out, sd, f"{prefix}.conv3", relu=False)
    out = F.relu(out + _shortcut(x, sd, prefix))
    if pool_stride is not None:
        out = F.max_pool2d(out, 2, stride=pool_stride)
    return out


def _torch_stem(img_nchw, sd):
    x = img_nchw - torch.tensor(PIXEL_MEAN)[None, :, None, None]
    for i in (1, 2, 3):
        x = conv_bn_relu(x, sd, f"backbone.stem.conv{i}",
                         stride=2 if i == 1 else 1)
    return F.max_pool2d(x, 2, stride=2)


def torch_backbone_r18(img_nchw, sd):
    """WS-R18-DC5: 3-conv stem + pool, res2 (trailing s2 pool), res3
    (trailing s1 pool), res4/res5 dilation 2 (resnet_ws.py:671-678)."""
    x = _torch_stem(img_nchw, sd)
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


def torch_backbone_r50(img_nchw, sd):
    """WS-R50-DC5: same stage plan as R18 with [3,4,6,3] bottlenecks."""
    x = _torch_stem(img_nchw, sd)
    stage_cfg = [("res2", 3, 1, 2), ("res3", 4, 1, 1),
                 ("res4", 6, 2, None), ("res5", 3, 2, None)]
    for name, nblocks, dil, pool in stage_cfg:
        for b in range(nblocks):
            x = bottleneck_block(
                x, sd, f"backbone.{name}.{b}", dilation=dil,
                pool_stride=pool if b == nblocks - 1 else None)
    return x


def torch_backbone_vgg16(img_nchw, sd):
    """VGG16 (vgg.py:100-244): biased 3x3 convs + ReLU; pools after
    plain1-3 (s2) and plain4 (s1 under CONV5_DILATION=2); plain5 dilated."""
    x = img_nchw - torch.tensor(PIXEL_MEAN)[None, :, None, None]
    stages = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
    for i, (_, nconv) in enumerate(stages, start=1):
        dil = 2 if i == 5 else 1
        for j in range(1, nconv + 1):
            pre = f"backbone.plain{i}.0.conv{j}"
            x = F.conv2d(x, t(sd, f"{pre}.weight"), t(sd, f"{pre}.bias"),
                         padding=dil, dilation=dil)
            x = F.relu(x)
        if i <= 4:
            x = F.max_pool2d(x, 2, stride=1 if i == 4 else 2)
    return x


TORCH_BACKBONES = {"r18": torch_backbone_r18,
                   "r50": torch_backbone_r50,
                   "vgg16": torch_backbone_vgg16}


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

def _cfg(backbone, head):
    cfg = get_cfg()
    if backbone == "r18":
        cfg.MODEL.RESNETS.DEPTH = 18
        cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    elif backbone == "r50":
        cfg.MODEL.RESNETS.DEPTH = 50
        cfg.MODEL.RESNETS.STEM_OUT_CHANNELS = R50_STEM
        cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = R50_RES2_OUT
        cfg.MODEL.RESNETS.WIDTH_PER_GROUP = R50_BC
    else:
        cfg.MODEL.BACKBONE.NAME = "build_vgg_backbone"
        cfg.MODEL.ROI_HEADS.IN_FEATURES = ["plain5"]
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
@pytest.mark.parametrize("backbone,head", [
    ("r18", "WSDDNROIHeads"),
    ("r18", "OICRROIHeads"),
    ("r50", "OICRROIHeads"),     # flagship: oicr_WSR_50_DC5_1x loads R50
    ("r50", "WSDDNROIHeads"),
    ("vgg16", "WSDDNROIHeads"),
    ("vgg16", "OICRROIHeads"),
])
def test_imported_weights_forward_parity(backbone, head, tmp_path):
    refine = head == "OICRROIHeads"
    sd, _ = make_state_dict(backbone, refine=refine)
    path = tmp_path / "ref_model.pkl"
    with open(path, "wb") as f:
        pickle.dump({"model": sd}, f)

    cfg = _cfg(backbone, head)
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
    with torch.no_grad():
        fmap = TORCH_BACKBONES[backbone](img, sd)
        tboxes = torch.from_numpy(np.asarray(batch.proposals)[0])
        pooled = torch_roi_pool(fmap, tboxes, 1.0 / 8)    # (P, C, 7, 7)
        obj = torch.from_numpy(np.asarray(batch.objectness)[0])
        m = torch.from_numpy(
            np.asarray(batch.proposal_mask)[0].astype(np.float32))
        pooled = pooled * ((obj + 1.0) * m)[:, None, None, None]
        pooled_flat = pooled.reshape(P, -1)               # torch (C,7,7) order

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
