"""Model builder + registries.

Equivalent of the reference registries/builder
(detectron2/modeling/meta_arch/build.py, detectron2/utils/registry.py):
string-keyed component registries so YAML configs name backbones and heads.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp

from ..config import CfgNode
from .backbones import (build_resnet_backbone, build_vgg_backbone,
                        build_ws_resnet_backbone)
from .backbones.fpn import build_resnet_fpn_backbone
from .meta_arch import GeneralizedRCNNWSL


class Registry:
    """Minimal string -> callable registry (reference detectron2/utils/
    registry.py)."""

    def __init__(self, name: str):
        self._name = name
        self._map: Dict[str, Callable] = {}

    def register(self, name: str | None = None):
        def deco(fn, key=name):
            key = key or fn.__name__
            assert key not in self._map, f"{key} already in {self._name}"
            self._map[key] = fn
            return fn
        return deco

    def get(self, name: str) -> Callable:
        if name not in self._map:
            raise KeyError(f"{name} not found in {self._name} registry; "
                           f"available: {sorted(self._map)}")
        return self._map[name]

    def __contains__(self, name: str) -> bool:
        return name in self._map


BACKBONE_REGISTRY = Registry("BACKBONE")
META_ARCH_REGISTRY = Registry("META_ARCH")

BACKBONE_REGISTRY.register("build_resnet_backbone")(build_resnet_backbone)
BACKBONE_REGISTRY.register("build_ws_resnet_backbone")(build_ws_resnet_backbone)
BACKBONE_REGISTRY.register("build_vgg_backbone")(build_vgg_backbone)
BACKBONE_REGISTRY.register("build_resnet_fpn_backbone")(build_resnet_fpn_backbone)

_HEAD_TYPES = {
    "WSDDNROIHeads": "WSDDN",
    "OICRROIHeads": "OICR",
    "PCLROIHeads": "PCL",
    "CSCROIHeads": "CSC",
    # CSC-weighted image loss + OICR refinement branches (reference
    # csc_oicr_* configs, wsl/modeling/roi_heads/roi_heads_csc.py)
    "CSCOICRROIHeads": "OICR",
    "WSJDSROIHeads": "CSC",   # CSC machinery + semantic seg branch
    # supervised heads (pseudo-GT retraining): both d2 names map to the same
    # fixed-shape FastRCNN path here
    "StandardROIHeads": "FastRCNN",
    "Res5ROIHeads": "FastRCNN",
    "CascadeROIHeads": "CascadeRCNN",
}


# heads whose training step computes CPG maps by backprop-to-image: the
# trainer selects the CSC step for these, and the pooler must stay
# differentiable (Pallas kernel is forward-only)
CSC_HEAD_NAMES = frozenset(
    {"CSCROIHeads", "CSCOICRROIHeads", "WSJDSROIHeads"})


@META_ARCH_REGISTRY.register("GeneralizedRCNNWSL")
def _build_rcnn_wsl(cfg: CfgNode) -> GeneralizedRCNNWSL:
    backbone, strides, channels = BACKBONE_REGISTRY.get(cfg.MODEL.BACKBONE.NAME)(cfg)
    in_features = list(cfg.MODEL.ROI_HEADS.IN_FEATURES)
    feature_name = in_features[0]
    pyramid = (tuple((f, strides[f]) for f in in_features)
               if len(in_features) > 1 else None)
    head_name = cfg.MODEL.ROI_HEADS.NAME
    if head_name not in _HEAD_TYPES:
        raise KeyError(f"Unknown ROI head {head_name}")

    refine_reg = tuple(cfg.WSL.REFINE_REG)
    refine_k = cfg.WSL.REFINE_NUM
    if _HEAD_TYPES[head_name] in ("WSDDN", "CSC", "FastRCNN", "CascadeRCNN"):
        # Pure WSDDN / CSC heads carry no refinement branches (the reference
        # csc_oicr variant combines them; configure via OICRROIHeads there).
        refine_k = 0
    if len(refine_reg) < refine_k:
        refine_reg = refine_reg + (False,) * (refine_k - len(refine_reg))

    return GeneralizedRCNNWSL(
        backbone=backbone,
        feature_name=feature_name,
        feature_stride=strides[feature_name],
        pyramid_strides=pyramid,
        num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
        head_type=_HEAD_TYPES[head_name],
        refine_k=refine_k,
        refine_reg=refine_reg[:refine_k],
        pooler_type=cfg.MODEL.ROI_BOX_HEAD.POOLER_TYPE,
        pooler_resolution=cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION,
        pooler_sampling_ratio=cfg.MODEL.ROI_BOX_HEAD.POOLER_SAMPLING_RATIO or 2,
        # CSC backprops image gradients THROUGH the pooler (CPG maps), and a
        # trainable backbone (FREEZE_AT < 5) needs feature gradients through
        # it too; the Pallas kernel is forward-only — use the differentiable
        # gather formulation in both cases.
        use_pallas_pooler=(cfg.MODEL.ROI_BOX_HEAD.USE_PALLAS_POOLER
                           and head_name not in CSC_HEAD_NAMES
                           and cfg.MODEL.BACKBONE.FREEZE_AT >= 5),
        dan_dims=tuple(cfg.MODEL.ROI_BOX_HEAD.DAN_DIM),
        dropout=cfg.MODEL.ROI_BOX_HEAD.DROPOUT,
        mean_loss=cfg.WSL.MEAN_LOSS,
        use_objectness=cfg.WSL.USE_OBN,
        cls_agnostic_bbox_reg=cfg.MODEL.ROI_BOX_HEAD.CLS_AGNOSTIC_BBOX_REG,
        reg_weights=tuple(cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS),
        cascade_ious=tuple(cfg.MODEL.ROI_BOX_CASCADE_HEAD.IOUS),
        cascade_reg_weights=tuple(
            tuple(w) for w in cfg.MODEL.ROI_BOX_CASCADE_HEAD.BBOX_REG_WEIGHTS),
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        pixel_std=tuple(cfg.MODEL.PIXEL_STD),
        freeze_backbone=cfg.MODEL.BACKBONE.FREEZE_AT >= 5,
        with_seg=head_name == "WSJDSROIHeads",
        seg_constraint=(head_name == "WSJDSROIHeads"
                        and cfg.MODEL.SEM_SEG_HEAD.CONSTRAINT),
        mask_on=cfg.MODEL.MASK_ON,
        mask_pooler_resolution=cfg.MODEL.ROI_MASK_HEAD.POOLER_RESOLUTION,
        keypoint_on=cfg.MODEL.KEYPOINT_ON,
        num_keypoints=cfg.MODEL.ROI_KEYPOINT_HEAD.NUM_KEYPOINTS,
        keypoint_pooler_resolution=cfg.MODEL.ROI_KEYPOINT_HEAD.POOLER_RESOLUTION,
        dtype=jnp.bfloat16 if cfg.MODEL.DTYPE == "bfloat16" else jnp.float32,
    )


@META_ARCH_REGISTRY.register("RetinaNet")
def _build_retinanet(cfg: CfgNode):
    from .retinanet import RetinaNet

    backbone, strides, _ = BACKBONE_REGISTRY.get(cfg.MODEL.BACKBONE.NAME)(cfg)
    r = cfg.MODEL.RETINANET
    in_features = tuple(r.IN_FEATURES)
    sizes = tuple(tuple(float(x) for x in s)
                  for s in cfg.MODEL.ANCHOR_GENERATOR.SIZES)
    assert len(sizes) == len(in_features), \
        "ANCHOR_GENERATOR.SIZES must list one size group per IN_FEATURE"
    return RetinaNet(
        backbone=backbone,
        in_features=in_features,
        strides=tuple(int(strides[f]) for f in in_features),
        anchor_sizes=sizes,
        aspect_ratios=tuple(
            float(a) for a in cfg.MODEL.ANCHOR_GENERATOR.ASPECT_RATIOS[0]),
        num_classes=r.NUM_CLASSES,
        num_convs=r.NUM_CONVS,
        prior_prob=r.PRIOR_PROB,
        iou_thresholds=tuple(r.IOU_THRESHOLDS),
        iou_labels=tuple(r.IOU_LABELS),
        focal_alpha=r.FOCAL_LOSS_ALPHA,
        focal_gamma=r.FOCAL_LOSS_GAMMA,
        smooth_l1_beta=r.SMOOTH_L1_LOSS_BETA,
        reg_weights=tuple(r.BBOX_REG_WEIGHTS),
        topk_candidates=r.TOPK_CANDIDATES_TEST,
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        pixel_std=tuple(cfg.MODEL.PIXEL_STD),
        dtype=jnp.bfloat16 if cfg.MODEL.DTYPE == "bfloat16" else jnp.float32,
    )


@META_ARCH_REGISTRY.register("PanopticFPN")
def _build_panoptic_fpn(cfg: CfgNode):
    from .panoptic import PanopticFPN

    backbone, strides, _ = BACKBONE_REGISTRY.get(cfg.MODEL.BACKBONE.NAME)(cfg)
    sem = cfg.MODEL.SEM_SEG_HEAD
    sem_feats = tuple(sem.IN_FEATURES)
    box_feats = tuple(cfg.MODEL.ROI_HEADS.IN_FEATURES) or sem_feats
    return PanopticFPN(
        backbone=backbone,
        pyramid_strides=tuple((f, int(strides[f])) for f in box_feats),
        sem_in_features=sem_feats,
        sem_strides=tuple(int(strides[f]) for f in sem_feats),
        num_classes=cfg.MODEL.ROI_HEADS.NUM_CLASSES,
        sem_num_classes=sem.NUM_CLASSES,
        common_stride=sem.COMMON_STRIDE,
        sem_conv_dim=sem.CONVS_DIM,
        pooler_resolution=cfg.MODEL.ROI_BOX_HEAD.POOLER_RESOLUTION,
        mask_on=cfg.MODEL.MASK_ON,
        instance_loss_weight=cfg.MODEL.PANOPTIC_FPN.INSTANCE_LOSS_WEIGHT,
        sem_loss_weight=sem.LOSS_WEIGHT,
        reg_weights=tuple(cfg.MODEL.ROI_BOX_HEAD.BBOX_REG_WEIGHTS),
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        pixel_std=tuple(cfg.MODEL.PIXEL_STD),
        dtype=jnp.bfloat16 if cfg.MODEL.DTYPE == "bfloat16" else jnp.float32,
    )


@META_ARCH_REGISTRY.register("SemanticSegmentor")
def _build_semantic_segmentor(cfg: CfgNode):
    from .semantic_seg import SemanticSegmentor

    backbone, strides, _ = BACKBONE_REGISTRY.get(cfg.MODEL.BACKBONE.NAME)(cfg)
    sem = cfg.MODEL.SEM_SEG_HEAD
    sem_feats = tuple(sem.IN_FEATURES)
    return SemanticSegmentor(
        backbone=backbone,
        sem_in_features=sem_feats,
        sem_strides=tuple(int(strides[f]) for f in sem_feats),
        num_classes=sem.NUM_CLASSES,
        common_stride=sem.COMMON_STRIDE,
        conv_dim=sem.CONVS_DIM,
        loss_weight=sem.LOSS_WEIGHT,
        ignore_value=sem.IGNORE_VALUE,
        pixel_mean=tuple(cfg.MODEL.PIXEL_MEAN),
        pixel_std=tuple(cfg.MODEL.PIXEL_STD),
        dtype=jnp.bfloat16 if cfg.MODEL.DTYPE == "bfloat16" else jnp.float32,
    )


def build_model(cfg: CfgNode) -> GeneralizedRCNNWSL:
    """Build the configured meta-architecture (reference build_model,
    detectron2/modeling/meta_arch/build.py:15)."""
    return META_ARCH_REGISTRY.get(cfg.MODEL.META_ARCHITECTURE)(cfg)
