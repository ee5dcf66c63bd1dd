"""GeneralizedRCNNWSL: the WSOD meta-architecture.

TPU-native equivalent of the reference meta-arch + ROI heads stack
(projects/WSL/wsl/modeling/meta_arch/rcnn.py:23-249 and
wsl/modeling/roi_heads/roi_heads_{wsddn,oicr}.py): backbone (no RPN —
precomputed proposals come with the batch), RoI pooling over ~4k padded
proposals, ``(objectness + 1)`` feature scaling, DAN neck, WSDDN two-stream
scores, and K OICR refinement branches.

Everything is one jit-able function of (params, batch, rng): train mode
returns the loss dict; eval mode returns the full (P, C+1) score and box
matrices that feed NMS / TTA, mirroring the reference's
``(results, all_scores, all_boxes)`` contract (rcnn.py:230-240).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.roi_align import roi_align, roi_pool
from ..ops import csc as csc_lib
from ..ops import pcl as pcl_lib
from ..structures import boxes as box_ops
from .heads.box_head import DiscriminativeAdaptionNeck
from .heads import fast_rcnn as fast_rcnn_lib
from .heads import oicr as oicr_lib
from .heads import wsddn as wsddn_lib


class GeneralizedRCNNWSL(nn.Module):
    """WSOD detector over precomputed proposals (static shapes throughout)."""

    backbone: nn.Module
    feature_name: str = "res5"
    feature_stride: int = 8
    # Multi-level (FPN) pooling: names + strides of the pyramid levels used
    # by the box pooler (reference ROIPooler level assignment,
    # detectron2/modeling/poolers.py:23-246). None => single level.
    pyramid_strides: Optional[Tuple[Tuple[str, int], ...]] = None
    num_classes: int = 20
    head_type: str = "OICR"            # WSDDN | OICR | PCL (PCL varies losses)
    refine_k: int = 3
    refine_reg: Sequence[bool] = (False, False, False)
    pooler_type: str = "ROIPool"       # ROIPool | ROIAlign | ROIAlignV2
    pooler_resolution: int = 7
    pooler_sampling_ratio: int = 2
    use_pallas_pooler: bool = True
    dan_dims: Sequence[int] = (4096, 4096)
    dropout: float = 0.5
    mean_loss: bool = True
    use_objectness: bool = True
    cls_agnostic_bbox_reg: bool = False
    reg_weights: Sequence[float] = (10.0, 10.0, 5.0, 5.0)
    # Cascade R-CNN (head_type "CascadeRCNN"): per-stage matcher IoUs and
    # box-transform weights (reference cascade_rcnn.py + the
    # ROI_BOX_CASCADE_HEAD config node).
    cascade_ious: Sequence[float] = (0.5, 0.6, 0.7)
    cascade_reg_weights: Sequence[Sequence[float]] = (
        (10.0, 10.0, 5.0, 5.0), (20.0, 20.0, 10.0, 10.0),
        (30.0, 30.0, 15.0, 15.0))
    pixel_mean: Sequence[float] = (102.9801, 115.9465, 122.7717)
    pixel_std: Sequence[float] = (1.0, 1.0, 1.0)
    freeze_backbone: bool = True
    # WSJDS joint detection+segmentation: adds an ASPP semantic head over the
    # backbone features, trained from CPG pseudo-labels inside the CSC step
    # (reference projects/WSL/wsl/modeling/seg_heads/).
    with_seg: bool = False
    # CRF constrain-to-boundary loss on the seg branch + CRF refinement at
    # inference (reference seg_heads.py:140-160 CONSTRAINT flag; targets
    # from SemSegHead.crf :173-229 via ops/crf.py).
    seg_constraint: bool = False
    # Keypoint R-CNN branch on the supervised FastRCNN path (reference
    # roi_heads.py:_forward_keypoint + keypoint_head.py).
    keypoint_on: bool = False
    num_keypoints: int = 17
    keypoint_pooler_resolution: int = 14
    # Mask R-CNN branch on the supervised FastRCNN / CascadeRCNN paths
    # (reference StandardROIHeads._forward_mask + mask_head.py).
    mask_on: bool = False
    mask_pooler_resolution: int = 14
    dtype: Any = jnp.float32

    def setup(self):
        self.dan = DiscriminativeAdaptionNeck(
            dan_dims=tuple(self.dan_dims), dropout_rate=self.dropout,
            dtype=self.dtype, name="box_head")
        if self.head_type == "FastRCNN":
            # supervised pseudo-GT retraining head (reference
            # detectron2/modeling/roi_heads/fast_rcnn.py)
            self.fast_predictor = fast_rcnn_lib.FastRCNNOutputLayers(
                num_classes=self.num_classes,
                cls_agnostic_bbox_reg=self.cls_agnostic_bbox_reg,
                dtype=self.dtype, name="box_predictor")
        if self.head_type in ("FastRCNN", "CascadeRCNN") and self.mask_on:
            from .heads.seg import MaskRCNNHead

            self.mask_head = MaskRCNNHead(
                num_classes=self.num_classes, dtype=self.dtype,
                name="mask_head")
        if self.head_type == "FastRCNN" and self.keypoint_on:
            from .heads.keypoint import KRCNNConvDeconvUpsampleHead

            self.keypoint_head = KRCNNConvDeconvUpsampleHead(
                num_keypoints=self.num_keypoints, dtype=self.dtype,
                name="keypoint_head")
        if self.head_type == "CascadeRCNN":
            # per-stage box head + class-agnostic predictor (reference
            # cascade_rcnn.py builds K heads; box head = 2xFC 1024)
            n_stages = len(self.cascade_ious)
            self.cascade_heads = [
                fast_rcnn_lib.FastRCNNConvFCHead(
                    fc_dims=(1024, 1024), dtype=self.dtype,
                    name=f"cascade_head_{k}")
                for k in range(n_stages)
            ]
            self.cascade_predictors = [
                fast_rcnn_lib.FastRCNNOutputLayers(
                    num_classes=self.num_classes, cls_agnostic_bbox_reg=True,
                    dtype=self.dtype, name=f"cascade_predictor_{k}")
                for k in range(n_stages)
            ]
        if self.head_type in ("WSDDN", "OICR", "PCL", "CSC"):
            self.wsddn = wsddn_lib.WSDDNOutputLayers(
                num_classes=self.num_classes, dtype=self.dtype,
                name="box_predictor")
        if self.with_seg:
            from .heads.seg import ASPPSegHead

            self.seg_head = ASPPSegHead(num_classes=self.num_classes,
                                        dtype=self.dtype, name="seg_head")
        if self.head_type in ("OICR", "PCL", "CSC") and self.refine_k > 0:
            self.box_refinery = [
                oicr_lib.RefinementOutputLayers(
                    num_classes=self.num_classes,
                    cls_agnostic_bbox_reg=self.cls_agnostic_bbox_reg,
                    dtype=self.dtype, name=f"box_refinery_{k}")
                for k in range(self.refine_k)
            ]

    # ------------------------------------------------------------------ parts
    @staticmethod
    def sanitize(batch):
        """Zero the padded proposal slots. Padding content is arbitrary
        (NaN/inf from donated buffers or poisoned loaders) and multiplying
        by the mask does NOT neutralize it (inf * 0 = NaN) — select does
        (reference analog: tests/modeling/test_model_e2e.py's inf/nan
        robustness contract)."""
        return batch.replace(
            proposals=jnp.where(batch.proposal_mask[..., None],
                                batch.proposals, 0.0),
            objectness=jnp.where(batch.proposal_mask, batch.objectness, 0.0))

    def preprocess(self, image: jnp.ndarray) -> jnp.ndarray:
        """Normalize padded pixels (reference rcnn.py:242-249)."""
        mean = jnp.asarray(self.pixel_mean, dtype=jnp.float32)
        std = jnp.asarray(self.pixel_std, dtype=jnp.float32)
        return ((image - mean) / std).astype(self.dtype)

    def features(self, image: jnp.ndarray):
        """(B, H, W, 3) raw pixels -> (B, Hf, Wf, C) map, or a dict of
        pyramid levels when configured with an FPN backbone."""
        x = self.preprocess(image)
        out = self.backbone(x)
        feats = (out if self.pyramid_strides is not None
                 else out[self.feature_name])
        if self.freeze_backbone:
            feats = jax.lax.stop_gradient(feats)
        return feats

    def pooled_features(self, feats, proposals, prop_mask, objectness,
                        *, train: bool):
        """RoI pool + objectness scaling + DAN: -> (B, P, D)."""
        scale = 1.0 / self.feature_stride
        res = self.pooler_resolution

        if self.pyramid_strides is not None:
            from ..ops.poolers import multilevel_roi_pool

            strides = dict(self.pyramid_strides)
            names = [n for n, _ in self.pyramid_strides]

            def pool_one(fmap_dict, boxes):
                return multilevel_roi_pool(
                    fmap_dict, strides, boxes, names, resolution=res,
                    pooler_type=self.pooler_type,
                    sampling_ratio=max(self.pooler_sampling_ratio, 1))

        else:
            if self.pooler_type == "ROIPool" and self.use_pallas_pooler:
                # VMEM-resident Pallas kernel (forward-only; fine because the
                # frozen backbone needs no feature grads). The
                # (objectness + 1) * validity multiply (reference
                # roi_heads_oicr.py:342) fuses into the kernel epilogue,
                # saving two full passes over the ~800MB pooled tensor.
                obj = (objectness + 1.0) if self.use_objectness else \
                    jnp.ones_like(objectness)
                roi_scale = obj * prop_mask.astype(obj.dtype)

                if jax.default_backend() == "cpu":
                    # The kernel's exact-XLA twin (the formulation it is
                    # bit-exact against on hardware). Running the Pallas
                    # kernel in interpret mode here instead was measured at
                    # ~36 s/step on the toy ladder config — interpret mode
                    # is for kernel unit tests, not full-model CPU runs.
                    from ..ops.roi_pool_pallas import _xla_fallback

                    pooled = _xla_fallback(feats, proposals, scale, res,
                                           roi_scale)
                else:
                    # batch-in-grid kernel (batch as a leading grid dim of
                    # ONE launch, raw map DMA'd from HBM into a single-
                    # buffered level-stack scratch): CT reaches 1024,
                    # halving the scalar-overhead-bound bin-pass count —
                    # measured 33.8 ms vs 36.6 for the vmap'd CT=512 path
                    # (PERF.md). RB=16 measured best; unroll_rois regresses
                    # the 5-tier kernel (code blowup), keep the fori form.
                    from ..ops.roi_pool_pallas import roi_pool_pallas_grid

                    pooled = roi_pool_pallas_grid(
                        feats, proposals, scale, resolution=res,
                        roi_scale=roi_scale, roi_block=16)
                B, P = pooled.shape[:2]
                flat = pooled.reshape(B * P, -1)
                feats_out = self.dan(flat, train=train)
                return feats_out.reshape(B, P, -1)

            def pool_one(fmap, boxes):
                if self.pooler_type == "ROIPool":
                    return roi_pool(fmap, boxes, scale, resolution=res)
                aligned = self.pooler_type == "ROIAlignV2"
                return roi_align(
                    fmap, boxes, scale, resolution=res,
                    sampling_ratio=max(self.pooler_sampling_ratio, 1),
                    aligned=aligned)

        pooled = jax.vmap(pool_one)(feats, proposals)      # (B, P, r, r, C)
        if self.use_objectness:
            # (objectness + 1) scaling, reference roi_heads_oicr.py:342.
            pooled = pooled * (objectness + 1.0)[..., None, None, None].astype(pooled.dtype)
        pooled = pooled * prop_mask[..., None, None, None].astype(pooled.dtype)
        B, P = pooled.shape[:2]
        flat = pooled.reshape(B * P, -1)
        feats_out = self.dan(flat, train=train)
        return feats_out.reshape(B, P, -1)

    def semantic_logits(self, batch) -> jnp.ndarray:
        """(B, Hf, Wf, C+1) semantic segmentation logits (WSJDS branch).

        With ``seg_constraint``, inference applies the dense CRF to the
        class probabilities against the raw image and returns their log —
        monotone for every argmax/softmax consumer (reference
        seg_heads.py:150-160 applies the CRF at eval when CONSTRAINT is
        on; deviation: we refine at the head's own resolution instead of
        a fixed 513x513 intermediate — static shapes, one resize fewer).
        """
        assert self.with_seg
        feats = self.features(batch.image)
        if isinstance(feats, dict):
            feats = feats[self.feature_name]
        logits = self.seg_head(feats)
        if self.seg_constraint:
            from ..ops.crf import crf_forward

            B, h, w, _ = logits.shape
            img_small = jax.vmap(
                lambda im: jax.image.resize(
                    im.astype(jnp.float32), (h, w, batch.image.shape[-1]),
                    "linear"))(batch.image)
            probs = jax.nn.softmax(logits, axis=-1)
            refined = jax.vmap(crf_forward)(probs, img_small)
            logits = jnp.log(jnp.clip(refined, 1e-8))
        return logits

    def proposal_scores(self, batch) -> jnp.ndarray:
        """WSDDN per-proposal scores (B, P, C) — the differentiable-in-image
        quantity CSC backprops to get class-peak-gradient maps (reference
        roi_heads_csc.py:423-474). Dropout off for a deterministic CPG pass."""
        batch = self.sanitize(batch)
        feats = self.features(batch.image)
        box_feats = self.pooled_features(
            feats, batch.proposals, batch.proposal_mask, batch.objectness,
            train=False)
        return self.wsddn(box_feats, batch.proposal_mask)

    # ------------------------------------------------------------------ train
    def __call__(self, batch, *, train: bool = True,
                 csc_w=None, cpg=None) -> Dict[str, jnp.ndarray]:
        """Training losses (train=True) for the configured head.

        csc_w: optional (W (B,P,C), PL (B,C), NL (B,C)) from
        :func:`drn_wsod_tpu.ops.csc.csc_forward` — replaces the plain WSDDN
        image BCE with the CSC-weighted positive/negative pair
        (reference CSCOutputs.csc_loss, fast_rcnn.py:888-935).
        cpg: optional (B, C, H, W) class-peak-gradient maps; with
        ``with_seg`` they supervise the semantic branch (WSJDS).
        """
        batch = self.sanitize(batch)
        feats = self.features(batch.image)

        seg_losses = {}
        if self.with_seg and train:
            f = feats[self.feature_name] if isinstance(feats, dict) else feats
            seg_logits = self.seg_head(f)
            if cpg is not None:
                from .heads.seg import seg_loss_from_cpg

                seg_losses["loss_seg"] = seg_loss_from_cpg(
                    seg_logits, jax.lax.stop_gradient(cpg), batch.labels,
                    batch.image_hw)
            if self.seg_constraint:
                # constrain-to-boundary: CRF-refined pseudo targets + KL
                # (reference seg_heads.py:140-147; targets :173-229).
                # batch.image is RAW pixels here (normalization happens
                # inside features()), matching the reference's
                # de-normalized CRF input.
                from .heads.seg import crf_constraint, crf_constraint_loss

                fg_probs = jax.nn.sigmoid(seg_logits[..., 1:])
                crf_fg, w = crf_constraint(fg_probs, batch.image)
                # the loss takes the SIGMOIDED prediction (the reference
                # feeds x_sigmoid into log(sigmoid(.)) — quirk mirrored
                # verbatim, see crf_constraint_loss)
                seg_losses["loss_constraint"] = crf_constraint_loss(
                    fg_probs, crf_fg, w)

        if self.head_type == "FastRCNN":
            losses = self._fast_rcnn_losses(feats, batch, train=train)
            losses.update(seg_losses)
            return losses

        if self.head_type == "CascadeRCNN":
            losses = self._cascade_losses(feats, batch, train=train)
            losses.update(seg_losses)
            return losses

        box_feats = self.pooled_features(
            feats, batch.proposals, batch.proposal_mask, batch.objectness,
            train=train)

        scores = self.wsddn(box_feats, batch.proposal_mask)     # (B, P, C)
        if csc_w is not None:
            W, PL, NL = csc_w
            pos, neg = csc_lib.csc_loss(scores, W, PL, NL, self.mean_loss)
            losses = {"loss_cls_pos": pos, "loss_cls_neg": neg}
        else:
            losses = {"loss_cls": wsddn_lib.wsddn_loss(
                scores, batch.labels, self.mean_loss)}
        losses.update(seg_losses)

        if self.head_type == "WSDDN" or self.refine_k == 0:
            return losses

        img_evidence = jax.lax.stop_gradient(wsddn_lib.image_probs(scores))
        prev_scores = jax.lax.stop_gradient(scores)             # (B, P, C)

        for k in range(self.refine_k):
            cls_logits, deltas = self.box_refinery[k](box_feats)
            if self.head_type == "PCL":
                # Branch supervised by proposal-cluster learning; background
                # lives in column 0 (reference roi_heads_pcl.py:342-349).
                losses[f"loss_cls_r{k}"] = pcl_lib.pcl_branch_loss(
                    cls_logits, prev_scores, batch.proposals,
                    batch.proposal_mask, batch.labels)
                prev = oicr_lib.branch_probs(cls_logits)[..., 1:]
            else:
                pgt = jax.vmap(oicr_lib.mine_pgt)(
                    prev_scores, batch.proposals, batch.proposal_mask,
                    batch.labels, img_evidence)
                targets = jax.vmap(oicr_lib.label_proposals)(
                    pgt, batch.proposals, batch.proposal_mask)
                losses[f"loss_cls_r{k}"] = oicr_lib.refinement_loss(
                    cls_logits, targets)
                if self.refine_reg[k]:
                    losses[f"loss_box_reg_r{k}"] = oicr_lib.refinement_box_loss(
                        deltas, batch.proposals, targets, batch.proposal_mask,
                        self.num_classes, tuple(self.reg_weights))
                prev = oicr_lib.branch_probs(cls_logits)[..., :self.num_classes]
            prev_scores = jax.lax.stop_gradient(prev)

        return losses

    def _fast_rcnn_losses(self, feats, batch, *, train: bool):
        """Supervised Fast R-CNN training on instance GT (pseudo-GT
        retraining): subsample a fixed slot count per image FIRST, pool only
        the sampled boxes (the reference pools after sampling too), then CE +
        smooth-L1."""
        rng = self.make_rng("dropout")
        B = batch.image.shape[0]
        sampled = jax.vmap(
            lambda p, m, gb, gc, gv, r: fast_rcnn_lib.subsample_proposals(
                p, m, gb, gc, gv, r)
        )(batch.proposals, batch.proposal_mask, batch.gt_boxes,
          batch.gt_classes, batch.gt_valid, jax.random.split(rng, B))

        sel_boxes = jnp.take_along_axis(
            batch.proposals, sampled.indices[..., None], axis=1)
        sel_obj = jnp.take_along_axis(batch.objectness, sampled.indices,
                                      axis=1)
        box_feats = self.pooled_features(
            feats, sel_boxes, sampled.valid, sel_obj, train=train)
        cls_logits, deltas = self.fast_predictor(box_feats)

        loss_cls, loss_box = jax.vmap(
            lambda cl, d, p, s: fast_rcnn_lib.fast_rcnn_losses(
                cl, d, p, s, self.num_classes, tuple(self.reg_weights))
        )(cls_logits, deltas, batch.proposals, sampled)
        losses = {"loss_cls": jnp.mean(loss_cls),
                  "loss_box_reg": jnp.mean(loss_box)}

        if self.keypoint_on and batch.gt_keypoints is not None:
            from ..ops.matcher import match
            from .heads.keypoint import (keypoint_rcnn_loss,
                                         keypoints_to_heatmap_targets)

            B, S = sel_boxes.shape[:2]
            kr = self.keypoint_pooler_resolution
            kpooled = self._pool_raw(feats, sel_boxes, sampled.valid,
                                     train=train, resolution=kr)
            kp_logits = self.keypoint_head(
                kpooled.reshape(B * S, kr, kr, -1))      # (BS, 4kr, 4kr, K)
            hs = kp_logits.shape[1]
            midx = jax.vmap(
                lambda gb, gv, bx: match(
                    box_ops.pairwise_iou(gb, bx), gv, [0.5], [0, 1])[0]
            )(batch.gt_boxes, batch.gt_valid, sel_boxes)  # (B, S)
            kp = jnp.take_along_axis(
                batch.gt_keypoints, midx[..., None, None], axis=1)
            tgt, kvalid = jax.vmap(
                lambda k, b: keypoints_to_heatmap_targets(k, b, hs)
            )(kp, sel_boxes)
            fg = ((sampled.gt_class >= 0) & sampled.valid)
            kvalid = kvalid & fg[..., None]
            losses["loss_keypoint"] = keypoint_rcnn_loss(
                kp_logits, tgt.reshape(B * S, -1),
                kvalid.reshape(B * S, -1))

        if self.mask_on and batch.gt_masks is not None:
            losses["loss_mask"] = self._mask_branch_loss(
                feats, sel_boxes, sampled, batch, train=train)
        return losses

    def _mask_branch_loss(self, feats, boxes, sampled, batch, *, train):
        """Mask R-CNN training branch over the sampled proposals (reference
        detectron2/modeling/roi_heads/mask_head.py:mask_rcnn_loss): pool at
        mask resolution, run the mask head, BCE on the matched class channel
        against the matched GT mask cropped to the proposal box."""
        from ..ops.matcher import match
        from .heads.seg import mask_loss

        B, S = boxes.shape[:2]
        mr = self.mask_pooler_resolution
        pooled = self._pool_raw(feats, boxes, sampled.valid, train=train,
                                resolution=mr)
        mlogits = self.mask_head(pooled.reshape(B * S, mr, mr, -1))
        m_out = mlogits.shape[1]
        midx = jax.vmap(
            lambda gb, gv, bx: match(
                box_ops.pairwise_iou(gb, bx), gv, [0.5], [0, 1])[0]
        )(batch.gt_boxes, batch.gt_valid, boxes)           # (B, S)

        def crop_one(masks, mi, bx):
            def crop(i, b):
                m = masks[i][..., None].astype(jnp.float32)
                return roi_align(m, b[None], 1.0, resolution=m_out,
                                 sampling_ratio=2, aligned=True)[0, :, :, 0]
            return jax.vmap(crop)(mi, bx)

        targets = jax.vmap(crop_one)(batch.gt_masks, midx, boxes)
        fg = (sampled.gt_class >= 0) & sampled.valid
        return mask_loss(
            mlogits.reshape(B * S, m_out, m_out, -1),
            sampled.gt_class.reshape(B * S),
            (targets >= 0.5).astype(jnp.float32).reshape(B * S, m_out, m_out),
            fg.reshape(B * S))

    def predict_masks(self, batch, boxes: jnp.ndarray,
                      classes: jnp.ndarray) -> jnp.ndarray:
        """(B, D, 4) boxes + (B, D) classes -> (B, D, 2mr, 2mr) mask
        probabilities of the selected class (reference mask_rcnn_inference).
        Boxes are in the (resized) image frame."""
        feats = self.features(batch.image)
        mr = self.mask_pooler_resolution
        B, D = boxes.shape[:2]
        pooled = self._pool_raw(feats, boxes, jnp.ones((B, D), bool),
                                train=False, resolution=mr)
        logits = self.mask_head(pooled.reshape(B * D, mr, mr, -1))
        m_out = logits.shape[1]
        logits = logits.reshape(B, D, m_out, m_out, -1)
        cls = jnp.clip(classes, 0, self.num_classes - 1)
        sel = jnp.take_along_axis(
            logits, cls[:, :, None, None, None], axis=-1)[..., 0]
        return jax.nn.sigmoid(sel)

    def predict_keypoints(self, batch, boxes: jnp.ndarray) -> jnp.ndarray:
        """(B, D, 4) boxes -> (B, D, K, 3) decoded keypoints (reference
        keypoint_rcnn_inference)."""
        from .heads.keypoint import heatmaps_to_keypoints

        feats = self.features(batch.image)
        kr = self.keypoint_pooler_resolution
        B, D = boxes.shape[:2]
        pooled = self._pool_raw(feats, boxes, jnp.ones((B, D), bool),
                                train=False, resolution=kr)
        logits = self.keypoint_head(pooled.reshape(B * D, kr, kr, -1))
        kps = heatmaps_to_keypoints(logits, boxes.reshape(B * D, 4))
        return kps.reshape(B, D, self.num_keypoints, 3)

    def _pool_raw(self, feats, boxes, mask, *, train: bool,
                  resolution: Optional[int] = None):
        """Pool (B, S, 4) boxes to (B, S, r*r*C) WITHOUT the DAN neck —
        cascade stages / keypoint branch have their own heads."""
        scale = 1.0 / self.feature_stride
        res = resolution or self.pooler_resolution

        if self.pyramid_strides is not None:
            from ..ops.poolers import multilevel_roi_pool

            strides = dict(self.pyramid_strides)
            names = [n for n, _ in self.pyramid_strides]

            def pool_one(fmap_dict, bx):
                return multilevel_roi_pool(
                    fmap_dict, strides, bx, names, resolution=res,
                    pooler_type=self.pooler_type,
                    sampling_ratio=max(self.pooler_sampling_ratio, 1))
        else:
            def pool_one(fmap, bx):
                if self.pooler_type == "ROIPool":
                    return roi_pool(fmap, bx, scale, resolution=res)
                aligned = self.pooler_type == "ROIAlignV2"
                return roi_align(
                    fmap, bx, scale, resolution=res,
                    sampling_ratio=max(self.pooler_sampling_ratio, 1),
                    aligned=aligned)

        pooled = jax.vmap(pool_one)(feats, boxes)        # (B, S, r, r, C)
        pooled = pooled * mask[..., None, None, None].astype(pooled.dtype)
        B, S = pooled.shape[:2]
        return pooled.reshape(B, S, -1)

    def _cascade_stage(self, k, feats, boxes, mask, *, train: bool):
        """Run stage k on (B, S, 4) boxes -> (cls_logits, deltas, new_boxes).
        new_boxes are the gradient-detached regressed boxes for stage k+1
        (reference cascade_rcnn.py:_create_proposals_from_boxes)."""
        B, S = boxes.shape[:2]
        pooled = self._pool_raw(feats, boxes, mask, train=train)
        h = self.cascade_heads[k](pooled.reshape(B * S, -1))
        cls_logits, deltas = self.cascade_predictors[k](h)
        cls_logits = cls_logits.reshape(B, S, -1)
        deltas = deltas.reshape(B, S, 4)
        new_boxes = box_ops.apply_deltas(
            jax.lax.stop_gradient(deltas), boxes,
            tuple(self.cascade_reg_weights[k]))
        return cls_logits, deltas, new_boxes

    def _cascade_losses(self, feats, batch, *, train: bool):
        """Per-stage CE + smooth-L1 (reference cascade_rcnn.py:_forward_box
        training arm: stage 0 samples once, later stages re-match their
        predecessor's regressed boxes at the stage IoU)."""
        from .heads.cascade import match_and_label

        rng = self.make_rng("dropout")
        B = batch.image.shape[0]
        sampled = jax.vmap(
            lambda p, m, gb, gc, gv, r: fast_rcnn_lib.subsample_proposals(
                p, m, gb, gc, gv, r,
                iou_thresholds=(self.cascade_ious[0],))
        )(batch.proposals, batch.proposal_mask, batch.gt_boxes,
          batch.gt_classes, batch.gt_valid, jax.random.split(rng, B))

        boxes = jnp.take_along_axis(
            batch.proposals, sampled.indices[..., None], axis=1)
        valid = sampled.valid
        S = boxes.shape[1]
        boxes0 = boxes    # stage-0 sampled boxes feed the mask branch

        losses = {}
        for k in range(len(self.cascade_ious)):
            if k == 0:
                cls_tgt, box_tgt = sampled.gt_class, sampled.gt_box
            else:
                cls_tgt, box_tgt = jax.vmap(
                    lambda bx, gb, gc, gv: match_and_label(
                        bx, gb, gc, gv, self.cascade_ious[k])
                )(boxes, batch.gt_boxes, batch.gt_classes, batch.gt_valid)
            cls_logits, deltas, new_boxes = self._cascade_stage(
                k, feats, boxes, valid, train=train)
            stage = jax.vmap(
                lambda cl, d, bx, c, gb, v: fast_rcnn_lib.fast_rcnn_losses(
                    cl, d, bx,
                    fast_rcnn_lib.SampledProposals(
                        indices=jnp.arange(S, dtype=jnp.int32),
                        gt_class=c, gt_box=gb, valid=v),
                    self.num_classes,
                    tuple(self.cascade_reg_weights[k]))
            )(cls_logits, deltas, boxes, cls_tgt, box_tgt, valid)
            losses[f"loss_cls_stage{k}"] = jnp.mean(stage[0])
            losses[f"loss_box_reg_stage{k}"] = jnp.mean(stage[1])
            boxes = jax.vmap(box_ops.clip)(new_boxes, batch.image_hw)

        if self.mask_on and batch.gt_masks is not None:
            # reference CascadeROIHeads inherits _forward_mask from
            # StandardROIHeads: the mask branch trains on the stage-0
            # sampled proposals (roi_heads/cascade_rcnn.py)
            losses["loss_mask"] = self._mask_branch_loss(
                feats, boxes0, sampled, batch, train=train)
        return losses

    def _cascade_inference(self, feats, batch):
        """Average per-stage class probs; boxes from the last stage
        (reference cascade_rcnn.py:_forward_box inference arm)."""
        boxes = batch.proposals
        mask = batch.proposal_mask
        probs = []
        for k in range(len(self.cascade_ious)):
            cls_logits, _, new_boxes = self._cascade_stage(
                k, feats, boxes, mask, train=False)
            probs.append(jax.nn.softmax(cls_logits, axis=-1))
            boxes = jax.vmap(box_ops.clip)(new_boxes, batch.image_hw)
        scores = sum(probs) / len(probs)
        scores = jnp.where(mask[..., None], scores, 0.0)
        return scores, boxes

    # -------------------------------------------------------------- inference
    def inference_scores(self, batch) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Full score/box matrices for NMS & TTA.

        Returns:
          scores: (B, P, C+1) — last column background (zeros for WSDDN).
          boxes: (B, P, 4) class-agnostic, or (B, P, C*4) when the last
            refinement branch regresses boxes (reference
            roi_heads_oicr.py:407-421).
        """
        batch = self.sanitize(batch)
        feats = self.features(batch.image)
        if self.head_type == "CascadeRCNN":
            return self._cascade_inference(feats, batch)
        box_feats = self.pooled_features(
            feats, batch.proposals, batch.proposal_mask, batch.objectness,
            train=False)

        if self.head_type == "FastRCNN":
            cls_logits, deltas = self.fast_predictor(box_feats)
            scores = jax.nn.softmax(cls_logits, axis=-1)
            boxes = box_ops.apply_deltas(deltas, batch.proposals,
                                         tuple(self.reg_weights))
            mask = batch.proposal_mask[..., None]
            return jnp.where(mask, scores, 0.0), boxes

        if self.head_type == "WSDDN" or self.refine_k == 0:
            scores = self.wsddn(box_feats, batch.proposal_mask)
            scores = jnp.where(batch.proposal_mask[..., None], scores, 0.0)
            return wsddn_lib.append_background(scores), batch.proposals

        branch_logits = []
        last_deltas = None
        for k in range(self.refine_k):
            cls_logits, deltas = self.box_refinery[k](box_feats)
            branch_logits.append(cls_logits)
            last_deltas = deltas

        if self.refine_reg[-1]:
            scores = oicr_lib.branch_probs(branch_logits[-1])
            boxes = box_ops.apply_deltas(
                last_deltas, batch.proposals, tuple(self.reg_weights))
        else:
            scores = oicr_lib.average_branch_probs(branch_logits)
            boxes = batch.proposals

        if self.head_type == "PCL":
            # PCL trains with background in column 0; rotate it to the back
            # for the shared inference path (reference fast_rcnn.py:1463-65).
            scores = jnp.concatenate([scores[..., 1:], scores[..., :1]], axis=-1)

        mask = batch.proposal_mask[..., None]
        scores = jnp.where(mask, scores, 0.0)
        return scores, boxes
