"""Test-time augmentation (multi-scale + flip, score averaging).

Re-design of the reference ``GeneralizedRCNNWithTTAAVG``
(projects/WSL/wsl/modeling/test_time_augmentation_avg.py): because the
precomputed proposal set is identical across views, per-proposal score and
box matrices can be averaged element-wise across views before a single NMS.

TPU-native shape: all V views of one image are batched into ONE jitted
forward (V is static: len(min_sizes) x (2 if flip)), and the inverse view
transforms (resize scale + horizontal flip) are applied analytically on
device — no per-view host round trips.

Deviation from the reference (documented): proposal dedup/top-k is done once
in the original frame rather than per view, which guarantees slot alignment
across views (the reference re-dedups per view and relies on rounding never
changing the mask).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .data import transforms as T
from .data.mapper import pick_bucket
from .ops.nms import multiclass_nms
from .structures import WSODBatch


def enumerate_views(image_hw, min_sizes, max_size: int, flip: bool):
    """The (new_h, new_w, flip) view list for one image."""
    H, W = image_hw
    views = []
    for size in min_sizes:
        nh, nw = T.ResizeShortestEdge.target_size(H, W, size, max_size)
        for do_flip in ((False, True) if flip else (False,)):
            views.append((nh, nw, do_flip))
    return views


def build_view_batch(image: np.ndarray, proposals: np.ndarray,
                     objectness: np.ndarray, labels: np.ndarray,
                     min_sizes, max_size: int, flip: bool,
                     buckets, num_proposals: int,
                     views=None) -> Tuple[WSODBatch, Dict]:
    """Build the (V, ...) batch of augmented views for one image.

    ``image`` is the raw (H, W, 3) image (already channel-ordered);
    ``proposals`` (N, 4) raw-frame boxes after dedup/top-k. ``views``
    optionally restricts to a subset (bucket grouping — all views in one
    batch share the smallest covering bucket instead of padding everything
    to the largest scale).
    Returns (batch, inverse-info dict with 'scale' (V, 2) and 'flip' (V,)).
    """
    H, W = image.shape[:2]
    if views is None:
        views = enumerate_views((H, W), min_sizes, max_size, flip)

    V = len(views)
    P = num_proposals
    bucket = max(pick_bucket(nh, nw, buckets) for nh, nw, _ in views)

    images = np.zeros((V, bucket, bucket, 3), dtype=np.float32)
    props = np.zeros((V, P, 4), dtype=np.float32)
    mask = np.zeros((V, P), dtype=bool)
    obj = np.zeros((V, P), dtype=np.float32)
    hw = np.zeros((V, 2), dtype=np.int32)
    scale = np.zeros((V, 2), dtype=np.float32)  # (sx, sy) view <- original
    flips = np.zeros((V,), dtype=np.float32)
    widths = np.zeros((V,), dtype=np.float32)

    n = min(len(proposals), P)
    for v, (nh, nw, do_flip) in enumerate(views):
        tfm = T.ResizeTransform(H, W, nh, nw)
        img = tfm.apply_image(image)
        b = tfm.apply_box(proposals[:n])
        if do_flip:
            img = img[:, ::-1]
            b = np.stack([nw - b[:, 2], b[:, 1], nw - b[:, 0], b[:, 3]],
                         axis=1)
        images[v, :nh, :nw] = img.astype(np.float32)
        props[v, :n] = b
        mask[v, :n] = True
        obj[v, :n] = objectness[:n]
        hw[v] = (nh, nw)
        scale[v] = (nw / W, nh / H)
        flips[v] = float(do_flip)
        widths[v] = nw

    batch = WSODBatch(
        image=jnp.asarray(images),
        image_hw=jnp.asarray(hw),
        orig_hw=jnp.asarray(np.tile([[H, W]], (V, 1)).astype(np.int32)),
        proposals=jnp.asarray(props),
        proposal_mask=jnp.asarray(mask),
        objectness=jnp.asarray(obj),
        labels=jnp.asarray(np.tile(labels[None], (V, 1))),
        image_id=jnp.zeros((V,), dtype=jnp.int32),
    )
    inv = {"scale": jnp.asarray(scale), "flip": jnp.asarray(flips),
           "width": jnp.asarray(widths)}
    return batch, inv


def _invert_boxes(boxes, inv):
    """Map (V, P, 4) view-frame boxes back to the original frame."""
    w = inv["width"][:, None]
    f = inv["flip"][:, None]
    x1, y1, x2, y2 = (boxes[..., i] for i in range(4))
    fx1 = jnp.where(f > 0, w - x2, x1)
    fx2 = jnp.where(f > 0, w - x1, x2)
    sx = inv["scale"][:, None, 0]
    sy = inv["scale"][:, None, 1]
    return jnp.stack([fx1 / sx, y1 / sy, fx2 / sx, y2 / sy], axis=-1)


def make_tta_detect_fn(model, score_thresh: float, nms_thresh: float,
                       topk: int):
    """Jitted (variables, view_batch, inv) -> detections in original frame
    (reference tta_avg.py:283-323: mean over views, then one NMS)."""

    @jax.jit
    def detect(variables, batch, inv):
        scores, boxes = model.apply(variables, batch,
                                    method="inference_scores")
        C = scores.shape[-1] - 1
        if boxes.shape[-1] != 4:
            # class-specific boxes: invert each class column
            V, P = boxes.shape[:2]
            b = boxes.reshape(V, P * C, 4)
            b = _invert_boxes(b, inv).reshape(V, P, C, 4)
            avg_boxes = jnp.mean(b, axis=0)
        else:
            avg_boxes = jnp.mean(_invert_boxes(boxes, inv), axis=0)
        avg_scores = jnp.mean(scores, axis=0)

        dets = multiclass_nms(
            avg_boxes, avg_scores[:, :C], batch.proposal_mask[0],
            iou_threshold=nms_thresh, score_threshold=score_thresh, topk=topk)
        dets["all_scores"] = avg_scores
        dets["all_boxes"] = avg_boxes
        return dets

    return detect


def make_tta_union_detect_fn(model, score_thresh: float, nms_thresh: float,
                             topk: int):
    """Union-style TTA (reference GeneralizedRCNNWithTTAUNION,
    test_time_augmentation_union.py:228-258): run per-view NMS'd detections,
    union the survivors across views, and NMS once more. On device this is:
    per-view keep masks -> candidate scores masked by (kept in any view) ->
    final NMS over the union."""
    from .ops.nms import multiclass_nms

    @jax.jit
    def detect(variables, batch, inv):
        scores, boxes = model.apply(variables, batch,
                                    method="inference_scores")
        V, P, C1 = scores.shape
        C = C1 - 1
        inv_boxes = _invert_boxes(boxes, inv)                # (V, P, 4)

        # A candidate (proposal, class) slot is in the union if it survived
        # at least one view's per-class NMS; it carries its best surviving
        # view score (the reference rebuilds the same sparse score matrix,
        # test_time_augmentation_union.py:243-252).
        from .ops.nms import nms_mask
        from .structures import boxes as box_ops

        def view_keep(b, s, m):
            iou = box_ops.pairwise_iou(b, b)

            def per_class(c):
                sc = s[:, c]
                v_ = m & (sc > score_thresh) & jnp.isfinite(sc)
                return nms_mask(b, sc, v_, nms_thresh, iou=iou)

            return jax.lax.map(per_class, jnp.arange(C)).T   # (P, C)

        keeps = jax.vmap(view_keep)(inv_boxes, scores[..., :C],
                                    batch.proposal_mask)     # (V, P, C)
        any_keep = jnp.any(keeps, axis=0)
        best_scores = jnp.max(jnp.where(keeps, scores[..., :C], 0.0), axis=0)
        union = jnp.where(any_keep, best_scores, 0.0)
        mean_boxes = jnp.mean(inv_boxes, axis=0)

        dets = multiclass_nms(mean_boxes, union, batch.proposal_mask[0],
                              iou_threshold=nms_thresh,
                              score_threshold=score_thresh, topk=topk)
        return dets

    return detect


def _sum_inverted(scores, boxes, inv):
    """Inverse-transform per-view boxes to the original frame and sum both
    matrices over views (the TTA-AVG reduction before the final /V)."""
    C = scores.shape[-1] - 1
    if boxes.shape[-1] != 4:
        V, P = boxes.shape[:2]
        b = boxes.reshape(V, P * C, 4)
        inv_boxes = _invert_boxes(b, inv).reshape(V, P, C, 4)
    else:
        inv_boxes = _invert_boxes(boxes, inv)
    return jnp.sum(scores, axis=0), jnp.sum(inv_boxes, axis=0)


def make_tta_scorer(model):
    """Jitted per-group scorer: sums scores and inverse-transformed boxes
    over the group's views (compiles once per bucket)."""

    @jax.jit
    def score(variables, batch, inv):
        scores, boxes = model.apply(variables, batch,
                                    method="inference_scores")
        return _sum_inverted(scores, boxes, inv)

    return score


def _device_view_batch(raw, hw0, new_hw, flips, bucket: int,
                       boxes, mask, objectness, labels):
    """Traced twin of :func:`build_view_batch`: build one bucket group's
    (V, bucket, bucket, 3) view batch ON DEVICE from the raw image.

    The host path resizes 16 full-resolution f32 views per image and ships
    them through the host->device link — measured 6.1 s/img (253 MB) on this
    rig vs 0.7 s of device scoring (PERF.md TTA bisect). Here the host ships
    the raw image ONCE (u8, ~0.75 MB edge-padded) and each view is a
    ``jax.image.scale_and_translate`` with DYNAMIC scale (half-pixel
    convention identical to ``jax.image.resize``; verified within 1/255 of
    the PIL-BILINEAR host transform), so one compile serves every original
    image size in the raw bucket.

    raw: (RB, RB, 3) u8/f32, original pixels edge-padded (edge mode keeps
      the linear kernel's boundary taps on the replicated edge row — the
      same clamp semantics PIL uses — instead of polluting with zeros);
    hw0: (2,) i32 valid size; new_hw: (V, 2) i32 exact per-view sizes
      (host-computed by enumerate_views, passed dynamically);
    flips: STATIC tuple of bool (part of the jit key);
    boxes (P, 4) original-frame proposals, mask (P,), objectness (P,),
    labels (C,).
    """
    V = len(flips)
    H0 = hw0[0].astype(jnp.float32)
    W0 = hw0[1].astype(jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (bucket, bucket), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (bucket, bucket), 1)
    rawf = raw.astype(jnp.float32)
    maskf = mask.astype(jnp.float32)

    imgs, props, scales, widths = [], [], [], []
    for v, do_flip in enumerate(flips):
        nh, nw = new_hw[v, 0], new_hw[v, 1]
        nhf, nwf = nh.astype(jnp.float32), nw.astype(jnp.float32)
        sy, sx = nhf / H0, nwf / W0
        im = jax.image.scale_and_translate(
            rawf, (bucket, bucket, 3), (0, 1),
            jnp.stack([sy, sx]), jnp.zeros((2,), jnp.float32),
            "linear", antialias=True)
        im = im * ((rows < nh) & (cols < nw))[..., None]
        if do_flip:
            # flip puts the valid cols at [bucket-nw, bucket); roll them
            # back to 0 (the wrapped tail re-enters the zeroed pad region)
            im = jnp.roll(im[:, ::-1], nw - bucket, axis=1)
        b = boxes * jnp.stack([sx, sy, sx, sy])
        if do_flip:
            b = jnp.stack([nwf - b[:, 2], b[:, 1], nwf - b[:, 0], b[:, 3]], 1)
        imgs.append(im)
        props.append(b * maskf[:, None])
        scales.append(jnp.stack([sx, sy]))
        widths.append(nwf)

    P = boxes.shape[0]
    batch = WSODBatch(
        image=jnp.stack(imgs),
        image_hw=new_hw.astype(jnp.int32),
        orig_hw=jnp.tile(hw0.astype(jnp.int32)[None], (V, 1)),
        proposals=jnp.stack(props),
        proposal_mask=jnp.tile(mask[None], (V, 1)),
        objectness=jnp.tile((objectness * maskf)[None], (V, 1)),
        labels=jnp.tile(labels[None], (V, 1)),
        image_id=jnp.zeros((V,), dtype=jnp.int32),
    )
    inv = {"scale": jnp.stack(scales),
           "flip": jnp.asarray([float(f) for f in flips]),
           "width": jnp.stack(widths)}
    return batch, inv


def make_group_scorer(model, flips, bucket: int):
    """Fused device-side view build + scorer for one bucket group: ONE
    dispatch per group, raw image in, summed score/box matrices out.
    Compiles per (raw-bucket, out-bucket, flips) key — independent of the
    original image size within the raw bucket."""

    @jax.jit
    def run(variables, raw, hw0, new_hw, boxes, mask, objectness, labels):
        batch, inv = _device_view_batch(raw, hw0, new_hw, tuple(flips),
                                        bucket, boxes, mask, objectness,
                                        labels)
        scores, bxs = model.apply(variables, batch,
                                  method="inference_scores")
        return _sum_inverted(scores, bxs, inv)

    return run


def make_tta_finalizer(nms_thresh: float, score_thresh: float, topk: int):
    @partial(jax.jit, static_argnames=())
    def finalize(sum_scores, sum_boxes, n_views, prop_mask):
        avg_scores = sum_scores / n_views
        avg_boxes = sum_boxes / n_views
        C = avg_scores.shape[-1] - 1
        dets = multiclass_nms(avg_boxes, avg_scores[:, :C], prop_mask,
                              iou_threshold=nms_thresh,
                              score_threshold=score_thresh, topk=topk)
        dets["all_scores"] = avg_scores
        dets["all_boxes"] = avg_boxes
        return dets

    return finalize


class GeneralizedRCNNWithTTAAVG:
    """Host-facing wrapper: record -> TTA detections (original frame)."""

    def __init__(self, cfg, model, variables):
        self.model = model
        self.variables = variables
        self.min_sizes = tuple(cfg.TEST.AUG.MIN_SIZES)
        self.max_size = cfg.TEST.AUG.MAX_SIZE
        self.flip = cfg.TEST.AUG.FLIP
        self.buckets = tuple(cfg.INPUT.BUCKETS)
        self.num_proposals = cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE
        self.fmt = cfg.INPUT.FORMAT
        self.num_classes = cfg.MODEL.ROI_HEADS.NUM_CLASSES
        self._score = make_tta_scorer(model)
        self.device_views = bool(getattr(cfg.TEST.AUG, "DEVICE_VIEWS", True))
        self._group_scorers: Dict[tuple, object] = {}
        self._finalize = make_tta_finalizer(
            cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
            cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST,
            cfg.TEST.DETECTIONS_PER_IMAGE)

    def __call__(self, record: dict):
        from .data.mapper import read_image
        from .data.datasets.voc import image_level_labels
        from .structures.boxes import unique_boxes_mask

        image = read_image(record["file_name"], self.fmt)
        boxes = np.asarray(record["proposal_boxes"], dtype=np.float32)
        logits = np.asarray(record["proposal_objectness_logits"],
                            dtype=np.float32)
        keep = unique_boxes_mask(boxes)
        boxes, logits = boxes[keep], logits[keep]
        labels = image_level_labels(record, self.num_classes)

        # group views by bucket so small scales don't pad to the largest
        views = enumerate_views(image.shape[:2], self.min_sizes,
                                self.max_size, self.flip)
        groups: Dict[int, list] = {}
        for v in views:
            groups.setdefault(pick_bucket(v[0], v[1], self.buckets),
                              []).append(v)

        sum_scores = sum_boxes = None
        prop_mask = None
        if self.device_views:
            # ship the raw image once (u8, edge-padded to a coarse square
            # raw bucket so one compile serves every image size); each
            # group's views are resized/flipped/padded ON DEVICE inside the
            # fused scorer (PERF.md: host view building + upload was 6.1
            # s/img vs 0.7 s of scoring on this rig)
            H0, W0 = image.shape[:2]
            rb = int(np.ceil(max(H0, W0) / 256) * 256)
            raw = np.pad(image, ((0, rb - H0), (0, rb - W0), (0, 0)),
                         mode="edge")
            P = self.num_proposals
            n = min(len(boxes), P)
            pboxes = np.zeros((P, 4), np.float32)
            pboxes[:n] = boxes[:n]
            pmask = np.zeros((P,), bool)
            pmask[:n] = True
            pobj = np.zeros((P,), np.float32)
            pobj[:n] = logits[:n]
            raw_d = jnp.asarray(raw)
            hw0 = jnp.asarray([H0, W0], jnp.int32)
            args = (jnp.asarray(pboxes), jnp.asarray(pmask),
                    jnp.asarray(pobj), jnp.asarray(labels))
            prop_mask = args[1]
            for bucket, bucket_views in groups.items():
                flips = tuple(bool(f) for _, _, f in bucket_views)
                new_hw = jnp.asarray([[nh, nw] for nh, nw, _ in bucket_views],
                                     jnp.int32)
                key = (rb, bucket, flips)
                scorer = self._group_scorers.get(key)
                if scorer is None:
                    scorer = make_group_scorer(self.model, flips, bucket)
                    self._group_scorers[key] = scorer
                s, b = scorer(self.variables, raw_d, hw0, new_hw, *args)
                sum_scores = s if sum_scores is None else sum_scores + s
                sum_boxes = b if sum_boxes is None else sum_boxes + b
        else:
            for bucket_views in groups.values():
                batch, inv = build_view_batch(
                    image, boxes, logits, labels, self.min_sizes,
                    self.max_size, self.flip, self.buckets,
                    self.num_proposals, views=bucket_views)
                s, b = self._score(self.variables, batch, inv)
                prop_mask = batch.proposal_mask[0]
                sum_scores = s if sum_scores is None else sum_scores + s
                sum_boxes = b if sum_boxes is None else sum_boxes + b
        dets = self._finalize(sum_scores, sum_boxes, float(len(views)),
                              prop_mask)
        return jax.device_get(dets)
