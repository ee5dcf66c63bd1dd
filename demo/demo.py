#!/usr/bin/env python
"""Single-image WSOD demo (equivalent of the reference demo/demo.py on the
DefaultPredictor API). WSOD consumes precomputed proposals, so the demo takes
a proposal pickle alongside the image; without one it falls back to a coarse
sliding-window proposal grid so the pipeline can still be exercised.
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def grid_proposals(h, w, n_scales=4):
    """Dense multi-scale window grid as a proposal fallback."""
    boxes = []
    for s in range(n_scales):
        size = min(h, w) // (2 ** s)
        if size < 16:
            break
        step = max(size // 2, 8)
        for y in range(0, h - size + 1, step):
            for x in range(0, w - size + 1, step):
                boxes.append([x, y, x + size, y + size])
    return np.asarray(boxes, dtype=np.float32)


def frame_proposals(data, fi: int):
    """Extract frame ``fi``'s (boxes, objectness) from a proposal pickle.

    Accepts the reference pickle layouts: {"boxes": [per-image (Ni,4)],
    "objectness_logits"/"scores": [per-image (Ni,)]} (proposal_convert.py
    output, legacy "scores" key included) AND the single-image shorthand
    {"boxes": (N, 4), "scores": (N,)} — a bare 2-D array is ONE image's
    boxes, not a per-image list (indexing it per frame would silently hand
    each frame a 1-D row)."""
    raw = data["boxes"] if "boxes" in data else data
    if isinstance(raw, np.ndarray) and raw.ndim == 2:
        all_boxes = [raw]
    else:
        all_boxes = raw
    boxes = np.asarray(all_boxes[min(fi, len(all_boxes) - 1)],
                       dtype=np.float32)
    obj = data.get("objectness_logits", data.get("scores"))
    if obj is None:
        obj = [np.zeros(len(boxes))]
    if isinstance(obj, np.ndarray) and obj.ndim == 1:
        obj = [obj]
    objectness = np.asarray(obj[min(fi, len(obj) - 1)], dtype=np.float32)
    return boxes, objectness


def main():
    from drn_wsod_tpu.config import get_cfg
    from drn_wsod_tpu.data.datasets.voc import VOC_CLASS_NAMES
    from drn_wsod_tpu.data.mapper import read_image
    from drn_wsod_tpu.engine.defaults import DefaultPredictor

    p = argparse.ArgumentParser()
    p.add_argument("--config-file", required=True)
    p.add_argument("--input", required=True, nargs="+",
                   help="image path(s); several paths are treated as a "
                        "frame sequence (video equivalent — no codec in "
                        "this environment)")
    p.add_argument("--output", default="",
                   help="file (single input) or directory to write "
                        "annotated images")
    p.add_argument("--proposals", default="", help="pickle with boxes")
    p.add_argument("--confidence-threshold", type=float, default=0.3)
    p.add_argument("opts", nargs=argparse.REMAINDER)
    args = p.parse_args()

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)

    proposal_data = None
    if args.proposals:
        with open(args.proposals, "rb") as f:
            proposal_data = pickle.load(f)

    predictor = DefaultPredictor(cfg)
    names = VOC_CLASS_NAMES if cfg.MODEL.ROI_HEADS.NUM_CLASSES == 20 else \
        [str(i) for i in range(cfg.MODEL.ROI_HEADS.NUM_CLASSES)]

    is_sequence = len(args.input) > 1
    video_vis = None
    if is_sequence and args.output:
        from drn_wsod_tpu.utils.video_visualizer import VideoVisualizer

        video_vis = VideoVisualizer(names)

    for fi, path in enumerate(args.input):
        image = read_image(path, cfg.INPUT.FORMAT)
        if proposal_data is not None:
            boxes, objectness = frame_proposals(proposal_data, fi)
        else:
            boxes = grid_proposals(*image.shape[:2])
            objectness = np.zeros(len(boxes), dtype=np.float32)

        out = predictor(image, boxes, objectness)

        n = 0
        for box, score, cls in zip(out["boxes"], out["scores"],
                                   out["classes"]):
            if score < args.confidence_threshold:
                continue
            n += 1
            print(f"{names[int(cls)]:>14s}  {score:.3f}  "
                  f"[{box[0]:.0f}, {box[1]:.0f}, "
                  f"{box[2]:.0f}, {box[3]:.0f}]")
        print(f"{path}: {n} detections above {args.confidence_threshold}")

        if args.output:
            from PIL import Image

            if video_vis is not None:
                vis = video_vis.draw_frame(
                    image, out["boxes"], out["scores"], out["classes"],
                    score_thresh=args.confidence_threshold)
            else:
                from drn_wsod_tpu.utils.visualizer import Visualizer

                v = Visualizer(image, names)
                v.draw_instance_predictions(
                    out["boxes"], out["scores"], out["classes"],
                    score_thresh=args.confidence_threshold)
                vis = v.get_image()
            if is_sequence or os.path.isdir(args.output):
                os.makedirs(args.output, exist_ok=True)
                dst = os.path.join(args.output, os.path.basename(path))
            else:
                dst = args.output
            Image.fromarray(vis).save(dst)


if __name__ == "__main__":
    main()
