#!/usr/bin/env python
"""Render detections from a COCO-format results/instances json onto images
(equivalent of the reference tools/visualize_json_results.py).

Usage:
  python tools/visualize_json_results.py --input results.json \
      --image-root datasets/VOC2007/JPEGImages --output viz/ [--conf 0.3]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))



def main():
    from drn_wsod_tpu.data.mapper import read_image
    from drn_wsod_tpu.utils.visualizer import Visualizer

    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--image-root", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--conf", type=float, default=0.3)
    p.add_argument("--limit", type=int, default=50)
    args = p.parse_args()

    with open(args.input) as f:
        data = json.load(f)

    if isinstance(data, dict):   # instances json
        id_to_file = {im["id"]: im["file_name"] for im in data["images"]}
        cats = {c["id"]: c["name"] for c in data.get("categories", [])}
        anns = data["annotations"]
    else:                        # bare results list
        id_to_file = {}
        cats = {}
        anns = data

    by_image = {}
    for a in anns:
        by_image.setdefault(a["image_id"], []).append(a)

    os.makedirs(args.output, exist_ok=True)
    names = [cats.get(i) or str(i) for i in range(1, max(cats, default=1) + 1)]
    for n, (img_id, dets) in enumerate(sorted(by_image.items())):
        if n >= args.limit:
            break
        fname = id_to_file.get(img_id, f"{img_id}.jpg")
        path = os.path.join(args.image_root, fname)
        if not os.path.exists(path):
            continue
        v = Visualizer(read_image(path, "BGR"), names)
        for a in dets:
            score = a.get("score", 1.0)
            if score < args.conf:
                continue
            x, y, w, h = a["bbox"]
            v.draw_box([x, y, x + w, y + h], a["category_id"] - 1, score)
        v.save(os.path.join(args.output, os.path.basename(fname)))
    print(f"Wrote visualizations to {args.output}")


if __name__ == "__main__":
    main()
