#!/usr/bin/env python
"""Generate pseudo ground truth from a trained WSOD model.

The missing link of the pseudo-GT re-training workflow (BASELINE config 5):
run inference (optionally TTA) over the TRAIN datasets and write the
top-scoring detections per present class as a COCO-format instance json that
`register_coco_instances` + the supervised `StandardROIHeads` config can
train from. (The reference does this via exported detections + external
scripts; here it is a first-class tool.)

Usage:
  python tools/generate_pgt.py --config-file configs/...oicr...yaml \
      --out datasets/pgt/voc07_trainval.json [--score-thresh 0.3]
"""

import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

logger = logging.getLogger("drn_wsod_tpu")


def main():
    from drn_wsod_tpu.checkpoint import Checkpointer
    from drn_wsod_tpu.config import get_cfg
    from drn_wsod_tpu.data import DatasetMapper, MetadataCatalog
    from drn_wsod_tpu.data.datasets.voc import register_all_pascal_voc
    from drn_wsod_tpu.data.loader import get_detection_dataset_dicts
    from drn_wsod_tpu.engine import create_train_state
    from drn_wsod_tpu.engine.defaults import _init_variables, default_setup
    from drn_wsod_tpu.evaluation import make_detect_fn
    from drn_wsod_tpu.models import build_model
    from drn_wsod_tpu.solver import build_optimizer

    p = argparse.ArgumentParser()
    p.add_argument("--config-file", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--score-thresh", type=float, default=0.3)
    p.add_argument("--per-class-top1", action="store_true", default=True,
                   help="keep only the top box per present image class")
    p.add_argument("opts", nargs=argparse.REMAINDER)
    args = p.parse_args()

    cfg = get_cfg()
    cfg.merge_from_file(args.config_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    default_setup(cfg)
    register_all_pascal_voc(os.environ.get("DETECTRON2_DATASETS", "datasets"))

    model = build_model(cfg)
    variables = _init_variables(model, cfg)
    ck = Checkpointer(os.path.join(cfg.OUTPUT_DIR, "checkpoints"))
    state = create_train_state(variables, build_optimizer(cfg, variables))
    state, _ = ck.resume_or_load(state, cfg.MODEL.WEIGHTS, resume=True)

    detect = make_detect_fn(model, cfg.MODEL.ROI_HEADS.SCORE_THRESH_TEST,
                            cfg.MODEL.ROI_HEADS.NMS_THRESH_TEST,
                            cfg.TEST.DETECTIONS_PER_IMAGE)
    mapper = DatasetMapper(cfg, is_train=False)

    images, annotations = [], []
    ann_id = 1
    class_names = None
    for di, name in enumerate(cfg.DATASETS.TRAIN):
        meta = MetadataCatalog.get(name)
        class_names = meta.thing_classes
        pf = ([cfg.DATASETS.PROPOSAL_FILES_TRAIN[di]]
              if cfg.MODEL.LOAD_PROPOSALS else ())
        records = get_detection_dataset_dicts([name], pf, filter_empty=True)
        from drn_wsod_tpu.data.loader import EvalLoader

        loader = EvalLoader(records, mapper, batch_size=1,
                            prefetch=cfg.DATALOADER.PREFETCH)
        for batch, n_real in loader:
            dets = jax.device_get(detect(state.params, batch))
            ids = np.asarray(jax.device_get(batch.image_id))
            for i in range(n_real):
                r = records[int(ids[i])]
                h, w = r.get("height", 0), r.get("width", 0)
                images.append({"id": len(images) + 1,
                               "file_name": os.path.basename(r["file_name"]),
                               "height": h, "width": w})
                img_id = len(images)
                present = {a["category_id"] for a in r.get("annotations", [])}
                taken = set()
                for b, s, c, v in zip(dets["boxes"][i], dets["scores"][i],
                                      dets["classes"][i], dets["valid"][i]):
                    c = int(c)
                    if not v or c not in present:
                        continue
                    if args.per_class_top1 and c in taken:
                        continue
                    if s < args.score_thresh and c in taken:
                        continue
                    taken.add(c)
                    x1, y1, x2, y2 = [float(x) for x in b]
                    annotations.append({
                        "id": ann_id, "image_id": img_id,
                        "category_id": c + 1,
                        "bbox": [x1, y1, x2 - x1, y2 - y1],
                        "area": (x2 - x1) * (y2 - y1),
                        "iscrowd": 0, "score": float(s),
                    })
                    ann_id += 1

    coco = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": i + 1, "name": n}
                       for i, n in enumerate(class_names or [])],
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(coco, f)
    logger.info(f"Wrote {len(annotations)} pseudo boxes over "
                f"{len(images)} images to {args.out}")


if __name__ == "__main__":
    main()
