"""COCO through the actual CLI entry point: synthetic COCO-format dataset in
the builtin layout -> train 2 iters -> COCO AP evaluation (the reference
supports COCO via the same train_net, projects/WSL/tools/train_net.py:119-167
+ configs/COCO-Detection)."""

import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_coco_dataset(root, n_images=4, hw=64, seed=0):
    """Builtin-layout COCO: coco/{train2017,val2017}, annotations jsons."""
    rng = np.random.RandomState(seed)
    images, annotations = [], []
    ids, boxes_all, logits_all = [], [], []
    img_dirs = {s: os.path.join(root, "coco", s)
                for s in ("train2017", "val2017")}
    for d in img_dirs.values():
        os.makedirs(d, exist_ok=True)
    os.makedirs(os.path.join(root, "coco", "annotations"), exist_ok=True)

    for i in range(n_images):
        name = f"{i:012d}.jpg"
        img = rng.randint(0, 255, (hw, hw, 3), dtype=np.uint8)
        for d in img_dirs.values():
            Image.fromarray(img).save(os.path.join(d, name))
        images.append({"id": i, "file_name": name, "height": hw, "width": hw})
        x1, y1 = [int(v) for v in rng.randint(5, 20, 2)]
        w, h = [int(v) for v in rng.randint(20, 35, 2)]
        annotations.append({"id": i, "image_id": i, "category_id": (i % 2) + 1,
                            "bbox": [x1, y1, w, h], "area": w * h,
                            "iscrowd": 0})
        ids.append(i)
        n_prop = 16
        px1 = rng.uniform(0, hw * 0.6, n_prop)
        py1 = rng.uniform(0, hw * 0.6, n_prop)
        pw = rng.uniform(8, hw * 0.4, n_prop)
        ph = rng.uniform(8, hw * 0.4, n_prop)
        pb = np.stack([px1, py1, px1 + pw, py1 + ph], 1).astype(np.float32)
        pb[0] = [x1, y1, x1 + w, y1 + h]
        boxes_all.append(pb)
        logits_all.append(rng.uniform(0, 1, n_prop).astype(np.float32))

    coco = {"images": images, "annotations": annotations,
            "categories": [{"id": 1, "name": "thing_a"},
                           {"id": 2, "name": "thing_b"}]}
    for split in ("train2017", "val2017"):
        with open(os.path.join(root, "coco", "annotations",
                               f"instances_{split}.json"), "w") as f:
            json.dump(coco, f)

    prop_file = os.path.join(root, "coco_props.pkl")
    with open(prop_file, "wb") as f:
        pickle.dump({"ids": ids, "boxes": boxes_all,
                     "objectness_logits": logits_all, "bbox_mode": 0}, f)
    return prop_file


@pytest.mark.slow
def test_train_net_cli_coco(tmp_path):
    prop_file = make_coco_dataset(str(tmp_path))
    cfg_path = tmp_path / "coco_test.yaml"
    out_dir = tmp_path / "out"
    cfg_path.write_text(f"""
MODEL:
  DTYPE: "float32"
  RESNETS:
    DEPTH: 18
    RES2_OUT_CHANNELS: 64
  ROI_HEADS:
    NAME: "OICRROIHeads"
    NUM_CLASSES: 2
    BATCH_SIZE_PER_IMAGE: 16
  ROI_BOX_HEAD:
    DAN_DIM: [32, 32]
WSL:
  REFINE_NUM: 2
  REFINE_REG: [False, False]
INPUT:
  MIN_SIZE_TRAIN: (64,)
  MAX_SIZE_TRAIN: 64
  MIN_SIZE_TEST: 64
  MAX_SIZE_TEST: 64
  BUCKETS: [64]
  CROP:
    ENABLED: False
DATASETS:
  TRAIN: ('coco_2017_train',)
  TEST: ('coco_2017_val',)
  PROPOSAL_FILES_TRAIN: ('{prop_file}',)
  PROPOSAL_FILES_TEST: ('{prop_file}',)
SOLVER:
  IMS_PER_BATCH: 2
  MAX_ITER: 2
  STEPS: (1,)
  CHECKPOINT_PERIOD: 2
PARALLEL:
  MESH_SHAPE: [2]
TEST:
  EVAL_PERIOD: 0
  EVAL_TRAIN: False
  AUG:
    ENABLED: False
DATALOADER:
  PREFETCH: 0
OUTPUT_DIR: "{out_dir}"
""")
    env = dict(os.environ)
    env["DETECTRON2_DATASETS"] = str(tmp_path)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train_net.py"),
         "--config-file", str(cfg_path)],
        capture_output=True, text=True, timeout=1200, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr[-3000:]
    log = r.stdout + r.stderr
    assert "Results on coco_2017_val" in log
    assert "AP50" in log
