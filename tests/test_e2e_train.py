"""Minimum end-to-end slice (SURVEY.md §7 step 5): WSDDN/OICR R18-WS on a
synthetic 5-image VOC subset with precomputed proposals — data pipeline ->
sharded train loop -> checkpoint -> eval (AP + CorLoc)."""

import pytest

pytestmark = pytest.mark.slow  # full train->checkpoint->eval cycles
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from drn_wsod_tpu.config import get_cfg
from drn_wsod_tpu.data import DatasetCatalog

from drn_wsod_tpu.data.datasets.voc import register_pascal_voc

CLASSES = ("cat", "dog")


def make_voc_dataset(root, n_images=5, hw=64, seed=0):
    rng = np.random.RandomState(seed)
    d = os.path.join(root, "VOC2007")
    os.makedirs(os.path.join(d, "JPEGImages"), exist_ok=True)
    os.makedirs(os.path.join(d, "Annotations"), exist_ok=True)
    os.makedirs(os.path.join(d, "ImageSets", "Main"), exist_ok=True)

    ids, boxes_all, logits_all = [], [], []
    for i in range(n_images):
        name = f"im{i:04d}"
        ids.append(name)
        img = rng.randint(0, 255, (hw, hw, 3), dtype=np.uint8)
        Image.fromarray(img).save(os.path.join(d, "JPEGImages", name + ".jpg"))
        cls = CLASSES[i % 2]
        x1, y1 = rng.randint(5, 20, 2)
        x2, y2 = x1 + rng.randint(20, 35), y1 + rng.randint(20, 35)
        xml = f"""<annotation><size><width>{hw}</width><height>{hw}</height>
<depth>3</depth></size>
<object><name>{cls}</name><difficult>0</difficult>
<bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox>
</object></annotation>"""
        with open(os.path.join(d, "Annotations", name + ".xml"), "w") as f:
            f.write(xml)
        # proposals: include the GT box plus random ones
        n_prop = 16
        px1 = rng.uniform(0, hw * 0.6, n_prop)
        py1 = rng.uniform(0, hw * 0.6, n_prop)
        pw = rng.uniform(8, hw * 0.4, n_prop)
        ph = rng.uniform(8, hw * 0.4, n_prop)
        pb = np.stack([px1, py1, px1 + pw, py1 + ph], 1).astype(np.float32)
        pb[0] = [x1 - 1, y1 - 1, x2, y2]
        boxes_all.append(pb)
        logits_all.append(rng.uniform(0, 1, n_prop).astype(np.float32))

    for split in ("train", "test"):
        with open(os.path.join(d, "ImageSets", "Main", split + ".txt"), "w") as f:
            f.write("\n".join(ids) + "\n")

    prop_file = os.path.join(root, "props.pkl")
    with open(prop_file, "wb") as f:
        pickle.dump({"ids": ids, "boxes": boxes_all,
                     "objectness_logits": logits_all, "bbox_mode": 0}, f)
    return d, prop_file


@pytest.fixture
def voc_setup(tmp_path):
    d, prop_file = make_voc_dataset(str(tmp_path))
    for name in ("e2e_voc_train", "e2e_voc_test"):
        if name in DatasetCatalog:
            DatasetCatalog.remove(name)
    register_pascal_voc("e2e_voc_train", d, "train", 2007, CLASSES)
    register_pascal_voc("e2e_voc_test", d, "test", 2007, CLASSES)
    yield d, prop_file
    DatasetCatalog.remove("e2e_voc_train")
    DatasetCatalog.remove("e2e_voc_test")


def tiny_e2e_cfg(tmp_path, prop_file):
    cfg = get_cfg()
    cfg.OUTPUT_DIR = os.path.join(str(tmp_path), "out")
    cfg.MODEL.DTYPE = "float32"
    cfg.MODEL.RESNETS.DEPTH = 18
    cfg.MODEL.RESNETS.RES2_OUT_CHANNELS = 64
    cfg.MODEL.ROI_HEADS.NUM_CLASSES = 2
    cfg.MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE = 16
    cfg.MODEL.ROI_BOX_HEAD.DAN_DIM = [32, 32]
    cfg.WSL.REFINE_NUM = 2
    cfg.WSL.REFINE_REG = [False, False]
    cfg.INPUT.MIN_SIZE_TRAIN = (64,)
    cfg.INPUT.MAX_SIZE_TRAIN = 64
    cfg.INPUT.MIN_SIZE_TEST = 64
    cfg.INPUT.MAX_SIZE_TEST = 64
    cfg.INPUT.BUCKETS = [64]
    cfg.INPUT.CROP.ENABLED = False
    cfg.DATASETS.TRAIN = ("e2e_voc_train",)
    cfg.DATASETS.TEST = ("e2e_voc_test",)
    cfg.DATASETS.PROPOSAL_FILES_TRAIN = (prop_file,)
    cfg.DATASETS.PROPOSAL_FILES_TEST = (prop_file,)
    cfg.SOLVER.IMS_PER_BATCH = 2
    cfg.SOLVER.MAX_ITER = 3
    cfg.SOLVER.BASE_LR = 0.001
    cfg.SOLVER.CHECKPOINT_PERIOD = 3
    cfg.SOLVER.WARMUP_ITERS = 0
    cfg.PARALLEL.MESH_SHAPE = [2]
    cfg.TEST.EVAL_PERIOD = 0
    cfg.TEST.AUG.ENABLED = False
    cfg.DATALOADER.PREFETCH = 0
    return cfg


def test_train_and_eval_e2e(voc_setup, tmp_path):
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import train_net

    d, prop_file = voc_setup
    cfg = tiny_e2e_cfg(tmp_path, prop_file)

    from drn_wsod_tpu.models import build_model

    model = build_model(cfg)
    state = train_net.do_train(cfg, model, resume=False)
    assert int(state.step) == 3

    # metrics were written
    assert os.path.exists(os.path.join(cfg.OUTPUT_DIR, "metrics.json"))
    # checkpoint saved
    ckpts = os.listdir(os.path.join(cfg.OUTPUT_DIR, "checkpoints"))
    assert len(ckpts) >= 1

    results = train_net.do_test(cfg, model, state.params)
    r = results["e2e_voc_test"]
    assert "bbox" in r and "AP50" in r["bbox"]
    assert "bbox CorLoc" in r
    assert 0.0 <= r["bbox"]["AP50"] <= 100.0


def test_resume_from_checkpoint(voc_setup, tmp_path):
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import train_net

    d, prop_file = voc_setup
    cfg = tiny_e2e_cfg(tmp_path, prop_file)

    from drn_wsod_tpu.checkpoint import Checkpointer
    from drn_wsod_tpu.engine import create_train_state
    from drn_wsod_tpu.engine.defaults import _init_variables
    from drn_wsod_tpu.models import build_model
    from drn_wsod_tpu.solver import build_optimizer

    model = build_model(cfg)
    train_net.do_train(cfg, model, resume=False)

    variables = _init_variables(model, cfg)
    tx = build_optimizer(cfg, variables)
    template = create_train_state(variables, tx)
    ck = Checkpointer(os.path.join(cfg.OUTPUT_DIR, "checkpoints"))
    state, start = ck.resume_or_load(template, resume=True)
    assert start == 3
