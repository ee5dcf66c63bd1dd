"""CLI e2e: CSC training through tools/train_net.py.

Verifies the VERDICT round-1 gap: a csc_*.yaml run through the entry point
must train the CSC objective (loss_cls_pos/neg in metrics) while
iter <= WSL.CSC_MAX_ITER, then switch to the plain step (loss_cls), matching
the reference gating (projects/WSL/wsl/modeling/roi_heads/
roi_heads_csc.py:428,481-499).
"""

import json
import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))
from test_e2e_train import make_voc_dataset  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_train_net_cli_csc_gating(tmp_path):
    d, prop_file = make_voc_dataset(str(tmp_path))
    cfg_path = tmp_path / "csc_cli_test.yaml"
    out_dir = tmp_path / "out"
    cfg_path.write_text(f"""
MODEL:
  DTYPE: "float32"
  RESNETS:
    DEPTH: 18
    RES2_OUT_CHANNELS: 64
  ROI_HEADS:
    NAME: "CSCROIHeads"
    NUM_CLASSES: 20
    BATCH_SIZE_PER_IMAGE: 16
  ROI_BOX_HEAD:
    DAN_DIM: [32, 32]
WSL:
  CSC_MAX_ITER: 19
INPUT:
  MIN_SIZE_TRAIN: (64,)
  MAX_SIZE_TRAIN: 64
  MIN_SIZE_TEST: 64
  MAX_SIZE_TEST: 64
  BUCKETS: [64]
  CROP:
    ENABLED: False
DATASETS:
  TRAIN: ('voc_2007_train',)
  TEST: ('voc_2007_test',)
  PROPOSAL_FILES_TRAIN: ('{prop_file}',)
  PROPOSAL_FILES_TEST: ('{prop_file}',)
SOLVER:
  IMS_PER_BATCH: 2
  MAX_ITER: 24
  STEPS: (23,)
  CHECKPOINT_PERIOD: 24
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
        capture_output=True, text=True, timeout=1800, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr[-3000:]

    metrics_path = out_dir / "metrics.json"
    assert metrics_path.exists()
    rows = [json.loads(line) for line in metrics_path.read_text().splitlines()]
    keys = set().union(*[set(row) for row in rows])
    # CSC objective trained while iter <= CSC_MAX_ITER (flush at iter 19)
    assert "loss_cls_pos" in keys and "loss_cls_neg" in keys, keys
    assert "csc/W_pos_mean" in keys, keys
    # plain step took over after the gate (final flush at iter 23 -> loss_cls)
    assert "loss_cls" in keys, keys
