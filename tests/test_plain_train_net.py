"""plain_train_net.py smoke: the explicit-loop trainer runs end to end on
the synthetic VOC fixture (reference tools/plain_train_net.py twin)."""

import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))
from test_e2e_train import make_voc_dataset  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_plain_train_net_cli(tmp_path):
    d, prop_file = make_voc_dataset(str(tmp_path))
    cfg_path = tmp_path / "plain_test.yaml"
    out_dir = tmp_path / "out"
    cfg_path.write_text(f"""
MODEL:
  DTYPE: "float32"
  RESNETS:
    DEPTH: 18
    RES2_OUT_CHANNELS: 64
  ROI_HEADS:
    NAME: "OICRROIHeads"
    NUM_CLASSES: 20
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
  TRAIN: ('voc_2007_train',)
  TEST: ()
  PROPOSAL_FILES_TRAIN: ('{prop_file}',)
SOLVER:
  IMS_PER_BATCH: 2
  MAX_ITER: 2
  STEPS: (1,)
  CHECKPOINT_PERIOD: 2
PARALLEL:
  MESH_SHAPE: [2]
TEST:
  EVAL_PERIOD: 0
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
        [sys.executable, os.path.join(REPO, "tools", "plain_train_net.py"),
         "--config-file", str(cfg_path)],
        capture_output=True, text=True, timeout=1200, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr[-3000:]
    # a checkpoint was written by the explicit loop
    ckpt_dir = out_dir / "checkpoints"
    assert ckpt_dir.exists() and any(ckpt_dir.iterdir()), "no checkpoint"
    assert "iter 2/2" in (r.stdout + r.stderr)
