"""CLI smoke: the actual tools/train_net.py entry point (argparse -> setup ->
train -> eval) on the synthetic VOC fixture — the reference's
run_instant_tests.sh pattern as a pytest."""

import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(__file__))
from test_e2e_train import make_voc_dataset  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_train_net_cli(tmp_path):
    d, prop_file = make_voc_dataset(str(tmp_path))
    cfg_path = tmp_path / "cli_test.yaml"
    out_dir = tmp_path / "out"
    # a VOC2007-shaped dataset dir: register via DETECTRON2_DATASETS
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
  TEST: ('voc_2007_test',)
  PROPOSAL_FILES_TRAIN: ('{prop_file}',)
  PROPOSAL_FILES_TEST: ('{prop_file}',)
SOLVER:
  IMS_PER_BATCH: 2
  MAX_ITER: 2
  STEPS: (1,)
  CHECKPOINT_PERIOD: 2
PARALLEL:
  MESH_SHAPE: [2]
VIS_PERIOD: 1
TEST:
  EVAL_PERIOD: 0
  EXPECTED_RESULTS: [["bbox", "AP50", 50.0, 100.0]]
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
    assert os.path.exists(out_dir / "metrics.json")
    assert os.path.exists(out_dir / "config.yaml")
    # eval ran on both test and (EVAL_TRAIN) train: AP in the log
    log = r.stdout + r.stderr
    assert "Results on voc_2007_test" in log
    # observability: pgt visualization dumps + tensorboard event files
    import glob
    assert glob.glob(str(out_dir / "pgt_vis" / "*.png")), "no pgt dumps"
    assert glob.glob(str(out_dir / "tb" / "events.out.tfevents*")), "no TB"
    # accuracy-assert pattern (TEST.EXPECTED_RESULTS -> verify_results)
    assert "verify_results: bbox/AP50" in log


@pytest.mark.slow
def test_train_net_cli_tensor_parallel(tmp_path):
    """CLI with a ('data','model') mesh from the YAML: the DAN FC stack is
    Megatron-split over the model axis (parallel/mesh.py:dan_tp_spec) and
    training still runs end to end."""
    d, prop_file = make_voc_dataset(str(tmp_path))
    cfg_path = tmp_path / "cli_tp.yaml"
    out_dir = tmp_path / "out_tp"
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
  MESH_AXES: ["data", "model"]
  MESH_SHAPE: [2, 2]
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
    assert os.path.exists(out_dir / "metrics.json")
