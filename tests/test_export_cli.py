"""Export CLI: cfg -> serialized StableHLO artifact + run-check round-trip
(reference deploy converter pattern, tools/deploy/caffe2_converter.py)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_export_model_cli(tmp_path):
    cfg_path = tmp_path / "export_test.yaml"
    cfg_path.write_text("""
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
""")
    out = tmp_path / "model.stablehlo"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # prevent the sitecustomize axon-PJRT registration from dialing the
    # (possibly stalled) TPU tunnel in the subprocess — same recipe as
    # every other CLI subprocess test
    env["PALLAS_AXON_POOL_IPS"] = ""
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "export_model.py"),
         "--config-file", str(cfg_path), "--output", str(out),
         "--height", "64", "--width", "64", "--proposals", "64",
         "--run-check"],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr[-3000:]
    assert out.exists() and out.stat().st_size > 1000
    assert "run-check OK" in r.stdout
