#!/bin/bash -e
# Short synthetic-workload smoke runs (equivalent of the reference
# dev/run_instant_tests.sh, without needing datasets): exercises the train
# step, the eval step and the virtual multi-chip path.
BIN="python"
ROOT="$(dirname "$0")/.."

echo "=== dryrun multichip (8 virtual CPU devices) ==="
JAX_PLATFORMS=cpu XLA_FLAGS="--xla_force_host_platform_device_count=8" \
  PALLAS_AXON_POOL_IPS= $BIN - <<'EOF'
import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath("__graft_entry__.py")))
import jax
jax.config.update("jax_platforms", "cpu")
from __graft_entry__ import dryrun_multichip
dryrun_multichip(8)
EOF

echo "=== synthetic train benchmark ==="
$BIN "$ROOT/tools/benchmark.py" --task train \
  MODEL.RESNETS.DEPTH 18 MODEL.RESNETS.RES2_OUT_CHANNELS 64 \
  MODEL.ROI_BOX_HEAD.DAN_DIM "[512, 1024]"

echo "=== unit tests ==="
$BIN -m pytest "$ROOT/tests" -q -x
