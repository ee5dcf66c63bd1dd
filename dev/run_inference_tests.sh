#!/bin/bash -e
# Eval-only regression harness + demo smoke over the quick_schedules
# inference configs — equivalent of the reference
# dev/run_inference_tests.sh (/root/reference/dev/run_inference_tests.sh:1-44).
#
# Two modes:
#   * real data: set DETECTRON2_DATASETS to a dir containing VOC2007 and
#     pass trained weights per config (MODEL.WEIGHTS) — configs run as-is
#     and their TEST.EXPECTED_RESULTS are enforced (verify_results).
#   * synthetic (default, zero-egress container): a 5-image synthetic
#     VOC2007 fixture is generated (dev/make_synthetic_voc.py — the same
#     generator the pytest e2e suite uses) and the configs run with random
#     weights, a tiny model override, and wide EXPECTED_RESULTS tolerance:
#     this checks the eval pipeline end to end (loader -> detect ->
#     NMS -> VOC AP/CorLoc -> verify_results), not absolute accuracy.

BIN="python tools/train_net.py"
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
cd "$ROOT"
OUTPUT=$(mktemp -d /tmp/inference_test_output.XXXXXX)

CFG_LIST=( "${@:1}" )
if [ ${#CFG_LIST[@]} -eq 0 ]; then
  CFG_LIST=( ./configs/quick_schedules/*inference_acc_test.yaml )
fi

SYNTH_OPTS=()
DEMO_IMG=""
if [ -z "$DETECTRON2_DATASETS" ] || [ ! -d "$DETECTRON2_DATASETS/VOC2007" ]; then
  echo "No real VOC2007 found — generating the synthetic fixture"
  export DETECTRON2_DATASETS="$OUTPUT/datasets"
  PROPS=$(JAX_PLATFORMS=cpu python dev/make_synthetic_voc.py "$DETECTRON2_DATASETS")
  export JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS=
  DEMO_IMG="$DETECTRON2_DATASETS/VOC2007/JPEGImages/im0000.jpg"
  SYNTH_OPTS=(
    MODEL.WEIGHTS ""
    MODEL.DTYPE float32
    MODEL.RESNETS.DEPTH 18
    MODEL.RESNETS.RES2_OUT_CHANNELS 64
    MODEL.ROI_BOX_HEAD.DAN_DIM "[32, 32]"
    MODEL.ROI_HEADS.BATCH_SIZE_PER_IMAGE 16
    DATASETS.PROPOSAL_FILES_TRAIN "('$PROPS',)"
    DATASETS.PROPOSAL_FILES_TEST "('$PROPS',)"
    INPUT.MIN_SIZE_TEST 64 INPUT.MAX_SIZE_TEST 64 "INPUT.BUCKETS" "[64]"
    TEST.EXPECTED_RESULTS "[['bbox', 'AP50', 50.0, 100.0]]"
    TEST.EVAL_TRAIN False
    DATALOADER.PREFETCH 0
  )
fi

echo "========================================================================"
echo "Configs to run:"
echo "${CFG_LIST[@]}"
echo "========================================================================"

for cfg in "${CFG_LIST[@]}"; do
    echo "========================================================================"
    echo "Running $cfg ..."
    echo "========================================================================"
    $BIN \
      --eval-only \
      --config-file "$cfg" \
      OUTPUT_DIR "$OUTPUT/run" "${SYNTH_OPTS[@]}"
    bash dev/parse_results.sh "$OUTPUT/run/log.txt"
    rm -rf "$OUTPUT/run"
done

echo "========================================================================"
echo "Running demo.py ..."
echo "========================================================================"
if [ -z "$DEMO_IMG" ]; then
  DEMO_IMG=$(ls "$DETECTRON2_DATASETS"/VOC2007/JPEGImages/*.jpg | head -n1)
  PROPS=""
fi
mkdir -p "$OUTPUT/demo"
python demo/demo.py \
  --config-file ./configs/quick_schedules/oicr_WSR_18_inference_acc_test.yaml \
  --input "$DEMO_IMG" --output "$OUTPUT/demo" \
  ${PROPS:+--proposals "$PROPS"} \
  "${SYNTH_OPTS[@]}"
ls -l "$OUTPUT/demo"
rm -rf "$OUTPUT"
echo "run_inference_tests: OK"
