#!/usr/bin/env bash
# Evaluate a checkpoint on HICO-DET (full/rare/non-rare mAP).
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -u -m skghoi_tpu.tools.test_hicodet \
  --data-root "${DATA_ROOT:-hicodet}" \
  --detection-dir "${TEST_DET:-hicodet/detections/test2015}" \
  --model-path "${MODEL_PATH:?set MODEL_PATH to a checkpoint dir}" \
  "$@"
