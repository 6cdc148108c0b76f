#!/usr/bin/env bash
# Cache V-COCO results (vcoco_results.pkl) then run the role-AP evaluation.
# Counterpart of slurm/vcoco_pickle.sh + slurm/vcoco_test.sh.
set -euo pipefail
cd "$(dirname "$0")/.."
python -u -m skghoi_tpu.tools.cache_results \
  --dataset vcoco \
  --data-root "${DATA_ROOT:-vcoco}" \
  --detection-dir "${DET_DIR:-vcoco/detections/test2014_r50_pretained}" \
  --cache-dir "${CACHE_DIR:-vcoco_cache}" \
  --model-path "${MODEL_PATH:-}" \
  "$@"
python -u -m skghoi_tpu.tools.vcoco_evaluation \
  --data-root "${DATA_ROOT:-vcoco}" \
  --det-file "${CACHE_DIR:-vcoco_cache}/vcoco_results.pkl"
