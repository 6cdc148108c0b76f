#!/usr/bin/env bash
# Launch HICO-DET SCG training on this host's TPU devices.
# Counterpart of the reference's slurm sbatch script
# (slurm/adamixer_sp/new_spatial_transh_graph_training.sh: 4 GPUs, batch 4
# per device, lr 1e-4, 12 epochs) — one process drives all local chips via
# the data mesh, so no spawn/rendezvous is needed. For multi-host pods, run
# this per host with JAX_COORDINATOR_ADDRESS etc. set (jax.distributed).
set -euo pipefail
cd "$(dirname "$0")/.."

DATA_ROOT=${DATA_ROOT:-hicodet}
TRAIN_DET=${TRAIN_DET:-hicodet/detections/train2015}
VAL_DET=${VAL_DET:-hicodet/detections/test2015}

exec python -u -m skghoi_tpu.tools.train_hicodet \
  --data-root "$DATA_ROOT" \
  --train-detection-dir "$TRAIN_DET" \
  --val-detection-dir "$VAL_DET" \
  --num-epochs "${NUM_EPOCHS:-12}" \
  --batch-size "${BATCH_SIZE:-4}" \
  --lr-head "${LR:-1e-4}" \
  --cache-dir "${CACHE_DIR:-./checkpoints}" \
  "$@" 2>&1 | tee "train_$(date +%Y%m%d_%H%M%S).log"
