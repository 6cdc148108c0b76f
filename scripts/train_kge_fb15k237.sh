#!/usr/bin/env bash
# Canonical TransE-on-FB15K237 run (OpenKE train_transe_FB15K237.py parity).
# Published target: Hits@10(filter) ~= 0.476.
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -u -m skghoi_tpu.tools.train_kge \
  --data "${KGE_DATA:?set KGE_DATA to an OpenKE benchmark dir}" \
  --model transe --dim 200 --margin 5.0 --epochs 1000 --alpha 1.0 \
  --neg-ent 25 --bern --json "$@"
