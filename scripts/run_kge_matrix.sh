#!/bin/bash
# Reproduce the KGE validation matrix (KGE_RESULTS.jsonl) on one TPU chip.
#
# Each row runs the preset named after the reference's example script
# (skghoi_tpu/kge/examples.py documents the provenance of every
# hyper-parameter) and appends one JSON line with the exact CLI + seed and
# the filtered link-prediction metrics.  Published Hits@10 targets:
# OpenKE/README.md:90-98.
#
#   bash scripts/run_kge_matrix.sh /path/to/OpenKE/benchmarks results.jsonl
set -u
BENCH=${1:?benchmarks dir (containing FB15K237/ WN18RR/)}
OUT=${2:-KGE_RESULTS.jsonl}
WN="$BENCH/WN18RR"
FB="$BENCH/FB15K237"

run() {
  data="$1"; example="$2"
  echo "=== $(date +%H:%M:%S) $example"
  # --checkpoint saves trained params BEFORE eval, so an eval-side failure
  # (e.g. OOM at a large eval chunk) never loses the training run.
  python -u -m skghoi_tpu.tools.train_kge \
    --data "$data" --example "$example" --json --json-out "$OUT" \
    --checkpoint "checkpoints/kge_${example}.ckpt"
}

# FB15K237 (published: TransE .476 TransH .490 TransR .511 TransD .487
#           DistMult .419 ComplEx .426 RotatE+adv .522)
run "$FB" transe_fb15k237
run "$FB" transh_fb15k237
run "$FB" transr_fb15k237    # 1-epoch TransE warm start per the shipped script
run "$FB" transd_fb15k237
run "$FB" distmult_fb15k237
run "$FB" complex_fb15k237
run "$FB" rotate_fb15k237
# smoke rows (no published number): exercises the remaining model zoo
run "$FB" rescal_fb15k237
run "$FB" analogy_fb15k237
run "$FB" simple_fb15k237
run "$FB" hole_fb15k237

# WN18RR (published: TransE .512 TransH .507 TransR .519 TransD .508
#         DistMult .479 ComplEx .485 RotatE+adv .565)
run "$WN" transe_wn18rr      # the shipped adv sigmoid recipe -> 0.533 measured
run "$WN" transh_wn18rr
run "$WN" transr_wn18rr
run "$WN" transd_wn18rr
run "$WN" distmult_wn18rr
run "$WN" distmult_wn18rr_adv  # shipped adv recipe -> 0.523 measured
run "$WN" complex_wn18rr       # -> 0.483 measured
run "$WN" rotate_wn18rr_adv
