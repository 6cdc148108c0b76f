#!/bin/bash
# Round-3 KGE queue: close the scoreboard gaps the round-2 verdict named.
#
#   bash scripts/run_kge_round3.sh /root/reference/OpenKE/benchmarks
#
# Order (most-valuable-first so a tunnel wedge loses the least):
#   1. WN18RR Trans* margin-recipe sweep (the reference ships no WN18RR
#      Trans* scripts — published 0.512/0.507/0.508 — so the recipe search
#      is recorded row-by-row in KGE_SWEEP.jsonl).
#   2. RotatE FB15K237 (+adv published 0.522, no shipped script; WN18RR adv
#      shape carried over) and RotatE WN18RR adv (shipped script
#      train_rotate_WN18RR_adv.py, published 0.565) -> KGE_RESULTS.jsonl.
#   3. Zoo tail: HolE/SimplE/Analogy WN18RR + RESCAL FB15K237 (shipped
#      scripts, no published rows; bar = sane committed numbers).
set -u
BENCH=${1:-/root/reference/OpenKE/benchmarks}
WN="$BENCH/WN18RR"
FB="$BENCH/FB15K237"
cd "$(dirname "$0")/.."

run() { # run <data> <out> [flags...]
  data="$1"; out="$2"; shift 2
  echo "=== $(date +%H:%M:%S) $*"
  python -u -m skghoi_tpu.tools.train_kge \
    --data "$data" --json --json-out "$out" "$@" < /dev/null
}

SWEEP=KGE_SWEEP.jsonl
RES=KGE_RESULTS.jsonl

# --- 1. WN18RR Trans* margin sweep (short runs; no --example so every flag
#        below is exactly what runs).  Round-2 rows: TransE 0.461 (m6 a0.5
#        1000ep), TransH 0.4215 (m4 a0.5), TransD 0.429 (m4 a1.0).  Axes:
#        alpha up (the FB15K237 scripts use 0.5-1.0), margin up (WN18RR is
#        sparse), 2000 epochs.
MARGIN_COMMON="--loss margin --dim 200 --p-norm 1 --opt sgd --nbatches 100 --neg-ent 25 --bern --epochs 2000"
run "$WN" "$SWEEP" --model transe $MARGIN_COMMON --margin 6 --alpha 1.0
run "$WN" "$SWEEP" --model transe $MARGIN_COMMON --margin 8 --alpha 1.0
run "$WN" "$SWEEP" --model transe $MARGIN_COMMON --margin 6 --alpha 2.0
run "$WN" "$SWEEP" --model transh $MARGIN_COMMON --margin 6 --alpha 1.0
run "$WN" "$SWEEP" --model transh $MARGIN_COMMON --margin 8 --alpha 1.0
run "$WN" "$SWEEP" --model transd $MARGIN_COMMON --margin 6 --alpha 1.0
run "$WN" "$SWEEP" --model transd $MARGIN_COMMON --margin 8 --alpha 2.0

# --- 2. RotatE (the flagship adversarial rows) ---------------------------
run "$FB" "$RES" --example rotate_fb15k237 --checkpoint checkpoints/kge_rotate_fb15k237.ckpt
run "$WN" "$RES" --example rotate_wn18rr_adv --checkpoint checkpoints/kge_rotate_wn18rr_adv.ckpt

# --- 3. Zoo tail ---------------------------------------------------------
run "$WN" "$RES" --example hole_wn18rr --checkpoint checkpoints/kge_hole_wn18rr.ckpt
run "$WN" "$RES" --example simple_wn18rr --checkpoint checkpoints/kge_simple_wn18rr.ckpt
run "$WN" "$RES" --example analogy_wn18rr --checkpoint checkpoints/kge_analogy_wn18rr.ckpt
run "$FB" "$RES" --example rescal_fb15k237 --checkpoint checkpoints/kge_rescal_fb15k237.ckpt

echo "=== $(date +%H:%M:%S) queue drained"
