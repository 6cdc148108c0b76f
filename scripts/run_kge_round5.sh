#!/bin/bash
# Round-5 KGE queue — the measurement round VERDICT r4 asked for:
#   (a) RotatE WN18RR adv, sized to the time actually available (flagship,
#       published hit10 0.565, OpenKE README.md:98)
#   (b) ledger repair: re-run the five FB15K237 headline recipes so every
#       number README.md cites has a committed KGE_RESULTS.jsonl row
#   (c) zoo tail: HolE / RESCAL / SimplE / Analogy + RotatE FB15K237
#   (d) WN18RR Trans* gap runs (adv T=2 per docs/KGE_WN18RR_SEARCH.md)
#
#   bash scripts/run_kge_round5.sh <deadline-epoch-seconds> [benchmarks-dir] [out.jsonl]
#
# A job only starts if its budget fits before the deadline; each is also
# wrapped in `timeout $left` as a backstop (budgets are generous: a SIGTERM'd
# TPU process can wedge the tunnel, so the backstop should never fire on a
# healthy run).
set -u
DEADLINE=${1:?deadline as epoch seconds (date -d '...' +%s)}
BENCH=${2:-/root/reference/OpenKE/benchmarks}
OUT=${3:-KGE_RESULTS.jsonl}
WN="$BENCH/WN18RR"
FB="$BENCH/FB15K237"
cd "$(dirname "$0")/.."

run() {
  budget="$1"; data="$2"; example="$3"; shift 3
  now=$(date +%s)
  left=$((DEADLINE - now))
  if [ "$left" -lt "$budget" ]; then
    echo "=== $(date +%H:%M:%S) SKIP $example $* (needs ${budget}s, ${left}s left)"
    return 0
  fi
  echo "=== $(date +%H:%M:%S) RUN $example $* (budget ${budget}s, ${left}s left)"
  timeout "$left" python -u -m skghoi_tpu.tools.train_kge \
    --data "$data" --example "$example" --json --json-out "$OUT" \
    --checkpoint "checkpoints/kge_${example}.ckpt" "$@" \
    2>&1 | tee "/tmp/kge_r5_${example}$(echo "$*" | tr -d ' .-').log" \
    | grep -E "Epoch (0|[0-9]*00) |hit|mrr|Using|Loaded|Error|error"
}

# (a) RotatE WN18RR adv: full recipe is 6000 epochs (~1.9 s/epoch measured
# + ~900 s dim-1024 eval).  Size to at most 38% of the remaining window so
# the ledger-repair block below still fits; floor 400 — a short documented
# row beats no row (the "cli" field records the epochs actually run).
ROT_LEFT=$(( DEADLINE - $(date +%s) ))
ROT_EPOCHS=$(( (ROT_LEFT * 38 / 100 - 900) * 10 / 19 ))
[ "$ROT_EPOCHS" -gt 6000 ] && ROT_EPOCHS=6000
if [ "$ROT_EPOCHS" -ge 400 ]; then
  run $(( ROT_EPOCHS * 19 / 10 + 900 )) "$WN" rotate_wn18rr_adv --epochs "$ROT_EPOCHS" --eval-chunk 4
else
  echo "=== $(date +%H:%M:%S) SKIP rotate_wn18rr_adv (only ${ROT_EPOCHS} epochs fit)"
fi

# (d) WN18RR Trans* gap runs: adv T=2 per docs/KGE_WN18RR_SEARCH.md
# (published 0.507/0.508; T=1 measured 0.456/0.429).
run 5200 "$WN" transh_wn18rr --adv-temperature 2.0 --eval-chunk 4
run 5200 "$WN" transd_wn18rr --adv-temperature 2.0 --eval-chunk 4

# (b) FB15K237 headline ledger repair (README.md rows; TransE measured
# ~25 min on this chip in round 1).
run 2000 "$FB" transe_fb15k237
run 2600 "$FB" transh_fb15k237
run 2800 "$FB" transd_fb15k237
run 2200 "$FB" distmult_fb15k237
run 2400 "$FB" complex_fb15k237

# (c) zoo tail — models with zero committed rows.
run 2200 "$WN" hole_wn18rr
run 2800 "$FB" rescal_fb15k237
run 2200 "$WN" simple_wn18rr --epochs 1000
run 2200 "$WN" analogy_wn18rr --epochs 1000
# RotatE FB15K237 (published 0.522): FB epochs are ~3x WN's (136 vs 43
# batches); 500 epochs ~= 68k steps, the RotatE paper's step scale half-way.
run 4400 "$FB" rotate_fb15k237 --epochs 500 --eval-chunk 4

echo "=== $(date +%H:%M:%S) queue done"
