#!/bin/bash
# Round-3 KGE queue: the ledger rows VERDICT.md asks for, sequenced by
# priority with a hard deadline guard so the single tunneled TPU chip is
# free before the round's driver bench runs.
#
#   bash scripts/run_kge_round3.sh <deadline-epoch-seconds> [benchmarks-dir] [out.jsonl]
#
# A job only starts if its budget fits before the deadline; each job is also
# wrapped in `timeout` as a backstop (NB a SIGTERM'd TPU process can wedge
# the tunnel — budgets are deliberately generous so the backstop never fires
# on a healthy run).
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
    echo "=== $(date +%H:%M:%S) SKIP $example (needs ${budget}s, ${left}s left)"
    return 0
  fi
  echo "=== $(date +%H:%M:%S) RUN $example (budget ${budget}s, ${left}s left)"
  timeout "$left" python -u -m skghoi_tpu.tools.train_kge \
    --data "$data" --example "$example" --json --json-out "$OUT" \
    --checkpoint "checkpoints/kge_${example}.ckpt" "$@" \
    2>&1 | tee "/tmp/kge_r3_${example}.log" | grep -E "Epoch (0|[0-9]*00) |hit|mrr|Using|Loaded|Error|error"
}

# 1. RotatE WN18RR adv — the flagship self-adversarial row (published 0.565,
#    README.md:98; shipped recipe trains 6000 epochs ~= 3.1h on this chip,
#    which no longer fits the round). Size the epoch count to the time that
#    is actually left (measured 1.9 s/epoch + ~900 s eval margin), cap 2000,
#    floor 400 — a short documented row beats no row; the "cli" field records
#    the epoch count actually run.
ROT_LEFT=$(( DEADLINE - $(date +%s) ))
ROT_EPOCHS=$(( (ROT_LEFT - 900) * 10 / 19 ))
[ "$ROT_EPOCHS" -gt 2000 ] && ROT_EPOCHS=2000
if [ "$ROT_EPOCHS" -ge 400 ]; then
  run $(( ROT_EPOCHS * 19 / 10 + 900 )) "$WN" rotate_wn18rr_adv --epochs "$ROT_EPOCHS" --eval-chunk 4
else
  echo "=== $(date +%H:%M:%S) SKIP rotate_wn18rr_adv (only ${ROT_EPOCHS} epochs fit)"
fi
# 2-3. Zoo tail with in-tree recipes, full epoch counts.
run 2200 "$WN" hole_wn18rr
run 2800 "$FB" rescal_fb15k237
# 4-5. SimplE/Analogy WN18RR: recipe is 2000 epochs; run 1000 to fit the
#      round (the bar here is a sane committed row, no published number).
run 2200 "$WN" simple_wn18rr --epochs 1000
run 2200 "$WN" analogy_wn18rr --epochs 1000
# 6. If time remains: TransH WN18RR with the adv temperature=2 variant
#    (documented search for the 0.507 row; T=1/3000 epochs measured 0.456).
#    (documented search; the row's "cli" field records the override).
run 5200 "$WN" transh_wn18rr --adv-temperature 2.0
echo "=== $(date +%H:%M:%S) queue done"
