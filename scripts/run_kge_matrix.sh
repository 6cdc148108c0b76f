#!/usr/bin/env bash
# Run the remaining KGE validation matrix sequentially on the real chip,
# appending one JSON row per run to KGE_RESULTS.jsonl (seed + CLI recorded).
# Usage: scripts/run_kge_matrix.sh [preset ...]   (default: the full queue)
set -u
cd "$(dirname "$0")/.."
OPENKE=/root/reference/OpenKE/benchmarks
OUT=KGE_RESULTS.jsonl

run() {
  local preset=$1 data=$2
  if grep -q "\"example\": \"$preset\"" "$OUT" 2>/dev/null; then
    echo "== $preset: already recorded, skipping"
    return 0
  fi
  echo "== $preset ($(date -u +%H:%M:%S))"
  timeout 7200 python -m skghoi_tpu.tools.train_kge \
    --data "$OPENKE/$data" --example "$preset" --seed 0 \
    --json --json-out "$OUT" 2>&1 | tail -3
}

if [ $# -gt 0 ]; then
  for p in "$@"; do
    case "$p" in
      *wn18rr*) run "$p" WN18RR ;;
      *) run "$p" FB15K237 ;;
    esac
  done
  exit 0
fi

# Published-number rows first (OpenKE/README.md:90-98), then smoke rows.
run transr_fb15k237 FB15K237     # published 0.511 (TransE-warm-start recipe)
run distmult_wn18rr WN18RR       # published 0.479
run complex_wn18rr WN18RR        # published 0.485
run transr_wn18rr WN18RR         # published 0.519
run rotate_wn18rr_adv WN18RR     # published 0.565 (self-adversarial)
run hole_wn18rr WN18RR           # smoke (no published number)
run analogy_wn18rr WN18RR        # smoke
run simple_wn18rr WN18RR         # smoke
run rescal_fb15k237 FB15K237     # smoke
run rotate_fb15k237 FB15K237     # published 0.479 (no adv)
echo "== queue done ($(date -u +%H:%M:%S))"
