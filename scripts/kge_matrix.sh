#!/bin/bash
# Round-2 KGE validation matrix: serialized TPU runs, one JSON line per run
# appended to KGE_RESULTS.jsonl (exact CLI + seed recorded in each line).
cd /root/repo
OUT=/root/repo/KGE_RESULTS.jsonl
run() {
  name=$1; shift
  echo "=== $name start $(date +%H:%M:%S)"
  python -u -m skghoi_tpu.tools.train_kge "$@" --json --json-out "$OUT" \
    > "logs/kge_${name}.log" 2>&1
  echo "=== $name done $(date +%H:%M:%S) rc=$?"
}
FB=/root/reference/OpenKE/benchmarks/FB15K237
WN=/root/reference/OpenKE/benchmarks/WN18RR

run transr_fb15k237   --data $FB --example transr_fb15k237
run transe_wn18rr     --data $WN --example transe_wn18rr
run transh_wn18rr     --data $WN --example transh_wn18rr
run transd_wn18rr     --data $WN --example transd_wn18rr
run transr_wn18rr     --data $WN --example transr_wn18rr
run distmult_wn18rr   --data $WN --example distmult_wn18rr
run complex_wn18rr    --data $WN --example complex_wn18rr
run rotate_wn18rr     --data $WN --example rotate_wn18rr_adv
run hole_wn18rr       --data $WN --example hole_wn18rr
run analogy_wn18rr    --data $WN --example analogy_wn18rr
run simple_wn18rr     --data $WN --example simple_wn18rr
run rescal_fb15k237   --data $FB --example rescal_fb15k237
echo "ALL DONE $(date)"
