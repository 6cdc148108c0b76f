#!/bin/bash
# Round-5 chip orchestrator: wait for the axon tunnel, then measure-first
# (VERDICT r4 #2 — perf phase, IO bench) and hand the chip to the
# deadline-guarded KGE queue.  Differences from r4:
#   - hedge jobs are frozen via the gate-guard LEASE (not ad-hoc PID
#     freezing): scripts/hedge_ctl.py keeps its children SIGSTOPped while
#     .gate_lock is fresh, so TPU compiles get the whole core;
#   - commits stage files individually with an existence guard (ADVICE r4:
#     `git add a b c` is all-or-nothing on a missing pathspec).
# Never SIGTERM a live TPU process by pattern; budgets are the stop mechanism.
set -u
DEADLINE=${1:-1787085000}   # default 20:30 UTC Aug 18 — ~40 min before round end
cd /root/repo

echo "$(date -u +%H:%M:%S) waiting for tunnel (port 8103)..."
while true; do
  now=$(date +%s)
  if [ "$now" -ge "$DEADLINE" ]; then
    echo "$(date -u +%H:%M:%S) deadline hit while waiting; giving up"
    exit 1
  fi
  if curl -s -m 3 -o /dev/null http://127.0.0.1:8103/; then
    echo "$(date -u +%H:%M:%S) port up; probing jax.devices()"
    if timeout 300 python -c "import jax; ds = jax.devices(); assert ds, 'no devices'; print(ds)" >/tmp/r5_probe.log 2>&1; then
      echo "$(date -u +%H:%M:%S) TPU reachable"
      break
    fi
    echo "$(date -u +%H:%M:%S) port up but devices() failed; retrying"
  fi
  sleep 60
done

# Freeze hedge jobs for the TPU phases: extend the gate lease; hedge_ctl
# pauses its children while it is fresh.  Renewed per phase below.
lease()   { python -m skghoi_tpu.utils.gate_guard lease "$1" >/dev/null; }
release() { python -m skghoi_tpu.utils.gate_guard release >/dev/null; }
trap release EXIT

commit_artifacts() {
  # Per-file existence-guarded adds (ADVICE r4 #1): one missing pathspec
  # must not silently void the whole crash-durability commit.
  staged=0
  for f in PERF_R5.json BENCH_IO_R5.jsonl KGE_RESULTS.jsonl KGE_RESULTS_CPU.jsonl checkpoints/*.ckpt; do
    [ -e "$f" ] && git add "$f" 2>/dev/null && staged=1
  done
  [ "$staged" = 1 ] || return 0
  git diff --cached --quiet || git commit -q -m "$1"
}

lease 4200
echo "$(date -u +%H:%M:%S) === perf phase ==="
timeout 3600 python -u scripts/perf_phase_r5.py 2>&1 | grep -v WARNING | tee /tmp/r5_perf_phase.log
echo "$(date -u +%H:%M:%S) perf phase exit=${PIPESTATUS[0]}"
commit_artifacts "Round-5 perf phase: measured post-freeze bench + MFU + compile-time numbers (PERF_R5.json)"

left=$(( DEADLINE - $(date +%s) ))
if [ "$left" -gt 10800 ]; then
  lease 3600
  echo "$(date -u +%H:%M:%S) === input-pipeline bench (loader + train e2e) ==="
  timeout 2400 python -u -m skghoi_tpu.tools.bench_io \
    --num-images 64 --batch-size 8 --num-workers 4 --epochs 3 --train \
    2>&1 | grep -v WARNING | tee /tmp/r5_bench_io.log
  echo "$(date -u +%H:%M:%S) bench_io exit=${PIPESTATUS[0]}"
  timeout 900 python -u -m skghoi_tpu.tools.bench_io \
    --num-images 64 --batch-size 8 --num-workers 4 --epochs 3 --device-resize \
    2>&1 | grep -v WARNING | tee -a /tmp/r5_bench_io.log
  echo "$(date -u +%H:%M:%S) bench_io device-resize exit=${PIPESTATUS[0]}"
  grep '^{' /tmp/r5_bench_io.log > BENCH_IO_R5.jsonl 2>/dev/null || true
  commit_artifacts "Round-5 IO bench: loader-included throughput + device-resize A/B (BENCH_IO_R5.jsonl)"
else
  echo "$(date -u +%H:%M:%S) skipping bench_io (${left}s left < 3h); KGE queue first"
fi

echo "$(date -u +%H:%M:%S) === KGE queue (deadline $DEADLINE) ==="
# Keep the lease fresh from a sidecar while the queue runs (TPU KGE jobs are
# also starved by host CPU contention during their compiles).
( while true; do lease 1200; sleep 600; done ) &
LEASE_PID=$!
bash scripts/run_kge_round5.sh "$DEADLINE" 2>&1 | tee /tmp/r5_kge_queue.log &
KGE_PID=$!
while kill -0 "$KGE_PID" 2>/dev/null; do
  sleep 600
  commit_artifacts "Round-5 KGE queue: ledger rows measured so far"
done
wait "$KGE_PID"
kill "$LEASE_PID" 2>/dev/null
release
commit_artifacts "Round-5 KGE queue: final ledger rows"
echo "$(date -u +%H:%M:%S) orchestrator done"
