#!/bin/bash
# Round-4 chip orchestrator: wait for the axon tunnel, run the perf phase
# (the round's #1 deliverable per VERDICT r3), then hand the chip to the
# deadline-guarded KGE queue.  Never SIGTERM a live TPU process by pattern;
# the queue's own budget guard is the stop mechanism.
set -u
DEADLINE=${1:-1787056800}   # default 12:40 UTC Aug 18 — ~35 min before round end
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
    if timeout 300 python -c "import jax; ds = jax.devices(); assert ds, 'no devices'; print(ds)" >/tmp/r4_probe.log 2>&1; then
      echo "$(date -u +%H:%M:%S) TPU reachable"
      break
    fi
    echo "$(date -u +%H:%M:%S) port up but devices() failed; retrying"
  fi
  sleep 60
done

# A long pytest suite on this 1-core host triples TPU compile times
# (memory: serialize pytest-with-compiles and TPU jobs).  Freeze it (by
# explicit PID only) for the duration of the TPU phases, resume at the end.
SUITE_PID=${SUITE_PID:-}
suite_stop()   { [ -n "$SUITE_PID" ] && kill -STOP "$SUITE_PID" 2>/dev/null && echo "suite $SUITE_PID frozen"; }
suite_resume() { [ -n "$SUITE_PID" ] && kill -CONT "$SUITE_PID" 2>/dev/null && echo "suite $SUITE_PID resumed"; }
trap suite_resume EXIT

commit_artifacts() {
  # Explicit paths only: never sweep in unrelated working-tree edits.
  git add PERF_R4.json BENCH_IO_R4.jsonl KGE_RESULTS.jsonl KGE_RESULTS_CPU.jsonl checkpoints/*.ckpt 2>/dev/null
  git diff --cached --quiet || git commit -q -m "$1"
}

suite_stop
echo "$(date -u +%H:%M:%S) === perf phase ==="
timeout 3600 python -u scripts/perf_phase_r4.py 2>&1 | grep -v WARNING | tee /tmp/r4_perf_phase.log
echo "$(date -u +%H:%M:%S) perf phase exit=${PIPESTATUS[0]}"
commit_artifacts "Round-4 perf phase: measured post-freeze bench + MFU numbers (PERF_R4.json)"

left=$(( DEADLINE - $(date +%s) ))
if [ "$left" -gt 10800 ]; then
  echo "$(date -u +%H:%M:%S) === input-pipeline bench (loader + train e2e) ==="
  timeout 2400 python -u -m skghoi_tpu.tools.bench_io \
    --num-images 64 --batch-size 8 --num-workers 4 --epochs 3 --train \
    2>&1 | grep -v WARNING | tee /tmp/r4_bench_io.log
  echo "$(date -u +%H:%M:%S) bench_io exit=${PIPESTATUS[0]}"
  # A/B: host resize vs raw-uint8 transfer + on-device resize (loader only).
  timeout 900 python -u -m skghoi_tpu.tools.bench_io \
    --num-images 64 --batch-size 8 --num-workers 4 --epochs 3 --device-resize \
    2>&1 | grep -v WARNING | tee -a /tmp/r4_bench_io.log
  echo "$(date -u +%H:%M:%S) bench_io device-resize exit=${PIPESTATUS[0]}"
  grep '^{' /tmp/r4_bench_io.log > BENCH_IO_R4.jsonl 2>/dev/null || true
  commit_artifacts "Round-4 IO bench: loader-included throughput + device-resize A/B (BENCH_IO_R4.jsonl)"
else
  echo "$(date -u +%H:%M:%S) skipping bench_io (${left}s left < 3h); KGE queue first"
fi

echo "$(date -u +%H:%M:%S) === KGE queue (deadline $DEADLINE) ==="
bash scripts/run_kge_round4.sh "$DEADLINE" 2>&1 | tee /tmp/r4_kge_queue.log &
KGE_PID=$!
# Commit ledger rows as they land (a queue cut off at the deadline must not
# lose the rows it already measured).
while kill -0 "$KGE_PID" 2>/dev/null; do
  sleep 600
  commit_artifacts "Round-4 KGE queue: ledger rows measured so far"
done
wait "$KGE_PID"
commit_artifacts "Round-4 KGE queue: final ledger rows"
echo "$(date -u +%H:%M:%S) orchestrator done"
