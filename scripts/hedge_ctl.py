#!/usr/bin/env python
"""Deadline-guarded CPU hedge controller for KGE scoreboard runs.

Replaces the round-3/4 /tmp shell controllers (VERDICT r4, weak #3: they
lived outside the repo, outside git, and their ledger writes landed
uncommitted).  This one:

- runs a queue of `skghoi_tpu.tools.train_kge --cpu` hedge runs, each
  auto-sized to the remaining wall budget (sec/epoch prior per recipe),
- registers every child PID in ``.hedge_pids`` so driver gates
  (``__graft_entry__``/``bench.py`` via ``gate_guard.gate_window``) can
  SIGSTOP them for the gate's duration,
- honors the ``.gate_lock`` lease itself: while a lease is fresh it keeps
  its child stopped (covers a SIGKILLed gate that could never send the
  SIGCONT), and resumes the child the moment the lease expires,
- commits ``KGE_RESULTS_CPU.jsonl`` + the run's checkpoint after every run
  (existence-guarded per-file ``git add`` — a missing pathspec must not turn
  the whole commit into a silent no-op, ADVICE r4 #1),
- never touches the TPU (children run ``--cpu`` at ``nice 19``) and never
  signals any process it did not spawn, except PIDs explicitly handed over
  with ``--adopt``.

Usage:
  python scripts/hedge_ctl.py --deadline EPOCH [--adopt PID] ITEM [ITEM...]

ITEM format: ``example:benchmark_dir:sec_per_epoch:eval_budget_s:cap_epochs``
e.g. ``transh_wn18rr_adv2:WN18RR:45:2500:600``.
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from skghoi_tpu.utils import gate_guard  # noqa: E402

BENCH_ROOT = "/root/reference/OpenKE/benchmarks"
MIN_EPOCHS = 60


def log(msg: str) -> None:
    print(f"{time.strftime('%H:%M:%S', time.gmtime())} hedge_ctl: {msg}", flush=True)


def git_commit_artifacts(message: str, paths: list[str]) -> None:
    # Per-file, existence-guarded adds: `git add a b c` stages NOTHING when
    # any one pathspec is missing (ADVICE r4 #1).
    staged = False
    for p in paths:
        if (REPO / p).exists():
            r = subprocess.run(["git", "add", p], cwd=REPO, capture_output=True)
            staged = staged or r.returncode == 0
    if not staged:
        return
    r = subprocess.run(["git", "diff", "--cached", "--quiet"], cwd=REPO)
    if r.returncode != 0:
        subprocess.run(["git", "commit", "-q", "-m", message], cwd=REPO)
        log(f"committed: {message}")


def _stopped(pid: int) -> bool:
    try:
        with open(f"/proc/{pid}/stat") as f:
            return f.read().rsplit(")", 1)[1].split()[0] == "T"
    except OSError:
        return False


def babysit(pid: int, deadline: float, grace: float = 120.0) -> int:
    """Wait for ``pid``, enforcing the gate lease and the wall deadline.

    Gate-paused time is NOT credited back — the deadline is wall-clock by
    design (the round ends at a wall time).  Returns the child's exit code,
    or -1 if we had to terminate it at the deadline.
    """
    while True:
        try:
            done, status = os.waitpid(pid, os.WNOHANG)
        except ChildProcessError:
            return 0
        if done:
            return os.waitstatus_to_exitcode(status)
        now = time.time()
        if now >= deadline + grace:
            log(f"deadline passed; terminating child {pid}")
            targets = gate_guard._with_descendants([pid])
            gate_guard._signal_all(targets, signal.SIGCONT)
            gate_guard._signal_all(targets, signal.SIGTERM)
            time.sleep(10)
            gate_guard._signal_all(gate_guard._with_descendants([pid]), signal.SIGKILL)
            try:
                os.waitpid(pid, 0)
            except ChildProcessError:
                pass
            return -1
        lease = gate_guard.lease_active()
        if lease and not _stopped(pid):
            log(f"gate lease active; pausing child {pid}")
            gate_guard._signal_all(gate_guard._with_descendants([pid]), signal.SIGSTOP)
        elif not lease and _stopped(pid):
            log(f"gate lease expired; resuming child {pid}")
            gate_guard._signal_all(gate_guard._with_descendants([pid]), signal.SIGCONT)
        time.sleep(15)


def wait_for_adopted(pid: int, deadline: float) -> None:
    """Wait (without signaling) for a pre-existing run we did not spawn."""
    gate_guard.register_hedge_pid(pid)
    while gate_guard._alive(pid) and time.time() < deadline:
        # A SIGKILLed gate can leave the adopted run stopped; resume it once
        # the lease lapses (our own children get the same treatment in
        # babysit()).
        if not gate_guard.lease_active() and _stopped(pid):
            log(f"lease expired; resuming adopted pid {pid}")
            gate_guard._signal_all(gate_guard._with_descendants([pid]), signal.SIGCONT)
        time.sleep(30)
    log(f"adopted pid {pid} finished (or deadline)")
    git_commit_artifacts(
        "KGE CPU hedge: ledger rows from adopted in-flight run",
        ["KGE_RESULTS_CPU.jsonl", "checkpoints"],
    )


def run_item(item: str, deadline: float) -> None:
    parts = item.split(":")
    example, bench, sec_per_epoch, eval_budget, cap = parts[:5]
    extra = parts[5].split(",") if len(parts) > 5 and parts[5] else []
    sec_per_epoch, eval_budget, cap = float(sec_per_epoch), float(eval_budget), int(cap)
    left = deadline - time.time()
    epochs = min(cap, int((left - eval_budget) / sec_per_epoch))
    if epochs < MIN_EPOCHS:
        log(f"SKIP {example}: only {epochs} epochs fit ({left:.0f}s left)")
        return
    ckpt = f"checkpoints/kge_{example}_cpu.ckpt"
    cmd = [
        "nice", "-n", "19", sys.executable, "-u", "-m", "skghoi_tpu.tools.train_kge",
        "--data", f"{BENCH_ROOT}/{bench}", "--example", example, "--cpu",
        "--epochs", str(epochs), "--json", "--json-out", "KGE_RESULTS_CPU.jsonl",
        "--checkpoint", ckpt,
    ] + extra
    log(f"START {example} epochs={epochs} ({left:.0f}s left)")
    logfile = open(f"/tmp/r5_hedge_{example}.log", "w")
    child = subprocess.Popen(cmd, cwd=REPO, stdout=logfile, stderr=subprocess.STDOUT)
    gate_guard.register_hedge_pid(child.pid)
    rc = babysit(child.pid, deadline)
    log(f"DONE {example} rc={rc}")
    git_commit_artifacts(
        f"KGE CPU hedge: {example} row ({epochs} epochs, sized to deadline)",
        ["KGE_RESULTS_CPU.jsonl", ckpt],
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--deadline", type=float, required=True)
    ap.add_argument("--adopt", type=int, default=None,
                    help="PID of an in-flight hedge run to wait for first")
    ap.add_argument("items", nargs="*")
    args = ap.parse_args()

    if args.adopt:
        wait_for_adopted(args.adopt, args.deadline)
    for item in args.items:
        if time.time() >= args.deadline:
            log("deadline reached; stopping queue")
            break
        run_item(item, args.deadline)
    log("queue complete")


if __name__ == "__main__":
    main()
