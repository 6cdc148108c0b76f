"""Gate guard: registered background jobs pause during a gate window.

Covers the round-4 failure mode (builder hedge jobs starving a driver gate's
XLA compile): registration, descendant discovery via /proc, SIGSTOP/SIGCONT
around the window, lease-file lifecycle, and dead-PID pruning.  No JAX.
"""

import os
import subprocess
import time

import pytest

from skghoi_tpu.utils import gate_guard


def _state(pid: int) -> str:
    with open(f"/proc/{pid}/stat") as f:
        return f.read().rsplit(")", 1)[1].split()[0]


@pytest.fixture
def clean_registry(tmp_path, monkeypatch):
    monkeypatch.setattr(gate_guard, "HEDGE_PIDS", tmp_path / "hedge_pids")
    monkeypatch.setattr(gate_guard, "GATE_LOCK", tmp_path / "gate_lock")
    return tmp_path


def test_gate_window_pauses_and_resumes(clean_registry):
    # A shell parent with a sleep child exercises descendant discovery.
    proc = subprocess.Popen(["sh", "-c", "sleep 60"])
    try:
        gate_guard.register_hedge_pid(proc.pid)
        assert gate_guard.registered_pids() == [proc.pid]
        time.sleep(0.2)  # let the child spawn

        with gate_guard.gate_window(lease_seconds=60):
            assert gate_guard.lease_active()
            deadline = time.time() + 5
            while _state(proc.pid) != "T" and time.time() < deadline:
                time.sleep(0.05)
            assert _state(proc.pid) == "T"
            # The sleep grandchild must be stopped too.
            kids = gate_guard._children_map().get(proc.pid, [])
            assert kids and all(_state(k) == "T" for k in kids)

        assert _state(proc.pid) in ("S", "R")
        assert not gate_guard.lease_active()
        assert not gate_guard.GATE_LOCK.exists()
    finally:
        proc.terminate()
        proc.wait()


def test_gate_window_noop_without_registry(clean_registry):
    with gate_guard.gate_window(lease_seconds=5):
        assert gate_guard.lease_active()
    assert not gate_guard.lease_active()


def test_prune_dead_drops_exited_pids(clean_registry):
    proc = subprocess.Popen(["true"])
    proc.wait()
    gate_guard.register_hedge_pid(proc.pid)
    assert gate_guard.prune_dead() == []
    assert gate_guard.registered_pids() == []


def test_never_stops_own_ancestors(clean_registry):
    # Registering our own PID (a polluted registry) must not freeze the gate.
    gate_guard.register_hedge_pid(os.getpid())
    with gate_guard.gate_window(lease_seconds=5):
        pass  # reaching here at all proves we weren't SIGSTOPped


def test_lease_expiry(clean_registry):
    gate_guard.GATE_LOCK.write_text(f"{time.time() - 1:.0f}\n")
    assert not gate_guard.lease_active()
    gate_guard.GATE_LOCK.write_text(f"{time.time() + 30:.0f}\n")
    assert gate_guard.lease_active()
    gate_guard.GATE_LOCK.write_text("garbage")
    assert not gate_guard.lease_active()
