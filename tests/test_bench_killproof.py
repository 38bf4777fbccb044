"""bench.py kill-proofing (VERDICT r4 #2): the driver artifact must be
complete even when the driver's `timeout` kills the process (rc=124 in
rounds 2 and 4).

Three mechanisms, each pinned here:
  (a) planning to 80% of the deadline — _DEADLINE < _HARD_DEADLINE;
  (b) a SIGALRM per-section watchdog that turns an overrun into an
      {"error": "timeout"} line instead of a dead process;
  (c) the final merged headline line emitted from atexit AND a SIGTERM
      handler that exits 0.
"""
import json
import os
import pathlib
import signal
import subprocess
import sys
import time

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402


def test_planning_deadline_is_85pct_of_hard():
    # 0.85: with the per-section SIGALRM watchdog bounding overruns, the
    # planner only needs slack for ONE watchdog miss, not for cumulative
    # estimate drift (r4 planned to 99% and died; r5 full-capture needs
    # ~2000s of sections inside a 2400s deadline)
    assert bench._DEADLINE - bench._T0 == pytest.approx(
        0.85 * (bench._HARD_DEADLINE - bench._T0)
    )


def test_emit_final_emits_once(monkeypatch):
    lines = []
    monkeypatch.setattr(bench, "emit", lambda obj: lines.append(obj))
    monkeypatch.setitem(bench._FINAL, "headline", {"metric": "m", "value": 1})
    monkeypatch.setitem(bench._FINAL, "extras", {"extra_key": 7})
    monkeypatch.setitem(bench._FINAL, "emitted", False)
    bench._emit_final("atexit")
    bench._emit_final("atexit")  # second call (e.g. atexit after inline)
    assert len(lines) == 1
    assert lines[0]["metric"] == "m" and lines[0]["extra_key"] == 7
    assert "total_elapsed_s" in lines[0]


def test_emit_final_noop_before_headline(monkeypatch):
    lines = []
    monkeypatch.setattr(bench, "emit", lambda obj: lines.append(obj))
    monkeypatch.setitem(bench._FINAL, "headline", None)
    monkeypatch.setitem(bench._FINAL, "emitted", False)
    bench._emit_final("signal_15")
    assert lines == []  # headline not measured yet: nothing to finalize


def test_watchdog_alarm_interrupts_section():
    """SIGALRM -> SectionTimeout inside a long section body; the timer is
    one-shot and cleared afterwards."""
    old = signal.signal(signal.SIGALRM, bench._sigalrm)
    try:
        signal.setitimer(signal.ITIMER_REAL, 0.1)
        with pytest.raises(bench.SectionTimeout):
            time.sleep(5.0)
    finally:
        signal.setitimer(signal.ITIMER_REAL, 0.0)
        signal.signal(signal.SIGALRM, old)


def test_sigterm_finalizes_and_exits_zero(tmp_path):
    """A driver-style SIGTERM mid-run leaves the merged final line on
    stdout and exits 0 — the exact rc=124 failure mode of BENCH_r02/r04."""
    script = r"""
import json, os, signal, sys
sys.path.insert(0, %r)
import bench
bench.emit = lambda obj: print(json.dumps(obj), flush=True)
bench._FINAL["headline"] = {"metric": "m", "value": 1}
bench._FINAL["extras"]["sections_done"] = 3
signal.signal(signal.SIGTERM, bench._sigterm)
os.kill(os.getpid(), signal.SIGTERM)
print("UNREACHABLE")
"""
    p = subprocess.run(
        [sys.executable, "-c", script % str(REPO)],
        capture_output=True, text=True, timeout=60,
        cwd=str(tmp_path),  # keep any stray journal writes out of the repo
    )
    assert p.returncode == 0, p.stderr
    lines = [l for l in p.stdout.splitlines() if l.strip()]
    assert "UNREACHABLE" not in p.stdout
    final = json.loads(lines[-1])
    assert final["metric"] == "m" and final["sections_done"] == 3
    assert final["finalized_by"] == "signal_15"
