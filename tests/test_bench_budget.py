"""bench.py budget plumbing: the journal-calibrated section estimates.

Round-3's driver run skipped `detector_scanned_dispatch` purely on a stale
static estimate (VERDICT weak #1); _journal_estimates() replaces static
guesses with the most recent actual per-section deltas recorded in
BENCH_SECTIONS.jsonl. These tests pin the parser's run-delimiting rules so
a regression can't silently feed the skip-gate negative or stale numbers.
"""
import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402


def _write(journal, rows):
    with open(journal, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_journal_deltas_within_one_run(tmp_path):
    j = tmp_path / "BENCH_SECTIONS.jsonl"
    _write(j, [
        {"metric": "headline", "value": 1},
        {"section": "budget_plan", "headline_elapsed_s": 30.0},
        {"section": "a", "elapsed_s": 100.0},
        {"section": "b", "elapsed_s": 150.0},
    ])
    assert bench._journal_estimates(str(j)) == {"a": 70.0, "b": 50.0}


def test_journal_resets_between_runs(tmp_path):
    """A new run's first section must not subtract the previous run's
    cumulative total (which would clamp to a bogus 1.0 s estimate).
    Skipped rows and old-format error rows (no elapsed_s) neither produce
    estimates nor shift the origin; a NEW-format error row (elapsed_s
    stamped) must do BOTH — it consumed real wall time, and r5's journal
    showed the next section absorbing a 596 s timeout into its own
    estimate when the origin stayed stale."""
    j = tmp_path / "BENCH_SECTIONS.jsonl"
    _write(j, [
        {"metric": "headline", "value": 1},
        {"section": "a", "elapsed_s": 900.0},
        {"metric": "headline", "value": 1, "total_elapsed_s": 900.0},
        # second run
        {"metric": "headline", "value": 2},
        {"section": "a", "elapsed_s": 120.0},
        {"section": "skipme", "skipped": True},
        {"section": "oldfmt_err", "error": "X"},
        {"section": "err", "error": "timeout", "elapsed_s": 500.0},
        {"section": "b", "elapsed_s": 700.0},
    ])
    est = bench._journal_estimates(str(j))
    assert est["a"] == 120.0
    # err consumed 500-120 s and b's delta is measured from err's end,
    # not from a's
    assert est["err"] == 380.0
    assert est["b"] == 200.0
    assert "skipme" not in est and "oldfmt_err" not in est


def test_journal_error_estimate_is_lower_bound(tmp_path):
    """A later successful run overwrites a timeout-derived estimate, but a
    timeout AFTER a success keeps the larger (conservative) number."""
    j = tmp_path / "BENCH_SECTIONS.jsonl"
    _write(j, [
        {"metric": "headline", "value": 1},
        {"section": "s", "elapsed_s": 600.0},  # timed-out cost 600 …
        {"metric": "headline", "value": 1, "total_elapsed_s": 600.0},
        {"metric": "headline", "value": 2},
        {"section": "s", "elapsed_s": 300.0},  # … later succeeds in 300
    ])
    assert bench._journal_estimates(str(j))["s"] == 300.0
    _write(j, [
        {"metric": "headline", "value": 1},
        {"section": "s", "elapsed_s": 300.0},
        {"metric": "headline", "value": 1, "total_elapsed_s": 300.0},
        {"metric": "headline", "value": 2},
        {"section": "s", "error": "timeout", "elapsed_s": 600.0},
    ])
    assert bench._journal_estimates(str(j))["s"] == 600.0


def test_journal_missing_file_falls_back_empty(tmp_path):
    assert bench._journal_estimates(str(tmp_path / "nope.jsonl")) == {}


def test_thread_watchdog_publishes_and_exits(monkeypatch, capsys):
    """A main thread wedged in an uninterruptible device call defeats every
    signal-based guard (handlers only run between bytecodes); the daemon
    thread watchdog must publish the section partials + a complete final
    line on its own and hard-exit 0."""
    import time as _time

    exits = []
    monkeypatch.setattr(bench.os, "_exit", lambda code: exits.append(code))
    monkeypatch.setattr(bench, "_FINAL",
                        {"headline": None, "extras": {}, "emitted": False})
    monkeypatch.setattr(bench, "_SECTION_PARTIAL", {"warm_ms": 12.5})
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    bench._arm_thread_watchdog("wedged_section", -1.0)  # already expired
    bench._watchdog_thread()  # runs inline; returns after "exit"
    assert exits == [0]
    out = [json.loads(line) for line in
           capsys.readouterr().out.strip().splitlines() if line.strip()]
    # partial row for the wedged section, then the merged final line
    sec = [r for r in out if r.get("section") == "wedged_section"]
    assert sec and sec[0]["error"] == "thread_watchdog"
    assert sec[0]["warm_ms"] == 12.5
    final = out[-1]
    assert final["metric"] == "ergo12_rep_build_throughput"
    assert final["finalized_by"] == "thread_watchdog"
    assert final["warm_ms"] == 12.5
    assert "unit" in final and "vs_baseline" in final
