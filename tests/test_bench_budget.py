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
    cumulative total (which would clamp to a bogus 1.0 s estimate), and
    skipped/error rows must neither produce estimates nor shift the
    cumulative origin for the sections after them."""
    j = tmp_path / "BENCH_SECTIONS.jsonl"
    _write(j, [
        {"metric": "headline", "value": 1},
        {"section": "a", "elapsed_s": 900.0},
        {"metric": "headline", "value": 1, "total_elapsed_s": 900.0},
        # second run
        {"metric": "headline", "value": 2},
        {"section": "a", "elapsed_s": 120.0},
        {"section": "skipme", "skipped": True},
        {"section": "err", "error": "X", "elapsed_s": 500.0},
        {"section": "b", "elapsed_s": 200.0},
    ])
    est = bench._journal_estimates(str(j))
    assert est["a"] == 120.0
    assert est["b"] == 80.0
    assert "skipme" not in est and "err" not in est


def test_journal_missing_file_falls_back_empty(tmp_path):
    assert bench._journal_estimates(str(tmp_path / "nope.jsonl")) == {}
