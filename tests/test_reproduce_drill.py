"""Runbook regression: the quick-scale reproduce drill must stay green.

REPRODUCE.md's claim ("this runbook is rehearsed end-to-end") is backed by
scripts/reproduce_drill.py; round-4's full-scale run found two real bugs
(--testing split, host-serial eval) that only an end-to-end execution of
the verbatim command forms could catch. This slow-lane test keeps the
quick-scale drill (CPU, ~2.4M events, subprocess CLIs) in the suite so a
CLI/loader regression cannot silently break day-1-on-real-data again.
Reference anchor: README.md:42-75 quickstart command forms.
"""
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.mark.slow
def test_quick_scale_drill_end_to_end(tmp_path):
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "reproduce_drill.py"),
         "--scale", "quick", "--platform", "cpu",
         "--root", str(tmp_path / "drill")],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, timeout=3000,
    )
    tail = "\n".join(r.stdout.splitlines()[-25:])
    assert r.returncode == 0, f"drill failed:\n{tail}"
    assert '"drill": "ok"' in r.stdout


@pytest.mark.slow
def test_drill_stage_resume(tmp_path):
    """--start-stage must refuse a root without built data (guards the
    resume path added after a session crash orphaned a half-done drill)."""
    r = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "reproduce_drill.py"),
         "--scale", "quick", "--platform", "cpu",
         "--root", str(tmp_path / "empty"), "--start-stage", "3"],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, timeout=300,
    )
    assert r.returncode != 0
    assert "start-stage" in r.stdout
