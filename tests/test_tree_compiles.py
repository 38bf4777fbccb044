"""Fast shipping gate: the whole tree must parse and the package import.

Round-4 postmortem (VERDICT r4 weak #1): the final commit inserted six
mis-indented lines into parallel/event_shard.py and shipped an unparseable
file — nothing in the repo would have caught it in under 15 minutes. This
test is the <5 s guard: ``python -m pytest tests/test_tree_compiles.py -q``
before ANY snapshot. It is deliberately jax-free (no device, no compile
cache) so it runs in seconds even cold.
"""
import compileall
import importlib
import pathlib
import py_compile

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
PKG = REPO / "event_representation_study_tpu"


def _py_files():
    files = sorted(PKG.rglob("*.py"))
    files += sorted((REPO / "scripts").glob("*.py"))
    files += sorted((REPO / "tests").glob("*.py"))
    files += [REPO / "bench.py", REPO / "__graft_entry__.py"]
    return [f for f in files if "__pycache__" not in f.parts]


def test_every_file_parses():
    bad = []
    for f in _py_files():
        try:
            py_compile.compile(str(f), doraise=True, cfile=None)
        except py_compile.PyCompileError as e:
            bad.append(f"{f}: {e.msg.splitlines()[0] if e.msg else e}")
    assert not bad, "unparseable files:\n" + "\n".join(bad)


def test_package_compileall():
    assert compileall.compile_dir(str(PKG), quiet=2, force=False), (
        "compileall failed — run `python -m compileall "
        "event_representation_study_tpu` for details"
    )


def test_every_module_imports():
    """Import (not just parse) every package module: catches bad imports,
    missing names, and top-level typos that py_compile can't see. jax is
    already initialized by conftest so this stays fast (~2 s warm)."""
    failed = []
    for f in sorted(PKG.rglob("*.py")):
        if "__pycache__" in f.parts:
            continue
        rel = f.relative_to(REPO).with_suffix("")
        mod = ".".join(rel.parts)
        if mod.endswith(".__init__"):
            mod = mod[: -len(".__init__")]
        try:
            importlib.import_module(mod)
        except Exception as e:  # noqa: BLE001 — report every failure kind
            failed.append(f"{mod}: {type(e).__name__}: {e}")
    assert not failed, "unimportable modules:\n" + "\n".join(failed)
