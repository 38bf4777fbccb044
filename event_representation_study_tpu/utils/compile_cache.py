"""Persistent XLA compilation cache for production entry points.

The detector's eval decode graph costs ~55 s (f32) to ~400 s (bf16, cold)
to compile through a remote-compile tunnel (measured on v5e; NOTES.md
"Eval-decode compile"); the train step ~127 s. The reference ships none of
this cost (eager torch), so a production CLI run must not pay it twice:
every entry point (train/eval/infer CLIs, bench) enables jax's persistent
compile cache, keyed on the HLO, so the second process on a machine reuses
the first's executables. Equivalent role to the reference's TensorRT engine
cache for deploy (deploy/TensorRT), done the JAX way.

Tests keep this opt-in (tests/conftest.py) — an XLA-CPU segfault was once
observed with the cache in a long suite session; on TPU it is standard.
"""
from __future__ import annotations

import os


def force_platform() -> None:
    """Honor EVENT_TPU_JAX_PLATFORM=cpu|axon|tpu for subprocess tooling.

    Some managed-TPU images register their PJRT plugin from sitecustomize
    and *explicitly* set ``jax_platforms`` via config at interpreter start,
    so the JAX_PLATFORMS environment variable is silently ignored — a
    "CPU" subprocess then queues on the (single-tenant) device tunnel.
    Only ``jax.config.update("jax_platforms", ...)`` before backend init
    wins. Every CLI entry point routes through here (via
    enable_persistent_cache) so harness scripts (scripts/reproduce_drill.py,
    scripts/aug_ablation.py, 2-process multihost tests) can pin their
    children to a backend with one env var.
    """
    plat = os.environ.get("EVENT_TPU_JAX_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def enable_persistent_cache(cache_dir: str | None = None,
                            min_compile_secs: float = 2.0) -> str | None:
    """Point jax's compilation cache at a durable directory. Safe to call
    more than once and before/after backend init; returns the directory or
    None when disabled via EVENT_TPU_NO_COMPILE_CACHE=1."""
    force_platform()
    if os.environ.get("EVENT_TPU_NO_COMPILE_CACHE"):
        return None
    import jax

    cache_dir = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/event_representation_study_tpu/xla"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs
        )
    except Exception:  # never fail an entry point over a cache
        return None
    return cache_dir
