"""utils/compile_cache: persistent-cache wiring + backend pinning.

The production entry points all route through enable_persistent_cache()
(REPRODUCE.md runs must not pay the ~400 s bf16 eval compile twice), and
force_platform() is the one mechanism that actually works for pinning a
subprocess to CPU on managed-TPU images whose sitecustomize sets
``jax_platforms`` via config (JAX_PLATFORMS env alone is ignored there —
see NOTES.md "the axon tunnel is single-tenant").
"""
import os

import jax

from event_representation_study_tpu.utils.compile_cache import (
    enable_persistent_cache,
    force_platform,
)


def _restore(key, old):
    if old is None:
        os.environ.pop(key, None)
    else:
        os.environ[key] = old


def test_enable_persistent_cache_sets_config(tmp_path):
    old_dir = jax.config.jax_compilation_cache_dir
    old_min = jax.config.jax_persistent_cache_min_compile_time_secs
    old_env = os.environ.pop("EVENT_TPU_NO_COMPILE_CACHE", None)  # conftest
    try:
        got = enable_persistent_cache(cache_dir=str(tmp_path / "xla"))
        assert got == str(tmp_path / "xla")
        assert os.path.isdir(got)
        assert jax.config.jax_compilation_cache_dir == got
        assert jax.config.jax_persistent_cache_min_compile_time_secs == 2.0
    finally:
        _restore("EVENT_TPU_NO_COMPILE_CACHE", old_env)
        jax.config.update("jax_compilation_cache_dir", old_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", old_min)


def test_enable_persistent_cache_opt_out(tmp_path):
    old = os.environ.get("EVENT_TPU_NO_COMPILE_CACHE")
    old_dir = jax.config.jax_compilation_cache_dir
    try:
        os.environ["EVENT_TPU_NO_COMPILE_CACHE"] = "1"
        assert enable_persistent_cache(str(tmp_path / "never")) is None
        assert not (tmp_path / "never").exists()
        assert jax.config.jax_compilation_cache_dir == old_dir
    finally:
        _restore("EVENT_TPU_NO_COMPILE_CACHE", old)


def test_force_platform_pins_config():
    # The suite runs on CPU already (conftest), so pinning to "cpu" is a
    # safe way to exercise the env-var -> config path for real.
    old = os.environ.get("EVENT_TPU_JAX_PLATFORM")
    try:
        os.environ["EVENT_TPU_JAX_PLATFORM"] = "cpu"
        force_platform()
        assert jax.config.jax_platforms == "cpu"
        assert jax.devices()[0].platform == "cpu"
    finally:
        _restore("EVENT_TPU_JAX_PLATFORM", old)


def test_force_platform_noop_without_env():
    old = os.environ.pop("EVENT_TPU_JAX_PLATFORM", None)
    try:
        before = jax.config.jax_platforms
        force_platform()
        assert jax.config.jax_platforms == before
    finally:
        _restore("EVENT_TPU_JAX_PLATFORM", old)
