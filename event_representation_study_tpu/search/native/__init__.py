"""ctypes bindings for the host-native kernel evaluator (the C++-equivalent
of gryffin's compiled Cython extensions, SURVEY §2.8 #1-2). Builds the
shared library on first use with the system compiler; callers fall back to
the XLA implementation when no toolchain is available."""
from __future__ import annotations

import ctypes
import pathlib
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = pathlib.Path(__file__).parent
_LIB_PATH = _DIR / "libkernel_evaluator.so"
_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    src = _DIR / "kernel_evaluator.c"
    for cc in ("cc", "gcc", "clang"):
        try:
            subprocess.run(
                [cc, "-O3", "-fopenmp", "-shared", "-fPIC", str(src),
                 "-o", str(_LIB_PATH), "-lm"],
                check=True, capture_output=True,
            )
            return True
        except (OSError, subprocess.CalledProcessError):
            continue
    return False


def load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    src = _DIR / "kernel_evaluator.c"
    stale = (
        _LIB_PATH.exists()
        and src.exists()
        and src.stat().st_mtime > _LIB_PATH.stat().st_mtime
    )
    if (not _LIB_PATH.exists() or stale) and not _build():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    dp = ctypes.POINTER(ctypes.c_double)
    lp = ctypes.POINTER(ctypes.c_long)
    lib.kernel_contrib_categorical.argtypes = [
        dp, lp, lp, dp, ctypes.c_double,
        ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long,
        dp, dp, dp,
    ]
    lib.kernel_contrib_categorical.restype = None
    lib.reshape_cat_probs.argtypes = [
        dp, dp, ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_long,
        ctypes.c_double, dp,
    ]
    lib.reshape_cat_probs.restype = None
    _lib = lib
    return lib


def kernel_contrib_categorical(
    cat_probs: np.ndarray,  # (draws, obs, total_options) f64
    offsets: np.ndarray,  # (dims,) int64
    samples: np.ndarray,  # (S, dims) int64
    objs: np.ndarray,  # (obs,) f64
    inv_vol: float,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    lib = load()
    if lib is None:
        raise RuntimeError("native kernel evaluator unavailable (no C compiler)")
    cat_probs = np.ascontiguousarray(cat_probs, np.float64)
    offsets = np.ascontiguousarray(offsets, np.int64)
    samples = np.ascontiguousarray(samples, np.int64)
    objs = np.ascontiguousarray(objs, np.float64)
    draws, obs, total = cat_probs.shape
    S, dims = samples.shape
    num = np.zeros(S)
    inv_den = np.zeros(S)
    probs = np.zeros((S, obs))
    dp = ctypes.POINTER(ctypes.c_double)
    lp = ctypes.POINTER(ctypes.c_long)
    lib.kernel_contrib_categorical(
        cat_probs.ctypes.data_as(dp), offsets.ctypes.data_as(lp),
        samples.ctypes.data_as(lp), objs.ctypes.data_as(dp),
        inv_vol, draws, obs, total, dims, S,
        num.ctypes.data_as(dp), inv_den.ctypes.data_as(dp),
        probs.ctypes.data_as(dp),
    )
    return num, inv_den, probs


def reshape_cat_probs_native(
    raw_probs: np.ndarray,  # (draws, obs, options) f64 — one categorical dim
    descriptors: np.ndarray,  # (options, desc_dim) f64
    sigma: float = 1.0,
) -> np.ndarray:
    """Descriptor-space kernel reshaping, the C/OpenMP twin of
    kernels.reshape_probs_one_dim (and of the reference's Cython
    kernel_prob_reshaping, with the corrected per-descriptor average)."""
    lib = load()
    if lib is None:
        raise RuntimeError("native kernel evaluator unavailable (no C compiler)")
    raw_probs = np.ascontiguousarray(raw_probs, np.float64)
    descriptors = np.ascontiguousarray(descriptors, np.float64)
    draws, obs, options = raw_probs.shape
    desc_dim = descriptors.shape[1]
    assert desc_dim <= 64, "C twin supports up to 64 descriptor dims"
    out = np.zeros_like(raw_probs)
    dp = ctypes.POINTER(ctypes.c_double)
    lib.reshape_cat_probs(
        raw_probs.ctypes.data_as(dp), descriptors.ctypes.data_as(dp),
        draws, obs, options, desc_dim, ctypes.c_double(sigma),
        out.ctypes.data_as(dp),
    )
    return out
