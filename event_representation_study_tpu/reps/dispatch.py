"""Representation dispatcher — the parity surface of
representations/gen1_transforms.py:12-89 / gen4_transforms.py:12-83.

:func:`build_representation` is the jittable device path: name -> (H, W, C)
float32, already scaled by 255 like every reference branch. It is the
function the training pipeline fuses with the model forward.

:func:`get_item_transform` is the host-facing parity API with the reference's
exact signature: a NumPy structured event array in, a NumPy (H, W, C) array
out, including the reference's polarity remaps and (for TORE) the dynamic
event-bounding-box frame.
"""
from __future__ import annotations

import functools
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..events.core import EventBlock, from_structured, wire_compat
from .event_stack import event_stack
from .ergo12 import ergo12
from .histogram import event_histogram
from .mdes import mixed_density_event_stack
from .time_surface import time_surface
from .tore import tore
from .voxel_grid import voxel_grid

# channel counts per representation (SURVEY §2.1)
REPRESENTATION_CHANNELS: Dict[str, int] = {
    "VoxelGrid": 12,
    "MixedDensityEventStack": 12,
    "OptimizedRepresentation": 12,
    "EventStack": 12,
    "EventHistogram": 2,
    "TORE": 12,
    "TimeSurface": 12,
    # model-side trainable quantization (models/learned_repr.py): 2*6 bins
    "LearnedRepresentation": 12,
}


def build_representation(name: str, block: EventBlock, height: int, width: int) -> jnp.ndarray:
    """Jittable device path: (H, W, C) float32, scaled by 255 (every branch of
    gen1_transforms.py multiplies by 255)."""
    if "ToVoxelGrid" in name or name == "VoxelGrid":
        rep = voxel_grid(block, height, width, n_time_bins=12)
    elif "MixedDensityEventStack" in name or name in ("OptimizedRepresentation", "ERGO12"):
        rep = ergo12(block, height, width)
    elif "EventStack" in name:
        rep = event_stack(block, height, width, stack_size=12)
    elif "ToImage" in name or name == "EventHistogram":
        rep = event_histogram(block, height, width)
    elif "TORE" in name.upper():
        rep = tore(block, height, width, k=6)
    elif "ToTimesurface" in name or name == "TimeSurface":
        rep = time_surface(block, height, width, tau=50000.0)
    else:
        raise ValueError(f"unknown representation: {name}")
    return rep * 255.0


@functools.partial(jax.jit, static_argnames=("name", "height", "width"))
def _build_jit(name: str, block: EventBlock, height: int, width: int):
    return build_representation(name, block, height, width)


def batched_representation(name: str, height: int, width: int) -> Callable:
    """Batched jitted builder: batched EventBlock -> (B, H, W, C).

    MDES/ERGO-12 route through the fused Pallas sorted-tile kernel on TPU
    (~75x the XLA scatter lowering, see ops/pallas_scatter.py); everything
    else (and CPU) uses the vmapped segment-op path.
    """
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        fused = None
        if "MixedDensityEventStack" in name or name in (
            "OptimizedRepresentation", "ERGO12",
        ):
            from .fused_mdes import ergo12_fused_batched as fused
        elif "ToImage" in name or name == "EventHistogram":
            from .fused_reps import histogram_fused_batched as fused
        elif "ToVoxelGrid" in name or name == "VoxelGrid":
            from .fused_reps import voxel_grid_fused_batched as fused
        elif "EventStack" in name:
            from .fused_reps import event_stack_fused_batched as fused
        elif "ToTimesurface" in name or name == "TimeSurface":
            from .fused_reps import time_surface_fused_batched as fused
        if fused is not None:
            @jax.jit
            @wire_compat
            def fn(blocks: EventBlock):
                return fused(blocks, height, width) * 255.0

            return fn

    @jax.jit
    @wire_compat
    def fn(blocks: EventBlock):
        return jax.vmap(
            lambda b: build_representation(name, b, height, width)
        )(blocks)

    return fn


def get_item_transform(
    reshaped_return_data: np.ndarray,
    representation_name: str,
    transform=None,
    height: int = 240,
    width: int = 304,
    num_events: int = 50000,
    time_window: int = 1000000,
) -> np.ndarray:
    """Reference-signature host API (gen1_transforms.py:12-89).

    ``reshaped_return_data`` is a structured array with fields x, y, t, p
    (p in {-1, +1}); ``transform`` is accepted for signature parity and
    ignored (the name selects the kernel). Returns float32 (H, W, C).
    """
    del transform, time_window
    ev = reshaped_return_data
    n = len(ev)
    capacity = max(num_events, n)

    if "TORE" in representation_name.upper():
        # reference computes TORE on the event bounding box: x,y shifted by
        # min, frame sized by shifted max (gen1_transforms.py:57-64)
        x = np.asarray(ev["x"]).astype(np.int64)
        y = np.asarray(ev["y"]).astype(np.int64)
        x = x - x.min()
        y = y - y.min()
        fh, fw = int(y.max()) + 1, int(x.max()) + 1
        block = EventBlock(
            x=jnp.asarray(np.pad(x, (0, capacity - n)).astype(np.int32)),
            y=jnp.asarray(np.pad(y, (0, capacity - n)).astype(np.int32)),
            t=jnp.asarray(
                np.pad(np.asarray(ev["t"]) - int(ev["t"][0]), (0, capacity - n)).astype(np.int32)
            ),
            p=jnp.asarray(np.pad(np.asarray(ev["p"]), (0, capacity - n)).astype(np.int32)),
            num=jnp.asarray(np.int32(n)),
        )
        rep = tore(block, fh, fw, k=6) * 255.0
        return np.asarray(rep, dtype=np.float32)

    block = from_structured(ev, capacity)
    rep = _build_jit(representation_name, block, height, width)
    return np.asarray(rep, dtype=np.float32)
