"""Core event-stream structures.

The reference keeps events as NumPy structured arrays ``(x, y, t, p)`` with a
different ad-hoc container per subproject (torch_geometric ``Data`` in
ev-YOLOv6/yolov6/data/gen1_2yolo.py:200-208, an ``Events`` dataclass in
ev-licious/src/evlicious/io/utils/events.py:12, raw dicts elsewhere).

Here there is exactly one container: :class:`EventBlock`, a fixed-capacity,
mask-padded struct-of-arrays pytree. Fixed capacity is what makes the whole
event pipeline jittable on TPU: every sample is padded to ``capacity`` events
and carries an explicit validity count; all downstream kernels are written
against (value, mask) pairs so XLA sees only static shapes.

Conventions (matching the reference data, gen1_2yolo.py:567-571):
- x, y: int32 pixel coordinates, 0 <= x < W, 0 <= y < H
- t:    int32 microseconds, offset so the first valid event is at t=0
        (the Gen1 loader subtracts the window-start time, gen1_2yolo.py:196)
- p:    int32 polarity in {-1, +1}
- valid events occupy the first ``num`` slots; padding fills the tail.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class EventBlock:
    """Fixed-capacity padded event window (struct-of-arrays pytree).

    All arrays share the leading shape ``(..., capacity)``; ``num`` has shape
    ``(...,)``. Batched blocks are just stacked leaves — every kernel in
    :mod:`..reps` is written for a single block and lifted with ``jax.vmap``.
    """

    x: jax.Array  # int32 (..., N); int16 on the host->device wire
    y: jax.Array  # int32 (..., N); int16 on the wire
    t: jax.Array  # int32 (..., N) microseconds, window-relative
    p: jax.Array  # int32 (..., N) in {-1, +1}; int8 on the wire
    num: jax.Array  # int32 (...,) number of valid events

    @property
    def capacity(self) -> int:
        return self.x.shape[-1]

    def as_int32(self) -> "EventBlock":
        """Upcast a compact wire-format block (x/y int16, p int8 — 9 B/event
        vs 16, shipped that way because host->device transfer dominated eval
        through the tunnel) to the int32 every rep kernel computes in.
        int32 is load-bearing: JAX's weak typing keeps ``y * width + x`` in
        the NARROW input dtype, and 240*304 already overflows int16. No-op
        (returns self) for blocks that are already int32."""
        if all(a.dtype == jnp.int32 for a in (self.x, self.y, self.t, self.p)):
            return self
        return EventBlock(
            x=self.x.astype(jnp.int32),
            y=self.y.astype(jnp.int32),
            t=self.t.astype(jnp.int32),
            p=self.p.astype(jnp.int32),
            num=self.num.astype(jnp.int32),
        )

    @property
    def mask(self) -> jax.Array:
        """bool (..., N): True for valid events (the first ``num`` slots)."""
        idx = jnp.arange(self.capacity, dtype=jnp.int32)
        return idx < self.num[..., None]

    def index(self) -> jax.Array:
        """int32 (..., N): position of each event within the block."""
        shape = self.x.shape
        return jnp.broadcast_to(jnp.arange(shape[-1], dtype=jnp.int32), shape)


def wire_compat(fn):
    """Device-entry boundary for wire-format blocks.

    Decorates a function whose FIRST argument is an :class:`EventBlock` so
    it accepts both compute-format (int32) and compact wire-format blocks
    (x/y int16, p int8 — 9 B/event, see data/loader.py _wire_block). This is
    THE single upcast site for EventBlock-first entry points; Batch-level
    entry points normalize via parallel.train_step.batch_on_device. Apply it
    UNDER ``jax.jit`` so the convert fuses into the compiled program instead
    of dispatching eagerly.
    """

    @functools.wraps(fn)
    def wrapped(blocks, *args, **kwargs):
        return fn(blocks.as_int32(), *args, **kwargs)

    return wrapped


def pad_events(
    x: np.ndarray,
    y: np.ndarray,
    t: np.ndarray,
    p: np.ndarray,
    capacity: int,
) -> EventBlock:
    """Pack host NumPy event arrays into a fixed-capacity :class:`EventBlock`.

    Keeps the **last** ``capacity`` events when the input is longer, matching
    the reference's fixed-size windows that end at the label timestamp
    (gen1_2yolo.py:186-198 slices ``events[idx-50000:idx]``).
    Timestamps are re-offset so the first kept event is at t=0.
    """
    n = len(x)
    if n > capacity:
        x, y, t, p = x[-capacity:], y[-capacity:], t[-capacity:], p[-capacity:]
        n = capacity
    t = np.asarray(t, dtype=np.int64)
    if n > 0:
        t = t - t[0]

    def _pad(a, dtype):
        out = np.zeros(capacity, dtype=dtype)
        out[:n] = a
        return out

    return EventBlock(
        x=jnp.asarray(_pad(x, np.int32)),
        y=jnp.asarray(_pad(y, np.int32)),
        t=jnp.asarray(_pad(t, np.int32)),
        p=jnp.asarray(_pad(p, np.int32)),
        num=jnp.asarray(np.int32(n)),
    )


def from_structured(events: np.ndarray, capacity: int) -> EventBlock:
    """Build a block from a reference-style structured array with fields
    ``x, y, t, p`` (dtype i4, gen1_2yolo.py:569)."""
    return pad_events(events["x"], events["y"], events["t"], events["p"], capacity)


def to_structured(block: EventBlock) -> np.ndarray:
    """Inverse of :func:`from_structured`; drops padding."""
    n = int(block.num)
    out = np.zeros(n, dtype=[("x", "<i4"), ("y", "<i4"), ("t", "<i4"), ("p", "<i4")])
    out["x"] = np.asarray(block.x[:n])
    out["y"] = np.asarray(block.y[:n])
    out["t"] = np.asarray(block.t[:n])
    out["p"] = np.asarray(block.p[:n])
    return out


def stack_blocks(blocks: list[EventBlock]) -> EventBlock:
    """Stack same-capacity blocks into a batched block (leading axis B)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *blocks)


def normalize_polarity(p: np.ndarray) -> np.ndarray:
    """Map {0,1} polarities to the canonical {-1,+1} (ev-licious
    events.py:29-35 does the same normalization on load)."""
    p = np.asarray(p)
    if p.size and p.min() >= 0:
        return 2 * p.astype(np.int32) - 1
    return p.astype(np.int32)
