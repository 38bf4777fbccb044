"""Wire-format property tests (VERDICT r4 #4).

The loader ships compact wire blocks (x/y int16, p int8 — 9 B/event vs 16,
data/loader.py _wire_block) because host->device transfer dominated eval
through the tunnel. Round 4 sprinkled ``as_int32()`` at N consumer entries
and a mechanical edit at 6 of those sites shipped an unparseable file. The
redesign: ONE upcast boundary — ``events.core.wire_compat`` for
EventBlock-first entries, ``parallel.train_step.batch_on_device`` for Batch
entries. These tests (a) prove every public device-entry function accepts a
wire-format block and computes the same result as with int32 blocks, and
(b) pin the call-site count so the sprinkle cannot silently return.
"""
import pathlib
import re

import jax
import numpy as np
import pytest

from event_representation_study_tpu.events import (
    from_structured,
    generate_fake_events,
    stack_blocks,
)
from event_representation_study_tpu.events.core import EventBlock


def _wire_and_int32(B=2, cap=2048, n=1500, H=64, W=80):
    evs = [
        generate_fake_events(n, height=H, width=W, duration_us=100_000, seed=i)
        for i in range(B)
    ]
    blocks = stack_blocks([from_structured(e, cap) for e in evs])
    ev = np.stack(
        [
            np.stack(
                [np.asarray(l) for l in (blocks.x[i], blocks.y[i], blocks.t[i], blocks.p[i])]
            )
            for i in range(B)
        ]
    )  # (B, 4, cap)
    from event_representation_study_tpu.data.loader import EventBatchLoader

    wire = EventBatchLoader._wire_block(ev, np.asarray(blocks.num))
    assert wire.x.dtype == np.int16 and wire.p.dtype == np.int8
    return wire, blocks


@pytest.mark.parametrize(
    "name",
    ["ToImage", "VoxelGrid", "EventStack", "OptimizedRepresentation",
     "TORE", "ToTimesurface"],
)
def test_batched_representation_accepts_wire(name):
    """Every dispatcher entry point gives identical output for wire-format
    and compute-format blocks — the upcast is wire_compat's job, not the
    caller's."""
    from event_representation_study_tpu.reps.dispatch import (
        batched_representation,
    )

    H, W = 64, 80
    wire, blocks = _wire_and_int32(H=H, W=W)
    fn = batched_representation(name, H, W)
    got = np.asarray(fn(jax.tree.map(np.asarray, wire)))
    want = np.asarray(fn(blocks))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_eval_and_train_batch_normalize_on_device():
    """batch_on_device upcasts a wire Batch exactly once and is idempotent."""
    from event_representation_study_tpu.parallel.train_step import (
        Batch,
        batch_on_device,
    )

    wire, blocks = _wire_and_int32()
    b = Batch(
        images=None,
        events=wire,
        gt_labels=np.zeros((2, 4), np.int32),
        gt_bboxes=np.zeros((2, 4, 4), np.float32),
        gt_mask=np.zeros((2, 4), np.float32),
    )
    up = batch_on_device(b)
    assert up.events.x.dtype == np.int32 and up.events.p.dtype == np.int32
    again = batch_on_device(up)
    assert again.events is up.events  # as_int32 is a no-op on int32 blocks
    np.testing.assert_array_equal(np.asarray(up.events.x), np.asarray(blocks.x))
    np.testing.assert_array_equal(np.asarray(up.events.p), np.asarray(blocks.p))


@pytest.mark.slow
def test_event_sharded_entries_accept_wire():
    """The sharded_* public functions (the file round 4 broke) accept wire
    blocks and match their own int32 result."""
    from jax.sharding import Mesh

    from event_representation_study_tpu.parallel.event_shard import (
        place_event_sharded,
        sharded_histogram,
        sharded_voxel_grid,
    )

    H, W = 64, 80
    wire, blocks = _wire_and_int32(H=H, W=W)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4), ("data", "event"))
    for fn in (sharded_histogram, sharded_voxel_grid):
        got = np.asarray(fn(place_event_sharded(
            jax.tree.map(jax.numpy.asarray, wire), mesh), H, W, mesh))
        want = np.asarray(fn(place_event_sharded(blocks, mesh), H, W, mesh))
        np.testing.assert_allclose(got, want, atol=1e-5)


def test_upcast_boundary_is_single():
    """Pin the as_int32 call-site count: the definition (events/core.py),
    the wire_compat boundary, and batch_on_device. Any new `.as_int32()`
    caller means the sprinkle is back — route it through wire_compat or
    batch_on_device instead."""
    pkg = pathlib.Path(__file__).resolve().parent.parent / (
        "event_representation_study_tpu"
    )
    callers = []
    for f in sorted(pkg.rglob("*.py")):
        if "__pycache__" in f.parts:
            continue
        for i, line in enumerate(f.read_text().splitlines(), 1):
            if re.search(r"\.as_int32\(\)", line):
                callers.append(f"{f.relative_to(pkg)}:{i}")
    allowed = {"events/core.py", "parallel/train_step.py"}
    bad = [c for c in callers if c.split(":")[0] not in allowed]
    assert not bad, f"as_int32 sprinkle is back: {bad}"
    assert len(callers) <= 2, f"too many as_int32 call sites: {callers}"
