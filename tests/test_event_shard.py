"""Event-axis (sequence-parallel) representation building on a 2x4
(data x event) mesh: sharded partial scatters + psum equal the single-device
kernels (SURVEY §5 long-sequence design)."""
import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute: see pytest.ini fast lane
from jax.sharding import Mesh


def _mesh():
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    return Mesh(devs, ("data", "event"))


def _batch(B=2, cap=2048, n=1500, H=64, W=80):
    from event_representation_study_tpu.events import (
        from_structured,
        generate_fake_events,
        stack_blocks,
    )

    evs = [generate_fake_events(n, height=H, width=W, duration_us=100_000,
                                seed=i) for i in range(B)]
    return evs, stack_blocks([from_structured(e, cap) for e in evs])


def test_sharded_histogram_matches_single_device():
    from event_representation_study_tpu.parallel.event_shard import (
        place_event_sharded,
        sharded_histogram,
    )
    from event_representation_study_tpu.reps.histogram import event_histogram

    H, W = 64, 80
    evs, blocks = _batch(H=H, W=W)
    mesh = _mesh()
    placed = place_event_sharded(blocks, mesh)
    got = np.asarray(sharded_histogram(placed, H, W, mesh))
    want = np.stack([
        np.asarray(event_histogram(jax.tree.map(lambda l: l[i], blocks), H, W))
        for i in range(2)
    ])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sharded_voxel_grid_matches_single_device():
    from event_representation_study_tpu.parallel.event_shard import (
        place_event_sharded,
        sharded_voxel_grid,
    )
    from event_representation_study_tpu.reps.voxel_grid import voxel_grid

    H, W = 64, 80
    evs, blocks = _batch(H=H, W=W)
    mesh = _mesh()
    placed = place_event_sharded(blocks, mesh)
    got = np.asarray(sharded_voxel_grid(placed, H, W, mesh))
    want = np.stack([
        np.asarray(voxel_grid(jax.tree.map(lambda l: l[i], blocks), H, W))
        for i in range(2)
    ])
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_sharded_ergo12_matches_fused_kernel():
    """The HOT path event-sharded (VERDICT r2 weak #3): per-shard fused
    Pallas partials + psum/pmax equal the unsharded fused ERGO-12 kernel."""
    from event_representation_study_tpu.parallel.event_shard import (
        place_event_sharded,
        sharded_ergo12,
    )
    from event_representation_study_tpu.reps.fused_mdes import (
        ergo12_fused_batched,
    )

    H, W = 16, 64
    evs, blocks = _batch(H=H, W=W, cap=2048, n=1500)
    mesh = _mesh()
    placed = place_event_sharded(blocks, mesh)
    got = np.asarray(sharded_ergo12(placed, H, W, mesh, interpret=True))
    want = np.asarray(ergo12_fused_batched(blocks, H, W, interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_sharded_mdes_max_and_variance_channels():
    """Max aggregations ride pmax; variance moments ride psum — one channel
    of each (plus mean/sum) against the unsharded kernel, SBT windows too."""
    from event_representation_study_tpu.parallel.event_shard import (
        place_event_sharded,
        sharded_mdes,
    )
    from event_representation_study_tpu.reps.fused_mdes import (
        mdes_fused_batched,
    )

    H, W = 16, 64
    evs, blocks = _batch(H=H, W=W, cap=2048, n=1500)
    mesh = _mesh()
    placed = place_event_sharded(blocks, mesh)
    windows = (0, 4, 2, 6)
    funcs = ("timestamp", "count", "polarity", "timestamp_neg")
    aggs = ("max", "variance", "mean", "sum")
    for stacking in ("SBN", "SBT"):
        got = np.asarray(
            sharded_mdes(placed, H, W, mesh, windows, funcs, aggs, stacking,
                         interpret=True)
        )
        want = np.asarray(
            mdes_fused_batched(blocks, H, W, windows, funcs, aggs, stacking,
                               interpret=True)
        )
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_sharded_tore_matches_single_device():
    """Per-shard top-k + associative merge equals the unsharded TORE."""
    from event_representation_study_tpu.parallel.event_shard import (
        place_event_sharded,
        sharded_tore,
    )
    from event_representation_study_tpu.reps.tore import tore

    H, W = 16, 24
    evs, blocks = _batch(H=H, W=W, cap=1024, n=900)
    mesh = _mesh()
    placed = place_event_sharded(blocks, mesh)
    got = np.asarray(sharded_tore(placed, H, W, mesh))
    want = np.stack([
        np.asarray(tore(jax.tree.map(lambda l: l[i], blocks), H, W))
        for i in range(2)
    ])
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_sharded_time_surface_matches_fused_kernel():
    from event_representation_study_tpu.parallel.event_shard import (
        place_event_sharded,
        sharded_time_surface,
    )
    from event_representation_study_tpu.reps.fused_reps import (
        time_surface_fused_batched,
    )

    H, W = 64, 80
    evs, blocks = _batch(H=H, W=W)
    mesh = _mesh()
    placed = place_event_sharded(blocks, mesh)
    got = np.asarray(
        sharded_time_surface(placed, H, W, mesh, interpret=True))
    want = np.asarray(time_surface_fused_batched(blocks, H, W,
                                                 interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
