"""Device mesh and sharding helpers.

The reference scales with one process per GPU + DDP allreduce
(SURVEY §2.7; train.py:244-253, engine.py:694-699). TPU-native replacement:
one process, a ``jax.sharding.Mesh`` over all chips, batch-sharded data
("data" axis) with parameters replicated; XLA inserts the gradient psum over
ICI. The event axis can additionally be sharded ("event" axis) for
sequence-parallel representation building — every reduction in the rep
kernels is associative, so partial per-shard scatters combine with one psum
(SURVEY §5 long-context note).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_names: Sequence[str] = ("data",)) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.array(devices).reshape(shape), axis_names)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the "data" mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch pytree with the leading axis sharded over data."""
    s = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def device_prefetch(iterator, mesh: Mesh, size: int = 2):
    """Double-buffered host->HBM staging: device_put the NEXT batch while the
    current one computes (the flax prefetch_to_device pattern; replaces the
    reference's pinned-memory DataLoader overlap). Yields whatever the
    iterator yields, with every array leaf already placed batch-sharded on
    the mesh; non-batch extras (e.g. index arrays) pass through untouched
    when they are not jax-puttable."""
    import collections

    s = data_sharding(mesh)

    def put(item):
        if isinstance(item, tuple) and len(item) == 2:
            batch, extra = item
            return jax.tree.map(lambda x: jax.device_put(x, s), batch), extra
        return jax.tree.map(lambda x: jax.device_put(x, s), item)

    queue = collections.deque()
    for item in iterator:
        queue.append(put(item))  # device_put is async: transfer starts now
        if len(queue) >= size:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
