"""Multi-host initialization — the replacement for the reference's
``dist.init_process_group("nccl"|"gloo", init_method="env://")``
(ev-YOLOv6/tools/train.py:244-253, yolov6/utils/envs.py:12-18).

On TPU pods ``jax.distributed.initialize()`` discovers the topology from the
environment; for CPU/GPU multi-process runs the reference-style env vars map
directly:

    LOCAL_RANK / RANK / WORLD_SIZE  (torch)  ->
    JAX process_id / num_processes + COORDINATOR_ADDRESS

After initialization the global mesh spans all chips of all hosts; each host
feeds its data shard (process_index / process_count replaces the
DistributedSampler, data_load.py:115-117).
"""
from __future__ import annotations

import os
from typing import Optional, Tuple


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Initialize jax.distributed when running multi-host; no-op single-host.

    Returns (process_index, process_count) — the loader's
    (shard_id, num_shards). Resolution order: explicit args, then the
    torch-style env vars (RANK/WORLD_SIZE + MASTER_ADDR:MASTER_PORT), then
    the TPU-pod auto-detection path.
    """
    import jax

    coordinator_address = coordinator_address or _env_coordinator()
    num_processes = num_processes or _env_int("WORLD_SIZE")
    process_id = process_id if process_id is not None else _env_int("RANK")

    already = getattr(jax.distributed, "is_initialized", None)
    if callable(already) and already():
        return jax.process_index(), jax.process_count()

    if coordinator_address and num_processes and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id or 0,
        )
    else:
        # TPU pod slice: topology auto-detected. Only engage when the slice
        # really spans multiple workers (a single-worker tunnel also sets
        # TPU_WORKER_HOSTNAMES).
        workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
        if len([w for w in workers.split(",") if w]) > 1 or os.environ.get(
            "MEGASCALE_COORDINATOR_ADDRESS"
        ):
            jax.distributed.initialize()
    return jax.process_index(), jax.process_count()


def _env_coordinator() -> Optional[str]:
    if os.environ.get("COORDINATOR_ADDRESS"):
        return os.environ["COORDINATOR_ADDRESS"]
    addr = os.environ.get("MASTER_ADDR")
    port = os.environ.get("MASTER_PORT")
    if addr and port:
        return f"{addr}:{port}"
    return None


def _env_int(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v else None
