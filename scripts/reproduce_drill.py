#!/usr/bin/env python
"""End-to-end rehearsal of REPRODUCE.md at real file scale.

Builds a Gen1-layout Blosc-ZSTD dataset (the exact group layout + filter
flags the published files use, gen1_2yolo.py:65-82 / hdf5plugin zstd
bit-shuffle), a Gen4 npz release directory, then executes the runbook's
VERBATIM command forms as subprocesses:

  1. train 2 epochs        (REPRODUCE.md "Route B", first stage command)
  2. --testing eval        (the runbook's final command)
  3. cli.gwd C_p           (runbook section 2 — real chosen indices)
  4. cli.consolidate       (runbook section 0, Gen4 raw -> consolidated)
  5. cli.precompute_reps   (representation export)

and asserts rc=0 + sane outputs for each. Day-1 on the real data is then a
file swap: every command here is the runbook command.

Scale:
  --scale quick : ~2.4M events, small model/img, CPU-runnable (minutes)
  --scale full  : >=1e7 events in training.h5, paper config at 640**2 —
                  run on the TPU (tens of minutes, dominated by compiles)
"""
from __future__ import annotations

import argparse
import json
import os
import pathlib
import re
import subprocess
import sys
import tempfile

import numpy as np
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
PY = [sys.executable, "-m"]


STAGE_TIMEOUT = 3600  # full scale raises this: run-1 stage-1 hit 3412 s
# unloaded, and the 1-core host can be contended by a concurrent suite run


def run(cmd, cwd=REPO, timeout=None):
    timeout = timeout or STAGE_TIMEOUT
    print(f"\n=== $ {' '.join(map(str, cmd))}", flush=True)
    t0 = time.time()
    r = subprocess.run([str(c) for c in cmd], cwd=cwd, timeout=timeout,
                       stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                       text=True)
    dt = time.time() - t0
    tail = "\n".join(r.stdout.splitlines()[-12:])
    print(tail)
    print(f"=== rc={r.returncode} in {dt:.0f}s", flush=True)
    assert r.returncode == 0, f"command failed (rc={r.returncode})"
    return r.stdout


def build_data(root: pathlib.Path, scale: str):
    sys.path.insert(0, str(REPO))
    from event_representation_study_tpu.data.gen1 import write_gen1_fixture
    from event_representation_study_tpu.data.gen4 import (
        write_gen4_npz_fixture,
    )

    gen1 = root / "gen1"
    gen1.mkdir(parents=True)
    if scale == "full":
        # >=1e7 events across the training split; validation gets enough
        # windows (bbox timestamps) to cover the chosen GWD indices
        train_kw = dict(num_files=5, boxes_per_file=40,
                        events_per_file=2_000_000)
        val_kw = dict(num_files=10, boxes_per_file=2030,
                      events_per_file=1_000_000)
        test_kw = dict(num_files=2, boxes_per_file=20,
                       events_per_file=500_000)
    else:
        train_kw = dict(num_files=3, boxes_per_file=12,
                        events_per_file=400_000)
        # gwd quick run uses --limit 2 -> needs windows up to CHOSEN[8]=2193
        val_kw = dict(num_files=5, boxes_per_file=460,
                      events_per_file=200_000)
        test_kw = dict(num_files=2, boxes_per_file=6, events_per_file=100_000)

    t0 = time.time()
    for name, kw in (("training.h5", train_kw), ("validation.h5", val_kw),
                     ("testing.h5", test_kw)):
        write_gen1_fixture(gen1 / name, seed=hash(name) % 997, blosc=True,
                           learnable=True, **kw)
        sz = (gen1 / name).stat().st_size / 1e6
        print(f"built {name}: {sz:.1f} MB "
              f"({kw['num_files']}x{kw['events_per_file']} events, "
              f"{kw['num_files'] * kw['boxes_per_file']} windows)")
    gen4_npz = root / "gen4_npz"
    write_gen4_npz_fixture(gen4_npz, num_recordings=2,
                           n_events=200_000 if scale == "full" else 30_000)
    print(f"data built in {time.time() - t0:.0f}s")
    return gen1, gen4_npz


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", choices=("quick", "full"), default="quick")
    ap.add_argument("--root", type=str, default=None,
                    help="work dir (default: a fresh temp dir)")
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--img-size", type=int, default=None)
    ap.add_argument("--start-stage", type=int, default=1,
                    help="resume an interrupted drill: skip stages below "
                         "this number (requires --root pointing at the "
                         "interrupted run's work dir; stage outputs there "
                         "are reused, e.g. the stage-1 checkpoint)")
    ap.add_argument("--platform", choices=("cpu", "axon", "tpu"),
                    default=None,
                    help="pin this drill AND its subprocess commands to a "
                         "jax backend. On single-tenant managed-TPU tunnels "
                         "the quick-scale drill should run --platform cpu "
                         "so it never queues behind (or wedges) the device "
                         "owner; note JAX_PLATFORMS env alone is ignored "
                         "there (see utils/compile_cache.force_platform).")
    args = ap.parse_args()
    if args.platform:
        os.environ["EVENT_TPU_JAX_PLATFORM"] = args.platform  # children
        import jax

        jax.config.update("jax_platforms", args.platform)  # this process

    root = pathlib.Path(args.root or tempfile.mkdtemp(prefix="repro_drill_"))
    root.mkdir(parents=True, exist_ok=True)
    print(f"drill root: {root} (scale={args.scale}, "
          f"start_stage={args.start_stage})")
    if args.start_stage > 1:
        gen1, gen4_npz = root / "gen1", root / "gen4_npz"
        assert (gen1 / "training.h5").exists(), (
            "--start-stage needs the interrupted run's --root (data found "
            "neither built nor reusable)")
    else:
        gen1, gen4_npz = build_data(root, args.scale)

    full = args.scale == "full"
    if full:
        global STAGE_TIMEOUT
        STAGE_TIMEOUT = 7200
    bs = args.batch_size or (8 if full else 4)
    img = args.img_size or (640 if full else 128)
    num_ev = 50000 if full else 8192
    conf = "configs/gen1_optimized.py"
    runs = root / "runs"
    overrides = [] if full else [
        "--override", "model.depth_multiple=0.25", "model.width_multiple=0.25",
    ]

    # 1. Route B stage-1 training command (epochs shortened for the drill)
    if args.start_stage <= 1:
        run(PY + ["event_representation_study_tpu.cli.train",
                  "--conf", conf, "--data-path", gen1,
                  "--batch-size", bs, "--epochs", 2, "--img-size", img,
                  "--num-events", num_ev, "--eval-interval", 1,
                  "--output-dir", runs / "stage1"] + overrides)
    best = runs / "stage1" / "best_ckpt"
    last = runs / "stage1" / "last_ckpt"
    ckpt = best if best.exists() else last
    assert ckpt.exists(), "training produced no checkpoint"

    # 2. the runbook's final command: --testing eval from the checkpoint
    if args.start_stage <= 2:
        out = run(PY + ["event_representation_study_tpu.cli.train",
                        "--conf", conf, "--data-path", gen1, "--testing",
                        "--batch-size", bs, "--img-size", img,
                        "--num-events", num_ev,
                        "--checkpoint", ckpt,
                        "--output-dir", runs / "test"] + overrides)
        m = re.search(r"'AP':\s*([0-9.eE+-]+)", out)
        assert m and np.isfinite(float(m.group(1))), (
            "--testing eval printed no finite AP metric")

    # 3. GWD C_p (runbook section 2) — real chosen validation indices
    if args.start_stage <= 3:
        gwd_cmd = PY + ["event_representation_study_tpu.cli.gwd",
                        "--data-path", gen1,
                        "--event_representation_name",
                        "OptimizedRepresentation",
                        "--num-events", num_ev]
        if full:
            gwd_cmd += ["--batched"]
        else:
            gwd_cmd += ["--limit", "2"]
        out = run(gwd_cmd)
        m = re.search(r"mean C_p over \d+ samples: ([0-9.e+-]+|nan)", out)
        assert m and m.group(1) != "nan", "gwd produced no finite mean C_p"

    # 4. Gen4 consolidation from the release npz directory
    gen4_h5 = root / "gen4" / "training.h5"
    if args.start_stage <= 4:
        gen4_h5.parent.mkdir(parents=True, exist_ok=True)
        run(PY + ["event_representation_study_tpu.cli.consolidate",
                  gen4_npz, "--output", gen4_h5])
        assert gen4_h5.exists() and gen4_h5.stat().st_size > 0

    # 5. representation export
    run(PY + ["event_representation_study_tpu.cli.precompute_reps",
              "--data-path", gen1, "--task", "val",
              "--representation", "OptimizedRepresentation",
              "--output-dir", root / "reps",
              "--batch-size", bs, "--num-events", num_ev, "--limit", 8])
    baked = list((root / "reps").glob("**/*"))
    assert baked, "precompute_reps wrote nothing"

    print(json.dumps({"drill": "ok", "scale": args.scale,
                      "root": str(root)}))


if __name__ == "__main__":
    main()
