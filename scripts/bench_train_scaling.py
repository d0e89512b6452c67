#!/usr/bin/env python
"""Measured multi-chip TRAIN-step scaling on the virtual CPU mesh.

    python scripts/bench_train_scaling.py [--devices 1,2,4,8]

Runs the full stage-3 training step (sampling, NoF chain, coarse+fine NeRF,
losses, gradient psum, dual optimizer) through parallel/mesh.py::dp_jit at
several mesh sizes at EQUAL GLOBAL BATCH (per-chip N_rand = total/n — the
reference's per-GPU semantics). One physical core timeshares every virtual
device, so absolute throughput is meaningless here; the measurable quantity
is the DP overhead: wall time at n devices vs 1 device for the same total
work. A ratio ~1.0 means the shard_map + psum machinery adds nothing and
real-chip scaling is linear up to the (tiny, ~1.5M-param) gradient
all-reduce. Companion to scripts/bench_render_scaling.py (render axis).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_one(n_devices: int, total_rays: int, iters: int) -> float:
    import jax
    jax.config.update("jax_platforms", "cpu")
    import tempfile

    from bench import build_trainer
    from moco_flow_tpu.parallel.mesh import make_mesh

    with tempfile.TemporaryDirectory() as tmp:
        trainer = build_trainer(
            os.path.join(tmp, "scene"), os.path.join(tmp, "log"),
            "float32", "xla", mesh=make_mesh(n_devices),
            n_rand=total_rays // n_devices,
            model_overrides={"N_samples": 32, "N_importance": 32})
        for _ in range(2):  # compile + warm
            trainer.train_func()
            trainer.clock.tick(trainer.world_size)
        jax.block_until_ready(trainer.params)
        t0 = time.perf_counter()
        for _ in range(iters):
            trainer.train_func()
            trainer.clock.tick(trainer.world_size)
        jax.block_until_ready(trainer.params)
        dt = time.perf_counter() - t0
        return total_rays * iters / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--total_rays", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--_child", type=int, default=0)
    args = ap.parse_args()

    if args._child:
        v = run_one(args._child, args.total_rays, args.iters)
        print(f"RESULT {args._child} {v:.1f}", flush=True)
        return

    results = {}
    for n in (int(x) for x in args.devices.split(",")):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        flags = [f for f in env.get("XLA_FLAGS", "").split()
                 if "xla_force_host_platform_device_count" not in f]
        env["XLA_FLAGS"] = " ".join(
            flags + [f"--xla_force_host_platform_device_count={n}"])
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--_child", str(n),
             "--total_rays", str(args.total_rays),
             "--iters", str(args.iters)],
            env=env, capture_output=True, text=True, cwd=REPO, timeout=3600)
        line = [l for l in r.stdout.splitlines() if l.startswith("RESULT")]
        assert line, (r.returncode, r.stdout[-500:], r.stderr[-2000:])
        results[n] = float(line[-1].split()[2])
        print(f"n={n}: {results[n]:.1f} rays/s", flush=True)

    base = results[min(results)]
    out = {
        "backend": "cpu-virtual-mesh (1 physical core)",
        "equal_global_batch_rays": args.total_rays,
        "rays_per_sec_total_work": results,
        # ~1.0 = DP machinery adds no overhead -> linear scaling on chips
        "overhead_ratio_vs_1dev": {
            n: round(base / v, 3) for n, v in results.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
