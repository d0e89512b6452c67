#!/usr/bin/env python
"""Measured multi-chip render scaling on the virtual CPU mesh.

    python scripts/bench_render_scaling.py [--devices 1,2,4,8]

Renders the same frame through the mesh-sharded tile path
(train/base.py::_chunk_render_fn: shard_map over the tile axis) at several
mesh sizes on the fake-device CPU backend. This host has ONE physical core,
so all virtual devices timeshare it and a throughput "speedup" is not
measurable here; what IS measurable is the SHARDING OVERHEAD: wall time at
n virtual devices vs 1 device for the same total work. overhead_ratio ~= 1.0
means shard_map partitioning adds nothing — on real chips, where each shard
runs on its own core/chip, throughput then scales linearly (rays are
embarrassingly parallel; the render path has no collective).

Self-respawns with ``--xla_force_host_platform_device_count=N`` the same way
__graft_entry__.dryrun_multichip does.
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


def run_one(n_devices: int, size: int, chunk: int, iters: int) -> float:
    """Child-process body: build a trainer on an n-device mesh, time the
    sharded full-frame render, print rays/s."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import tempfile

    from bench import build_trainer
    from moco_flow_tpu.parallel.mesh import make_mesh

    with tempfile.TemporaryDirectory() as tmp:
        trainer = build_trainer(
            os.path.join(tmp, "scene"), os.path.join(tmp, "log"),
            "float32", "xla", mesh=make_mesh(n_devices), n_rand=64,
            model_overrides={"N_samples": 32, "N_importance": 32})
        ds = trainer.val_dataset
        rays, _ = ds.frame_rays(0)
        bg = jnp.ones((rays.shape[0], 3))
        out = trainer.render_rays_chunked(rays, bg, trainer.rcfg_test,
                                          anneal=trainer.anneal(),
                                          chunk=chunk)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = trainer.render_rays_chunked(rays, bg, trainer.rcfg_test,
                                              anneal=trainer.anneal(),
                                              chunk=chunk)
            jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        return rays.shape[0] * iters / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--chunk", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--_child", type=int, default=0)
    args = ap.parse_args()

    if args._child:
        v = run_one(args._child, args.size, args.chunk, args.iters)
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
             "--size", str(args.size), "--chunk", str(args.chunk),
             "--iters", str(args.iters)],
            env=env, capture_output=True, text=True, cwd=REPO, timeout=3600)
        line = [l for l in r.stdout.splitlines() if l.startswith("RESULT")]
        assert line, (r.returncode, r.stdout[-500:], r.stderr[-2000:])
        results[n] = float(line[-1].split()[2])
        print(f"n={n}: {results[n]:.1f} rays/s", flush=True)

    base = results[min(results)]
    out = {
        "backend": "cpu-virtual-mesh (1 physical core)",
        "rays_per_sec_total_work": results,
        # ~1.0 = sharding adds no overhead -> linear scaling on real chips
        "overhead_ratio_vs_1dev": {
            n: round(base / v, 3) for n, v in results.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
