#!/usr/bin/env python
"""Profile the render/train hot path on the real TPU and print the op-level
time breakdown (the PERF.md workflow: jax.profiler trace -> ProfileData).

    python scripts/profile_hotpath.py --mode render --steps 3
    python scripts/profile_hotpath.py --mode train  --steps 3

Prints the top-K XLA ops by self time, grouped by fusion kind, so kernel work
targets measured cost, not guesses.
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def trace_once(mode: str, steps: int, dtype: str, impl: str, n_rand: int,
               trace_dir: str, fine_budget: int = 0,
               student: str = "4x128") -> float:
    """Returns the traced section's WALL seconds (compare against the
    trace's device-busy total to expose host/dispatch glue)."""
    import time

    import jax
    from bench import bench_render, bench_train, build_trainer

    with tempfile.TemporaryDirectory() as tmp:
        trainer = build_trainer(os.path.join(tmp, "scene"),
                                os.path.join(tmp, "log"), dtype, impl,
                                mesh=None, n_rand=n_rand,
                                fine_budget=fine_budget)
        if mode == "occ_exact":
            # the round-5 headline axis (bench.py::_occ_axes exact-sampling
            # + occ-skip + packed stream, occ_tighten 0): where does the
            # 774k-vs-930k-bound per-view overhead live? Teacher field, no
            # student; reference sample counts.
            import jax.numpy as jnp
            from bench_occupancy import distill_sharp_field, time_render
            trainer.config.raw["model"]["occ_res"] = 192
            trainer.config.raw["model"]["occ_tighten"] = 0
            distill_sharp_field(trainer, trainer.smpl_data, steps=250)
            jax.block_until_ready(trainer.params)
            trainer.occupancy_grid(0)
            ds = trainer.val_dataset
            rays, _ = ds.frame_rays(0)
            bg = jnp.ones((rays.shape[0], 3))
            import dataclasses
            rcfg = dataclasses.replace(trainer.rcfg_test, fine_budget=0,
                                       coarse_probe=0)
            time_render(trainer, rays, bg, rcfg, 2, tighten_frame=0,
                        ray_skip=True)  # compile outside the trace
            t0 = time.perf_counter()
            with jax.profiler.trace(trace_dir):
                time_render(trainer, rays, bg, rcfg, steps, tighten_frame=0,
                            ray_skip=True)
            return time.perf_counter() - t0
        if mode == "occ_student":
            # reproduce the bench's glue-bound axis (bench.py::_occ_axes):
            # distilled sharp field -> 4x128 student -> occupancy grid ->
            # pipelined masked renders (PERF.md round-4: the student renders
            # at the same speed with exact sampling as with budget knobs —
            # glue-bound, not FLOP-bound; this mode measures WHERE the
            # non-kernel time lives)
            import jax.numpy as jnp
            from bench_occupancy import distill_sharp_field, time_render
            from moco_flow_tpu.render.distill import distill_student
            trainer.config.raw["model"]["occ_res"] = 64
            distill_sharp_field(trainer, trainer.smpl_data, steps=250)
            d, w = (int(v) for v in student.split("x"))
            distill_student(trainer, depth=d, width=w, steps=300)
            jax.block_until_ready(trainer.params)
            trainer.occupancy_grid(0)
            ds = trainer.val_dataset
            rays, _ = ds.frame_rays(0)
            bg = jnp.ones((rays.shape[0], 3))
            import dataclasses
            rcfg = dataclasses.replace(trainer.rcfg_test, fine_budget=0,
                                       coarse_probe=0)
            time_render(trainer, rays, bg, rcfg, 1, tighten_frame=0,
                        ray_skip=True)  # compile outside the trace
            t0 = time.perf_counter()
            with jax.profiler.trace(trace_dir):
                time_render(trainer, rays, bg, rcfg, steps, tighten_frame=0,
                            ray_skip=True)
            return time.perf_counter() - t0
        # compile outside the trace
        if mode == "train":
            bench_train(trainer, 1)
        else:
            bench_render(trainer, 1)
        t0 = time.perf_counter()
        with jax.profiler.trace(trace_dir):
            if mode == "train":
                bench_train(trainer, steps)
            else:
                bench_render(trainer, steps)
        return time.perf_counter() - t0


def _bucket(name: str) -> str:
    """Group op names into readable cost buckets."""
    n = name.lower()
    if "custom-call" in n or "tpu_custom_call" in n or "mosaic" in n:
        return "pallas kernels"
    if n.startswith("%fusion") or ".fusion" in n:
        return "fusions"
    if "convolution" in n or "dot" in n:
        return "matmuls"
    if "copy" in n or "bitcast" in n or "transpose" in n or "reshape" in n:
        return "layout/copies"
    if "dynamic" in n or "gather" in n or "scatter" in n or "slice" in n:
        return "gather/slice"
    if "sort" in n:
        return "sort"
    if "reduce" in n or "cumsum" in n or "cumprod" in n:
        return "reductions"
    return "other"


def summarize(trace_dir: str, top_k: int = 40, wall_s: float = 0.0) -> None:
    """Sum ONLY the 'XLA Ops' line (module/step lines double-count; async
    copy-start spans overlap compute — CLAUDE.md pitfall #6)."""
    from jax.profiler import ProfileData
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane.pb under {trace_dir}"
    # NEWEST trace — the default trace_dir persists across runs, and an old
    # xplane.pb here once profiled a week-old graph (cost an afternoon)
    pd = ProfileData.from_file(max(paths, key=os.path.getmtime))
    per_op = collections.Counter()
    per_bucket = collections.Counter()
    for plane in pd.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                per_op[ev.name] += ev.duration_ns
                per_bucket[_bucket(ev.name)] += ev.duration_ns
    total = sum(per_op.values())
    print(f"total 'XLA Ops' time: {total/1e6:.1f} ms over "
          f"{len(per_op)} op names")
    if wall_s:
        # device-busy vs wall: the gap is host glue + dispatch + transfers
        # (trace op times are ~20-45% inflated vs bench wall, CLAUDE.md #6,
        # so treat the busy fraction as an upper bound on device work)
        print(f"traced wall: {wall_s*1e3:.1f} ms; device-busy/wall = "
              f"{total/1e6/(wall_s*1e3):.2f} (gap = host glue/dispatch)")
    print("-- buckets --")
    for name, ns in per_bucket.most_common():
        print(f"{ns/1e6:9.2f} ms  {100*ns/total:5.1f}%  {name}")
    print("-- top ops --")
    for name, ns in per_op.most_common(top_k):
        print(f"{ns/1e6:9.2f} ms  {100*ns/total:5.1f}%  {name[:140]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="render",
                    choices=["train", "render", "occ_student", "occ_exact"])
    ap.add_argument("--student", default="4x128")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--impl", default="auto")
    ap.add_argument("--n_rand", type=int, default=1024)
    ap.add_argument("--fine_budget", type=int, default=0)
    ap.add_argument("--trace_dir", default="/tmp/mocoflow_trace")
    ap.add_argument("--summarize_only", action="store_true")
    args = ap.parse_args()
    wall = 0.0
    if not args.summarize_only:
        os.makedirs(args.trace_dir, exist_ok=True)
        wall = trace_once(args.mode, args.steps, args.dtype, args.impl,
                          args.n_rand, args.trace_dir, args.fine_budget,
                          student=args.student)
    summarize(args.trace_dir, wall_s=wall)


if __name__ == "__main__":
    main()
