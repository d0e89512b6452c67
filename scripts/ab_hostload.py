"""A/B: occ render axes solo vs under a synthetic host CPU load
(round-4 verdict item 2 — the round-4 occ axes lost ~25% to background
host activity; the packed streamer should make them robust).

Runs the bench's occ measurement twice on the SAME trainer/field — once
solo, once with N busy-loop processes saturating the host — and reports
the suppression. Keep N modest (the host has one core; a fully saturated
core starves even a single dispatch thread — the realistic scenario is
"something else is running", not "the bench is deprioritized entirely").

    python scripts/ab_hostload.py [--load 1] [--reps 10]
"""

import argparse
import dataclasses
import json
import multiprocessing
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))


def _busy():
    x = 1.0
    while True:
        x = x * 1.0000001 + 1e-9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--load", type=int, default=1,
                    help="number of busy-loop load processes")
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--occ_grid_res", type=int, default=192)
    args = ap.parse_args()

    import jax.numpy as jnp
    from bench import build_trainer
    from bench_occupancy import distill_sharp_field, time_render
    from moco_flow_tpu.parallel.mesh import make_mesh

    tmp = tempfile.mkdtemp(prefix="ab_hostload_")
    trainer = build_trainer(os.path.join(tmp, "scene"),
                            os.path.join(tmp, "log"), "bfloat16", "auto",
                            make_mesh(1), fine_budget=128, coarse_probe=32,
                            model_overrides={"nerf_activate_type": "relu"})
    trainer.config.raw["model"]["occ_res"] = args.occ_grid_res
    distill_sharp_field(trainer, trainer.smpl_data, steps=250)
    ds = trainer.val_dataset
    rays, _ = ds.frame_rays(0)
    bg = jnp.ones((rays.shape[0], 3))
    rcfg_e = dataclasses.replace(trainer.rcfg_test, fine_budget=0,
                                 coarse_probe=0)
    trainer.config.raw["model"]["occ_tighten"] = 0
    trainer.occupancy_grid(0)

    def measure():
        r, _ = time_render(trainer, rays, bg, rcfg_e, args.reps,
                           tighten_frame=0, ray_skip=True)
        return r

    measure()  # compile everything
    solo = [measure() for _ in range(2)]

    procs = [multiprocessing.Process(target=_busy, daemon=True)
             for _ in range(args.load)]
    for p in procs:
        p.start()
    time.sleep(1.0)
    loaded = [measure() for _ in range(2)]
    for p in procs:
        p.terminate()

    solo_best, loaded_best = max(solo), max(loaded)
    print(json.dumps({
        "axis": "exact_sampling_occ_skip",
        "solo_rays_s": round(solo_best, 1),
        "loaded_rays_s": round(loaded_best, 1),
        "load_procs": args.load,
        "suppression_pct": round(100 * (1 - loaded_best / solo_best), 1),
    }))


if __name__ == "__main__":
    main()
