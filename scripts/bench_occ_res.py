#!/usr/bin/env python
"""Occupancy-grid resolution sweep on the occ render axes.

Replicates bench.py::_occ_axes (same trainer, same 250-step distilled sharp
field) but sweeps occ_res for the exact-sampling + ray-skip (tighten OFF)
axis and the budget+occ axis. Reports rays/s, psnr-vs-exact, empty_frac,
and the one-time grid build seconds per resolution (first build — includes
that resolution's compiles; bench.py reports the steady-state rebuild).

Source of the PERF.md round-4 "knee at 192" table: finer grids tighten the
per-cell sigma upper bound, so MORE rays are provably empty AND the skipped
set is closer to exactly-background — quality and speed improve together
until the grid build cost bites (ref for the skip semantics it bounds:
trainer_moco_flow.py:226-268; rendering.py:195-375).
"""
import dataclasses, io, json, os, sys, tempfile, time, contextlib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from bench import build_trainer
from bench_occupancy import distill_sharp_field, time_render

import numpy as np

def main():
    import jax
    import jax.numpy as jnp
    chatter = io.StringIO()
    rows = []
    with tempfile.TemporaryDirectory() as tmp, \
            contextlib.redirect_stdout(chatter):
        trainer = build_trainer(os.path.join(tmp, "scene"),
                                os.path.join(tmp, "log"), "bfloat16",
                                "auto", mesh=None, n_rand=1024,
                                fine_budget=128, coarse_probe=32, occ_res=0)
        distill_sharp_field(trainer, trainer.smpl_data, steps=250)
        jax.block_until_ready(trainer.params)
        ds = trainer.val_dataset
        rays, _ = ds.frame_rays(0)
        bg = jnp.ones((rays.shape[0], 3))
        rcfg_b = trainer.rcfg_test
        rcfg_e = dataclasses.replace(rcfg_b, fine_budget=0, coarse_probe=0)
        _, img_exact = time_render(trainer, rays, bg, rcfg_e, 1)

        def psnr(img):
            mse = float(np.mean((np.asarray(img, np.float32)
                                 - np.asarray(img_exact, np.float32)) ** 2))
            return round(-10.0 * float(np.log10(mse + 1e-12)), 1)

        for res in (64, 128, 192, 256):
            trainer.config.raw["model"]["occ_res"] = res
            trainer._occ_grids.clear()
            from moco_flow_tpu.utils.sync import fence
            t0 = time.perf_counter()
            g = trainer.occupancy_grid(0)
            fence(getattr(g, "sig_dev", None))  # device builds are async
            build_s = time.perf_counter() - t0
            ws = max(trainer.world_size, 1)
            trainer.config.raw["model"]["occ_tighten"] = 0
            r_eskip, img_eskip = time_render(trainer, rays, bg, rcfg_e, 5,
                                             tighten_frame=0, ray_skip=True)
            e_stats = dict(trainer._occ_stats or {})
            trainer.config.raw["model"]["occ_tighten"] = 1
            r_skip, img_skip = time_render(trainer, rays, bg, rcfg_b, 5,
                                           tighten_frame=0, ray_skip=True)
            b_stats = dict(trainer._occ_stats or {})
            rows.append({
                "occ_res": res, "grid_build_s": round(build_s, 2),
                "exact_skip_rays_s_per_chip": round(r_eskip / ws, 1),
                "exact_skip_psnr": psnr(img_eskip),
                "exact_empty_frac": round(float(e_stats.get("empty_frac", -1)), 4),
                "budget_skip_rays_s_per_chip": round(r_skip / ws, 1),
                "budget_skip_psnr": psnr(img_skip),
            })
            print(json.dumps(rows[-1]), file=sys.stderr, flush=True)
    print(chatter.getvalue(), file=sys.stderr)
    print(json.dumps({"sweep": rows}))

if __name__ == "__main__":
    main()
