#!/usr/bin/env python
"""Measure occupancy-grid render speedup AND quality on a genuinely trained
field (untrained fields make empty-space skipping look arbitrarily good).

    python scripts/bench_occupancy.py --train_steps 300 --steps 8

Trains the bench trainer briefly on the synthetic scene, then times and
cross-checks three render configurations on the same frame:
  exact      — full reference sampling (fine_budget=0, coarse_probe=0)
  budget     — fine_budget/coarse_probe skipping (the round-2 knobs)
  budget+occ — same, plus occupancy-grid depth-bound tightening
               (render/occupancy.py)

Prints ONE JSON line with rays/s and max/mean |rgb - exact| per config.
"""

from __future__ import annotations

import argparse
import contextlib
import dataclasses
import io
import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def time_render(trainer, rays, bg, rcfg, steps, tighten_frame=None):
    import jax
    rr = rays

    def prep():
        return (trainer.tighten_rays(rays, tighten_frame,
                                     size=trainer.val_dataset.size)
                if tighten_frame is not None else rays)

    rr = prep()
    out = trainer.render_rays_chunked(rr, bg, rcfg, anneal=trainer.anneal(),
                                      chunk=16384)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        rr = prep()
        out = trainer.render_rays_chunked(rr, bg, rcfg,
                                          anneal=trainer.anneal(),
                                          chunk=16384)
        jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    typ = "rgb_fine" if "rgb_fine" in out else "rgb_coarse"
    return rays.shape[0] * steps / dt, np.asarray(out[typ])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train_steps", type=int, default=300)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--fine_budget", type=int, default=128)
    ap.add_argument("--coarse_probe", type=int, default=32)
    ap.add_argument("--occ_res", type=int, default=64)
    ap.add_argument("--occ_threshold", type=float, default=5.0)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--impl", default="auto")
    args = ap.parse_args()

    from bench import build_trainer

    chatter = io.StringIO()
    results = {}
    with tempfile.TemporaryDirectory() as tmp, \
            contextlib.redirect_stdout(chatter):
        # white background: with the tiny config's 'rand' background the
        # field collapses to zero density (the renderer is handed the blend
        # color, so w=0 reproduces most hull rays exactly) — measured
        # train_psnr 22 with sigma == 0 everywhere
        trainer = build_trainer(
            os.path.join(tmp, "scene"), os.path.join(tmp, "log"),
            args.dtype, args.impl, mesh=None, n_rand=1024,
            fine_budget=args.fine_budget, coarse_probe=args.coarse_probe,
            occ_res=args.occ_res, bkgd=1.0)
        trainer.config.raw["model"]["occ_threshold"] = args.occ_threshold
        # the bench stage-3 config freezes density until c2f_start=5000 and
        # anneals PE from zero — a few hundred steps would leave sigma at
        # its random init (occupancy degenerate). Unfreeze + full PE so the
        # short training run produces a REAL density field to skip.
        trainer.c2f = False
        trainer.c2f_start = -1
        for _ in range(args.train_steps):
            trainer.train_func()
            trainer.clock.tick(1)
        import jax
        import jax.numpy as jnp
        jax.block_until_ready(trainer.params)

        ds = trainer.val_dataset
        rays, _ = ds.frame_rays(0)
        bg = jnp.ones((rays.shape[0], 3))
        rcfg_b = trainer.rcfg_test
        rcfg_e = dataclasses.replace(rcfg_b, fine_budget=0, coarse_probe=0)

        r_exact, img_exact = time_render(trainer, rays, bg, rcfg_e,
                                         args.steps)
        r_budget, img_budget = time_render(trainer, rays, bg, rcfg_b,
                                           args.steps)
        grid = trainer.occupancy_grid(0)  # build outside the timed loop
        r_occ, img_occ = time_render(trainer, rays, bg, rcfg_b, args.steps,
                                     tighten_frame=0)

        def delta(img):
            d = np.abs(img.astype(np.float32) - img_exact.astype(np.float32))
            return {"max": float(d.max()), "mean": float(d.mean())}

        from moco_flow_tpu.train.vis import sigma_grid
        sig = sigma_grid(trainer, 0, n_grid=64)
        results = {
            "sigma_max": float(sig.max()),
            "train_steps": args.train_steps,
            "scene_rays": int(rays.shape[0]),
            "occupancy_fraction": grid.occupancy_fraction,
            "occ_stats": trainer._occ_stats,
            "exact_rays_per_sec": round(r_exact, 1),
            "budget_rays_per_sec": round(r_budget, 1),
            "budget_occ_rays_per_sec": round(r_occ, 1),
            "budget_delta_vs_exact": delta(img_budget),
            "budget_occ_delta_vs_exact": delta(img_occ),
            "config": {"fine_budget": args.fine_budget,
                       "coarse_probe": args.coarse_probe,
                       "occ_res": args.occ_res,
                       "occ_threshold": args.occ_threshold},
        }
    print(chatter.getvalue(), file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
