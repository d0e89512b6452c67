"""Probe ONLY the exact-sampling + occ-skip render leg (the round-5 858k
target axis) so stream-scheduling experiments iterate in ~5 min instead of
a full bench. Reuses bench.py's trainer/field recipe verbatim.

    python scripts/probe_occ_exact_leg.py [--reps 12] [--sync_every 4]
"""

import argparse
import dataclasses
import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=12)
    ap.add_argument("--sync_every", type=int, default=0,
                    help="override render/packed.py SYNC_EVERY (0 = keep)")
    ap.add_argument("--seg", type=int, default=0,
                    help="override render/packed.py SEG (0 = keep)")
    ap.add_argument("--occ_grid_res", type=int, default=192)
    args = ap.parse_args()

    import jax.numpy as jnp
    from bench import build_trainer
    from bench_occupancy import distill_sharp_field, time_render
    from moco_flow_tpu.render import packed

    if args.sync_every:
        packed.SYNC_EVERY = args.sync_every
    if args.seg:
        packed.SEG = args.seg

    tmp = tempfile.mkdtemp(prefix="occ_leg_")
    trainer = build_trainer(os.path.join(tmp, "scene"),
                            os.path.join(tmp, "log"), "bfloat16", "auto",
                            None, fine_budget=128, coarse_probe=32)
    trainer.config.raw["model"]["occ_res"] = args.occ_grid_res
    trainer.config.raw["model"]["occ_tighten"] = 0
    distill_sharp_field(trainer, trainer.smpl_data, steps=250)
    ds = trainer.val_dataset
    rays, _ = ds.frame_rays(0)
    bg = jnp.ones((rays.shape[0], 3))
    rcfg_e = dataclasses.replace(trainer.rcfg_test, fine_budget=0,
                                 coarse_probe=0)
    trainer.occupancy_grid(0)
    r, _ = time_render(trainer, rays, bg, rcfg_e, args.reps,
                       tighten_frame=0, ray_skip=True)
    print(json.dumps({
        "exact_occ_rays_per_sec": round(r, 1),
        "empty_frac": round(float(trainer._occ_stats["empty_frac"]), 4),
        "sync_every": packed.SYNC_EVERY, "seg": packed.SEG,
        "reps": args.reps}))


if __name__ == "__main__":
    main()
