#!/usr/bin/env python
"""Steady-state occupancy grid build time at 192^3x2 on the bench field,
device builder vs the host pipeline."""
import io, json, os, sys, tempfile, time, contextlib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from bench import build_trainer
from bench_occupancy import distill_sharp_field


def main():
    import jax
    from moco_flow_tpu.render.occupancy import build_occupancy_grid
    chatter = io.StringIO()
    out = {}
    with tempfile.TemporaryDirectory() as tmp, \
            contextlib.redirect_stdout(chatter):
        trainer = build_trainer(os.path.join(tmp, "scene"),
                                os.path.join(tmp, "log"), "bfloat16",
                                "auto", mesh=None, n_rand=1024,
                                fine_budget=128, coarse_probe=32, occ_res=0)
        trainer.config.raw["model"]["occ_res"] = 192
        distill_sharp_field(trainer, trainer.smpl_data, steps=250)
        jax.block_until_ready(trainer.params)
        for mode in ("device", "host"):
            dev = mode == "device"
            g = build_occupancy_grid(trainer, 0, resolution=192,
                                     supersample=2, threshold=5.0,
                                     extent=trainer._occ_auto_extent(0),
                                     device=dev)  # compile + build
            t0 = time.perf_counter()
            g2 = build_occupancy_grid(trainer, 0, resolution=192,
                                      supersample=2, threshold=5.0,
                                      extent=trainer._occ_auto_extent(0),
                                      device=dev)
            if dev:  # device builds dispatch async; fence before timing
                from moco_flow_tpu.utils.sync import fence
                fence(g2.sig_dev)
            out[f"{mode}_steady_s"] = round(time.perf_counter() - t0, 2)
            out[f"{mode}_occ_frac"] = round(g2.occupancy_fraction, 4)
            out[f"{mode}_outer_sig"] = round(g2.outer_sig, 4)
        import numpy as np
        gd = build_occupancy_grid(trainer, 0, resolution=192, supersample=2,
                                  threshold=5.0,
                                  extent=trainer._occ_auto_extent(0),
                                  device=True)
        gh = build_occupancy_grid(trainer, 0, resolution=192, supersample=2,
                                  threshold=5.0,
                                  extent=trainer._occ_auto_extent(0),
                                  device=False)
        out["occ_agree_frac"] = round(float((gd.occ == gh.occ).mean()), 6)
        out["sig_max_absdiff"] = float(np.nanmax(np.abs(
            np.where(np.isinf(gd.sig) & np.isinf(gh.sig), 0.0,
                     gd.sig - gh.sig))))
    print(chatter.getvalue(), file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
