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


def time_render(trainer, rays, bg, rcfg, steps, tighten_frame=None,
                ray_skip=False):
    """Time full-frame renders (delivered rays/s). ``ray_skip`` drops the
    provably-empty rays (occ_keep_mask) via render_masked_image — the
    actual test.py frame path."""
    import jax

    from moco_flow_tpu.utils.sync import fence, fence_floor
    anneal = trainer.anneal()

    def run(n):
        """n views through the production path: the pipelined driver when
        occupancy is in play (train/base.py::render_views_pipelined — the
        same double-buffered stream train/vis.py uses), plain chunked
        renders otherwise. Returns the LAST view's output dict."""
        if tighten_frame is None:
            out = None
            for _ in range(n):
                out = trainer.render_rays_chunked(rays, bg, rcfg,
                                                  anneal=anneal, chunk=16384)
            return out
        jobs = ((rays, tighten_frame, bg) for _ in range(n))
        for out in trainer.render_views_pipelined(jobs, rcfg, anneal=anneal,
                                                  chunk=16384, skip=ray_skip):
            pass
        return out

    out = run(1)  # warmup / compile
    floor = fence_floor(out)
    t0 = time.perf_counter()
    out = run(steps)
    fence(out)  # readback fence — block_until_ready can lie (utils/sync.py)
    dt = time.perf_counter() - t0 - floor
    typ = "rgb_fine" if "rgb_fine" in out else "rgb_coarse"
    return rays.shape[0] * steps / dt, np.asarray(out[typ])


def distill_sharp_field(trainer, smpl, steps=400, sigma_in=150.0,
                        sigma_out=-20.0, shell=0.15, lr=3e-3):
    """Train the trainer's NeRFs by DIRECT field regression: sigma_raw to a
    body-shaped target (inside the SMPL vertex shell -> sigma_in, outside ->
    sigma_out) and rgb to the position colormap.

    Growing a sharp field photometrically needs tens of thousands of steps
    (the reference trains 200k; short runs plateau as fog — sigma_raw ~1 at
    train PSNR 12-40, measured), which no benchmark budget on the tunneled
    TPU covers. Distillation produces the same ARTIFACT class a converged
    run produces — a NeRF MLP with sharp positive sigma at the body and
    strongly negative sigma elsewhere — so render timings and skipping
    error bounds measured on it are representative. Speed is shape-driven
    (identical model/sample counts); only the density DISTRIBUTION matters
    for occupancy, and this one is body-shaped by construction.
    """
    import jax
    import jax.numpy as jnp
    import optax
    from moco_flow_tpu.geometry.smpl import smpl_forward
    from moco_flow_tpu.nn.nerf import nerf_apply
    from moco_flow_tpu.ops.knn import nearest_neighbor
    from moco_flow_tpu.render.volume import embed_padded

    # the distillation embeds with FULL PE (weights=None); the stage-3
    # trainer's clock sits at step 0 where c2f annealing zeroes every PE
    # frequency, so renders/sigma_grid would evaluate a different function
    # than the one trained (measured: sigma +150 at the verts under full PE,
    # -15..-5 everywhere under the step-0 anneal). Disable c2f so
    # trainer.anneal() matches the distilled embedding.
    trainer.c2f = False

    statics = trainer.statics
    cfg = statics.fine or statics.coarse
    ds = trainer.train_dataset
    pose = jnp.asarray(np.asarray(ds._poses[0:1], np.float32))
    betas = jnp.asarray(np.asarray(ds._betas[0:1], np.float32))
    verts = smpl_forward(smpl, pose, betas)[0]
    lo, hi = verts.min(0), verts.max(0)

    params = {"fine_NeRF": trainer.params["fine_NeRF"]}
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    ind_emb = embed_padded(jnp.zeros((1, 1)), statics.nerf_ind,
                           cfg.extra_feat_dim) if statics.nerf_ind else None

    def loss_fn(p, x):
        x_emb = embed_padded(x, statics.nerf_xyz, cfg.in_channels_xyz)
        extra = (jnp.broadcast_to(ind_emb, (x.shape[0], cfg.extra_feat_dim))
                 if ind_emb is not None else None)
        out = nerf_apply(p["fine_NeRF"], x_emb, extra, cfg)
        dist, _ = nearest_neighbor(verts, x, chunk=8192)
        t_sig = jnp.where(dist < shell, sigma_in, sigma_out)
        t_rgb = jnp.clip((x - lo) / (hi - lo + 1e-6), 0.0, 1.0)
        return (jnp.mean(((out[:, 3] - t_sig) / 50.0) ** 2)
                + jnp.mean((out[:, :3] - t_rgb) ** 2))

    @jax.jit
    def step(p, s, key):
        # stratified sampling: far field / boundary band / inside the shell.
        # The inside component is essential — a sigma=0.3 Gaussian around
        # the vertices puts <2% of points within a 0.15 shell, which starves
        # the sigma_in target and the whole field converges to sigma_out
        # (measured: cano sigma max -5.7 after 150 steps with the old mix).
        x = jax.random.uniform(key, (5462, 3), minval=-1.5, maxval=1.5)
        pick = lambda k, n: verts[jax.random.randint(k, (n,), 0,
                                                     verts.shape[0])]
        xb = jax.random.normal(jax.random.fold_in(key, 1), (5462, 3)) * 0.3 \
            + pick(jax.random.fold_in(key, 2), 5462)
        xi = jax.random.normal(jax.random.fold_in(key, 3), (5460, 3)) \
            * (shell / 3.0) + pick(jax.random.fold_in(key, 4), 5460)
        x = jnp.concatenate([x, xb, xi], axis=0)
        l, g = jax.value_and_grad(loss_fn)(p, x)
        upd, s = opt.update(g, s, p)
        return optax.apply_updates(p, upd), s, l

    key = jax.random.key(0)
    for i in range(steps):
        key = jax.random.fold_in(key, i)
        params, opt_state, l = step(params, opt_state, key)
    trainer.params = dict(trainer.params,
                          fine_NeRF=params["fine_NeRF"],
                          coarse_NeRF=jax.tree.map(lambda a: a,
                                                   params["fine_NeRF"]))
    return float(l)


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
        root = os.path.join(tmp, "scene")
        from moco_flow_tpu.data.synthetic import make_synthetic_scene
        smpl = make_synthetic_scene(root, n_frames=8, size=256, focal=300.0,
                                    blob_sigma2=250.0)
        trainer = build_trainer(
            root, os.path.join(tmp, "log"),
            args.dtype, args.impl, mesh=None, n_rand=1024,
            fine_budget=args.fine_budget, coarse_probe=args.coarse_probe,
            occ_res=args.occ_res, bkgd=1.0,
            scene_kwargs={"blob_sigma2": 250.0})
        trainer.config.raw["model"]["occ_threshold"] = args.occ_threshold
        final_loss = distill_sharp_field(trainer, smpl,
                                         steps=args.train_steps)
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
        r_skip, img_skip = time_render(trainer, rays, bg, rcfg_b,
                                       args.steps, tighten_frame=0,
                                       ray_skip=True)
        # exact per-ray sampling + whole-ray skipping: the high-quality
        # config (error = only the grid-threshold transmittance bound)
        r_eskip, img_eskip = time_render(trainer, rays, bg, rcfg_e,
                                         args.steps, tighten_frame=0,
                                         ray_skip=True)

        def delta(img):
            d = np.abs(img.astype(np.float32) - img_exact.astype(np.float32))
            # PSNR vs the exact render: max alone over-weights single edge
            # pixels; PSNR is the metric quality parity is judged in
            mse = float(np.mean(d ** 2))
            return {"max": float(d.max()), "mean": float(d.mean()),
                    "psnr_vs_exact": round(-10.0 * np.log10(mse + 1e-12), 2)}

        from moco_flow_tpu.train.vis import sigma_grid
        sig = sigma_grid(trainer, 0, n_grid=64)
        results = {
            "sigma_max": float(sig.max()),
            "distill_loss": final_loss,
            "train_steps": args.train_steps,
            "scene_rays": int(rays.shape[0]),
            "occupancy_fraction": grid.occupancy_fraction,
            "occ_stats": trainer._occ_stats,
            "exact_rays_per_sec": round(r_exact, 1),
            "budget_rays_per_sec": round(r_budget, 1),
            "budget_occ_rays_per_sec": round(r_occ, 1),
            "budget_occ_skip_rays_per_sec": round(r_skip, 1),
            "exact_occ_skip_rays_per_sec": round(r_eskip, 1),
            "budget_delta_vs_exact": delta(img_budget),
            "budget_occ_delta_vs_exact": delta(img_occ),
            "budget_occ_skip_delta_vs_exact": delta(img_skip),
            "exact_occ_skip_delta_vs_exact": delta(img_eskip),
            "config": {"fine_budget": args.fine_budget,
                       "coarse_probe": args.coarse_probe,
                       "occ_res": args.occ_res,
                       "occ_threshold": args.occ_threshold},
        }
    print(chatter.getvalue(), file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
