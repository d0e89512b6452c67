#!/usr/bin/env python
"""Benchmark: stage-3 joint-training throughput at the reference step shape.

Prints ONE JSON line: rays/sec/chip for the full MoCo-Flow train step
(N_rand=1024 rays, 128 coarse + 128 fine samples, bw/fw NoF warps with local +
global chain losses, NoF L1 + alpha-mask supervision, dual adam) — the step
the reference runs at ~2.0e4 rays/s per V100 (derived from README.md:139 +
c2f.yaml:34,142; see BASELINE.md).

``vs_baseline`` = ours / 2.0e4.

The default ``--mode both`` reports the train axis plus a
``render_rays_per_sec_per_chip`` field for test-time novel-view throughput
(north star >= 1e6 rays/s/chip, BASELINE.md). ``--impl auto`` (default)
resolves to the fused VMEM megakernels on TPU; ``--fine_budget`` (default
128) enables empty-space skipping for the render axis (0 = exact reference
sampling; see PARITY.md).

``--occ_axis`` (default on) additionally distills a sharp body-shaped
density into the NeRF (untrained fields make skipping look arbitrarily
good) and reports occupancy-grid whole-ray skipping throughput + quality
(``render_occ_*`` fields; render/occupancy.py, PERF.md round-3 table).
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import tempfile
import time

BASELINE_TRAIN_RAYS_PER_SEC = 2.0e4     # V100, derived (BASELINE.md)
BASELINE_RENDER_RAYS_PER_SEC = 1.0e6    # north-star render target


def build_trainer(root, save_dir, dtype, impl, mesh, n_rand=1024,
                  fine_budget=0, coarse_probe=0, occ_res=0, bkgd=None,
                  model_overrides=None, scene_kwargs=None):
    from __graft_entry__ import _tiny_moco_config
    from moco_flow_tpu.train import get_trainer
    from moco_flow_tpu.utils.config import Config
    from moco_flow_tpu.data.synthetic import make_synthetic_scene

    smpl = make_synthetic_scene(root, n_frames=8, size=256, focal=300.0,
                                **(scene_kwargs or {}))
    cfg = _tiny_moco_config(root, save_dir)
    cfg["dataloader"]["size"] = [256, 256]
    cfg["dataloader"]["val_size"] = [256, 256]
    if bkgd is not None:
        cfg["dataloader"]["bkgd"] = bkgd
    m = cfg["model"]
    m.update({"N_rand": n_rand, "N_samples": 128, "N_importance": 128,
              "N_sampled": 1000, "compute_dtype": dtype, "mlp_impl": impl,
              "perturb": 1.0, "remat": n_rand > 1024,
              "fine_budget": fine_budget, "coarse_probe": coarse_probe,
              "occ_res": occ_res})
    if model_overrides:
        m.update(model_overrides)
    config = Config(cfg, mode="train")
    return get_trainer(config, smpl_data=smpl, mesh=mesh)


def _stage1_config(root, save_dir, dtype, impl):
    """Reference stage-1 shape (init_nerf.yaml:25-45): 5120 rays x
    (128+128) samples, 8x256 dir-conditioned NeRF, softplus, radam."""
    nerf = {"type": "NeRF", "D": 8, "W": 256, "in_channels_xyz": 63,
            "skips": [4], "extra_feat_type": "dir", "extra_feat_dim": 27}
    return {
        "save_dir": save_dir, "exp_name": "bench_s1",
        "dataloader": {
            "type": "moco_flow", "root_dir": root, "imgs_dir": "images",
            "size": [256, 256], "val_size": [256, 256],
            "aabb": [[1.2, 1.2, 1.2], [0, 0, 0]], "bkgd": 1.0,
            "interval": 1,
        },
        "model": {
            "type": "nerf", "pretrained_path": None,
            "N_rand": 5120, "chunk": 32768, "N_samples": 128,
            "N_importance": 128, "use_disp": False, "perturb": 1.0,
            "noise_std": 0.0, "nerf_activate_type": "softplus",
            "compute_dtype": dtype, "mlp_impl": impl,
            "nerf_embedding_xyz": {"type": "Embedding", "in_channels": 3,
                                   "N_freqs": 0, "logscale": True},
            "nerf_embedding_dir": {"type": "Embedding", "in_channels": 3,
                                   "N_freqs": 4, "logscale": True},
            "nerf_embedding_ind": None,
            "coarse_NeRF": dict(nerf), "fine_NeRF": dict(nerf),
        },
        "loss": {"type": "MSE"},
        "optimizer": {"type": "radam", "lr": 5e-4, "weight_decay": 0},
        "scheduler": {"type": "steplr", "decay_step": [500000],
                      "decay_gamma": 0.5},
        "trainer": {"num_iters": 10, "val_every_n_step": 0,
                    "save_every_n_step": 0, "log_freq": 1000000},
    }


def _stage2_config(root, save_dir):
    """Reference stage-2 shape (init_nof.yaml:17-28): 100k correspondence
    points/step, D=4 W=128 quat NoFs both directions, adam."""
    nof = {"type": "NoF", "D": 4, "W": 128, "in_channels_xyz": 33,
           "skips": [2], "extra_feat_type": "ind", "extra_feat_dim": 33,
           "use_quat": True}
    return {
        "save_dir": save_dir, "exp_name": "bench_s2",
        "dataloader": {"type": "nof", "root_dir": root, "interval": 1},
        "model": {
            "type": "nof", "pretrained_path": None, "pretrained_nof": None,
            "N_sampled": 100000,
            "nof_embedding_xyz": {"in_channels": 3, "N_freqs": 5,
                                  "logscale": True},
            "nof_embedding_ind": {"in_channels": 1, "N_freqs": 16,
                                  "logscale": True},
            "fw_NoF": nof, "bw_NoF": nof,
        },
        "loss": {"type": "L1"},
        "optimizer": {"type": "adam", "lr": 5e-4, "weight_decay": 0},
        "scheduler": {"type": "steplr", "decay_step": [300000],
                      "decay_gamma": 0.5},
        "trainer": {"num_iters": 10, "val_every_n_step": 0,
                    "save_every_n_step": 0, "log_freq": 1000000},
    }


def bench_stage_axes(root, tmp, dtype, impl, steps: int) -> dict:
    """Stage-1 / stage-2 train throughput at the reference step shapes —
    the inputs of the end-to-end wall-clock budget (PERF.md; the stage-3
    axis is the main train metric above). Returns rays/s/chip (stage 1)
    and correspondence points/s/chip (stage 2)."""
    import jax
    from moco_flow_tpu.data.synthetic import make_synthetic_scene
    from moco_flow_tpu.train import get_trainer
    from moco_flow_tpu.utils.config import Config

    smpl = make_synthetic_scene(os.path.join(tmp, "scene_s1"), n_frames=8,
                                size=256, focal=300.0)
    t1 = get_trainer(Config(_stage1_config(os.path.join(tmp, "scene_s1"),
                                           os.path.join(tmp, "log_s1"),
                                           dtype, impl), mode="train"),
                     smpl_data=smpl)
    s1 = bench_train(t1, steps) / t1.world_size
    del t1

    t2 = get_trainer(Config(_stage2_config(os.path.join(tmp, "scene_s1"),
                                           os.path.join(tmp, "log_s2")),
                            mode="train"), smpl_data=smpl)
    from moco_flow_tpu.utils.sync import fence, fence_floor
    for _ in range(3):
        t2.train_func()
        t2.clock.tick(t2.world_size)
    floor = fence_floor(t2.params)
    t0 = time.perf_counter()
    for _ in range(steps):
        t2.train_func()
        t2.clock.tick(t2.world_size)
    fence(t2.params)
    n_pts = t2.config["model"]["N_sampled"]
    s2 = n_pts * steps / (time.perf_counter() - t0 - floor)
    return {
        "train_stage1_rays_per_sec_per_chip": round(s1, 1),
        "train_stage2_pts_per_sec_per_chip": round(s2, 1),
    }


def bench_train(trainer, steps: int) -> float:
    # NOTE: every timed loop here fences with utils.sync.fence (a real
    # one-element readback), NOT bare block_until_ready — the latter has
    # returned without waiting on this backend and once produced an
    # impossible 11.8M rays/s render axis. The readback's ~28 ms tunnel
    # round-trip is measured per loop and subtracted.
    from moco_flow_tpu.utils.sync import fence, fence_floor
    for _ in range(3):  # warmup / compile
        trainer.train_func()
        trainer.clock.tick(trainer.world_size)
    floor = fence_floor(trainer.params)
    t0 = time.perf_counter()
    for _ in range(steps):
        trainer.train_func()
        trainer.clock.tick(trainer.world_size)
    fence(trainer.params)
    dt = time.perf_counter() - t0 - floor
    n_rand = trainer.config["model"]["N_rand"]
    return n_rand * trainer.world_size * steps / dt


def bench_render(trainer, steps: int, rcfg=None, occupancy=False,
                 ray_skip=False) -> float:
    """Full-frame render throughput in DELIVERED rays/s (frame pixels /
    wall time). ``ray_skip`` times the actual test.py frame path when
    occupancy is on: provably-empty rays are dropped and composited as
    background (train/base.py::render_masked_image) — the same accounting
    the reference uses, whose test renderer also only evaluates hull rays
    (trainer_moco_flow.py:226-268)."""
    import jax
    import jax.numpy as jnp
    rcfg = rcfg if rcfg is not None else trainer.rcfg_test
    ds = trainer.val_dataset
    rays_raw, _ = ds.frame_rays(0)
    if occupancy:
        trainer.occupancy_grid(0)  # grid build amortizes over frame views

    from moco_flow_tpu.utils.sync import fence, fence_floor
    anneal = trainer.anneal()
    bg = jnp.ones((rays_raw.shape[0], 3))

    def run(n):
        """n views through the production path: the pipelined driver when
        occupancy is in play (the per-view tighten+mask cost IS timed — the
        pipeline overlaps it with device renders exactly as train/vis.py
        does in a video render; the grid itself is cached per frame), plain
        chunked renders otherwise. Returns the LAST view's outputs."""
        if not occupancy:
            out = None
            for _ in range(n):
                out = trainer.render_rays_chunked(rays_raw, bg, rcfg,
                                                  anneal=anneal, chunk=16384)
            return out
        jobs = ((rays_raw, 0, bg) for _ in range(n))
        for out in trainer.render_views_pipelined(jobs, rcfg, anneal=anneal,
                                                  chunk=16384, skip=ray_skip):
            pass
        return out

    out = run(1)  # warmup / compile
    floor = fence_floor(out)
    t0 = time.perf_counter()
    out = run(steps)
    fence(out)  # the fence that can't lie (see utils/sync.py)
    dt = time.perf_counter() - t0 - floor
    return rays_raw.shape[0] * steps / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="both",
                    choices=["train", "render", "both"])
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--impl", default="auto",
                    choices=["auto", "xla", "pallas", "fused"])
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--n_rand", type=int, default=1024,
                    help="rays per step per chip (reference stage-3 shape: 1024)")
    ap.add_argument("--fine_budget", type=int, default=128,
                    help="test-time empty-space skipping: fine samples kept "
                         "per ray (0 = exact reference sampling; the "
                         "default 128 halves the fine pass at max rgb error "
                         "~3e-6 on the bench scene — PARITY.md)")
    ap.add_argument("--occ_res", type=int, default=0,
                    help="occupancy-grid depth tightening for the render "
                         "axis (render/occupancy.py; 0 = off)")
    ap.add_argument("--occ_axis", type=int, default=1,
                    help="1 (default): also measure the occupancy-grid "
                         "render axis on a distilled body-shaped field "
                         "(render/occupancy.py; scripts/bench_occupancy.py "
                         "is the full version) — untrained fields make "
                         "empty-space skipping look arbitrarily good, so "
                         "this axis distills a sharp SMPL-shell density "
                         "first. 0: skip (faster bench)")
    ap.add_argument("--student_axis", type=int, default=1,
                    help="1 (default): after the occupancy axis, distill "
                         "the trained teacher field into a narrow student "
                         "trunk (render/distill.py) and report its render "
                         "throughput + dB vs the teacher's exact render. "
                         "0: skip. Requires --occ_axis")
    ap.add_argument("--occ_grid_res", type=int, default=192,
                    help="occupancy grid resolution for the occ/student "
                         "axes. Swept on the bench field (PERF.md round "
                         "4): 64 -> 497k rays/s exact+skip @ 78.4 dB, "
                         "128 -> 601k @ 78.4, 192 -> 713k @ 120 dB, "
                         "256 -> 721k @ 120 dB; 192 is the knee (256 "
                         "costs 2.7x the grid build for +1%)")
    ap.add_argument("--video_scale", type=int, default=4,
                    help="video-axis frame size as a multiple of the bench "
                         "scene's 256^2 (4 -> 1024^2; production "
                         "People-Snapshot frames are 1080^2)")
    ap.add_argument("--student", default="4x128",
                    help="student trunk architecture 'DxW'")
    ap.add_argument("--student_steps", type=int, default=3000,
                    help="distillation steps for the student axis (the "
                         "distill itself costs ~25 s on the TPU; 1200 -> "
                         "3000 measured +4 dB vs teacher, PERF.md round 4)")
    ap.add_argument("--stage_axes", type=int, default=1,
                    help="1 (default): also measure stage-1 (5120-ray) and "
                         "stage-2 (100k-point) train throughput at the "
                         "reference step shapes — the inputs of the "
                         "3-stage wall-clock budget (PERF.md). 0: skip")
    ap.add_argument("--coarse_probe", type=int, default=32,
                    help="test-time coarse subsampling: strided sigma probe "
                         "count (0 = evaluate all coarse samples; the "
                         "default 32 quarters the coarse pass — the "
                         "importance pdf becomes a 32-bin histogram, a "
                         "standard coarse resolution — at max rgb error "
                         "~7e-7 on the bench scene)")
    ap.add_argument("--init_timeout", type=int, default=900,
                    help="seconds to wait for backend init before aborting "
                         "(the tunneled TPU backend HANGS instead of "
                         "erroring when the tunnel is down; fail fast with "
                         "a message instead of wedging the caller). "
                         "0 disables the watchdog")
    args = ap.parse_args()

    # backend-init watchdog: jax backend init on the tunneled TPU can block
    # forever when the pool is unreachable — convert that into a loud,
    # bounded failure (stderr + exit 3; stdout stays clean for the JSON line)
    if args.init_timeout > 0:
        import threading
        backend_up = threading.Event()

        def _watchdog():
            if not backend_up.wait(args.init_timeout):
                print(f"bench.py: backend init did not complete within "
                      f"{args.init_timeout}s (TPU tunnel down?) — aborting",
                      file=sys.stderr, flush=True)
                os._exit(3)

        threading.Thread(target=_watchdog, daemon=True).start()
        import jax
        jax.devices()
        backend_up.set()

    # keep stdout clean for the single JSON line
    chatter = io.StringIO()
    with tempfile.TemporaryDirectory() as tmp, \
            contextlib.redirect_stdout(chatter):
        trainer = build_trainer(os.path.join(tmp, "scene"),
                                os.path.join(tmp, "log"), args.dtype,
                                args.impl, mesh=None, n_rand=args.n_rand,
                                fine_budget=args.fine_budget,
                                coarse_probe=args.coarse_probe,
                                occ_res=args.occ_res)
        render_value = render_exact = None
        if args.mode in ("render", "both"):
            render_value = bench_render(
                trainer, max(args.steps // 4, 3),
                occupancy=args.occ_res > 0,
                ray_skip=args.occ_res > 0) / trainer.world_size
            if args.fine_budget or args.coarse_probe:
                # also measure EXACT reference sampling so the headline
                # skipped-sampling number stays comparable across rounds
                import dataclasses
                rcfg_exact = dataclasses.replace(
                    trainer.rcfg_test, fine_budget=0, coarse_probe=0)
                render_exact = bench_render(
                    trainer, max(args.steps // 4, 3),
                    rcfg=rcfg_exact) / trainer.world_size
        if args.mode in ("train", "both"):
            value = bench_train(trainer, args.steps) / trainer.world_size
            metric = "train_rays_per_sec_per_chip"
            base = BASELINE_TRAIN_RAYS_PER_SEC
        else:
            value = render_value
            metric = "render_rays_per_sec_per_chip"
            base = BASELINE_RENDER_RAYS_PER_SEC

        stage = None
        if args.stage_axes and args.mode in ("train", "both"):
            try:
                stage = bench_stage_axes(os.path.join(tmp, "scene"), tmp,
                                         args.dtype, args.impl,
                                         max(args.steps // 2, 5))
            except Exception as e:  # noqa: BLE001 — record, don't lose
                import traceback
                traceback.print_exc(file=sys.stderr)
                stage = {"stage_axes_error": f"{type(e).__name__}: {e}"[:300]}

        occ = None
        if args.occ_axis and args.mode in ("render", "both"):
            # occupancy axis LAST: the distillation overwrites the NeRF
            # params (and disables c2f), which must not affect the train /
            # plain-render axes above. A failure here records occ_axis_error
            # instead of losing every axis already measured.
            try:
                occ = _occ_axes(args, trainer)
            except Exception as e:  # noqa: BLE001 — record, don't lose
                import traceback
                traceback.print_exc(file=sys.stderr)
                occ = {"occ_axis_error": f"{type(e).__name__}: {e}"[:300]}
    print(chatter.getvalue(), file=sys.stderr)
    out = {
        "metric": metric,
        "value": round(value, 1),
        "unit": "rays/s/chip",
        "vs_baseline": round(value / base, 3),
        "config": {"mode": args.mode, "dtype": args.dtype, "impl": args.impl,
                   "fine_budget": args.fine_budget,
                   "coarse_probe": args.coarse_probe,
                   "occ_res": args.occ_res,
                   "step_shape": "1024 rays x (128+128) samples, chain+nof+msk"
                   if args.mode != "render" else "full-frame test render"},
    }
    if args.mode == "both" and render_value is not None:
        # second axis recorded in the same (single) JSON line
        out["render_rays_per_sec_per_chip"] = round(render_value, 1)
        out["render_vs_baseline"] = round(
            render_value / BASELINE_RENDER_RAYS_PER_SEC, 3)
    if render_exact is not None:
        out["render_exact_rays_per_sec_per_chip"] = round(render_exact, 1)
    if stage is not None:
        out.update(stage)
    if occ is not None:
        out.update(occ)
    print(json.dumps(out))


def _occ_axes(args, trainer) -> dict:
    """The occupancy + student render axes (see --occ_axis/--student_axis)."""
    import dataclasses

    import numpy as np
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "scripts"))
    from bench_occupancy import distill_sharp_field, time_render
    import jax
    import jax.numpy as jnp
    trainer.config.raw["model"]["occ_res"] = args.occ_grid_res
    distill_sharp_field(trainer, trainer.smpl_data, steps=250)
    jax.block_until_ready(trainer.params)
    ds = trainer.val_dataset
    rays, _ = ds.frame_rays(0)
    bg = jnp.ones((rays.shape[0], 3))
    rcfg_b = trainer.rcfg_test
    rcfg_e = dataclasses.replace(rcfg_b, fine_budget=0,
                                 coarse_probe=0)
    # occ axes stream reps views through the packed pipelined renderer; a
    # video renders hundreds of views, so measure a long-enough stream that
    # the one padded flush segment (<4096 rows) and the final partial
    # count-sync (render/packed.py batches readbacks) are noise
    reps = max(args.steps, 12)
    _, img_exact = time_render(trainer, rays, bg, rcfg_e, 1)
    from moco_flow_tpu.utils.sync import fence as _fence0
    g0 = trainer.occupancy_grid(0)  # compile + build outside the timed loop
    _fence0(getattr(g0, "sig_dev", None))  # async build: drain it BEFORE
    # the timed rebuild below, or its compile lands inside that fence
    # (measured: 12.15 s "build" = first build's compile + both builds)
    # steady-state per-frame grid cost (compile cached): what a
    # training-pose video pays per NEW frame — reported, not folded into
    # the per-view rates, matching how the grid amortizes over a frame's
    # views (spherical/bullet renders) or is paid once per frame (pose
    # videos)
    trainer._occ_grids.clear()
    from moco_flow_tpu.utils.sync import fence as _fence
    t0 = time.perf_counter()
    g = trainer.occupancy_grid(0)
    # the device-resident build dispatches async (render/occupancy.py
    # DeviceOccupancyGrid); fence it so this measures real device time
    _fence(getattr(g, "sig_dev", None))
    grid_build_s = time.perf_counter() - t0
    r_skip, img_skip = time_render(trainer, rays, bg, rcfg_b, reps,
                                   tighten_frame=0, ray_skip=True)
    # exact-sampling axis: ray DROP only, no depth tightening — the fixed
    # sample-count kernels gain nothing from shorter intervals, and leaving
    # near/far untouched keeps every kept ray bit-identical to the exact
    # render, so the whole image is tau-bounded (measured: 48.7 -> 78.4 dB
    # at the same rays/s on the distilled bench field, PERF.md round 4)
    trainer.config.raw["model"]["occ_tighten"] = 0
    r_eskip, img_eskip = time_render(trainer, rays, bg, rcfg_e,
                                     reps, tighten_frame=0,
                                     ray_skip=True)

    # training-pose VIDEO axis: one view per frame, a NEW occupancy grid
    # per frame — the reference's flagship output mode
    # (trainer_moco_flow.py:589-626). The per-view occ axes above amortize
    # one grid over the whole stream; this axis pays every build, which
    # the device-resident grid (render/occupancy.py DeviceOccupancyGrid)
    # dispatches async inside the same stream. Exact sampling + tighten 0.
    from moco_flow_tpu.utils.sync import fence as _f, fence_floor as _ff
    n_vf = int(min(getattr(trainer, "num_frames", 1), 8))
    # video frames render at PRODUCTION size (--video_scale x the bench
    # scene's 256^2; People-Snapshot's flagship videos are 1080^2): at
    # 256^2 a frame is 65k rays against a ~1-2 s grid build, which no
    # build scheme can amortize — the real workload carries 16x the rays
    # per grid
    vs = max(int(getattr(args, "video_scale", 2)), 1)
    vrays = [ds.frame_rays_scaled(f, vs)[0] if vs > 1
             else ds.frame_rays(f)[0] for f in range(n_vf)]
    vbg = jnp.ones((vrays[0].shape[0], 3))
    vjobs = [(vrays[f], f, vbg) for f in range(n_vf)]

    def _video_pass():
        last = None
        trainer._occ_grids.clear()  # every frame pays its grid build
        for last in trainer.render_views_pipelined(
                iter(vjobs), rcfg_e, anneal=trainer.anneal(),
                chunk=16384, skip=True):
            pass
        return last

    vout = _video_pass()  # warmup: grid/tighten/render compiles
    vfloor = _ff(vout)
    t0 = time.perf_counter()
    vout = _video_pass()
    _f(vout)
    r_video = vrays[0].shape[0] * n_vf / (time.perf_counter() - t0
                                          - vfloor)

    # same video through the warp-pullback builder (occ_builder: warp):
    # per-frame grids via canonical-bound pullback instead of full trunk
    # re-evaluation; the canonical grid is rebuilt once per pass (honest:
    # one per video). Quality = frame-0 skip render vs the exact render.
    r_video_warp = warp_stats = None
    if "bw_NoF" in trainer.params:
        trainer.config.raw["model"]["occ_builder"] = "warp"
        vout = _video_pass()  # warmup compiles for the pullback programs
        vfloor = _ff(vout)
        t0 = time.perf_counter()
        vout = _video_pass()
        _f(vout)
        r_video_warp = vrays[0].shape[0] * n_vf / (
            time.perf_counter() - t0 - vfloor)
        _, img_wskip = time_render(trainer, rays, bg, rcfg_e, 1,
                                   tighten_frame=0, ray_skip=True)
        warp_stats = {"img": img_wskip,
                      "empty_frac": float(trainer._occ_stats["empty_frac"])}
        trainer.config.raw["model"]["occ_builder"] = "direct"
        trainer._occ_grids.clear()
    trainer.config.raw["model"]["occ_tighten"] = 1

    def psnr(img):
        mse = float(np.mean((np.asarray(img, np.float32)
                             - np.asarray(img_exact, np.float32)) ** 2))
        return round(-10.0 * float(np.log10(mse + 1e-12)), 1)

    occ = {
        "render_occ_rays_per_sec_per_chip":
            round(r_skip / trainer.world_size, 1),
        "render_occ_psnr_vs_exact": psnr(img_skip),
        "render_occ_exact_sampling_rays_per_sec_per_chip":
            round(r_eskip / trainer.world_size, 1),
        "render_occ_exact_sampling_psnr_vs_exact": psnr(img_eskip),
        "occ_empty_frac": round(
            float(trainer._occ_stats["empty_frac"]), 4),
        "occ_grid_res": args.occ_grid_res,
        "occ_grid_build_s": round(grid_build_s, 2),
        "render_video_rays_per_sec_per_chip":
            round(r_video / trainer.world_size, 1),
        "render_video_frames": n_vf,
        "render_video_rays_per_frame": int(vrays[0].shape[0]),
    }
    if r_video_warp is not None:
        occ["render_video_warp_rays_per_sec_per_chip"] = round(
            r_video_warp / trainer.world_size, 1)
        occ["render_video_warp_psnr_vs_exact"] = psnr(warp_stats["img"])
        occ["occ_warp_empty_frac"] = round(warp_stats["empty_frac"], 4)

    if args.student_axis:
        # student-trunk distillation axis (render/distill.py): the
        # trained teacher field just benched above is distilled into
        # a narrow student; quality is dB vs the TEACHER's exact
        # render (img_exact), the same axis the occ numbers use.
        # An axis failure records student_error instead of losing
        # the whole JSON line (everything above already measured).
        try:
            from moco_flow_tpu.render.distill import distill_student
            d, w = (int(v) for v in args.student.split("x"))
            # restart diverged draws: the sharp relu target collapses
            # some seeds outright (measured loss 3.9 / 9 dB at seed 1 vs
            # ~0.03 / 30 dB healthy — PERF.md round 4); a loss well above
            # the healthy band is a failed optimization, not a quality
            # trade, so retry with a fresh seed like any restarted run
            teacher_params, teacher_statics = trainer.params, trainer.statics
            for seed in range(3):
                if seed:  # restore the teacher before a retry
                    trainer.params = teacher_params
                    trainer.statics = teacher_statics
                    trainer._render_fns.clear()
                    trainer._occ_grids.clear()
                    getattr(trainer, "_sigma_eval_fns", {}).clear()
                _, _, dloss = distill_student(trainer, depth=d, width=w,
                                              steps=args.student_steps,
                                              seed=seed)
                if dloss < 0.1:
                    break
                print(f"student distill diverged (loss {dloss:.3f}, "
                      f"seed {seed}) — restarting", file=sys.stderr)
            occ["student_distill_loss"] = round(dloss, 5)
            occ["student_distill_seed"] = seed
            jax.block_until_ready(trainer.params)
            trainer.occupancy_grid(0)  # rebuild on the student field
            r_stu, img_stu = time_render(trainer, rays, bg, rcfg_b,
                                         reps, tighten_frame=0,
                                         ray_skip=True)
            trainer.config.raw["model"]["occ_tighten"] = 0  # see above
            r_stue, img_stue = time_render(trainer, rays, bg,
                                           rcfg_e, reps,
                                           tighten_frame=0,
                                           ray_skip=True)
            trainer.config.raw["model"]["occ_tighten"] = 1
            occ.update({
                "render_student_rays_per_sec_per_chip":
                    round(r_stu / trainer.world_size, 1),
                "render_student_psnr_vs_teacher_exact":
                    psnr(img_stu),
                "render_student_exact_sampling_rays_per_sec_per_chip":
                    round(r_stue / trainer.world_size, 1),
                "render_student_exact_sampling_psnr_vs_teacher_exact":
                    psnr(img_stue),
                "student_arch": args.student,
            })
        except Exception as e:  # noqa: BLE001 — record, don't lose
            import traceback
            traceback.print_exc(file=sys.stderr)
            occ["student_error"] = f"{type(e).__name__}: {e}"[:300]
    return occ


if __name__ == "__main__":
    main()
