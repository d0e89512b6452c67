#!/usr/bin/env python
"""Rendering / evaluation CLI.

Same surface as the reference ``test.py``:
``python test.py -c cfg.yaml [-r ckpt] [--reso N] [--render_gt |
--test_json path] [--render_training_poses] [--render_spherical_poses
[--spherical_poses_frame F]] [--extract_mesh [--mesh_frame F] [--N_grid N]
[--sigma_threshold T]] [--out_dir DIR]`` — frame ``-1`` renders/extracts the
canonical space. The PE-annealing state needs no explicit restoration here:
annealing weights are a pure function of the checkpointed step
(cf. ref test.py:35 increase_xyzemb_dim).
"""

from __future__ import annotations

import argparse
import os
import os.path as osp

from moco_flow_tpu.train import get_trainer
from moco_flow_tpu.train.checkpoint import find_latest_checkpoint
from moco_flow_tpu.train.vis import (
    visualize_bullet_time,
    visualize_frame,
    visualize_mesh,
    visualize_spherical,
    visualize_video,
)
from moco_flow_tpu.utils.config import Config


def test(config: Config, args, smpl_data=None):
    trainer = get_trainer(config, smpl_data=smpl_data)

    config.raw["dataloader"]["val_size"] = [args.reso, args.reso]
    config.raw["model"]["pretrained_nerf"] = None
    config.raw["model"]["pretrained_nof"] = None
    config.raw["dataloader"]["bkgd"] = 1.0
    if getattr(args, 'fine_budget', None) is not None:
        # test-time empty-space skipping (PARITY.md; 0 = exact sampling)
        config.raw["model"]["fine_budget"] = args.fine_budget
    if getattr(args, 'coarse_probe', None) is not None:
        config.raw["model"]["coarse_probe"] = args.coarse_probe
    if getattr(args, 'occ_res', None) is not None:
        # per-frame occupancy grid + depth-bound tightening
        # (render/occupancy.py; 0 = off)
        config.raw["model"]["occ_res"] = args.occ_res
    trainer.build_model(config["model"])

    if config.resume:
        trainer.load_ckpt(config.resume)
    else:
        latest = find_latest_checkpoint(
            osp.join(config.save_dir, config.exp_name, "*", "ckpts", "*.npz"))
        if latest:
            trainer.load_ckpt(latest)

    if args.out_dir:
        os.makedirs(args.out_dir, exist_ok=True)
    if not args.render_gt:
        assert args.test_json, "provide --test_json or --render_gt"
        config.raw["dataloader"]["root_dir"] = osp.dirname(args.test_json)
    trainer.prepare_dataloader(config["dataloader"])
    trainer.num_frames = trainer.val_dataset.num_frames

    if args.render_training_poses:
        visualize_video(trainer, vis_novel_view=False, save_path=args.out_dir)
    if args.render_spherical_poses:
        visualize_spherical(trainer, args.spherical_poses_frame,
                            save_path=args.out_dir)
    if args.render_bullet_time:
        visualize_bullet_time(trainer, args.bullet_time_frame,
                              save_path=args.out_dir)
    if args.extract_mesh:
        visualize_mesh(trainer, args.mesh_frame, n_grid=args.N_grid,
                       sigma_threshold=args.sigma_threshold,
                       save_path=args.out_dir)
    if args.render_frame is not None:
        visualize_frame(trainer, args.render_frame, save_path=args.out_dir)
    if args.eval_metrics:
        import json
        metrics = trainer.evaluate_sequence(max_frames=args.eval_max_frames)
        print(json.dumps(metrics))
    return trainer


def main():
    args = argparse.ArgumentParser(description="testing pipeline")
    args.add_argument("-m", "--mode", default="test", type=str)
    args.add_argument("-c", "--config", required=True, type=str)
    args.add_argument("-r", "--resume", default=None, type=str)
    args.add_argument("-n", "--job_name", default=None, type=str)
    args.add_argument("-s", "--seed", default=None)
    args.add_argument("--out_dir", default=None, type=str)
    args.add_argument("--reso", default=512, type=int)
    args.add_argument("--render_gt", action="store_true")
    args.add_argument("--test_json", default=None, type=str)
    args.add_argument("--render_training_poses", action="store_true")
    args.add_argument("--render_spherical_poses", action="store_true")
    args.add_argument("--spherical_poses_frame", default=-1, type=int)
    args.add_argument("--render_bullet_time", action="store_true")
    args.add_argument("--bullet_time_frame", default=0, type=int)
    args.add_argument("--extract_mesh", action="store_true")
    args.add_argument("--mesh_frame", default=-1, type=int)
    args.add_argument("--N_grid", default=512, type=int)
    args.add_argument("--sigma_threshold", default=10, type=int)
    args.add_argument("--render_frame", default=None, type=int)
    args.add_argument("--fine_budget", default=None, type=int,
                      help="test-time empty-space skipping: fine samples "
                           "kept per ray (multiples of 128 are fastest; "
                           "0/absent = exact reference sampling). Only the "
                           "fused TPU render path implements this — "
                           "requesting it with mlp_impl xla/pallas (or on "
                           "a CPU backend, where auto -> xla) is an error, "
                           "never a silent exact render")
    args.add_argument("--coarse_probe", default=None, type=int,
                      help="test-time coarse subsampling: strided sigma "
                           "probe count (must divide N_samples; 0/absent "
                           "= exact). Fused TPU path only, like "
                           "--fine_budget")
    args.add_argument("--occ_res", default=None, type=int,
                      help="occupancy-grid empty-space skipping: cache a "
                           "per-frame sigma-occupancy grid at this "
                           "resolution and tighten every ray's near/far to "
                           "the occupied interval (0/absent = exact "
                           "bounds). Composes with --fine_budget/"
                           "--coarse_probe; works on every render path "
                           "(XLA and fused)")
    args.add_argument("--eval_metrics", action="store_true",
                      help="compute mean PSNR/SSIM over the val sequence")
    args.add_argument("--eval_max_frames", default=None, type=int)
    ns = args.parse_args()
    config = Config.from_args(ns, mode="test")
    test(config, ns)


if __name__ == "__main__":
    main()
