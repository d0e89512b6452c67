#!/usr/bin/env python
"""People-Snapshot quality-validation runbook — ONE command from GT to
PSNR/SSIM(/LPIPS) numbers (round-4 verdict item 8).

The moment real People-Snapshot data exists, run THIS:

    # 1. real data, train from scratch and evaluate:
    python scripts/validate_ps.py --gt_dir /data/male-3-casual \
        --work /tmp/vps --steps 200000

    # 2. real data, evaluate a CONVERTED reference checkpoint instead of
    #    training (parity check against the PyTorch implementation):
    python scripts/validate_ps.py --gt_dir /data/male-3-casual \
        --work /tmp/vps --ref_ckpt /ref/ckpts/model_200000.pth

    # LPIPS: export official weights once with
    #   python scripts/export_lpips_weights.py --out lpips_alex.npz
    # on a machine with the `lpips` package, then set
    #   MOCO_LPIPS_WEIGHTS=lpips_alex.npz
    # evaluate_sequence picks them up automatically (nn/lpips.py).

Without real data the WHOLE chain runs on fabricated fixtures
(``--fixtures``): a schema-exact GT triplet (camera.pkl / consensus.pkl /
reconstructed_poses.hdf5, the same fixtures tests/test_preprocess.py
validates against the reference schema at
scripts/preprocess_snapshot_data.py:54-74), a synthetic SMPL pickle, and
software-rasterized frame images — so every link (GT converter ->
dataset build -> [converter|training] -> eval metrics) is exercised in CI
(tests/test_preprocess.py::test_validate_ps_fixtures).

Reference quantities being matched: the per-stage val PSNR/SSIM the
reference computes but never publishes (trainer_moco_flow.py:453-473,
models/metrics.py).
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import pickle
import subprocess
import sys

import numpy as np

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, REPO)


def fabricate_fixtures(work: str, n_frames: int, reso: int, focal: float):
    """Schema-exact GT triplet + synthetic SMPL pickle + rasterized frame
    images — the stand-in for a real People-Snapshot subject directory."""
    import h5py
    from moco_flow_tpu.geometry.smpl import synthetic_smpl_data
    from scripts.drive_pipeline_e2e import write_scene_smpl_pickle

    gt_dir = osp.join(work, "gt")
    os.makedirs(gt_dir, exist_ok=True)
    rng = np.random.default_rng(1)
    smpl = synthetic_smpl_data(256, seed=1)
    smpl_dir = osp.join(work, "smpl")
    write_scene_smpl_pickle(smpl, smpl_dir)

    poses = np.zeros((n_frames, 72), np.float32)
    poses[:, 3:] = rng.normal(scale=0.08, size=(n_frames, 69))
    trans = np.tile(np.array([0.0, 0.0, 2.8], np.float32), (n_frames, 1))
    with open(osp.join(gt_dir, "camera.pkl"), "wb") as f:
        pickle.dump({"camera_f": np.array([focal, focal]),
                     "camera_c": np.array([reso / 2, reso / 2]),
                     "camera_k": np.zeros(5)}, f)
    with open(osp.join(gt_dir, "consensus.pkl"), "wb") as f:
        pickle.dump({"betas": np.zeros(10, np.float32)}, f)
    with h5py.File(osp.join(gt_dir, "reconstructed_poses.hdf5"), "w") as h5:
        h5.create_dataset("pose", data=poses)
        h5.create_dataset("trans", data=trans)
    return gt_dir, smpl_dir, smpl


def rasterize_frames(root: str, smpl, size, focal: float):
    """GT frame images for the fixture subject: the posed SMPL mesh with a
    position colormap under the dataset's camera (camera_pose
    diag(1,-1,-1,1), scripts/data_utils.py::create_moco_flow_data)."""
    import jax.numpy as jnp
    from PIL import Image
    from moco_flow_tpu.geometry.smpl import smpl_forward
    from scripts.rasterizer import rasterize_mesh

    meta = json.load(open(osp.join(root, "train.json")))
    h, w = size
    cam_c = np.asarray(meta["camera_c"], np.float32)
    out_dir = osp.join(root, "images")
    os.makedirs(out_dir, exist_ok=True)
    for fr in meta["frames"]:
        verts = np.asarray(smpl_forward(
            smpl, jnp.asarray(fr["pose"], jnp.float32)[None],
            jnp.asarray(fr["betas"], jnp.float32)[None]))[0] \
            + np.asarray(fr["transl"], np.float32)
        lo, hi = verts.min(0), verts.max(0)
        colors = (verts - lo) / (hi - lo + 1e-8)
        rgba = rasterize_mesh(verts, smpl.faces, colors,
                              np.asarray(fr["camera_pose"], np.float32),
                              float(meta["camera_focal"]), cam_c, (h, w),
                              bkgd=1.0)
        Image.fromarray((rgba * 255).astype(np.uint8), "RGBA").save(
            osp.join(out_dir, fr["file_path"]))


def build_dataset(gt_dir: str, work: str, size, smpl=None):
    """GT triplet -> converted.pkl -> train/val.json + init_nerf data —
    the convert_snapshot_gt leg of scripts/preprocess_snapshot_data.py
    (real runs additionally extract/matte video frames there)."""
    from scripts.data_utils import create_init_nerf_data, create_moco_flow_data
    from scripts.preprocess_snapshot_data import convert_snapshot_gt

    root = osp.join(work, "data")
    os.makedirs(root, exist_ok=True)
    import h5py
    with h5py.File(osp.join(gt_dir, "reconstructed_poses.hdf5"), "r") as h5:
        n = h5["pose"].shape[0]
    _, focal, c = convert_snapshot_gt(gt_dir, osp.join(root, "converted.pkl"),
                                      0, n, 1)
    create_moco_flow_data(osp.join(root, "converted.pkl"), size, focal=focal,
                          c=c)
    create_init_nerf_data(osp.join(root, "converted.pkl"), size, focal=focal,
                          c=c, num_images=12, smpl_data=smpl)
    return root, focal


def eval_ckpt(cfg_path: str, env: dict, reso: int, budget: int, probe: int,
              max_frames: int | None, timeout: int) -> dict:
    cmd = [sys.executable, "test.py", "-c", cfg_path, "--render_gt",
           "--reso", str(reso), "--eval_metrics",
           "--fine_budget", str(budget), "--coarse_probe", str(probe)]
    if max_frames:
        cmd += ["--eval_max_frames", str(max_frames)]
    r = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                       text=True, timeout=timeout)
    if r.returncode != 0:
        print(r.stdout[-2000:], file=sys.stderr)
        print(r.stderr[-3000:], file=sys.stderr)
        raise SystemExit("eval failed")
    for line in reversed(r.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    raise SystemExit("no metrics JSON in test.py output")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gt_dir", default=None,
                    help="People-Snapshot subject GT dir (camera.pkl + "
                         "consensus.pkl + reconstructed_poses.hdf5); frame "
                         "images must already be at <work>/data/images "
                         "(preprocess_snapshot_data.py extracts+mattes them)")
    ap.add_argument("--fixtures", action="store_true",
                    help="no real data: fabricate the GT triplet, SMPL "
                         "pickle and rasterized frames, then run the SAME "
                         "chain (CI mode)")
    ap.add_argument("--work", default="/tmp/validate_ps")
    ap.add_argument("--reso", type=int, default=512)
    ap.add_argument("--frames", type=int, default=4,
                    help="fixture mode: number of fabricated frames")
    ap.add_argument("--steps", type=int, default=600,
                    help="training steps per stage (ignored with "
                         "--ref_ckpt); the reference trains 200k/600k/2.2M")
    ap.add_argument("--ref_ckpt", default=None,
                    help="reference stage-3 .pth: convert (scripts/"
                         "convert_ref_ckpt.py) and evaluate INSTEAD of "
                         "training — the cross-implementation parity mode")
    ap.add_argument("--eval_budget", type=int, default=0,
                    help="test.py --fine_budget (0 = exact sampling)")
    ap.add_argument("--eval_probe", type=int, default=0)
    ap.add_argument("--eval_max_frames", type=int, default=None)
    ap.add_argument("--stage_timeout", type=int, default=100000)
    args = ap.parse_args()

    os.makedirs(args.work, exist_ok=True)
    smpl = None
    if args.fixtures:
        gt_dir, smpl_dir, smpl = fabricate_fixtures(
            args.work, args.frames, args.reso, focal=args.reso * 1.2)
        env = dict(os.environ, SMPL_MODEL_DIR=smpl_dir)
    else:
        assert args.gt_dir, "--gt_dir or --fixtures required"
        gt_dir, env = args.gt_dir, dict(os.environ)

    size = (args.reso, args.reso)
    root, _focal = build_dataset(gt_dir, args.work, size, smpl=smpl)
    if args.fixtures:
        rasterize_frames(root, smpl, size, _focal)

    import yaml
    from scripts.drive_pipeline_e2e import run_stage
    from tests.test_stages import moco_config, nerf_config, nof_config

    save = osp.join(args.work, "save")

    def sized(cfg):
        cfg["dataloader"]["size"] = [args.reso, args.reso]
        cfg["dataloader"]["val_size"] = [args.reso, args.reso]
        cfg["trainer"]["num_iters"] = args.steps
        cfg["trainer"]["val_every_n_step"] = 0
        cfg["trainer"]["save_every_n_step"] = 0
        return cfg

    c3 = sized(moco_config(root, save))
    if args.ref_ckpt:
        from scripts.convert_ref_ckpt import convert_checkpoint
        import torch
        ckpt = torch.load(args.ref_ckpt, map_location="cpu")
        tree, extra, skipped = convert_checkpoint(ckpt)
        if skipped:
            print(f"converter skipped: {skipped}", file=sys.stderr)
        stem = osp.join(args.work, "ref_converted")
        from moco_flow_tpu.train.checkpoint import save_checkpoint
        save_checkpoint(stem, tree, extra)
        c3["model"]["pretrained_path"] = stem + ".npz"
    else:
        c1 = sized(nerf_config(osp.join(args.work, "data", "init_nerf"),
                               save))
        ck1 = run_stage(c1, "s1", args.work, save, env, args.stage_timeout)
        ck2 = run_stage(sized(nof_config(root, save)), "s2", args.work,
                        save, env, args.stage_timeout)
        c3["model"]["pretrained_nerf"] = ck1
        c3["model"]["pretrained_nof"] = ck2
        c3["model"]["coarse_to_fine"] = args.steps >= 20000
        run_stage(c3, "s3", args.work, save, env, args.stage_timeout)

    cfg_path = osp.join(args.work, "s3.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(c3, f)
    metrics = eval_ckpt(cfg_path, env, args.reso, args.eval_budget,
                        args.eval_probe, args.eval_max_frames,
                        args.stage_timeout)
    out = {"mode": "ref_ckpt" if args.ref_ckpt else "trained",
           "work": args.work, **metrics}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
