#!/usr/bin/env python
"""Measure the hash-grid encoding (nn/hashgrid.py) against the reference
sinusoidal-PE NeRF on the SAME stage-1 task: step time AND converged
quality (val-frame PSNR vs GT) after --train_steps.

    python scripts/bench_hashgrid.py --train_steps 1500 --steps 20

Two trainers on one synthetic blob scene (the genuinely-fittable one,
PERF.md round-3 honesty note):
  pe    — the reference architecture: N_freqs=10 PE (63ch) + 8x256 MLP
          (init_nerf.yaml), mlp_impl auto (fused megakernels on TPU)
  hash  — encoding: hashgrid (L levels x F feats) + tiny 2x64 MLP,
          mlp_impl auto (XLA — gathers have no Mosaic path)

Prints ONE JSON line: per-config step rays/s, end-of-train val PSNR, and
the speedup ratio. The VERDICT round-2 item-4 gate is "same-or-better
PSNR at a large measured step-time reduction".
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

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def stage1_config(root, save_dir, size, encoding, hash_cfg, n_rand,
                  n_samples, dtype, impl, lr):
    nerf_pe = {"type": "NeRF", "D": 8, "W": 256, "in_channels_xyz": 63,
               "skips": [4], "extra_feat_type": "dir", "extra_feat_dim": 27}
    nerf_hash = {"type": "NeRF", "D": 2, "W": 64, "skips": [],
                 "extra_feat_type": "dir", "extra_feat_dim": 27,
                 "encoding": "hashgrid", "hash": hash_cfg}
    nerf = nerf_pe if encoding == "pe" else nerf_hash
    return {
        "save_dir": save_dir, "exp_name": f"hgb_{encoding}",
        "dataloader": {
            "type": "moco_flow", "root_dir": root, "imgs_dir": "images",
            "size": [size, size], "val_size": [size, size],
            "aabb": [[1.2, 1.2, 1.2], [0, 0, 0]], "bkgd": 1.0,
            "interval": 1,
        },
        "model": {
            "type": "nerf", "pretrained_path": None,
            "N_rand": n_rand, "chunk": 16384, "N_samples": n_samples,
            "N_importance": n_samples, "use_disp": False, "perturb": 1.0,
            "noise_std": 0.0, "nerf_activate_type": "softplus",
            "compute_dtype": dtype, "mlp_impl": impl,
            "nerf_embedding_xyz": {"type": "Embedding", "in_channels": 3,
                                   "N_freqs": 10, "logscale": True},
            "nerf_embedding_dir": {"type": "Embedding", "in_channels": 3,
                                   "N_freqs": 4, "logscale": True},
            "nerf_embedding_ind": None,
            "coarse_NeRF": dict(nerf), "fine_NeRF": dict(nerf),
        },
        "loss": {"type": "MSE"},
        "optimizer": {"type": "radam", "lr": lr, "weight_decay": 0},
        "scheduler": {"type": "steplr", "decay_step": [1000000],
                      "decay_gamma": 0.5},
        "trainer": {"num_iters": 10, "val_every_n_step": 0,
                    "save_every_n_step": 0, "log_freq": 1000000},
    }


def run_one(root, smpl, tmp, encoding, args):
    import jax
    import jax.numpy as jnp
    from moco_flow_tpu.train import get_trainer
    from moco_flow_tpu.utils.config import Config

    hash_cfg = {"n_levels": args.n_levels, "n_features": 2,
                "log2_table_size": args.log2_table, "base_res": 16,
                "max_res": args.max_res, "extent": 1.5}
    lr = args.lr_pe if encoding == "pe" else args.lr_hash
    cfg = stage1_config(root, os.path.join(tmp, f"log_{encoding}"),
                        args.size, encoding, hash_cfg, args.n_rand,
                        args.n_samples, args.dtype, args.impl, lr)
    trainer = get_trainer(Config(cfg, mode="train"), smpl_data=smpl)

    # --- step time (bench.py::bench_train pattern) ---
    for _ in range(3):
        trainer.train_func()
        trainer.clock.tick(1)
    jax.block_until_ready(trainer.params)
    t0 = time.perf_counter()
    for _ in range(args.steps):
        trainer.train_func()
        trainer.clock.tick(1)
    jax.block_until_ready(trainer.params)
    rays_per_sec = args.n_rand * args.steps / (time.perf_counter() - t0)

    # --- train to convergence, then val PSNR vs GT on a held-out frame ---
    t0 = time.perf_counter()
    for _ in range(args.train_steps):
        trainer.train_func()
        trainer.clock.tick(1)
    jax.block_until_ready(trainer.params)
    train_wall = time.perf_counter() - t0

    ds = trainer.val_dataset
    rays, _ = ds.frame_rays(0)
    bg = jnp.ones((rays.shape[0], 3))
    gt = np.asarray(ds.frame_rgbs(0, bkgd=bg), np.float32)
    out = trainer.render_rays_chunked(jnp.asarray(rays), bg,
                                      trainer.rcfg_test,
                                      anneal=trainer.anneal(), chunk=16384)
    key = "rgb_fine" if "rgb_fine" in out else "rgb_coarse"
    img = np.asarray(out[key], np.float32).reshape(gt.shape)
    mse = float(np.mean((img - gt) ** 2))
    psnr = -10.0 * np.log10(mse + 1e-12)
    return {
        "train_rays_per_sec": round(rays_per_sec, 1),
        "val_psnr": round(psnr, 2),
        "train_steps": args.train_steps,
        "train_wall_s": round(train_wall, 1),
        "mlp": "8x256+PE63" if encoding == "pe"
        else f"2x64+hash(L{args.n_levels},T2^{args.log2_table})",
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train_steps", type=int, default=1500)
    ap.add_argument("--steps", type=int, default=20,
                    help="timed steps for the rays/s measurement")
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--n_rand", type=int, default=1024)
    ap.add_argument("--n_samples", type=int, default=64)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--impl", default="auto")
    ap.add_argument("--lr_pe", type=float, default=5e-3)
    ap.add_argument("--lr_hash", type=float, default=1e-2)
    ap.add_argument("--n_levels", type=int, default=8)
    ap.add_argument("--log2_table", type=int, default=16)
    ap.add_argument("--max_res", type=int, default=256)
    ap.add_argument("--only", choices=["pe", "hash"], default=None)
    args = ap.parse_args()

    chatter = io.StringIO()
    results = {}
    with tempfile.TemporaryDirectory() as tmp, \
            contextlib.redirect_stdout(chatter):
        root = os.path.join(tmp, "scene")
        from moco_flow_tpu.data.synthetic import make_synthetic_scene
        smpl = make_synthetic_scene(root, n_frames=8, size=args.size,
                                    focal=150.0 * args.size / 128,
                                    blob_sigma2=250.0)
        for enc in ([args.only] if args.only else ["pe", "hash"]):
            results[enc] = run_one(root, smpl, tmp, enc, args)
        if "pe" in results and "hash" in results:
            results["speedup"] = round(
                results["hash"]["train_rays_per_sec"]
                / results["pe"]["train_rays_per_sec"], 2)
            results["psnr_delta"] = round(
                results["hash"]["val_psnr"] - results["pe"]["val_psnr"], 2)
    print(chatter.getvalue(), file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
