#!/usr/bin/env python
"""Cross-implementation TRAINING parity: the actual PyTorch reference vs the
JAX rebuild, trained on the same synthetic scene.

Operator-level parity (tests/test_ref_parity.py: same weights, same inputs,
one forward) is necessary but not sufficient — optimizer trajectories, the
freeze/anneal/NoF-schedule interplay and the static-shape loss substitutions
only show up across a *training run*. This harness:

  1. builds one synthetic scene + schema-exact SMPL pickle shared by both,
  2. constructs the REAL reference trainers on CPU (scripts/ref_driver.py —
     trainer/trainer_nerf.py, trainer/trainer_moco_flow.py, driven exactly
     like the reference train.py loop, trainer/base.py:231-239),
  3. copies the reference's torch-initialized weights into the rebuild
     (block-layout PE permutation, PARITY.md),
  4. trains BOTH for --steps steps with identical hyperparameters
     (stage 1: radam+steplr; stage 3: dual adam, freeze window, c2f PE
     annealing window, 3-phase NoF schedule, chain+mask losses),
  5. renders the same frame from both and reports loss/PSNR trajectories
     plus cross-implementation render agreement.

RNG streams are independent (torch vs JAX), so per-step losses are compared
smoothed, and the end states via PSNR-to-GT and render-vs-render PSNR.
Results are recorded in PARITY.md; tests/test_train_parity.py runs a short
version of this in CI.

    python scripts/parity_train_e2e.py --steps 300 --out /tmp/parity.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# force the rebuild onto the CPU backend (CLAUDE.md pitfall: the axon
# sitecustomize overrides JAX_PLATFORMS; update the config after import)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# numpy>=1.24 removed the np.float alias the reference still uses in its
# masked-render scatter (trainer_nerf.py:137, trainer_moco_flow.py:258)
if not hasattr(np, "float"):
    np.float = float  # noqa: NPY001


# ---------------------------------------------------------------------------
# config surfaces (identical hyperparameters on both sides)
# ---------------------------------------------------------------------------

SIZE = 48
FOCAL = 60.0
N_FRAMES = 4

NERF_XYZ_FREQS, NERF_DIR_FREQS, NERF_IND_FREQS = 6, 4, 2
NOF_XYZ_FREQS, NOF_IND_FREQS = 5, 16


def stage1_model(n_rand):
    nerf = {"type": "NeRF", "D": 4, "W": 128,
            "in_channels_xyz": 3 + 6 * NERF_XYZ_FREQS, "skips": [2],
            "extra_feat_type": "dir",
            "extra_feat_dim": 3 + 6 * NERF_DIR_FREQS}
    return {
        "type": "nerf", "pretrained_path": None,
        "N_rand": n_rand, "chunk": 4096, "N_samples": 24, "N_importance": 24,
        "use_disp": False, "perturb": 1.0, "noise_std": 0.0,
        "nerf_activate_type": "softplus",
        "nerf_embedding_xyz": {"type": "Embedding", "in_channels": 3,
                               "N_freqs": NERF_XYZ_FREQS, "logscale": True},
        "nerf_embedding_dir": {"type": "Embedding", "in_channels": 3,
                               "N_freqs": NERF_DIR_FREQS, "logscale": True},
        "nerf_embedding_ind": None,
        "coarse_NeRF": dict(nerf), "fine_NeRF": dict(nerf),
    }


def stage3_model(n_rand):
    nof = {"type": "NoF", "D": 4, "W": 128,
           "in_channels_xyz": 3 + 6 * NOF_XYZ_FREQS, "skips": [2],
           "extra_feat_type": "ind",
           "extra_feat_dim": 1 + 2 * NOF_IND_FREQS, "use_quat": True}
    nerf = {"type": "NeRF", "D": 4, "W": 128,
            "in_channels_xyz": 3 + 6 * NERF_XYZ_FREQS, "skips": [2],
            "extra_feat_type": "ind",
            "extra_feat_dim": 1 + 2 * NERF_IND_FREQS}
    return {
        "type": "moco_flow", "pretrained_path": None,
        "pretrained_nerf": None, "pretrained_nof": None,
        "coarse_to_fine": True,
        "N_rand": n_rand, "N_sampled": 500, "chunk": 4096,
        "N_samples": 16, "N_importance": 16, "use_disp": False,
        "perturb": 1.0, "noise_std": 0.0, "nerf_activate_type": "relu",
        "nof_embedding_xyz": {"type": "Embedding", "in_channels": 3,
                              "N_freqs": NOF_XYZ_FREQS, "logscale": True},
        "nof_embedding_ind": {"type": "Embedding", "in_channels": 1,
                              "N_freqs": NOF_IND_FREQS, "logscale": True},
        "fw_NoF": dict(nof), "bw_NoF": dict(nof),
        "nerf_embedding_xyz": {"type": "Embedding", "in_channels": 3,
                               "N_freqs": NERF_XYZ_FREQS, "logscale": True},
        "nerf_embedding_dir": None,
        "nerf_embedding_ind": {"type": "Embedding", "in_channels": 1,
                               "N_freqs": NERF_IND_FREQS, "logscale": True},
        "coarse_NeRF": dict(nerf), "fine_NeRF": dict(nerf),
    }


def dataloader_cfg(root, ref_side: bool):
    cfg = {"type": "moco_flow", "root_dir": root, "imgs_dir": "images",
           "size": [SIZE, SIZE], "val_size": [SIZE, SIZE],
           "aabb": [[1.2, 1.2, 1.2], [0, 0, 0]], "bkgd": 1.0, "interval": 1,
           "cache": True}
    if ref_side:
        cfg.update(batch_size=1, workers=0)
    return cfg


def stage_cfg(stage: int, root, save_dir, steps, n_rand, ref_side: bool):
    # the c2f window length must be ~a multiple of the PE freq counts or the
    # reference's increase_xyzemb_dim indexes past its weights list
    # (trainer_moco_flow.py:287 — latent at production scale, fatal at tiny
    # windows); 30 = lcm(nerf 6, nof 5)
    c2f_start = max(steps // 6, 4)
    c2f_end = c2f_start + 30 * max(1, steps // 90)
    cfg = {
        "save_dir": save_dir, "exp_name": f"s{stage}",
        "dataloader": dataloader_cfg(root, ref_side),
        "model": stage1_model(n_rand) if stage == 1 else stage3_model(n_rand),
        "loss": ({"type": "MSE"} if stage == 1 else {
            "chain_local": True, "nof_local_weight": 0.2,
            "chain_global": True, "nof_global_weight": 0.2,
            "img_loss": {"type": "MSE", "weight": 1},
            "nof_loss": {"type": "L1", "weight": 10},
            "msk_loss": {"type": "BCE", "weight": 10}}),
        "optimizer": ({"type": "radam", "lr": 5e-4, "weight_decay": 0}
                      if stage == 1 else {
            "moco": {"type": "adam", "lr": 5e-4, "weight_decay": 0},
            "nof": {"type": "adam", "lr": 5e-4, "weight_decay": 0}}),
        "scheduler": {"type": "steplr", "decay_step": [10 ** 6],
                      "decay_gamma": 0.5},
        "trainer": {"num_iters": steps,
                    "coarse2fine_start_iter": c2f_start,
                    "coarse2fine_end_iter": c2f_end,
                    "val_every_n_step": 10 ** 9,
                    "save_every_n_step": 10 ** 9, "log_freq": 10 ** 9},
    }
    return cfg


# ---------------------------------------------------------------------------
# reference side
# ---------------------------------------------------------------------------

def build_reference(ns, cfg_dict, seed: int = 0):
    from scripts.ref_driver import make_config
    config = make_config(ns, cfg_dict, job_name="ref", seed=seed)
    return ns.trainer.get_trainer(config)


def train_reference(trainer, steps: int):
    """Drive the real reference trainer exactly like the reference train.py
    iter loop (train.py:51-76). Returns losses-per-step."""
    losses = []
    clock = trainer.clock
    while clock.step < steps:
        for data in trainer.train_loader:
            if clock.step >= steps:
                break
            trainer.train_func(data)
            losses.append(
                {k: float(v.detach()) for k, v in trainer.losses.items()}
                | {"train_psnr": float(trainer.extra["train_psnr"])})
            clock.tick()
        clock.tock()
    trainer.eval_mode()
    return losses


def ref_render_frame(ns, trainer, frame: int, stage: int):
    """Deterministic full-frame test render (perturb forced to 0 for the
    comparison only — training used the config's 1.0 on both sides)."""
    import torch
    trainer.config["model"]["perturb"] = 0.0
    ds = trainer.val_dataset
    sample = ds[frame]
    rays = sample["rays"].float()
    n = rays.shape[0]
    if stage == 3 and trainer.config["loss"]["chain_global"]:
        rays = torch.cat([rays, -torch.ones_like(rays[:, :1])], dim=1)
    bg = sample["background"].float()
    with torch.no_grad():
        if stage == 1:
            out = trainer.render(rays, bg, test_time=True)
        else:
            out = trainer.render(rays, bg, use_nof=True, test_time=True)
    typ = "fine" if "rgb_fine" in out else "coarse"
    return (out[f"rgb_{typ}"].numpy().reshape(SIZE, SIZE, 3),
            sample["rgbs"].numpy().reshape(SIZE, SIZE, 3))


# ---------------------------------------------------------------------------
# rebuild side
# ---------------------------------------------------------------------------

def run_rebuild(cfg_dict, smpl, params_init, steps: int, seed: int = 0):
    from moco_flow_tpu.train import get_trainer
    from moco_flow_tpu.utils.config import Config
    config = Config(cfg_dict, mode="train", job_name="jax", seed=seed)
    trainer = get_trainer(config, smpl_data=smpl)
    if params_init is not None:
        trainer.params = params_init
    losses = []
    while trainer.clock.step < steps:
        metrics = trainer.train_step()
        losses.append({k: float(v) for k, v in metrics.items()})
        trainer.clock.tick()
    return trainer, losses


def jax_render_frame(trainer, frame: int):
    import jax.numpy as jnp
    ds = trainer.val_dataset
    rays, _ = ds.frame_rays(frame)
    out = trainer.render_rays_chunked(rays, ds.bkgd_img, trainer.rcfg_test,
                                      anneal=trainer.anneal())
    typ = "rgb_fine" if "rgb_fine" in out else "rgb_coarse"
    gt = np.asarray(ds.frame_rgbs(frame)).reshape(SIZE, SIZE, 3)
    return np.asarray(out[typ]).reshape(SIZE, SIZE, 3), gt


# ---------------------------------------------------------------------------
# weight transfer: torch reference init -> rebuild pytree
# ---------------------------------------------------------------------------

def transfer_stage1(ns, ref_trainer):
    from tests.test_ref_parity import block_perm, map_nerf_params
    px = block_perm(3, NERF_XYZ_FREQS)
    pd = block_perm(3, NERF_DIR_FREQS)
    return {
        "coarse_NeRF": map_nerf_params(ref_trainer.nets["coarse_NeRF"],
                                       perm_xyz=px, perm_extra=pd),
        "fine_NeRF": map_nerf_params(ref_trainer.nets["fine_NeRF"],
                                     perm_xyz=px, perm_extra=pd),
    }


def transfer_stage3(ns, ref_trainer):
    from tests.test_ref_parity import (block_perm, map_nerf_params,
                                       map_nof_params)
    px = block_perm(3, NERF_XYZ_FREQS)
    pi = block_perm(1, NERF_IND_FREQS)
    nx = block_perm(3, NOF_XYZ_FREQS)
    ni = block_perm(1, NOF_IND_FREQS)
    cx, ce = 3 + 6 * NOF_XYZ_FREQS, 1 + 2 * NOF_IND_FREQS
    return {
        "coarse_NeRF": map_nerf_params(ref_trainer.nets["coarse_NeRF"],
                                       perm_xyz=px, perm_extra=pi),
        "fine_NeRF": map_nerf_params(ref_trainer.nets["fine_NeRF"],
                                     perm_xyz=px, perm_extra=pi),
        "bw_NoF": map_nof_params(ref_trainer.nets["bw_NoF"], cx, ce,
                                 perm_xyz=nx, perm_ind=ni),
        "fw_NoF": map_nof_params(ref_trainer.nets["fw_NoF"], cx, ce,
                                 perm_xyz=nx, perm_ind=ni),
    }


# ---------------------------------------------------------------------------
# comparison
# ---------------------------------------------------------------------------

def nof_eval(ns, ref_trainer, jax_trainer, n_frames: int):
    """Post-training NoF quality on IDENTICAL evaluation points through both
    trained models: mean bw/fw L1 on the reference dataset's own
    correspondence sets (fixed seed). This is the apples-to-apples NoF
    comparison — the per-step nof_bw/fw loss tails are NOT comparable
    across implementations because the reference's DataLoader visits frames
    sequentially (frame 0 has near-zero loss) while the rebuild samples
    frames uniformly."""
    import torch
    import jax.numpy as jnp
    from moco_flow_tpu.train.stage_nof import nof_points
    res = {"ref_bw": [], "jax_bw": [], "ref_fw": [], "jax_fw": []}
    jt = jax_trainer
    anneal = jt.anneal()
    for f in range(n_frames):
        torch.manual_seed(123 + f)
        np.random.seed(123 + f)
        inside, _ = ref_trainer.train_dataset.get_frame_correspondence(
            torch.tensor(f), num_sampled=500)
        q = inside[:, :3].float()
        c = inside[:, 3:].float()
        idx = torch.tensor(f)  # RAW frame index: forward_nof normalizes
        # internally (trainer_moco_flow.py:178)
        with torch.no_grad():
            bw = ref_trainer.forward_nof(q, idx, "bw_NoF")
            fw = ref_trainer.forward_nof(c, idx, "fw_NoF")
        res["ref_bw"].append(float((bw - c).abs().mean()))
        res["ref_fw"].append(float((fw - q).abs().mean()))
        qj, cj = jnp.asarray(q.numpy()), jnp.asarray(c.numpy())
        ni = jnp.asarray(f * 2.0 / n_frames - 1.0)
        bwj = nof_points(jt.params["bw_NoF"], jt.statics, anneal, qj, ni,
                         jt.rcfg_train)
        fwj = nof_points(jt.params["fw_NoF"], jt.statics, anneal, cj, ni,
                         jt.rcfg_train)
        res["jax_bw"].append(float(jnp.mean(jnp.abs(bwj - cj))))
        res["jax_fw"].append(float(jnp.mean(jnp.abs(fwj - qj))))
    return {k: float(np.mean(v)) for k, v in res.items()}


def psnr(a, b):
    return float(-10 * np.log10(np.mean((a - b) ** 2) + 1e-12))


def smoothed(losses, key, frac=0.2):
    vals = [l[key] for l in losses if key in l]
    tail = vals[-max(int(len(vals) * frac), 1):]
    return float(np.mean(tail))


def compare_stage(stage, ns, root, smpl, save, steps, n_rand, seed=0,
                  arms=("uniform",)):
    ref_cfg = stage_cfg(stage, root, os.path.join(save, "ref"), steps,
                        n_rand, ref_side=True)
    ref_trainer = build_reference(ns, ref_cfg, seed=seed)
    # snapshot the torch init into a rebuild pytree BEFORE training mutates
    # the reference nets in place; keep it as HOST numpy — the rebuild's
    # train step donates its params buffers, so handing the same device
    # arrays to a second arm would raise 'Array has been deleted'
    import jax
    init = jax.tree.map(np.asarray, (transfer_stage1 if stage == 1
                                     else transfer_stage3)(ns, ref_trainer))

    print(f"== stage {stage}: training the PyTorch reference {steps} steps",
          flush=True)
    ref_losses = train_reference(ref_trainer, steps)

    print(f"== stage {stage}: training the rebuild {steps} steps "
          "(same init weights)", flush=True)
    jax_cfg = stage_cfg(stage, root, os.path.join(save, "jax"), steps,
                        n_rand, ref_side=False)
    jax_trainer, jax_losses = run_rebuild(jax_cfg, smpl, init, steps,
                                          seed=seed)

    ref_img, gt = ref_render_frame(ns, ref_trainer, 0, stage)
    jax_img, gt2 = jax_render_frame(jax_trainer, 0)
    np.testing.assert_allclose(gt, gt2, atol=1e-5)  # same scene on both sides

    key = "img_loss"
    report = {
        "steps": steps,
        "ref_img_loss_tail": smoothed(ref_losses, key),
        "jax_img_loss_tail": smoothed(jax_losses, key),
        "ref_train_psnr_tail": smoothed(ref_losses, "train_psnr"),
        "jax_train_psnr_tail": smoothed(jax_losses, "train_psnr"),
        "ref_render_psnr_vs_gt": psnr(ref_img, gt),
        "jax_render_psnr_vs_gt": psnr(jax_img, gt),
        "cross_render_psnr": psnr(jax_img, ref_img),
    }
    if stage == 3:
        # identical loss keys on both sides (trainer_moco_flow.py:330-364);
        # NOTE: bw/fw tails are frame-mix-noisy (sequential vs uniform frame
        # visits) — nof_eval below is the apples-to-apples comparison
        for k in ("nof_bw", "nof_fw", "nof_local", "nof_global",
                  "alphas_mask"):
            report[f"jax_{k}_tail"] = smoothed(jax_losses, k)
            report[f"ref_{k}_tail"] = smoothed(ref_losses, k)
        report["nof_eval_fixed_points"] = nof_eval(
            ns, ref_trainer, jax_trainer, N_FRAMES)
        # NoF-gap study arms: retrain the rebuild from the SAME init under
        # other frame-visitation policies (the reference side above is
        # single-GPU sequential — shuffle=False, trainer_moco_flow.py:31).
        for arm in arms:
            if arm == "uniform":
                continue  # that's the jax_trainer already evaluated
            print(f"== stage 3 arm: rebuild with frame_sampling={arm}",
                  flush=True)
            arm_cfg = stage_cfg(stage, root, os.path.join(save, f"jax_{arm}"),
                                steps, n_rand, ref_side=False)
            arm_cfg["model"]["frame_sampling"] = arm
            arm_trainer, _ = run_rebuild(arm_cfg, smpl, init, steps,
                                         seed=seed)
            report[f"nof_eval_fixed_points_{arm}"] = nof_eval(
                ns, ref_trainer, arm_trainer, N_FRAMES)
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--steps3", type=int, default=None,
                    help="stage-3 steps (default: --steps)")
    ap.add_argument("--n_rand", type=int, default=256)
    ap.add_argument("--out", default="/tmp/parity_train_report.json")
    ap.add_argument("--base", default=None)
    ap.add_argument("--stages", default="1,3")
    ap.add_argument("--seed", type=int, default=0,
                    help="init/RNG seed for BOTH sides (multi-seed NoF-gap "
                         "study: run with several seeds and compare the "
                         "nof_eval_fixed_points spread — PARITY.md)")
    ap.add_argument("--arms", default="uniform",
                    help="comma list of rebuild frame_sampling arms for "
                         "stage 3 (uniform always runs; add sequential "
                         "and/or epoch_perm for the NoF-gap study)")
    args = ap.parse_args()

    base = args.base or tempfile.mkdtemp(prefix="parity_train_")
    os.makedirs(base, exist_ok=True)
    root = os.path.join(base, "scene")

    from moco_flow_tpu.data.synthetic import make_synthetic_scene
    from scripts.drive_pipeline_e2e import write_scene_smpl_pickle
    smpl = make_synthetic_scene(root, n_frames=N_FRAMES, size=SIZE,
                                focal=FOCAL)
    smpl_root = os.path.join(base, "smpl")
    write_scene_smpl_pickle(smpl, os.path.join(smpl_root, "data"))

    # stage-1 data: multi-view rasterized renders of the frame-0 posed body
    # (the analog of the reference's init_nerf dataset,
    # scripts/data_utils.py:273-336), written through our own preprocessing
    import pickle as _pickle
    import json as _json
    with open(os.path.join(root, "train.json")) as f:
        scene_meta = _json.load(f)
    fr0 = scene_meta["frames"][0]
    vibe_pkl = os.path.join(base, "vibe.pkl")
    with open(vibe_pkl, "wb") as f:
        _pickle.dump({1: {"frame_ids": np.arange(1),
                          "pose": np.asarray([fr0["pose"]], np.float32),
                          "betas": np.asarray([fr0["betas"]], np.float32),
                          "transls": np.asarray([fr0["transl"]],
                                                np.float32)}}, f)
    from scripts.data_utils import create_init_nerf_data
    create_init_nerf_data(vibe_pkl, (SIZE, SIZE), focal=FOCAL,
                          num_images=12, smpl_data=smpl)
    root1 = os.path.join(base, "init_nerf")

    from scripts.ref_driver import import_reference
    ns = import_reference(smpl_root)

    report = {}
    for stage in (int(s) for s in args.stages.split(",")):
        steps = args.steps if stage == 1 else (args.steps3 or args.steps)
        report[f"stage{stage}"] = compare_stage(
            stage, ns, root1 if stage == 1 else root, smpl,
            os.path.join(base, f"s{stage}"), steps, args.n_rand,
            seed=args.seed, arms=tuple(args.arms.split(",")))
        print(json.dumps(report[f"stage{stage}"], indent=2), flush=True)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"report -> {args.out}")
    return report


if __name__ == "__main__":
    main()
