"""YAML config system.

Same external surface as the reference ``utils/parse_config.py``: one YAML per
stage, an experiment directory layout
``save_dir/exp_name/job_name(timestamp)/{ckpts,log,code,config.yaml}``
(parse_config.py:40-53), a code snapshot for reproducibility (:125-131),
resume-pulls-config-from-checkpoint (:86-88), and dict-style access.
"""

from __future__ import annotations

import os
import os.path as osp
import shutil
import time
import warnings

import yaml

# ---------------------------------------------------------------------------
# Schema validation: every key the framework consumes, by section. The
# reference accepts any YAML silently (utils/parse_config.py); here unknown
# keys warn so a typo ('N_importence') or a knob this rebuild does not have
# cannot silently no-op.
# ---------------------------------------------------------------------------

_EMBEDDING_KEYS = {"type", "in_channels", "N_freqs", "logscale"}
_NERF_KEYS = {"type", "D", "W", "in_channels_xyz", "skips",
              "extra_feat_type", "extra_feat_dim", "encoding", "hash"}
_NOF_KEYS = {"type", "D", "W", "in_channels_xyz", "skips",
             "extra_feat_type", "extra_feat_dim", "use_quat"}
_OPT_KEYS = {"type", "lr", "weight_decay", "momentum", "warmup"}

_SCHEMA = {
    "": {"save_dir", "exp_name", "dataloader", "model", "loss",
         "optimizer", "scheduler", "trainer"},
    "dataloader": {"type", "root_dir", "imgs_dir", "size", "val_size",
                   "aabb", "bkgd", "interval", "cache"},
    "model": {"type", "pretrained_path", "pretrained_nerf", "pretrained_nof",
              "coarse_to_fine", "N_rand", "N_sampled", "chunk", "N_samples",
              "N_importance", "use_disp", "perturb", "noise_std",
              "nerf_activate_type", "compute_dtype", "mlp_impl", "remat",
              "fine_budget", "coarse_probe",
              "share_coarse_warps",
              "occ_res", "occ_threshold", "occ_supersample", "occ_extent",
              "occ_tau", "occ_impl", "occ_tighten", "occ_builder",
              "masked_render",
              "frame_sampling",
              "nof_embedding_xyz", "nof_embedding_ind", "nerf_embedding_xyz",
              "nerf_embedding_dir", "nerf_embedding_ind",
              "fw_NoF", "bw_NoF", "coarse_NeRF", "fine_NeRF"},
    "loss": {"type", "weight", "chain_local", "nof_local_weight",
             "chain_global", "nof_global_weight", "img_loss", "nof_loss",
             "msk_loss"},
    "optimizer": _OPT_KEYS | {"moco", "nof"},
    "scheduler": {"type", "decay_step", "decay_gamma", "lr_decay",
                  "num_epochs", "poly_exp"},
    "trainer": {"num_iters", "coarse2fine_start_iter", "coarse2fine_end_iter",
                "val_every_n_step", "vis_img_every_n_val",
                "vis_mesh_video_every_n_val", "save_every_n_step",
                "log_freq"},
}

# model sub-blocks with their own schemas
_MODEL_SUBBLOCKS = {
    "nof_embedding_xyz": _EMBEDDING_KEYS, "nof_embedding_ind": _EMBEDDING_KEYS,
    "nerf_embedding_xyz": _EMBEDDING_KEYS,
    "nerf_embedding_dir": _EMBEDDING_KEYS,
    "nerf_embedding_ind": _EMBEDDING_KEYS,
    "fw_NoF": _NOF_KEYS, "bw_NoF": _NOF_KEYS,
    "coarse_NeRF": _NERF_KEYS, "fine_NeRF": _NERF_KEYS,
}
_LOSS_SUBBLOCKS = {"img_loss", "nof_loss", "msk_loss"}


def validate_config(cfg: dict) -> list:
    """Return a list of warning strings for unknown / known-ignored keys."""
    msgs = []

    def check(d, known, section):
        for k in d or {}:
            if k not in known:
                msgs.append(f"unknown config key '{section}{k}' "
                            f"(known: {', '.join(sorted(known))})")

    check(cfg, _SCHEMA[""], "")
    for section in ("dataloader", "model", "loss", "scheduler", "trainer"):
        block = cfg.get(section)
        if isinstance(block, dict):
            check(block, _SCHEMA[section], section + ".")
    model = cfg.get("model") or {}
    for name, keys in _MODEL_SUBBLOCKS.items():
        sub = model.get(name)
        if isinstance(sub, dict):
            check(sub, keys, f"model.{name}.")
    loss = cfg.get("loss") or {}
    for name in _LOSS_SUBBLOCKS:
        sub = loss.get(name)
        if isinstance(sub, dict):
            check(sub, {"type", "weight"}, f"loss.{name}.")
    opt = cfg.get("optimizer")
    if isinstance(opt, dict):
        check(opt, _SCHEMA["optimizer"], "optimizer.")
        for name in ("moco", "nof"):  # stage-3 dual-optimizer sub-blocks
            sub = opt.get(name)
            if isinstance(sub, dict):
                check(sub, _OPT_KEYS, f"optimizer.{name}.")
    dl = cfg.get("dataloader") or {}
    if "cache" in dl:
        msgs.append(
            "dataloader.cache is accepted for reference compatibility but "
            "has no effect: images/tables are always HBM-resident here "
            "(a strict superset of the reference's RAM cache)")
    return msgs


class Config:
    """Parsed config with experiment-directory services."""

    def __init__(self, cfg: dict, mode: str = "train", resume: str | None = None,
                 job_name: str | None = None, seed: int | None = None,
                 make_dirs: bool = True):
        self._cfg = cfg
        self.mode = mode
        self.resume = resume
        self.seed = seed
        for msg in validate_config(cfg):
            warnings.warn(msg, stacklevel=2)

        self.save_dir = cfg.get("save_dir", "./log")
        self.exp_name = cfg.get("exp_name", "exp")
        self.job_name = job_name or time.strftime("%b%d_%H%M%S")
        self.exp_dir = osp.join(self.save_dir, self.exp_name, self.job_name)
        self.ckpts_dir = osp.join(self.exp_dir, "ckpts")
        self.log_dir = osp.join(self.exp_dir, "log")

        if mode == "train" and make_dirs:
            os.makedirs(self.ckpts_dir, exist_ok=True)
            os.makedirs(self.log_dir, exist_ok=True)
            with open(osp.join(self.exp_dir, "config.yaml"), "w") as f:
                yaml.safe_dump(cfg, f)
            self._snapshot_code()

    def _snapshot_code(self):
        """Copy the package source next to the logs (parse_config.py:125-131)."""
        try:
            pkg = osp.dirname(osp.dirname(osp.abspath(__file__)))
            dst = osp.join(self.exp_dir, "code", "moco_flow_tpu")
            if not osp.exists(dst):
                shutil.copytree(pkg, dst,
                                ignore=shutil.ignore_patterns("__pycache__"))
        except OSError:
            pass  # snapshot is best-effort

    @classmethod
    def from_file(cls, path: str, **kwargs) -> "Config":
        with open(path) as f:
            cfg = yaml.safe_load(f)
        return cls(cfg, **kwargs)

    @classmethod
    def from_args(cls, args, mode: str | None = None) -> "Config":
        """argparse namespace -> Config; on --resume, re-load the config saved
        next to the checkpoint (parse_config.py:86-88)."""
        cfg_path = args.config
        resume = getattr(args, "resume", None)
        if resume:
            saved = osp.join(osp.dirname(osp.dirname(resume)), "config.yaml")
            if osp.exists(saved):
                cfg_path = saved
        return cls.from_file(
            cfg_path,
            mode=mode or getattr(args, "mode", "train"),
            resume=resume,
            job_name=getattr(args, "job_name", None),
            seed=int(args.seed) if getattr(args, "seed", None) is not None else None,
        )

    # dict-style access (parse_config.py:56-58)
    def __getitem__(self, key):
        return self._cfg[key]

    def __contains__(self, key):
        return key in self._cfg

    def get(self, key, default=None):
        return self._cfg.get(key, default)

    @property
    def raw(self) -> dict:
        return self._cfg
