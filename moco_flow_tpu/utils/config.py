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

import yaml


class Config:
    """Parsed config with experiment-directory services."""

    def __init__(self, cfg: dict, mode: str = "train", resume: str | None = None,
                 job_name: str | None = None, seed: int | None = None,
                 make_dirs: bool = True):
        self._cfg = cfg
        self.mode = mode
        self.resume = resume
        self.seed = seed

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
