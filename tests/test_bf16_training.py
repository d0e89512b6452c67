"""The bf16 pipeline (what bench.py measures) actually converges."""

import numpy as np
import pytest

from moco_flow_tpu.data.synthetic import make_synthetic_scene
from moco_flow_tpu.parallel.mesh import make_mesh
from moco_flow_tpu.train import get_trainer
from moco_flow_tpu.utils.config import Config
from tests.test_stages import nerf_config, run_steps


def test_stage1_overfit_bf16(tmp_path):
    root = str(tmp_path / "scene")
    smpl = make_synthetic_scene(root, n_frames=2, size=40, focal=50.0)
    raw = nerf_config(root, str(tmp_path))
    raw["model"]["compute_dtype"] = "bfloat16"
    raw["trainer"]["num_iters"] = 40
    cfg = Config(raw, mode="train")
    trainer = get_trainer(cfg, smpl_data=smpl, mesh=make_mesh(1))
    metrics = run_steps(trainer, 40)
    first = np.mean([float(m["img_loss"]) for m in metrics[:5]])
    last = np.mean([float(m["img_loss"]) for m in metrics[-5:]])
    assert np.isfinite(last) and last < first * 0.8, (first, last)
