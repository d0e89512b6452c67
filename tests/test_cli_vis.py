"""End-to-end CLI + visualization tests: train loop entry, checkpoint
auto-resume, frame/mesh rendering, test.py dispatch."""

import argparse
import glob
import os.path as osp

import numpy as np
import pytest

from moco_flow_tpu.data.synthetic import make_synthetic_scene
from moco_flow_tpu.parallel.mesh import make_mesh
from moco_flow_tpu.utils.config import Config
from tests.test_stages import moco_config, nerf_config


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scene"))
    smpl = make_synthetic_scene(root, n_frames=3, size=48, focal=60.0)
    return root, smpl


def test_train_loop_and_resume(scene, tmp_path):
    from train import train
    root, smpl = scene
    raw = nerf_config(root, str(tmp_path))
    raw["trainer"].update({"num_iters": 6, "val_every_n_step": 0,
                           "save_every_n_step": 4})
    cfg = Config(raw, mode="train", job_name="job1")
    trainer = train(cfg, smpl_data=smpl, mesh=make_mesh(1))
    assert trainer.clock.step >= 6
    ckpts = glob.glob(osp.join(str(tmp_path), "t_nerf", "*", "ckpts", "*.npz"))
    assert any("final" in c for c in ckpts)

    # resume: a fresh trainer picks up the newest checkpoint
    raw2 = nerf_config(root, str(tmp_path))
    raw2["trainer"].update({"num_iters": 8, "val_every_n_step": 0,
                            "save_every_n_step": 0})
    cfg2 = Config(raw2, mode="train", job_name="job2")
    from moco_flow_tpu.train import get_trainer
    t2 = get_trainer(cfg2, smpl_data=smpl, mesh=make_mesh(1))
    t2.auto_resume()
    assert t2.clock.step >= 6


def test_visualize_frame_and_mesh(scene, tmp_path):
    from moco_flow_tpu.train import get_trainer
    from moco_flow_tpu.train.vis import (
        sigma_grid, visualize_frame, visualize_mesh)
    root, smpl = scene
    cfg = Config(moco_config(root, str(tmp_path)), mode="train")
    trainer = get_trainer(cfg, smpl_data=smpl, mesh=make_mesh(1))
    trainer.train_func()  # one step so everything is materialized

    strip = visualize_frame(trainer, 1, use_nof=True, vis_novel_view=True,
                            save_path=str(tmp_path))
    assert strip.shape[0] == 48 and strip.shape[1] >= 48 * 3
    assert np.isfinite(strip).all()
    out = glob.glob(osp.join(str(tmp_path), "images_epoch_*", "*.png"))
    assert out

    grid = sigma_grid(trainer, -1, n_grid=24, chunk=4096)
    assert grid.shape == (24, 24, 24) and np.isfinite(grid).all()
    # the NoF-warped per-frame grid also evaluates
    grid1 = sigma_grid(trainer, 1, n_grid=16, chunk=4096)
    assert np.isfinite(grid1).all()
    # glue test with a known field: sphere sigma -> OBJ on disk
    import moco_flow_tpu.train.vis as vis_mod
    lin = np.linspace(-1.5, 1.5, 24, dtype=np.float32)
    gx, gy, gz = np.meshgrid(lin, lin, lin, indexing="ij")
    sphere = 20.0 * (1.0 - np.sqrt(gx**2 + gy**2 + gz**2))
    orig = vis_mod.sigma_grid
    vis_mod.sigma_grid = lambda *a, **k: np.maximum(sphere, 0)
    try:
        path = visualize_mesh(trainer, -1, n_grid=24, sigma_threshold=10,
                              save_path=str(tmp_path))
    finally:
        vis_mod.sigma_grid = orig
    assert path is not None and osp.exists(path)
    assert open(path).readline().startswith("v ")


def test_testpy_dispatch(scene, tmp_path):
    """test.py's test() end-to-end: load ckpt, render a frame, extract mesh."""
    from moco_flow_tpu.train import get_trainer
    from test import test as run_test
    root, smpl = scene

    # train + save a stage-3 checkpoint
    raw = moco_config(root, str(tmp_path))
    cfg = Config(raw, mode="train", job_name="trained")
    trainer = get_trainer(cfg, smpl_data=smpl, mesh=make_mesh(1))
    trainer.train_func()
    trainer.clock.tick()
    trainer.save_ckpt("epoch1_iter1")

    args = argparse.Namespace(
        mode="test", config=None, resume=None, job_name=None, seed=None,
        out_dir=str(tmp_path / "out"), reso=32, render_gt=True,
        test_json=None, render_training_poses=False,
        render_spherical_poses=False, spherical_poses_frame=-1,
        extract_mesh=True, mesh_frame=-1, N_grid=24, sigma_threshold=0.0,
        render_frame=1, eval_metrics=True, eval_max_frames=1,
        render_bullet_time=False, bullet_time_frame=0)
    cfg_t = Config(dict(raw), mode="test", make_dirs=False)
    t = run_test(cfg_t, args, smpl_data=smpl)
    assert t.clock.step >= 1  # checkpoint was found and loaded
    outs = glob.glob(str(tmp_path / "out" / "**" / "*"), recursive=True)
    assert any(p.endswith(".png") for p in outs)


def test_testpy_occupancy_dispatch(scene, tmp_path):
    """test.py --occ_res plumbs into the model config and the occupancy-
    skipped render matches the exact render within the tau bound."""
    from moco_flow_tpu.train import get_trainer
    from test import test as run_test
    root, smpl = scene

    raw = moco_config(root, str(tmp_path))
    cfg = Config(raw, mode="train", job_name="trained")
    trainer = get_trainer(cfg, smpl_data=smpl, mesh=make_mesh(1))
    trainer.train_func()
    trainer.clock.tick()
    trainer.save_ckpt("epoch1_iter1")

    base = dict(
        mode="test", config=None, resume=None, job_name=None, seed=None,
        reso=32, render_gt=True, test_json=None,
        render_training_poses=False, render_spherical_poses=False,
        spherical_poses_frame=-1, extract_mesh=False, mesh_frame=-1,
        N_grid=24, sigma_threshold=0.0, render_frame=1, eval_metrics=False,
        eval_max_frames=1, render_bullet_time=False, bullet_time_frame=0)
    import copy
    t_exact = run_test(Config(copy.deepcopy(raw), mode="test",
                              make_dirs=False),
                       argparse.Namespace(out_dir=str(tmp_path / "exact"),
                                          **base), smpl_data=smpl)
    t_occ = run_test(Config(copy.deepcopy(raw), mode="test",
                            make_dirs=False),
                     argparse.Namespace(out_dir=str(tmp_path / "occ"),
                                        occ_res=8, **base), smpl_data=smpl)
    assert t_occ.occ_cfg["resolution"] == 8
    assert t_exact.occ_cfg["resolution"] == 0

    from PIL import Image
    exact_pngs = sorted(glob.glob(str(tmp_path / "exact" / "**" / "*.png"),
                                  recursive=True))
    occ_pngs = sorted(glob.glob(str(tmp_path / "occ" / "**" / "*.png"),
                                recursive=True))
    assert exact_pngs and len(exact_pngs) == len(occ_pngs)
    a = np.asarray(Image.open(exact_pngs[0]), dtype=np.float32) / 255.0
    b = np.asarray(Image.open(occ_pngs[0]), dtype=np.float32) / 255.0
    # the strip is [gt | rgb | depth] panels (train/vis.py); compare the
    # rendered RGB panel only — skipped-empty rays get a sentinel depth by
    # design (ref trainer_moco_flow.py:226-268), so the depth panel differs
    w = a.shape[0]
    assert np.abs(a[:, w:2 * w] - b[:, w:2 * w]).max() <= 0.02
