"""Student-trunk render distillation (render/distill.py): the student
approximates the teacher's field, swaps into the trainer's render path
(both NeRFs), renders through the standard machinery, and refuses to
train afterwards."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from __graft_entry__ import _tiny_moco_config
from moco_flow_tpu.data.synthetic import make_synthetic_scene
from moco_flow_tpu.render.distill import (distill_student, student_config,
                                          swap_render_nerf)
from moco_flow_tpu.train import get_trainer
from moco_flow_tpu.utils.config import Config


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("distill")
    root = str(tmp / "scene")
    smpl = make_synthetic_scene(root, n_frames=2, size=24, focal=30.0)
    cfg = _tiny_moco_config(root, str(tmp / "log"))
    cfg["dataloader"]["size"] = [24, 24]
    cfg["dataloader"]["val_size"] = [24, 24]
    cfg["model"].update({"N_rand": 16, "N_samples": 8, "N_importance": 8})
    t = get_trainer(Config(cfg, mode="train"), smpl_data=smpl)
    t.c2f = False  # distillation embeds with full PE (bench_occupancy note)
    # give the teacher a non-trivial field so the distillation target isn't
    # the init noise: a few steps of real training
    for _ in range(2):
        t.train_func()
        t.clock.tick()
    return t


def test_student_config_shapes():
    from moco_flow_tpu.nn.nerf import NeRFConfig
    t = NeRFConfig(depth=8, width=256, in_channels_xyz=63, skips=(4,),
                   extra_feat_type="ind", extra_feat_dim=5)
    s = student_config(t, depth=4, width=128)
    assert (s.depth, s.width, s.skips) == (4, 128, (2,))
    assert s.in_channels_xyz == 63 and s.extra_feat_dim == 5
    s2 = student_config(t, depth=2, width=64)
    assert s2.skips == ()


def test_distill_learns_and_swaps(trainer):
    from moco_flow_tpu.nn.nerf import nerf_apply
    from moco_flow_tpu.render.volume import embed_padded

    statics = trainer.statics
    t_cfg = statics.fine
    t_params = trainer.params["fine_NeRF"]

    rays, _ = trainer.val_dataset.frame_rays(0)
    bg = jnp.ones((rays.shape[0], 3))
    ref = trainer.render_rays_chunked(rays, bg, trainer.rcfg_test,
                                      anneal=trainer.anneal(), chunk=256)
    ref_rgb = np.asarray(ref["rgb_fine"])

    s_params, s_cfg, loss = distill_student(
        trainer, depth=2, width=64, steps=150, batch=2048, extent=1.5)
    assert np.isfinite(loss)

    # pointwise field agreement on fresh points (the distillation target)
    key = jax.random.key(42)
    x = jax.random.uniform(key, (512, 3), minval=-1.5, maxval=1.5)
    ind = jnp.zeros((512, 1))
    extra = embed_padded(ind, statics.nerf_ind, t_cfg.extra_feat_dim)
    x_emb_t = embed_padded(x, statics.nerf_xyz, t_cfg.in_channels_xyz)
    x_emb_s = embed_padded(x, statics.nerf_xyz, s_cfg.in_channels_xyz)
    out_t = np.asarray(nerf_apply(t_params, x_emb_t, extra, t_cfg))
    out_s = np.asarray(nerf_apply(s_params, x_emb_s, extra, s_cfg))
    soft = lambda s: np.log1p(np.maximum(s, 0.0))
    sig_mse = float(np.mean((soft(out_s[:, 3]) - soft(out_t[:, 3])) ** 2))
    base_mse = float(np.mean(soft(out_t[:, 3]) ** 2)) + 1e-6
    assert sig_mse < 0.5 * base_mse or sig_mse < 1e-3

    # the swap installed the student in BOTH render NeRFs and the statics
    assert trainer.statics.fine is s_cfg and trainer.statics.coarse is s_cfg
    # render through the standard chunked path: same keys, close output
    out = trainer.render_rays_chunked(rays, bg, trainer.rcfg_test,
                                      anneal=trainer.anneal(), chunk=256)
    assert set(out.keys()) == set(ref.keys())
    stu_rgb = np.asarray(out["rgb_fine"])
    assert np.isfinite(stu_rgb).all()
    mse = float(np.mean((stu_rgb - ref_rgb) ** 2))
    psnr = -10 * np.log10(mse + 1e-12)
    assert psnr > 20.0, psnr  # student tracks the teacher's render

    # training after the swap is refused loudly
    with pytest.raises(RuntimeError, match="render-time artifact"):
        trainer.train_step()


def test_swap_render_nerf_clears_caches(tmp_path):
    root = str(tmp_path / "scene")
    smpl = make_synthetic_scene(root, n_frames=2, size=16, focal=20.0)
    cfg = _tiny_moco_config(root, str(tmp_path / "log"))
    cfg["dataloader"]["size"] = [16, 16]
    cfg["dataloader"]["val_size"] = [16, 16]
    cfg["model"].update({"N_rand": 8, "N_samples": 4, "N_importance": 4,
                         "occ_res": 4, "occ_threshold": -1e9})
    t = get_trainer(Config(cfg, mode="train"), smpl_data=smpl)
    rays, _ = t.val_dataset.frame_rays(0)
    t.tighten_rays(rays, 0, size=t.val_dataset.size)
    t.render_rays_chunked(rays[:8], jnp.ones((8, 3)), t.rcfg_test,
                          anneal=t.anneal(), chunk=8)
    from moco_flow_tpu.train.vis import sigma_grid
    sigma_grid(t, 0, n_grid=8, chunk=512)  # populate the jitted-eval cache
    assert t._occ_grids and t._render_fns and t._sigma_eval_fns
    from moco_flow_tpu.nn.nerf import init_nerf
    s_cfg = student_config(t.statics.fine, depth=4, width=48)
    sp = init_nerf(jax.random.key(0), s_cfg)
    swap_render_nerf(t, s_cfg, sp)
    assert not t._occ_grids and not t._render_fns
    # the sigma-eval path must rebuild against the STUDENT architecture
    # (a stale closure over the teacher config crashed the first TPU
    # student-axis bench with a skip-concat shape mismatch)
    g = sigma_grid(t, 0, n_grid=8, chunk=512)
    assert np.isfinite(g).all()
    # and the occupancy grid rebuilds through it (the crashing call chain)
    t.tighten_rays(rays, 0, size=t.val_dataset.size)
