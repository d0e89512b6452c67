"""End-to-end smoke + convergence tests for the 3-stage pipeline on a
synthetic scene (tiny configs; CPU)."""

import numpy as np
import pytest

import jax

from moco_flow_tpu.data.synthetic import make_synthetic_scene
from moco_flow_tpu.geometry.smpl import synthetic_smpl_data
from moco_flow_tpu.parallel.mesh import make_mesh
from moco_flow_tpu.train import get_trainer
from moco_flow_tpu.utils.config import Config


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scene"))
    smpl = make_synthetic_scene(root, n_frames=3, size=48, focal=60.0)
    return root, smpl


def nerf_config(root, save_dir):
    return {
        "save_dir": save_dir, "exp_name": "t_nerf",
        "dataloader": {
            "type": "moco_flow", "root_dir": root, "imgs_dir": "images",
            "size": [48, 48], "val_size": [48, 48],
            "aabb": [[1.2, 1.2, 1.2], [0, 0, 0]], "bkgd": 1.0, "interval": 1,
        },
        "model": {
            "type": "nerf", "pretrained_path": None,
            "N_rand": 128, "chunk": 2048, "N_samples": 16, "N_importance": 16,
            "use_disp": False, "perturb": 1.0, "noise_std": 0.0,
            "nerf_activate_type": "softplus",
            "nerf_embedding_xyz": {"type": "Embedding", "in_channels": 3,
                                   "N_freqs": 6, "logscale": True},
            "nerf_embedding_dir": {"type": "Embedding", "in_channels": 3,
                                   "N_freqs": 4, "logscale": True},
            "nerf_embedding_ind": None,
            "coarse_NeRF": {"type": "NeRF", "D": 4, "W": 64,
                            "in_channels_xyz": 39, "skips": [2],
                            "extra_feat_type": "dir", "extra_feat_dim": 27},
            "fine_NeRF": {"type": "NeRF", "D": 4, "W": 64,
                          "in_channels_xyz": 39, "skips": [2],
                          "extra_feat_type": "dir", "extra_feat_dim": 27},
        },
        "loss": {"type": "MSE"},
        "optimizer": {"type": "radam", "lr": 5e-3, "weight_decay": 0},
        "scheduler": {"type": "steplr", "decay_step": [100000],
                      "decay_gamma": 0.5},
        "trainer": {"num_iters": 60, "val_every_n_step": 0,
                    "save_every_n_step": 0, "log_freq": 10},
    }


def nof_config(root, save_dir):
    nof = {"type": "NoF", "D": 2, "W": 64, "in_channels_xyz": 33,
           "skips": [1], "extra_feat_type": "ind", "extra_feat_dim": 33,
           "use_quat": True}
    return {
        "save_dir": save_dir, "exp_name": "t_nof",
        "dataloader": {"type": "nof", "root_dir": root, "interval": 1},
        "model": {
            "type": "nof", "pretrained_path": None, "pretrained_nof": None,
            "N_sampled": 512,
            "nof_embedding_xyz": {"in_channels": 3, "N_freqs": 5,
                                  "logscale": True},
            "nof_embedding_ind": {"in_channels": 1, "N_freqs": 16,
                                  "logscale": True},
            "fw_NoF": nof, "bw_NoF": nof,
        },
        "loss": {"type": "L1"},
        "optimizer": {"type": "adam", "lr": 1e-3, "weight_decay": 0},
        "scheduler": {"type": "steplr", "decay_step": [300000],
                      "decay_gamma": 0.5},
        "trainer": {"num_iters": 40, "val_every_n_step": 0,
                    "save_every_n_step": 0, "log_freq": 10},
    }


def moco_config(root, save_dir, pretrained_nerf=None, pretrained_nof=None):
    nof = {"type": "NoF", "D": 2, "W": 64, "in_channels_xyz": 33,
           "skips": [1], "extra_feat_type": "ind", "extra_feat_dim": 33,
           "use_quat": True}
    return {
        "save_dir": save_dir, "exp_name": "t_moco",
        "dataloader": {
            "type": "moco_flow", "root_dir": root, "imgs_dir": "images",
            "size": [48, 48], "val_size": [48, 48],
            "aabb": [[1.2, 1.2, 1.4], [0, 0, 0]], "bkgd": "rand",
            "interval": 1,
        },
        "model": {
            "type": "moco_flow", "pretrained_path": None,
            "pretrained_nerf": pretrained_nerf, "pretrained_nof": pretrained_nof,
            "coarse_to_fine": True,
            "N_rand": 64, "N_sampled": 128, "chunk": 2048,
            "N_samples": 12, "N_importance": 12, "use_disp": False,
            "perturb": 1.0, "noise_std": 0.0, "nerf_activate_type": "relu",
            "nof_embedding_xyz": {"in_channels": 3, "N_freqs": 5,
                                  "logscale": True},
            "nof_embedding_ind": {"in_channels": 1, "N_freqs": 16,
                                  "logscale": True},
            "fw_NoF": nof, "bw_NoF": nof,
            "nerf_embedding_xyz": {"in_channels": 3, "N_freqs": 6,
                                   "logscale": True},
            "nerf_embedding_dir": None,
            "nerf_embedding_ind": {"in_channels": 1, "N_freqs": 2,
                                   "logscale": True},
            "coarse_NeRF": {"type": "NeRF", "D": 4, "W": 64,
                            "in_channels_xyz": 39, "skips": [2],
                            "extra_feat_type": "ind", "extra_feat_dim": 5},
            "fine_NeRF": {"type": "NeRF", "D": 4, "W": 64,
                          "in_channels_xyz": 39, "skips": [2],
                          "extra_feat_type": "ind", "extra_feat_dim": 5},
        },
        "loss": {
            "chain_local": True, "nof_local_weight": 0.2,
            "chain_global": True, "nof_global_weight": 0.2,
            "img_loss": {"type": "MSE", "weight": 1},
            "nof_loss": {"type": "L1", "weight": 10},
            "msk_loss": {"type": "BCE", "weight": 10},
        },
        "optimizer": {
            "moco": {"type": "adam", "lr": 1e-3, "weight_decay": 0},
            "nof": {"type": "adam", "lr": 1e-3, "weight_decay": 0},
        },
        "scheduler": {"type": "steplr", "decay_step": [1050000],
                      "decay_gamma": 0.5},
        "trainer": {"num_iters": 30, "coarse2fine_start_iter": 8,
                    "coarse2fine_end_iter": 20, "val_every_n_step": 0,
                    "save_every_n_step": 0, "log_freq": 10},
    }


def run_steps(trainer, n):
    metrics = []
    for _ in range(n):
        metrics.append(trainer.train_func())
        trainer.clock.tick(trainer.world_size)
    return metrics


def test_stage1_overfit(scene, tmp_path):
    root, smpl = scene
    cfg = Config(nerf_config(root, str(tmp_path)), mode="train")
    trainer = get_trainer(cfg, smpl_data=smpl, mesh=make_mesh(1))
    metrics = run_steps(trainer, 60)
    first = np.mean([m["img_loss"] for m in metrics[:5]])
    last = np.mean([m["img_loss"] for m in metrics[-5:]])
    assert np.isfinite(last)
    assert last < first * 0.7, (first, last)
    assert metrics[-1]["train_psnr"] > metrics[0]["train_psnr"]
    # val path
    val = trainer.val_step()
    assert np.isfinite(val["val_psnr"])
    # empty-space skipping on a TRAINED density field: a reduced fine
    # budget must render close to the exact path (it keeps the top-weight
    # coarse bins' samples)
    import dataclasses as dc
    import jax.numpy as jnp
    ds = trainer.val_dataset
    rays, _ = ds.frame_rays(0)
    rcfg = dc.replace(trainer.rcfg_test, mlp_impl="fused")
    exact = trainer.render_rays_chunked(rays[:256], jnp.ones((256, 3)), rcfg,
                                        chunk=256)
    cut = trainer.render_rays_chunked(
        rays[:256], jnp.ones((256, 3)),
        dc.replace(rcfg, fine_budget=24), chunk=256)
    err = float(jnp.mean(jnp.abs(cut["rgb_fine"] - exact["rgb_fine"])))
    assert err < 2e-2, err
    # coarse probe on the trained field: the importance pdf from an 8-bin
    # histogram must still render close
    prb = trainer.render_rays_chunked(
        rays[:256], jnp.ones((256, 3)),
        dc.replace(rcfg, fine_budget=24, coarse_probe=8), chunk=256)
    err = float(jnp.mean(jnp.abs(prb["rgb_fine"] - exact["rgb_fine"])))
    assert err < 3e-2, err
    # checkpoint roundtrip
    trainer.save_ckpt("final")
    p0 = jax.tree_util.tree_leaves(trainer.params)[0].copy()
    trainer.params = jax.tree.map(lambda x: x * 0, trainer.params)
    trainer.load_ckpt(trainer._ckpt_path("final"))
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(trainer.params)[0]),
        np.asarray(p0))
    tmp_path.joinpath("marker").write_text("ok")


def test_stage2_nof_converges(scene, tmp_path):
    root, smpl = scene
    cfg = Config(nof_config(root, str(tmp_path)), mode="train")
    trainer = get_trainer(cfg, smpl_data=smpl, mesh=make_mesh(1))
    metrics = run_steps(trainer, 40)
    first = metrics[0]["nof_bw"] + metrics[0]["nof_fw"]
    last = metrics[-1]["nof_bw"] + metrics[-1]["nof_fw"]
    assert np.isfinite(last) and last < first, (first, last)
    val = trainer.val_step()
    assert np.isfinite(val["val_nof_bw"])


def test_stage3_phases_and_losses(scene, tmp_path):
    root, smpl = scene
    # stage-1 checkpoint to bootstrap from
    cfg1 = Config(nerf_config(root, str(tmp_path)), mode="train")
    t1 = get_trainer(cfg1, smpl_data=smpl, mesh=make_mesh(1))
    run_steps(t1, 3)
    t1.save_ckpt("final")
    nerf_ckpt = t1._ckpt_path("final")

    cfg = Config(moco_config(root, str(tmp_path), pretrained_nerf=nerf_ckpt),
                 mode="train")
    trainer = get_trainer(cfg, smpl_data=smpl, mesh=make_mesh(1))

    # sigma-branch surgery: both NeRFs share the stage-1 fine sigma branch
    np.testing.assert_allclose(
        np.asarray(trainer.params["coarse_NeRF"]["trunk"][0]["w"]),
        np.asarray(t1.params["fine_NeRF"]["trunk"][0]["w"]))

    # phase schedule parity at realistic steps (c2f 5000..1005000,
    # ref trainer_moco_flow.py:419-438): msk-only when (step//1000)%10==0
    ref_phases = {0: ("full", True), 4999: ("full", True),
                  5000: ("none", True), 5001: ("none", False),
                  9999: ("none", False), 10000: ("msk", False),
                  10999: ("msk", False), 11000: ("none", False),
                  19999: ("none", False), 20000: ("msk", False),
                  1005000: ("msk", False), 2000000: ("msk", False)}
    t_saved = (trainer.c2f_start, trainer.c2f_end)
    trainer.c2f_start, trainer.c2f_end = 5000, 1005000
    for s, want in ref_phases.items():
        assert trainer.phase(s) == want, (s, trainer.phase(s), want)
    trainer.c2f_start, trainer.c2f_end = t_saved

    seen = set()
    metrics = []
    for _ in range(26):
        seen.add(trainer.phase(trainer.clock.step))
        metrics.append(trainer.train_func())
        trainer.clock.tick(1)
    # at toy scale (all steps < 1000) the schedule yields full then msk
    modes = {m for m, _ in seen}
    assert modes == {"full", "msk"}, modes
    # phase-1 steps have the full loss set
    assert {"img_loss", "nof_local", "nof_global", "nof_bw", "nof_fw",
            "alphas_mask"} <= set(metrics[0])
    # msk-phase steps drop nof_bw/fw but keep alphas_mask
    late = metrics[-1]
    assert "alphas_mask" in late and "nof_bw" not in late
    for m in metrics:
        for k, v in m.items():
            assert np.isfinite(v), (k, m)
    # the nof-optimizer deletion flag flips only at a 'none' step
    # (ref :374-377); toy-scale schedule never reaches one
    assert not trainer.nof_opt_deleted
    val = trainer.val_step()
    assert np.isfinite(val["val_psnr"])


def test_stage1_data_parallel(scene, tmp_path):
    """Same training on an 8-device CPU mesh: runs, converges, params stay
    replicated/identical."""
    from moco_flow_tpu.parallel.mesh import make_mesh
    root, smpl = scene
    mesh = make_mesh(8)
    cfg = Config(nerf_config(root, str(tmp_path)), mode="train")
    trainer = get_trainer(cfg, smpl_data=smpl, mesh=mesh)
    assert trainer.world_size == 8
    metrics = run_steps(trainer, 20)
    first = np.mean([m["img_loss"] for m in metrics[:3]])
    last = np.mean([m["img_loss"] for m in metrics[-3:]])
    assert np.isfinite(last) and last < first


def test_stage2_data_parallel(scene, tmp_path):
    """NoF pretraining on an 8-device mesh: converges with psum'd grads."""
    root, smpl = scene
    cfg = Config(nof_config(root, str(tmp_path)), mode="train")
    trainer = get_trainer(cfg, smpl_data=smpl, mesh=make_mesh(8))
    assert trainer.world_size == 8
    metrics = run_steps(trainer, 15)
    first = float(metrics[0]["nof_bw"]) + float(metrics[0]["nof_fw"])
    last = float(metrics[-1]["nof_bw"]) + float(metrics[-1]["nof_fw"])
    assert np.isfinite(last) and last < first


def test_stage3_data_parallel(scene, tmp_path):
    """Flagship stage-3 step on an 8-device mesh: dual optimizer, phase
    variants, correspondence table through shard_map — converges, finite."""
    root, smpl = scene
    cfg = Config(moco_config(root, str(tmp_path)), mode="train")
    trainer = get_trainer(cfg, smpl_data=smpl, mesh=make_mesh(8))
    assert trainer.world_size == 8
    metrics = run_steps(trainer, 16)
    for m in metrics:
        for k, v in m.items():
            assert np.isfinite(v), (k, m)
    first = np.mean([m["img_loss"] for m in metrics[:3]])
    last = np.mean([m["img_loss"] for m in metrics[-3:]])
    assert np.isfinite(last) and last < first
    # LR milestones are scaled by world_size at construction
    # (ref trainer/base.py:147) — the dp trainer must pass its world size in
    import optax
    from moco_flow_tpu.train.optim import make_schedule
    sched = make_schedule({"type": "steplr", "decay_step": [80],
                           "decay_gamma": 0.5}, 1e-3,
                          world_size=trainer.world_size)
    assert np.isclose(float(sched(9)), 1e-3) and \
        np.isclose(float(sched(10)), 5e-4)
    val = trainer.val_step()
    assert np.isfinite(val["val_psnr"])


def test_epoch_perm_frame_semantics():
    """`frame_sampling: epoch_perm` (the reference DataLoader's shuffled
    without-replacement epochs, ref train.py:47-51): every consecutive
    block of num_frames steps visits each frame exactly once; epochs are
    shuffled independently; the draw is a pure deterministic function of
    (seed, step)."""
    import jax.numpy as jnp

    from moco_flow_tpu.parallel.mesh import epoch_perm_frame

    F = 7
    steps = jnp.arange(4 * F)
    frames = np.asarray(jax.vmap(
        lambda s: epoch_perm_frame(3, None, s, F))(steps))
    for e in range(4):
        block = frames[e * F:(e + 1) * F]
        assert sorted(block.tolist()) == list(range(F)), (e, block)
    # epochs reshuffle (all-equal permutations across 4 epochs would mean
    # the epoch index never reaches the key)
    assert any(frames[:F].tolist() != frames[e * F:(e + 1) * F].tolist()
               for e in range(1, 4))
    # deterministic in (seed, step); different seeds decorrelate
    again = np.asarray(jax.vmap(
        lambda s: epoch_perm_frame(3, None, s, F))(steps))
    np.testing.assert_array_equal(frames, again)
    other = np.asarray(jax.vmap(
        lambda s: epoch_perm_frame(4, None, s, F))(steps))
    assert frames.tolist() != other.tolist()


def test_epoch_perm_frame_per_chip():
    """Under DP each chip draws its own epoch permutation (the
    DistributedSampler analog): per-chip sequences are all valid
    without-replacement epochs but not identical across chips."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from moco_flow_tpu.parallel.mesh import epoch_perm_frame, make_mesh

    F = 5
    mesh = make_mesh(8)

    def draw(steps):  # steps: (1, F) shard per chip
        return jax.vmap(
            lambda s: epoch_perm_frame(0, "data", s, F))(steps[0])[None]

    steps = jnp.broadcast_to(jnp.arange(F)[None], (8, F))
    out = np.asarray(
        jax.jit(shard_map(draw, mesh=mesh, in_specs=P("data"),
                          out_specs=P("data")))(steps))
    assert out.shape == (8, F)
    for chip in range(8):
        assert sorted(out[chip].tolist()) == list(range(F)), out[chip]
    assert len({tuple(r.tolist()) for r in out}) > 1, out


def test_frame_sampling_knob_validated(scene, tmp_path):
    """Unknown model.frame_sampling values fail loudly at trainer build."""
    root, smpl = scene
    cfg = nof_config(root, str(tmp_path))
    cfg["model"]["frame_sampling"] = "bogus"
    with pytest.raises(ValueError, match="frame_sampling"):
        get_trainer(Config(cfg, mode="train"), smpl_data=smpl,
                    mesh=make_mesh(1))


def test_sequential_frame_sampling():
    """`frame_sampling: sequential` = the reference's single-GPU DataLoader
    order (shuffle=False, ref trainer_moco_flow.py:31): 0,1,..,F-1 cycling."""
    import jax.numpy as jnp

    from moco_flow_tpu.parallel.mesh import sample_frame

    F = 4
    key = jax.random.key(0)
    frames = [int(sample_frame("sequential", 0, None, s, F, key))
              for s in range(2 * F + 1)]
    assert frames == [0, 1, 2, 3, 0, 1, 2, 3, 0]


def test_stage2_epoch_perm_trains(scene, tmp_path):
    """NoF pretraining with epoch_perm visitation still converges."""
    root, smpl = scene
    cfg = nof_config(root, str(tmp_path))
    cfg["model"]["frame_sampling"] = "epoch_perm"
    trainer = get_trainer(Config(cfg, mode="train"), smpl_data=smpl,
                          mesh=make_mesh(1))
    metrics = run_steps(trainer, 40)
    first = metrics[0]["nof_bw"] + metrics[0]["nof_fw"]
    last = metrics[-1]["nof_bw"] + metrics[-1]["nof_fw"]
    assert np.isfinite(last) and last < first, (first, last)
