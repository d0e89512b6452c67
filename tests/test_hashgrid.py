"""Multiresolution hash-grid encoding (nn/hashgrid.py): encoder math,
model plumbing (encoding: hashgrid), and stage-1 convergence — the
BASELINE.json configs[4] stretch swap for the sinusoidal PE."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moco_flow_tpu.nn.hashgrid import (HashGridConfig, hashgrid_encode,
                                       init_hashgrid)
from moco_flow_tpu.nn.nerf import (NeRFConfig, init_nerf, nerf_apply,
                                   sigma_branch_params)


def small_cfg(**kw):
    d = dict(n_levels=3, n_features=2, log2_table_size=10, base_res=4,
             max_res=16, extent=1.0)
    d.update(kw)
    return HashGridConfig(**d)


def test_shapes_and_levels():
    cfg = small_cfg()
    table = init_hashgrid(jax.random.key(0), cfg)
    assert table.shape == (3, 1024, 2)
    res = cfg.level_resolutions()
    assert res[0] == 4 and res[-1] == 16 and np.all(np.diff(res) > 0)
    x = jax.random.uniform(jax.random.key(1), (37, 3), minval=-1, maxval=1)
    out = hashgrid_encode(table, x, cfg)
    assert out.shape == (37, cfg.out_dim) and out.dtype == jnp.float32
    out_bf = hashgrid_encode(table, x, cfg, compute_dtype=jnp.bfloat16)
    assert out_bf.dtype == jnp.bfloat16


def test_trilinear_exact_at_lattice_and_midpoint():
    # one dense level (5^3 = 125 <= 1024: collision-free linear indexing):
    # the encoding at a lattice vertex must equal that vertex's table row,
    # and at a cell midpoint the mean of its 8 corner rows
    cfg = small_cfg(n_levels=1, base_res=4, max_res=4)
    table = init_hashgrid(jax.random.key(0), cfg) * 1e4  # O(1) entries
    n_verts = 5

    def vert_world(i, j, k):
        # world coord of lattice vertex (i,j,k): x01 = i/res
        return (np.array([i, j, k], np.float32) / 4.0) * 2 * cfg.extent \
            - cfg.extent

    def row(i, j, k):
        return np.asarray(table[0, (i * n_verts + j) * n_verts + k])

    x = jnp.asarray([vert_world(1, 2, 3), vert_world(0, 0, 0),
                     vert_world(2, 2, 2) + 0.25 * cfg.extent])  # midpoint
    out = np.asarray(hashgrid_encode(table, x, cfg))
    np.testing.assert_allclose(out[0], row(1, 2, 3), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out[1], row(0, 0, 0), rtol=1e-5, atol=1e-6)
    corners = np.mean([row(2 + a, 2 + b, 2 + c)
                       for a in (0, 1) for b in (0, 1) for c in (0, 1)],
                      axis=0)
    np.testing.assert_allclose(out[2], corners, rtol=1e-5, atol=1e-6)


def test_continuity_and_clamp():
    cfg = small_cfg()
    table = init_hashgrid(jax.random.key(2), cfg)
    x = jnp.asarray([[0.3, -0.2, 0.7]])
    eps = 1e-5
    a = hashgrid_encode(table, x, cfg)
    b = hashgrid_encode(table, x + eps, cfg)
    assert float(jnp.abs(a - b).max()) < 1e-3  # trilerp is continuous
    # outside the AABB clamps to the boundary value
    far = hashgrid_encode(table, jnp.asarray([[5.0, 5.0, 5.0]]), cfg)
    edge = hashgrid_encode(table, jnp.asarray([[1.0, 1.0, 1.0]]), cfg)
    np.testing.assert_allclose(np.asarray(far), np.asarray(edge), atol=1e-6)


def test_gradient_flows_to_table():
    cfg = small_cfg()
    table = init_hashgrid(jax.random.key(3), cfg)
    x = jax.random.uniform(jax.random.key(4), (16, 3), minval=-1, maxval=1)

    def loss(t):
        return jnp.sum(hashgrid_encode(t, x, cfg) ** 2)

    g = jax.grad(loss)(table)
    assert g.shape == table.shape
    assert float(jnp.abs(g).max()) > 0
    # gradients only land on touched rows: 16 pts * 8 corners * 3 levels max
    touched = int(jnp.sum(jnp.any(g != 0, axis=-1)))
    assert 0 < touched <= 16 * 8 * 3


def nerf_hash_dict():
    return {"type": "NeRF", "D": 2, "W": 64, "skips": [],
            "extra_feat_type": "dir", "extra_feat_dim": 27,
            "encoding": "hashgrid",
            "hash": {"n_levels": 4, "n_features": 2, "log2_table_size": 12,
                     "base_res": 4, "max_res": 32, "extent": 1.2}}


def test_nerf_config_plumbing():
    cfg = NeRFConfig.from_dict(nerf_hash_dict())
    assert cfg.encoding == "hashgrid"
    assert cfg.in_channels_xyz == 8  # L*F replaces the PE width
    params = init_nerf(jax.random.key(0), cfg)
    assert params["hash"].shape == (4, 4096, 2)
    assert "hash" in sigma_branch_params(params)  # density transfers with it
    # forward through the tiny MLP on encoded features
    x = jax.random.uniform(jax.random.key(1), (8, 3), minval=-1, maxval=1)
    feats = hashgrid_encode(params["hash"], x, cfg.hash)
    extra = jnp.zeros((8, 27))
    out = nerf_apply(params, feats, extra, cfg)
    assert out.shape == (8, 4) and bool(jnp.all(jnp.isfinite(out)))
    with pytest.raises(ValueError, match="unknown NeRF encoding"):
        NeRFConfig.from_dict({"encoding": "fourier"})


def test_factory_rejects_fused_impl():
    from moco_flow_tpu.train.factory import render_config
    model_cfg = {"coarse_NeRF": nerf_hash_dict(), "N_samples": 8,
                 "mlp_impl": "fused"}
    with pytest.raises(ValueError, match="hashgrid"):
        render_config(model_cfg)
    # auto resolves to xla instead of fused
    rcfg = render_config(dict(model_cfg, mlp_impl="auto"))
    assert rcfg.mlp_impl == "xla"


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    from moco_flow_tpu.data.synthetic import make_synthetic_scene
    root = str(tmp_path_factory.mktemp("scene"))
    smpl = make_synthetic_scene(root, n_frames=3, size=48, focal=60.0)
    return root, smpl


def hash_nerf_stage1_config(root, save_dir):
    from test_stages import nerf_config
    cfg = nerf_config(root, save_dir)
    m = cfg["model"]
    for k in ("coarse_NeRF", "fine_NeRF"):
        m[k] = dict(nerf_hash_dict())
    # PE block stays for the dir embedding; xyz PE is simply unused
    cfg["trainer"]["num_iters"] = 120
    cfg["optimizer"]["lr"] = 1e-2  # hash tables train at instant-ngp LRs
    return cfg


def test_stage1_hashgrid_converges(scene, tmp_path):
    """Stage-1 trains end-to-end with the hash encoding and beats its own
    start by a wide margin (the VERDICT item-4 convergence gate)."""
    from moco_flow_tpu.train import get_trainer
    from moco_flow_tpu.utils.config import Config

    root, smpl = scene
    config = Config(hash_nerf_stage1_config(root, str(tmp_path)),
                    mode="train")
    trainer = get_trainer(config, smpl_data=smpl)
    metrics = []
    for _ in range(config["trainer"]["num_iters"]):
        metrics.append(trainer.train_func())
        trainer.clock.tick(1)
    first = float(np.mean([m["img_loss"] for m in metrics[:10]]))
    last = float(np.mean([m["img_loss"] for m in metrics[-10:]]))
    assert np.isfinite(last)
    assert last < 0.5 * first, (first, last)
    assert metrics[-1]["train_psnr"] > metrics[0]["train_psnr"]
    # the hash table actually trained (it carries the field)
    delta = float(jnp.abs(trainer.params["fine_NeRF"]["hash"]).max())
    assert delta > 1e-3  # init is U(-1e-4, 1e-4)
    # checkpoint roundtrip carries the table
    trainer.save_ckpt("final")
    t0 = np.asarray(trainer.params["fine_NeRF"]["hash"]).copy()
    trainer.params = jax.tree.map(lambda x: x * 0, trainer.params)
    trainer.load_ckpt(trainer._ckpt_path("final"))
    np.testing.assert_allclose(
        np.asarray(trainer.params["fine_NeRF"]["hash"]), t0)
