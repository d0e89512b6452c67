"""Multi-chip render sharding: the chunked renderer shards tiles across the
mesh and matches the single-device result."""

import jax
import jax.numpy as jnp
import numpy as np

from moco_flow_tpu.data.synthetic import make_synthetic_scene
from moco_flow_tpu.parallel.mesh import make_mesh
from moco_flow_tpu.train import get_trainer
from moco_flow_tpu.utils.config import Config
from tests.test_stages import moco_config


def test_fused_kernels_under_shard_map(tmp_path):
    """The fused Pallas megakernels (interpret mode on CPU) inside a REAL
    sharded train step: `mlp_impl: fused` through dp_jit/shard_map on the
    8-device mesh must match `mlp_impl: xla` step-for-step — the exact
    combination production multi-chip training runs (round-4 verdict: the
    fused path was only ever exercised single-device)."""
    root = str(tmp_path / "scene")
    smpl = make_synthetic_scene(root, n_frames=2, size=24, focal=30.0)

    def trainer_for(impl, name):
        raw = moco_config(root, str(tmp_path))
        raw["model"].update({"mlp_impl": impl, "N_rand": 8, "N_samples": 4,
                             "N_importance": 4, "chunk": 256})
        raw["trainer"]["num_iters"] = 4
        return get_trainer(Config(raw, mode="train", job_name=name),
                           smpl_data=smpl, mesh=make_mesh(8))

    tf = trainer_for("fused", "fused8")
    tx = trainer_for("xla", "xla8")
    # identical init — a REAL copy: tf's donated train steps delete its
    # initial param buffers, and jnp.asarray would alias them
    tx.params = jax.tree.map(lambda x: jnp.array(x, copy=True), tf.params)
    assert tf.world_size == 8 and tf.rcfg_train.mlp_impl == "fused"

    def run(tr, n):
        out = []
        for _ in range(n):
            out.append(tr.train_step())
            tr.clock.tick(tr.world_size)
        return out

    mf = run(tf, 3)
    mx = run(tx, 3)
    for a, b in zip(mf, mx):
        for k in a:
            np.testing.assert_allclose(float(a[k]), float(b[k]),
                                       rtol=2e-3, atol=2e-4, err_msg=k)
    flat_f = jax.tree_util.tree_leaves(tf.params)
    flat_x = jax.tree_util.tree_leaves(tx.params)
    for pa, pb in zip(flat_f, flat_x):
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb),
                                   rtol=5e-3, atol=5e-4)


def test_sharded_render_matches_single(tmp_path):
    root = str(tmp_path / "scene")
    smpl = make_synthetic_scene(root, n_frames=2, size=40, focal=50.0)
    raw = moco_config(root, str(tmp_path))
    t1 = get_trainer(Config(raw, mode="train", job_name="a"),
                     smpl_data=smpl, mesh=make_mesh(1))
    t8 = get_trainer(Config(dict(raw), mode="train", job_name="b"),
                     smpl_data=smpl, mesh=make_mesh(8))
    t8.params = t1.params  # identical weights

    ds = t1.val_dataset
    rays, _ = ds.frame_rays(0)
    bg = jnp.ones((rays.shape[0], 3))
    # chunk chosen so the tile count (7) is NOT divisible by 8 -> padding path
    r1 = t1.render_rays_chunked(rays, bg, t1.rcfg_test,
                                anneal=t1.anneal(), chunk=256)
    r8 = t8.render_rays_chunked(rays, bg, t8.rcfg_test,
                                anneal=t8.anneal(), chunk=256)
    for k in r1:
        np.testing.assert_allclose(np.asarray(r8[k]), np.asarray(r1[k]),
                                   rtol=1e-4, atol=1e-5), k
    typ = "rgb_fine" if "rgb_fine" in r1 else "rgb_coarse"
    assert r1[typ].shape == (rays.shape[0], 3)
