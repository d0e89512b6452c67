"""bf16 compute path: runs end to end, hidden activations in bf16, outputs
close to the f32 path (bf16 has ~3 decimal digits: loose tolerances)."""

import jax
import jax.numpy as jnp
import numpy as np

from moco_flow_tpu.nn.nerf import NeRFConfig, init_nerf, nerf_apply
from moco_flow_tpu.nn.nof import NoFConfig, init_nof, nof_apply, nof_apply_split


def test_nerf_bf16_close_to_f32():
    cfg = NeRFConfig(extra_feat_type="ind", extra_feat_dim=5)
    params = init_nerf(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (128, 63))
    e = jax.random.normal(jax.random.key(2), (128, 5))
    a = np.asarray(nerf_apply(params, x, e, cfg))
    b = np.asarray(nerf_apply(params, x, e, cfg, jnp.bfloat16))
    assert b.dtype == np.float32  # heads stay f32
    np.testing.assert_allclose(a, b, atol=0.05)


def test_nof_bf16_close_to_f32():
    cfg = NoFConfig()
    params = init_nof(jax.random.key(3), cfg)
    n, s = 4, 8
    xyz_emb = jax.random.normal(jax.random.key(4), (n * s, cfg.in_channels_xyz))
    ind_emb = jax.random.normal(jax.random.key(5), (n, cfg.extra_feat_dim))
    xyz = jax.random.normal(jax.random.key(6), (n * s, 3)) * 0.3
    a = np.asarray(nof_apply_split(params, xyz_emb, ind_emb, s, xyz, cfg))
    b = np.asarray(nof_apply_split(params, xyz_emb, ind_emb, s, xyz, cfg,
                                   jnp.bfloat16))
    np.testing.assert_allclose(a, b, atol=0.08)


def test_render_bf16_end_to_end():
    import sys
    sys.path.insert(0, "tests")
    import dataclasses
    from test_render import make_rays, stage3_setup
    from moco_flow_tpu.render.volume import RenderConfig, render_rays
    params, statics = stage3_setup(jax.random.key(0))
    anneal = {"nerf_xyz": jnp.ones(10), "nof_xyz": jnp.ones(5)}
    rays = make_rays(4, with_chain=True)
    rcfg = RenderConfig(n_samples=8, n_importance=8, use_nof=True,
                        chain_local=True, chain_global=True,
                        compute_dtype="bfloat16")
    out = render_rays(params, statics, anneal, rays, jnp.ones((4, 3)),
                      jax.random.key(1), rcfg)
    for k, v in out.items():
        assert np.all(np.isfinite(np.asarray(v))), k
    # gradients flow through the bf16 path
    g = jax.grad(lambda p: jnp.mean(render_rays(
        p, statics, anneal, rays, jnp.ones((4, 3)), jax.random.key(1),
        rcfg)["rgb_fine"]))(params)
    assert all(np.all(np.isfinite(np.asarray(l)))
               for l in jax.tree_util.tree_leaves(g))
