"""The rank-split forward paths (per-ray features broadcast after their
matmuls) must match the concat-based reference paths exactly."""

import jax
import jax.numpy as jnp
import numpy as np

from moco_flow_tpu.nn.nerf import (
    NeRFConfig,
    init_nerf,
    nerf_apply,
    nerf_apply_perray_extra,
)
from moco_flow_tpu.nn.nof import NoFConfig, init_nof, nof_apply, nof_apply_split


def test_nof_split_matches_concat():
    cfg = NoFConfig()
    params = init_nof(jax.random.key(0), cfg)
    n, s = 7, 11
    xyz_emb = jax.random.normal(jax.random.key(1), (n * s, cfg.in_channels_xyz))
    ind_emb = jax.random.normal(jax.random.key(2), (n, cfg.extra_feat_dim))
    xyz = jax.random.normal(jax.random.key(3), (n * s, 3))

    bc = jnp.broadcast_to(ind_emb[:, None, :], (n, s, cfg.extra_feat_dim)
                          ).reshape(-1, cfg.extra_feat_dim)
    want = nof_apply(params, jnp.concatenate([xyz_emb, bc], -1), xyz, cfg)
    got = nof_apply_split(params, xyz_emb, ind_emb, s, xyz, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_nerf_perray_extra_matches_concat():
    for feat, e in [("ind", 5), ("dir", 27), ("none", 0)]:
        cfg = NeRFConfig(extra_feat_type=feat, extra_feat_dim=e)
        params = init_nerf(jax.random.key(4), cfg)
        n, s = 5, 9
        x = jax.random.normal(jax.random.key(5), (n * s, 63))
        if feat == "none":
            want = nerf_apply(params, x, None, cfg)
            got = nerf_apply_perray_extra(params, x, None, s, cfg)
        else:
            extra = jax.random.normal(jax.random.key(6), (n, e))
            bc = jnp.broadcast_to(extra[:, None, :], (n, s, e)).reshape(-1, e)
            want = nerf_apply(params, x, bc, cfg)
            got = nerf_apply_perray_extra(params, x, extra, s, cfg)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5), feat


def test_renderer_split_equals_pallas_concat():
    """Both renderer code paths (xla-split vs pallas-concat, interpreted on
    CPU) agree end to end."""
    import dataclasses
    import sys
    sys.path.insert(0, "tests")
    from test_render import make_rays, stage3_setup
    from moco_flow_tpu.render.volume import RenderConfig, render_rays
    params, statics = stage3_setup(jax.random.key(0))
    anneal = {"nerf_xyz": jnp.ones(10), "nof_xyz": jnp.ones(5)}
    rays = make_rays(6, with_chain=True)
    rcfg = RenderConfig(n_samples=8, n_importance=8, use_nof=True,
                        chain_local=True, chain_global=True)
    a = render_rays(params, statics, anneal, rays, jnp.ones((6, 3)),
                    jax.random.key(1), rcfg)
    b = render_rays(params, statics, anneal, rays, jnp.ones((6, 3)),
                    jax.random.key(1),
                    dataclasses.replace(rcfg, mlp_impl="pallas"))
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]),
                                   rtol=1e-3, atol=1e-4), k
