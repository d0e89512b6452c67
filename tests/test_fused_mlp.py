"""Fused Pallas MLP kernels vs the plain-XLA reference implementations.

On CPU these run through the Pallas interpreter path (pallas_call lowers to
interpret-able HLO on the host backend) — numerics should match the jnp MLPs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moco_flow_tpu.nn.nerf import NeRFConfig, init_nerf, nerf_apply, nerf_sigma
from moco_flow_tpu.nn.nof import NoFConfig, init_nof, nof_apply
from moco_flow_tpu.ops.fused_mlp import nerf_fused, nof_fused


@pytest.fixture(scope="module")
def nerf_setup():
    cfg = NeRFConfig(depth=8, width=256, in_channels_xyz=63, skips=(4,),
                     extra_feat_type="ind", extra_feat_dim=5)
    params = init_nerf(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (300, 63))
    e = jax.random.normal(jax.random.key(2), (300, 5))
    return cfg, params, x, e


def test_nerf_fused_matches_xla(nerf_setup):
    cfg, params, x, e = nerf_setup
    got = nerf_fused(params, cfg, x, e, sigma_only=False)
    want = nerf_apply(params, x, e, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_nerf_fused_sigma_only(nerf_setup):
    cfg, params, x, _ = nerf_setup
    got = nerf_fused(params, cfg, x, None, sigma_only=True)
    want = nerf_sigma(params, x, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_nerf_fused_grad_matches(nerf_setup):
    cfg, params, x, e = nerf_setup

    def loss_fused(p):
        return jnp.sum(nerf_fused(p, cfg, x, e, False) ** 2)

    def loss_ref(p):
        return jnp.sum(nerf_apply(p, x, e, cfg) ** 2)

    g1 = jax.grad(loss_fused)(params)
    g2 = jax.grad(loss_ref)(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_nof_fused_matches_xla():
    cfg = NoFConfig(use_quat=True)
    params = init_nof(jax.random.key(3), cfg)
    inputs = jax.random.normal(jax.random.key(4), (257, cfg.in_dim))
    xyz = jax.random.normal(jax.random.key(5), (257, 3))
    got = nof_fused(params, cfg, inputs, xyz)
    want = nof_apply(params, inputs, xyz, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_nof_fused_offset_mode():
    cfg = NoFConfig(use_quat=False)
    params = init_nof(jax.random.key(6), cfg)
    inputs = jax.random.normal(jax.random.key(7), (64, cfg.in_dim))
    xyz = jax.random.normal(jax.random.key(8), (64, 3))
    np.testing.assert_allclose(
        np.asarray(nof_fused(params, cfg, inputs, xyz)),
        np.asarray(nof_apply(params, inputs, xyz, cfg)),
        rtol=2e-4, atol=2e-5)


def test_render_with_pallas_impl():
    """Full renderer with mlp_impl='pallas' matches the XLA renderer."""
    import dataclasses
    from tests.test_render import stage3_setup, make_rays
    from moco_flow_tpu.render.volume import RenderConfig, render_rays
    params, statics = stage3_setup(jax.random.key(0))
    rays = make_rays(8, with_chain=True)
    anneal = {"nerf_xyz": jnp.ones(10), "nof_xyz": jnp.ones(5)}
    base = RenderConfig(n_samples=8, n_importance=8, use_nof=True,
                        chain_local=True, chain_global=True)
    out_xla = render_rays(params, statics, anneal, rays, jnp.ones((8, 3)),
                          jax.random.key(2), base)
    out_pal = render_rays(params, statics, anneal, rays, jnp.ones((8, 3)),
                          jax.random.key(2),
                          dataclasses.replace(base, mlp_impl="pallas"))
    for k in out_xla:
        np.testing.assert_allclose(np.asarray(out_pal[k]),
                                   np.asarray(out_xla[k]),
                                   rtol=5e-4, atol=5e-4), k
