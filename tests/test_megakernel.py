"""Fused megakernel (ops/megakernel.py) vs the plain-XLA funnels.

Runs in Pallas interpret mode on the CPU test backend. Checks forward
equivalence and gradients (params, inputs) for both MLPs, annealing folds,
sigma-only, padding (N not a multiple of the block), and multi-block weight
gradient accumulation (small row budgets force grid > 1).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moco_flow_tpu.nn.nerf import NeRFConfig, init_nerf, nerf_apply, nerf_sigma
from moco_flow_tpu.nn.nof import NoFConfig, init_nof, nof_apply
from moco_flow_tpu.nn.embedding import posenc
from moco_flow_tpu.ops import megakernel as mk
from moco_flow_tpu.render.volume import EmbeddingSpec, embed_padded


NERF_CFG = NeRFConfig(depth=4, width=64, in_channels_xyz=27, skips=(2,),
                      extra_feat_type="ind", extra_feat_dim=5)
NOF_CFG = NoFConfig(depth=4, width=32, in_channels_xyz=21, skips=(2,),
                    extra_feat_dim=21, use_quat=True)
NERF_FREQS = 4   # 3 + 2*12 = 27
NOF_FREQS = 3    # 3 + 2*9 = 21


def _nerf_ref(params, xyz, extra_emb, anneal, sigma_only=False):
    """Oracle: the tested XLA path (embed + pad + nerf_apply)."""
    n, s = xyz.shape[0], xyz.shape[1]
    flat = xyz.reshape(-1, 3)
    x_emb = embed_padded(flat, EmbeddingSpec(NERF_FREQS),
                         NERF_CFG.in_channels_xyz, anneal)
    if sigma_only:
        return nerf_sigma(params, x_emb, NERF_CFG).reshape(n, s, 1)
    e = jnp.broadcast_to(extra_emb[:, None, :],
                         (n, s, extra_emb.shape[-1])).reshape(n * s, -1)
    return nerf_apply(params, x_emb, e, NERF_CFG).reshape(n, s, 4)


def _nof_ref(params, xyz, ind_emb, anneal):
    n, s = xyz.shape[0], xyz.shape[1]
    flat = xyz.reshape(-1, 3)
    x_emb = embed_padded(flat, EmbeddingSpec(NOF_FREQS),
                         NOF_CFG.in_channels_xyz, anneal)
    e = jnp.broadcast_to(ind_emb[:, None, :],
                         (n, s, ind_emb.shape[-1])).reshape(n * s, -1)
    inputs = jnp.concatenate([x_emb, e], axis=-1)
    return nof_apply(params, inputs, flat, NOF_CFG).reshape(n, s, 3)


@pytest.fixture(scope="module")
def nerf_setup():
    key = jax.random.key(0)
    params = init_nerf(key, NERF_CFG)
    n, s = 6, 16
    xyz = jax.random.normal(jax.random.key(1), (n, s, 3))
    ind = jax.random.uniform(jax.random.key(2), (n, 1)) * 2 - 1
    extra_emb = embed_padded(ind, EmbeddingSpec(2, in_channels=1),
                             NERF_CFG.extra_feat_dim)
    return params, xyz, extra_emb


@pytest.fixture(scope="module")
def nof_setup():
    params = init_nof(jax.random.key(3), NOF_CFG)
    n, s = 6, 16
    xyz = jax.random.normal(jax.random.key(4), (n, s, 3))
    ind = jax.random.uniform(jax.random.key(5), (n, 1)) * 2 - 1
    ind_emb = embed_padded(ind, EmbeddingSpec(NOF_FREQS, in_channels=1),
                           NOF_CFG.extra_feat_dim)
    return params, xyz, ind_emb


def _fused_nerf(params, xyz, extra_emb, anneal, sigma_only=False):
    return mk.nerf_fused_rays(params, NERF_CFG, NERF_FREQS, True, anneal,
                              xyz, extra_emb, sigma_only)


def _fused_nof(params, xyz, ind_emb, anneal):
    return mk.nof_fused_rays(params, NOF_CFG, NOF_FREQS, True, anneal,
                             xyz, ind_emb)


def test_nerf_forward(nerf_setup):
    params, xyz, extra = nerf_setup
    np.testing.assert_allclose(_fused_nerf(params, xyz, extra, None),
                               _nerf_ref(params, xyz, extra, None),
                               rtol=1e-5, atol=1e-5)


def test_nerf_forward_anneal(nerf_setup):
    params, xyz, extra = nerf_setup
    anneal = jnp.array([1.0, 0.7, 0.2, 0.0])
    np.testing.assert_allclose(_fused_nerf(params, xyz, extra, anneal),
                               _nerf_ref(params, xyz, extra, anneal),
                               rtol=1e-5, atol=1e-5)


def test_nerf_sigma_only(nerf_setup):
    params, xyz, extra = nerf_setup
    np.testing.assert_allclose(
        _fused_nerf(params, xyz, None, None, sigma_only=True),
        _nerf_ref(params, xyz, None, None, sigma_only=True),
        rtol=1e-5, atol=1e-5)


def test_nerf_padding(nerf_setup):
    """N not a multiple of the ray block (forces grid padding)."""
    params, xyz, extra = nerf_setup
    old = mk._FWD_ROWS
    mk._FWD_ROWS = 64  # r = 4 rays/block; n=6 pads to 8
    try:
        mk._nerf_fwd_call.cache_clear()
        got = _fused_nerf(params, xyz, extra, None)
    finally:
        mk._FWD_ROWS = old
        mk._nerf_fwd_call.cache_clear()
    np.testing.assert_allclose(got, _nerf_ref(params, xyz, extra, None),
                               rtol=1e-5, atol=1e-5)


def test_nerf_grads(nerf_setup):
    params, xyz, extra = nerf_setup
    anneal = jnp.array([1.0, 1.0, 0.5, 0.1])

    def loss_fused(p, x, e):
        return jnp.sum(jnp.sin(_fused_nerf(p, x, e, anneal) * 3.0))

    def loss_ref(p, x, e):
        return jnp.sum(jnp.sin(_nerf_ref(p, x, e, anneal) * 3.0))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(params, xyz, extra)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(params, xyz, extra)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_nerf_grads_multiblock(nerf_setup):
    """Weight gradients accumulate across grid steps (small row budget)."""
    params, xyz, extra = nerf_setup
    old_f, old_b = mk._FWD_ROWS, mk._BWD_ROWS
    mk._FWD_ROWS = mk._BWD_ROWS = 32  # r = 2 rays/block -> grid = 3
    try:
        mk._nerf_fwd_call.cache_clear()
        mk._nerf_bwd_call.cache_clear()

        def loss_fused(p):
            return jnp.sum(_fused_nerf(p, xyz, extra, None) ** 2)

        def loss_ref(p):
            return jnp.sum(_nerf_ref(p, xyz, extra, None) ** 2)

        gf = jax.grad(loss_fused)(params)
        gr = jax.grad(loss_ref)(params)
    finally:
        mk._FWD_ROWS, mk._BWD_ROWS = old_f, old_b
        mk._nerf_fwd_call.cache_clear()
        mk._nerf_bwd_call.cache_clear()
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_nerf_sigma_grads(nerf_setup):
    params, xyz, _ = nerf_setup

    def loss_fused(p, x):
        return jnp.sum(_fused_nerf(p, x, None, None, sigma_only=True) ** 2)

    def loss_ref(p, x):
        return jnp.sum(_nerf_ref(p, x, None, None, sigma_only=True) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1))(params, xyz)
    gr = jax.grad(loss_ref, argnums=(0, 1))(params, xyz)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_nof_forward(nof_setup):
    params, xyz, ind_emb = nof_setup
    np.testing.assert_allclose(_fused_nof(params, xyz, ind_emb, None),
                               _nof_ref(params, xyz, ind_emb, None),
                               rtol=1e-5, atol=1e-5)


def test_nof_forward_anneal(nof_setup):
    params, xyz, ind_emb = nof_setup
    anneal = jnp.array([1.0, 0.4, 0.0])
    np.testing.assert_allclose(_fused_nof(params, xyz, ind_emb, anneal),
                               _nof_ref(params, xyz, ind_emb, anneal),
                               rtol=1e-5, atol=1e-5)


def test_nof_no_quat(nof_setup):
    _, xyz, ind_emb = nof_setup
    cfg = NOF_CFG.__class__(**{**NOF_CFG.__dict__, "use_quat": False})
    params = init_nof(jax.random.key(7), cfg)
    got = mk.nof_fused_rays(params, cfg, NOF_FREQS, True, None, xyz, ind_emb)
    n, s = xyz.shape[0], xyz.shape[1]
    flat = xyz.reshape(-1, 3)
    x_emb = embed_padded(flat, EmbeddingSpec(NOF_FREQS),
                         cfg.in_channels_xyz, None)
    e = jnp.broadcast_to(ind_emb[:, None, :],
                         (n, s, ind_emb.shape[-1])).reshape(n * s, -1)
    want = nof_apply(params, jnp.concatenate([x_emb, e], -1), flat,
                     cfg).reshape(n, s, 3)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_nof_grads(nof_setup):
    """Params + xyz + ind gradients, incl. the hand-chained quaternion VJP."""
    params, xyz, ind_emb = nof_setup
    anneal = jnp.array([1.0, 0.8, 0.3])

    def loss_fused(p, x, e):
        return jnp.sum(jnp.cos(_fused_nof(p, x, e, anneal) * 2.0))

    def loss_ref(p, x, e):
        return jnp.sum(jnp.cos(_nof_ref(p, x, e, anneal) * 2.0))

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(params, xyz, ind_emb)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(params, xyz, ind_emb)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_nof_grads_multiblock(nof_setup):
    params, xyz, ind_emb = nof_setup
    old_f, old_b = mk._FWD_ROWS, mk._BWD_ROWS
    mk._FWD_ROWS = mk._BWD_ROWS = 32
    try:
        mk._nof_fwd_call.cache_clear()
        mk._nof_bwd_call.cache_clear()

        def loss_fused(p):
            return jnp.sum(_fused_nof(p, xyz, ind_emb, None) ** 2)

        def loss_ref(p):
            return jnp.sum(_nof_ref(p, xyz, ind_emb, None) ** 2)

        gf = jax.grad(loss_fused)(params)
        gr = jax.grad(loss_ref)(params)
    finally:
        mk._FWD_ROWS, mk._BWD_ROWS = old_f, old_b
        mk._nof_fwd_call.cache_clear()
        mk._nof_bwd_call.cache_clear()
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_bf16_grads_stay_fp32(nerf_setup):
    """bf16 compute: weight gradients must come back fp32 (the cast to the
    compute dtype happens INSIDE the custom_vjp boundary, so the in-kernel
    fp32 dW accumulators are not quantized to bf16), and match the XLA bf16
    path within bf16 noise."""
    params, xyz, extra = nerf_setup

    def loss_fused(p):
        return jnp.sum(mk.nerf_fused_rays(p, NERF_CFG, NERF_FREQS, True,
                                          None, xyz, extra, False,
                                          jnp.bfloat16) ** 2)

    def loss_ref(p):
        n, s = xyz.shape[0], xyz.shape[1]
        x_emb = embed_padded(xyz.reshape(-1, 3), EmbeddingSpec(NERF_FREQS),
                             NERF_CFG.in_channels_xyz, None)
        e = jnp.broadcast_to(extra[:, None, :],
                             (n, s, extra.shape[-1])).reshape(n * s, -1)
        return jnp.sum(nerf_apply(p, x_emb, e, NERF_CFG,
                                  jnp.bfloat16) ** 2)

    gf = jax.grad(loss_fused)(params)
    gr = jax.grad(loss_ref)(params)
    for leaf in jax.tree_util.tree_leaves(gf):
        assert leaf.dtype == jnp.float32, leaf.dtype
    # bf16 forward noise compounds through the squared loss: loose check
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gr)):
        denom = np.maximum(np.abs(np.asarray(b)), 1.0)
        rel = np.abs(np.asarray(a) - np.asarray(b)) / denom
        assert float(np.median(rel)) < 5e-2, float(np.median(rel))


def test_nof_single_ray_rechunk(nof_setup):
    """The nof_points path: one 'ray' with many samples re-chunks through
    the kernel and matches the direct evaluation."""
    params, _, _ = nof_setup
    p = 3000  # > _FWD_ROWS, not a multiple
    xyz = jax.random.normal(jax.random.key(8), (1, p, 3))
    ind_emb = embed_padded(jnp.array([[0.3]]),
                           EmbeddingSpec(NOF_FREQS, in_channels=1),
                           NOF_CFG.extra_feat_dim)
    got = _fused_nof(params, xyz, ind_emb, None)
    want = _nof_ref(params, xyz, ind_emb, None)
    assert got.shape == (1, p, 3)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_render_rays_fused_matches_xla():
    """End-to-end render_rays with mlp_impl='fused' vs 'xla' (full stage-3
    shape: NoF warps + chains + coarse/fine NeRF + consensus)."""
    import dataclasses as dc
    from moco_flow_tpu.render.volume import (ModelStatics, RenderConfig,
                                             render_rays)
    ncfg = NeRFConfig(depth=4, width=64, in_channels_xyz=27, skips=(2,),
                      extra_feat_type="ind", extra_feat_dim=5)
    fcfg = NoFConfig(depth=4, width=32, in_channels_xyz=21, skips=(2,),
                     extra_feat_dim=21, use_quat=True)
    statics = ModelStatics(
        coarse=ncfg, fine=ncfg, nof=fcfg,
        nerf_xyz=EmbeddingSpec(4), nerf_ind=EmbeddingSpec(2, in_channels=1),
        nof_xyz=EmbeddingSpec(3), nof_ind=EmbeddingSpec(3, in_channels=1))
    keys = jax.random.split(jax.random.key(0), 4)
    params = {
        "coarse_NeRF": init_nerf(keys[0], ncfg),
        "fine_NeRF": init_nerf(keys[1], ncfg),
        "bw_NoF": init_nof(keys[2], fcfg),
        "fw_NoF": init_nof(keys[3], fcfg),
    }
    n = 8
    rng = np.random.default_rng(0)
    o = np.tile([0.0, 0.0, 3.0], (n, 1)) + rng.normal(scale=0.05, size=(n, 3))
    d = rng.normal(size=(n, 3))
    d = -np.abs(d) / np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate(
        [o, d, np.full((n, 1), 2.0), np.full((n, 1), 4.0),
         np.full((n, 1), 0.25), np.full((n, 1), -0.5)], -1).astype(np.float32)
    rays = jnp.asarray(rays)
    bg = jnp.ones((n, 3))
    base = RenderConfig(n_samples=16, n_importance=16, perturb=0.0,
                        use_nof=True, chain_local=True, chain_global=True)
    anneal = {"nerf_xyz": jnp.array([1.0, 1.0, 0.6, 0.0]),
              "nof_xyz": jnp.array([1.0, 0.5, 0.0])}
    out_x = render_rays(params, statics, anneal, rays, bg, jax.random.key(1),
                        base)
    out_f = render_rays(params, statics, anneal, rays, bg, jax.random.key(1),
                        dc.replace(base, mlp_impl="fused"))
    assert set(out_x) == set(out_f)
    for k in out_x:
        np.testing.assert_allclose(out_f[k], out_x[k], rtol=5e-4, atol=5e-4,
                                   err_msg=k)

    # test time: the combined warp+NeRF megakernel path (one kernel per
    # pass, xyz reconstructed from o + d*z in VMEM)
    tt = dc.replace(base, test_time=True)
    out_x = render_rays(params, statics, anneal, rays, bg, jax.random.key(1),
                        tt)
    out_f = render_rays(params, statics, anneal, rays, bg, jax.random.key(1),
                        dc.replace(tt, mlp_impl="fused"))
    assert set(out_x) == set(out_f)
    for k in out_x:
        np.testing.assert_allclose(out_f[k], out_x[k], rtol=5e-4, atol=5e-4,
                                   err_msg=k)

    # empty-space skipping: a full budget keeps every sample in z order —
    # bit-identical to the exact path; a reduced budget stays close (the
    # dropped samples sit in the lowest-weight coarse bins)
    full = dc.replace(tt, mlp_impl="fused", fine_budget=32)
    out_b = render_rays(params, statics, anneal, rays, bg, jax.random.key(1),
                        full)
    for k in out_f:
        np.testing.assert_allclose(out_b[k], out_f[k], rtol=1e-6, atol=1e-6,
                                   err_msg=k)
    cut = dc.replace(tt, mlp_impl="fused", fine_budget=24)
    out_c = render_rays(params, statics, anneal, rays, bg, jax.random.key(1),
                        cut)
    assert float(jnp.max(jnp.abs(out_c["rgb_fine"] - out_f["rgb_fine"]))) \
        < 3e-2

    # coarse probe: probe == n_samples is stride 1 == exact
    pr = dc.replace(tt, mlp_impl="fused", coarse_probe=16)
    out_p = render_rays(params, statics, anneal, rays, bg, jax.random.key(1),
                        pr)
    for k in out_f:
        np.testing.assert_allclose(out_p[k], out_f[k], rtol=1e-6, atol=1e-6,
                                   err_msg=k)
    # reduced probe still renders finite, correct shapes
    pr8 = dc.replace(tt, mlp_impl="fused", coarse_probe=8, fine_budget=24)
    out_p8 = render_rays(params, statics, anneal, rays, bg,
                         jax.random.key(1), pr8)
    assert out_p8["rgb_fine"].shape == out_f["rgb_fine"].shape
    assert bool(jnp.all(jnp.isfinite(out_p8["rgb_fine"])))


def test_render_rays_fused_chain_grads():
    """Gradients through the fused NoF chain kernel (train path: bw + local
    + global chains in one kernel with one VJP) vs the XLA renderer."""
    import dataclasses as dc
    from moco_flow_tpu.render.volume import (ModelStatics, RenderConfig,
                                             render_rays)
    ncfg = NeRFConfig(depth=4, width=64, in_channels_xyz=27, skips=(2,),
                      extra_feat_type="ind", extra_feat_dim=5)
    fcfg = NoFConfig(depth=4, width=32, in_channels_xyz=21, skips=(2,),
                     extra_feat_dim=21, use_quat=True)
    statics = ModelStatics(
        coarse=ncfg, fine=ncfg, nof=fcfg,
        nerf_xyz=EmbeddingSpec(4), nerf_ind=EmbeddingSpec(2, in_channels=1),
        nof_xyz=EmbeddingSpec(3), nof_ind=EmbeddingSpec(3, in_channels=1))
    keys = jax.random.split(jax.random.key(0), 4)
    params = {
        "coarse_NeRF": init_nerf(keys[0], ncfg),
        "fine_NeRF": init_nerf(keys[1], ncfg),
        "bw_NoF": init_nof(keys[2], fcfg),
        "fw_NoF": init_nof(keys[3], fcfg),
    }
    n = 8
    rng = np.random.default_rng(3)
    o = np.tile([0.0, 0.0, 3.0], (n, 1))
    d = rng.normal(size=(n, 3))
    d = -np.abs(d) / np.linalg.norm(d, -1, keepdims=True)
    rays = jnp.asarray(np.concatenate(
        [o, d, np.full((n, 1), 2.0), np.full((n, 1), 4.0),
         np.full((n, 1), 0.25), np.full((n, 1), -0.5)], -1), jnp.float32)
    bg = jnp.ones((n, 3))
    base = RenderConfig(n_samples=16, n_importance=16, perturb=0.0,
                        use_nof=True, chain_local=True, chain_global=True)

    def loss(p, rcfg):
        res = render_rays(p, statics, {}, rays, bg, jax.random.key(1), rcfg)
        return (jnp.sum(res["rgb_fine"] ** 2)
                + res["nof_local_disp_coarse"] + res["nof_local_disp_fine"]
                + res["nof_global_disp_coarse"]
                + res["nof_global_disp_fine"])

    gx = jax.grad(lambda p: loss(p, base))(params)
    gf = jax.grad(lambda p: loss(p, dc.replace(base, mlp_impl="fused")))(
        params)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(a, b, rtol=3e-4, atol=3e-4)

    # chain-variant coverage: local-only and global-only configurations
    def loss_var(p, rcfg):
        res = render_rays(p, statics, {}, rays, bg, jax.random.key(1), rcfg)
        out = jnp.sum(res["rgb_fine"] ** 2)
        for k in res:
            if k.startswith("nof_"):
                out = out + res[k]
        return out

    for kw in [dict(chain_local=True, chain_global=False),
               dict(chain_local=False, chain_global=True)]:
        var = dc.replace(base, **kw)
        gx = jax.grad(lambda p: loss_var(p, var))(params)
        gf = jax.grad(lambda p: loss_var(
            p, dc.replace(var, mlp_impl="fused")))(params)
        for a, b in zip(jax.tree_util.tree_leaves(gf),
                        jax.tree_util.tree_leaves(gx)):
            np.testing.assert_allclose(a, b, rtol=3e-4, atol=3e-4,
                                       err_msg=str(kw))


def test_render_rays_hybrid_impls():
    """fused_nof / fused_nerf (per-family kernel routing) match the XLA
    renderer in the train configuration."""
    import dataclasses as dc
    from moco_flow_tpu.render.volume import (ModelStatics, RenderConfig,
                                             render_rays)
    ncfg = NeRFConfig(depth=4, width=64, in_channels_xyz=27, skips=(2,),
                      extra_feat_type="ind", extra_feat_dim=5)
    fcfg = NoFConfig(depth=4, width=32, in_channels_xyz=21, skips=(2,),
                     extra_feat_dim=21, use_quat=True)
    statics = ModelStatics(
        coarse=ncfg, fine=ncfg, nof=fcfg,
        nerf_xyz=EmbeddingSpec(4), nerf_ind=EmbeddingSpec(2, in_channels=1),
        nof_xyz=EmbeddingSpec(3), nof_ind=EmbeddingSpec(3, in_channels=1))
    keys = jax.random.split(jax.random.key(0), 4)
    params = {
        "coarse_NeRF": init_nerf(keys[0], ncfg),
        "fine_NeRF": init_nerf(keys[1], ncfg),
        "bw_NoF": init_nof(keys[2], fcfg),
        "fw_NoF": init_nof(keys[3], fcfg),
    }
    n = 8
    rng = np.random.default_rng(5)
    o = np.tile([0.0, 0.0, 3.0], (n, 1))
    d = rng.normal(size=(n, 3))
    d = -np.abs(d) / np.linalg.norm(d, -1, keepdims=True)
    rays = jnp.asarray(np.concatenate(
        [o, d, np.full((n, 1), 2.0), np.full((n, 1), 4.0),
         np.full((n, 1), 0.25), np.full((n, 1), -0.5)], -1), jnp.float32)
    bg = jnp.ones((n, 3))
    base = RenderConfig(n_samples=16, n_importance=16, perturb=0.0,
                        use_nof=True, chain_local=True, chain_global=True)
    out_x = render_rays(params, statics, {}, rays, bg, jax.random.key(1),
                        base)
    for impl in ["fused_nof", "fused_nerf"]:
        out_h = render_rays(params, statics, {}, rays, bg, jax.random.key(1),
                            dc.replace(base, mlp_impl=impl))
        for k in out_x:
            np.testing.assert_allclose(out_h[k], out_x[k], rtol=5e-4,
                                       atol=5e-4, err_msg=f"{impl}:{k}")


def test_render_rays_fused_stage1_and_testtime():
    """Stage-1 shape (dir-conditioned rgb, no NoF) and the test-time
    sigma-only coarse pass through the fused path."""
    import dataclasses as dc
    from moco_flow_tpu.render.volume import (ModelStatics, RenderConfig,
                                             render_rays)
    ncfg = NeRFConfig(depth=4, width=64, in_channels_xyz=27, skips=(2,),
                      extra_feat_type="dir", extra_feat_dim=15)
    statics = ModelStatics(coarse=ncfg, fine=ncfg, nerf_xyz=EmbeddingSpec(4),
                           nerf_dir=EmbeddingSpec(2))
    params = {"coarse_NeRF": init_nerf(jax.random.key(0), ncfg),
              "fine_NeRF": init_nerf(jax.random.key(1), ncfg)}
    n = 8
    rng = np.random.default_rng(0)
    o = np.tile([0.0, 0.0, 3.0], (n, 1))
    d = rng.normal(size=(n, 3))
    d = -np.abs(d) / np.linalg.norm(d, -1, keepdims=True)
    rays = jnp.asarray(np.concatenate(
        [o, d, np.full((n, 1), 2.0), np.full((n, 1), 4.0),
         np.full((n, 1), 0.0)], -1), jnp.float32)
    bg = jnp.ones((n, 3))
    for rcfg in [RenderConfig(n_samples=16, n_importance=16, perturb=0.0),
                 RenderConfig(n_samples=16, n_importance=16, perturb=0.0,
                              test_time=True)]:
        ox = render_rays(params, statics, {}, rays, bg, jax.random.key(1),
                         rcfg)
        of = render_rays(params, statics, {}, rays, bg, jax.random.key(1),
                         dc.replace(rcfg, mlp_impl="fused"))
        for k in ox:
            np.testing.assert_allclose(of[k], ox[k], rtol=5e-4, atol=5e-4,
                                       err_msg=k)


def test_zero_freq_raw_xyz_quirk():
    """n_freqs == 0 (the SHIPPED init_nerf/init_nof quirk: raw xyz
    zero-padded to in_channels_xyz, reference configs
    init_nerf.yaml nerf_embedding_xyz N_freqs: 0) must run through the
    fused kernels — Mosaic rejects 0-width vector loads, so the fold
    substitutes constant-zero sin/cos rows under a synthetic 1-freq spec.
    Forward AND gradients must match the XLA oracle, with zero gradient
    into the pad rows (true model: pad inputs are zero)."""
    cfg = NeRFConfig(depth=4, width=64, in_channels_xyz=27, skips=(2,),
                     extra_feat_type="ind", extra_feat_dim=5)
    params = init_nerf(jax.random.key(7), cfg)
    n, s = 5, 16
    xyz = jax.random.normal(jax.random.key(8), (n, s, 3))
    ind = jax.random.uniform(jax.random.key(9), (n, 1)) * 2 - 1
    extra = embed_padded(ind, EmbeddingSpec(2, in_channels=1),
                         cfg.extra_feat_dim)

    def ref(p, x):
        x_emb = embed_padded(x.reshape(-1, 3), EmbeddingSpec(0),
                             cfg.in_channels_xyz, None)
        e = jnp.broadcast_to(extra[:, None, :],
                             (n, s, extra.shape[-1])).reshape(n * s, -1)
        return nerf_apply(p, x_emb, e, cfg).reshape(n, s, 4)

    def fused(p, x):
        return mk.nerf_fused_rays(p, cfg, 0, True, None, x, extra, False)

    np.testing.assert_allclose(fused(params, xyz), ref(params, xyz),
                               rtol=1e-5, atol=1e-5)

    gr = jax.grad(lambda p, x: (ref(p, x) ** 2).sum(), argnums=(0, 1))(
        params, xyz)
    gf = jax.grad(lambda p, x: (fused(p, x) ** 2).sum(), argnums=(0, 1))(
        params, xyz)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4,
                                                         atol=1e-4), gr, gf)
    # pad rows (everything past the raw-xyz rows) get exactly zero gradient
    np.testing.assert_array_equal(np.asarray(gf[0]["trunk"][0]["w"])[3:], 0.0)

    # same quirk for the NoF kernel (init_nof.yaml nof_embedding_xyz
    # N_freqs: 0)
    ncfg = NoFConfig(depth=4, width=32, in_channels_xyz=21, skips=(2,),
                     extra_feat_dim=21, use_quat=True)
    nparams = init_nof(jax.random.key(10), ncfg)
    ind_emb = embed_padded(ind, EmbeddingSpec(NOF_FREQS, in_channels=1),
                           ncfg.extra_feat_dim)

    def nof_ref(p, x):
        x_emb = embed_padded(x.reshape(-1, 3), EmbeddingSpec(0),
                             ncfg.in_channels_xyz, None)
        e = jnp.broadcast_to(ind_emb[:, None, :],
                             (n, s, ind_emb.shape[-1])).reshape(n * s, -1)
        return nof_apply(p, jnp.concatenate([x_emb, e], axis=-1),
                         x.reshape(-1, 3), ncfg).reshape(n, s, 3)

    def nof_fused_(p, x):
        return mk.nof_fused_rays(p, ncfg, 0, True, None, x, ind_emb)

    np.testing.assert_allclose(nof_fused_(nparams, xyz), nof_ref(nparams, xyz),
                               rtol=1e-5, atol=1e-5)
    gr = jax.grad(lambda p: (nof_ref(p, xyz) ** 2).sum())(nparams)
    gf = jax.grad(lambda p: (nof_fused_(p, xyz) ** 2).sum())(nparams)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4,
                                                         atol=1e-4), gr, gf)
