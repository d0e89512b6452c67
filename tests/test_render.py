import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moco_flow_tpu.nn.nerf import NeRFConfig, init_nerf
from moco_flow_tpu.nn.nof import NoFConfig, init_nof
from moco_flow_tpu.render.volume import (
    EmbeddingSpec,
    ModelStatics,
    RenderConfig,
    composite,
    embed_padded,
    render_rays,
)


def make_rays(n, key=0, with_chain=False):
    rng = np.random.default_rng(key)
    o = rng.normal(size=(n, 3)) * 0.1 + np.array([0, 0, 3.0])
    d = rng.normal(size=(n, 3))
    d = -d / np.linalg.norm(d, axis=-1, keepdims=True)
    near = np.full((n, 1), 2.0)
    far = np.full((n, 1), 4.0)
    ind = np.full((n, 1), 0.25)
    cols = [o, d, near, far, ind]
    if with_chain:
        cols.append(np.full((n, 1), -0.5))
    return jnp.asarray(np.concatenate(cols, axis=-1), jnp.float32)


def stage1_setup(key):
    """init_nerf-style: dir-conditioned coarse+fine NeRF, no NoF
    (configs/people_snapshot/male-3-casual/init_nerf.yaml)."""
    ncfg = NeRFConfig(in_channels_xyz=63, extra_feat_type="dir", extra_feat_dim=27)
    k1, k2 = jax.random.split(key)
    params = {"coarse_NeRF": init_nerf(k1, ncfg), "fine_NeRF": init_nerf(k2, ncfg)}
    statics = ModelStatics(
        coarse=ncfg, fine=ncfg,
        nerf_xyz=EmbeddingSpec(0), nerf_dir=EmbeddingSpec(4))
    return params, statics


def stage3_setup(key):
    """c2f-style: ind-conditioned NeRFs + quat NoFs (c2f.yaml)."""
    ncfg = NeRFConfig(in_channels_xyz=63, extra_feat_type="ind", extra_feat_dim=5)
    fcfg = NoFConfig(in_channels_xyz=33, extra_feat_dim=33, use_quat=True)
    ks = jax.random.split(key, 4)
    params = {
        "coarse_NeRF": init_nerf(ks[0], ncfg),
        "fine_NeRF": init_nerf(ks[1], ncfg),
        "bw_NoF": init_nof(ks[2], fcfg),
        "fw_NoF": init_nof(ks[3], fcfg),
    }
    statics = ModelStatics(
        coarse=ncfg, fine=ncfg, nof=fcfg,
        nerf_xyz=EmbeddingSpec(10), nerf_ind=EmbeddingSpec(2, in_channels=1),
        nof_xyz=EmbeddingSpec(5), nof_ind=EmbeddingSpec(16, in_channels=1))
    return params, statics


def test_embed_padded_pads_to_target():
    x = jnp.ones((4, 3))
    e = embed_padded(x, EmbeddingSpec(0), 63)
    assert e.shape == (4, 63)
    assert np.all(np.asarray(e[:, 3:]) == 0)
    with pytest.raises(ValueError):
        embed_padded(x, EmbeddingSpec(12), 63)  # 75 > 63


def test_composite_closed_form():
    """Constant sigma, unit direction: alpha_i = 1-exp(-delta_i*sigma),
    T_i = exp(-sigma * sum_{j<i} delta_j)."""
    z = jnp.asarray(np.linspace(1.0, 2.0, 9)[None].astype(np.float32))
    sigma = 3.0
    sig = jnp.full((1, 9), sigma)
    alphas, weights = composite(sig, z, jnp.ones((1, 1)), None, "relu")
    deltas = np.diff(np.asarray(z)[0])
    deltas = np.append(deltas, 1e10)
    a_want = 1 - np.exp(-deltas * sigma)
    np.testing.assert_allclose(np.asarray(alphas)[0], a_want, rtol=1e-4)
    t = np.cumprod(np.concatenate([[1.0], 1 - a_want[:-1] + 1e-10]))
    np.testing.assert_allclose(np.asarray(weights)[0], a_want * t, rtol=1e-4)
    assert abs(float(jnp.sum(weights)) - 1.0) < 1e-5  # opaque ray saturates


def test_render_stage1_shapes(key):
    params, statics = stage1_setup(key)
    rcfg = RenderConfig(n_samples=16, n_importance=8, perturb=1.0)
    rays = make_rays(12)
    bg = jnp.ones((12, 3))
    out = render_rays(params, statics, {}, rays, bg, jax.random.key(9), rcfg)
    for k in ["rgb_coarse", "rgb_fine"]:
        assert out[k].shape == (12, 3)
        assert np.all(np.isfinite(np.asarray(out[k])))
    for k in ["depth_coarse", "depth_fine", "opacity_coarse", "opacity_fine"]:
        assert out[k].shape == (12,)


def test_render_stage1_test_time_skips_coarse_rgb(key):
    params, statics = stage1_setup(key)
    rcfg = RenderConfig(n_samples=16, n_importance=8, test_time=True)
    out = render_rays(params, statics, {}, make_rays(6), jnp.ones((6, 3)),
                      jax.random.key(0), rcfg)
    assert "rgb_coarse" not in out
    assert "rgb_fine" in out and "opacity_coarse" in out


def test_render_stage3_full(key):
    params, statics = stage3_setup(key)
    anneal = {"nerf_xyz": jnp.ones(10), "nof_xyz": jnp.ones(5)}
    rcfg = RenderConfig(n_samples=12, n_importance=12, perturb=1.0,
                        use_nof=True, chain_local=True, chain_global=True)
    rays = make_rays(8, with_chain=True)
    out = render_rays(params, statics, anneal, rays, jnp.ones((8, 3)),
                      jax.random.key(1), rcfg)
    for k in ["nof_local_disp_coarse", "nof_global_disp_coarse",
              "nof_local_disp_fine", "nof_global_disp_fine"]:
        assert out[k].shape == ()
        assert np.isfinite(float(out[k]))
    assert out["rgb_fine"].shape == (8, 3)


def test_render_stage3_annealed_pe_zero_weights(key):
    """With zeroed PE weights (c2f start), rendering still works and differs
    from fully-on weights."""
    params, statics = stage3_setup(key)
    # make the density field non-empty so rgb actually depends on the PE
    params["coarse_NeRF"]["sigma"]["b"] = (
        params["coarse_NeRF"]["sigma"]["b"] + 2.0)
    rcfg = RenderConfig(n_samples=8, n_importance=0, use_nof=True)
    rays = make_rays(4)
    off = render_rays(params, statics,
                      {"nerf_xyz": jnp.zeros(10), "nof_xyz": jnp.zeros(5)},
                      rays, None, jax.random.key(2), rcfg)
    on = render_rays(params, statics,
                     {"nerf_xyz": jnp.ones(10), "nof_xyz": jnp.ones(5)},
                     rays, None, jax.random.key(2), rcfg)
    assert not np.allclose(np.asarray(off["rgb_coarse"]),
                           np.asarray(on["rgb_coarse"]))


def test_render_background_blending(key):
    """Near-empty field: rgb ~= background."""
    params, statics = stage1_setup(key)
    # push sigma head bias very negative -> relu(sigma)=0 -> transparent
    for net in ["coarse_NeRF", "fine_NeRF"]:
        params[net]["sigma"]["b"] = jnp.full_like(params[net]["sigma"]["b"], -100.0)
    rcfg = RenderConfig(n_samples=8, n_importance=4)
    bg = jnp.full((5, 3), 0.7)
    out = render_rays(params, statics, {}, make_rays(5), bg,
                      jax.random.key(3), rcfg)
    np.testing.assert_allclose(np.asarray(out["rgb_fine"]), 0.7, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["opacity_fine"]), 0.0, atol=1e-5)


def test_render_jit_and_grad(key):
    """The whole renderer is differentiable and jittable end-to-end."""
    params, statics = stage3_setup(key)
    anneal = {"nerf_xyz": jnp.ones(10), "nof_xyz": jnp.ones(5)}
    rcfg = RenderConfig(n_samples=6, n_importance=6, use_nof=True,
                        chain_local=True, chain_global=True)
    rays = make_rays(4, with_chain=True)
    target = jnp.full((4, 3), 0.5)

    @jax.jit
    def loss_fn(p):
        out = render_rays(p, statics, anneal, rays, jnp.ones((4, 3)),
                          jax.random.key(4), rcfg)
        return (jnp.mean((out["rgb_fine"] - target) ** 2)
                + out["nof_local_disp_fine"] + out["nof_global_disp_coarse"])

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.max(jnp.abs(l))) > 0 for l in leaves)


def test_merge_sorted_samples_matches_argsort(key):
    from moco_flow_tpu.render.sampling import merge_sorted_samples
    rng = np.random.default_rng(11)
    za = np.sort(rng.uniform(1, 3, size=(5, 7)).astype(np.float32), axis=-1)
    zb = rng.uniform(1, 3, size=(5, 4)).astype(np.float32)
    pa = {"cano": rng.normal(size=(5, 7, 3)).astype(np.float32)}
    pb = {"cano": rng.normal(size=(5, 4, 3)).astype(np.float32)}
    z_all, merged = merge_sorted_samples(jnp.asarray(za), jnp.asarray(zb),
                                         {"cano": jnp.asarray(pa["cano"])},
                                         {"cano": jnp.asarray(pb["cano"])})
    zc = np.concatenate([za, zb], axis=-1)
    pc = np.concatenate([pa["cano"], pb["cano"]], axis=1)
    order = np.argsort(zc, axis=-1, kind="stable")
    np.testing.assert_allclose(np.asarray(z_all),
                               np.take_along_axis(zc, order, axis=-1))
    np.testing.assert_allclose(
        np.asarray(merged["cano"]),
        np.take_along_axis(pc, order[..., None], axis=1))

    # VJP: d/dpayload of sum(w * merged) must scatter w back through the
    # permutation — compare against the argsort oracle
    w = rng.normal(size=(5, 11, 3)).astype(np.float32)

    def f(a, b):
        _, m = merge_sorted_samples(jnp.asarray(za), jnp.asarray(zb),
                                    {"cano": a}, {"cano": b})
        return jnp.sum(jnp.asarray(w) * m["cano"])

    ga, gb = jax.grad(f, argnums=(0, 1))(jnp.asarray(pa["cano"]),
                                         jnp.asarray(pb["cano"]))
    inv = np.empty_like(order)
    np.put_along_axis(inv, order, np.arange(11)[None].repeat(5, 0), axis=-1)
    g_concat = np.take_along_axis(w, inv[..., None], axis=1)
    np.testing.assert_allclose(np.asarray(ga), g_concat[:, :7], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gb), g_concat[:, 7:], rtol=1e-6)


def test_share_coarse_warps_is_exact(key):
    """The fine pass reusing the coarse pass's NoF warps must reproduce the
    re-warp-everything path: same outputs, same parameter gradients (the
    warp networks and inputs are identical; only evaluation count differs)."""
    import dataclasses
    params, statics = stage3_setup(key)
    anneal = {"nerf_xyz": jnp.ones(10), "nof_xyz": jnp.ones(5)}
    rcfg_on = RenderConfig(n_samples=12, n_importance=12, perturb=1.0,
                           use_nof=True, chain_local=True, chain_global=True,
                           noise_std=0.3, share_coarse_warps=True)
    rcfg_off = dataclasses.replace(rcfg_on, share_coarse_warps=False)
    rays = make_rays(8, with_chain=True)
    bg = jnp.ones((8, 3))
    k = jax.random.key(3)
    out_on = render_rays(params, statics, anneal, rays, bg, k, rcfg_on)
    out_off = render_rays(params, statics, anneal, rays, bg, k, rcfg_off)
    assert set(out_on) == set(out_off)
    for name in out_off:
        np.testing.assert_allclose(np.asarray(out_on[name]),
                                   np.asarray(out_off[name]),
                                   rtol=2e-5, atol=2e-6, err_msg=name)

    def loss(p, rcfg):
        out = render_rays(p, statics, anneal, rays, bg, k, rcfg)
        return (jnp.mean(out["rgb_fine"] ** 2)
                + out["nof_local_disp_fine"] + out["nof_global_disp_fine"]
                + out["nof_local_disp_coarse"])

    g_on = jax.grad(loss)(params, rcfg_on)
    g_off = jax.grad(loss)(params, rcfg_off)
    flat_on, _ = jax.tree_util.tree_flatten_with_path(g_on)
    flat_off, _ = jax.tree_util.tree_flatten_with_path(g_off)
    for (path, a), (_, b) in zip(flat_on, flat_off):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(path))

    # test-time (no chains) variant
    rcfg_t_on = dataclasses.replace(rcfg_on, test_time=True, perturb=0.0,
                                    noise_std=0.0, chain_local=False,
                                    chain_global=False)
    rcfg_t_off = dataclasses.replace(rcfg_t_on, share_coarse_warps=False)
    t_on = render_rays(params, statics, anneal, rays, bg, k, rcfg_t_on)
    t_off = render_rays(params, statics, anneal, rays, bg, k, rcfg_t_off)
    for name in t_off:
        np.testing.assert_allclose(np.asarray(t_on[name]),
                                   np.asarray(t_off[name]),
                                   rtol=2e-5, atol=2e-6, err_msg=name)
