"""Cross-implementation parity tests against the ACTUAL PyTorch reference.

The reference at /root/reference is importable (torch-cpu is installed); its
numerics are the spec. These tests load the real reference modules — with
stubs only for CUDA-era deps that do not exist here (kornia, mcubes, plyfile,
torchvision, the KNN_CUDA-importing datasets package) — drive them and the
JAX rebuild with IDENTICAL weights and inputs, and assert agreement:

  - sample_pdf                 (models/rendering.py:5-46)
  - PE embedding + annealing   (models/embedding.py:30-47 +
                                trainer/trainer_moco_flow.py:270-305)
  - NoF quaternion head        (models/nof.py:55-85)
  - NeRF MLP (full+sigma_only) (models/nerf.py:61-102)
  - SMPL FK/LBS on a fabricated pickle (utils/smpl/smpl_model.py:96-186)
  - full render_rays coarse+fine, chains + consensus
                               (models/rendering.py:195-375)

The kornia stub reimplements the two quaternion conversions exactly as
kornia 0.6.5 (the version the reference pins, XYZW coefficient order) — it is
an independent torch-side oracle, not shared code with the JAX build.

Weight-layout note: the rebuild's PE uses a block layout
[x, sin_0..sin_{K-1}, cos_0..cos_{K-1}] — a fixed permutation of the
reference's interleaved [x, sin_0, cos_0, ...] (documented in PARITY.md).
Tests that feed raw (pre-embedding) inputs permute the first-layer weight
rows with :func:`block_perm` accordingly.
"""

from __future__ import annotations

import pickle
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

REF_ROOT = "/root/reference"


# ---------------------------------------------------------------------------
# reference import machinery
# ---------------------------------------------------------------------------

def _stub_module(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _install_kornia_stub():
    """kornia 0.6.5 quaternion conversions (XYZW order), in torch."""
    import torch.nn.functional as F

    def quaternion_log_to_exp(q, eps: float = 1e-8):
        norm_q = torch.norm(q, p=2, dim=-1, keepdim=True).clamp(min=eps)
        vec = q * torch.sin(norm_q) / norm_q
        return torch.cat([vec, torch.cos(norm_q)], dim=-1)

    def quaternion_to_rotation_matrix(q):
        q = F.normalize(q, p=2, dim=-1, eps=1e-12)
        x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
        tx, ty, tz = 2 * x, 2 * y, 2 * z
        twx, twy, twz = tx * w, ty * w, tz * w
        txx, txy, txz = tx * x, ty * x, tz * x
        tyy, tyz, tzz = ty * y, tz * y, tz * z
        one = torch.ones_like(x)
        m = torch.stack([
            one - (tyy + tzz), txy - twz, txz + twy,
            txy + twz, one - (txx + tzz), tyz - twx,
            txz - twy, tyz + twx, one - (txx + tyy),
        ], dim=-1)
        return m.reshape(q.shape[:-1] + (3, 3))

    def _no_ssim(*a, **k):
        raise NotImplementedError("ssim stub — not under test here")

    k = _stub_module("kornia")
    kg = _stub_module("kornia.geometry")
    kgc = _stub_module(
        "kornia.geometry.conversions",
        quaternion_log_to_exp=quaternion_log_to_exp,
        quaternion_to_rotation_matrix=quaternion_to_rotation_matrix)
    km = _stub_module("kornia.metrics")
    kms = _stub_module("kornia.metrics.ssim", ssim=_no_ssim)
    k.geometry, kg.conversions, k.metrics, km.ssim = kg, kgc, km, kms.ssim


@pytest.fixture(scope="module")
def ref():
    """Reference modules, imported once with dependency stubs."""
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    if "kornia" not in sys.modules:
        _install_kornia_stub()
    for name in ("mcubes", "plyfile", "trimesh"):
        if name not in sys.modules:
            _stub_module(name, PlyData=None, PlyElement=None)
    if "torchvision" not in sys.modules:
        tv = _stub_module("torchvision")
        tv.utils = _stub_module("torchvision.utils")
        tv.transforms = _stub_module("torchvision.transforms")
    if "datasets" not in sys.modules:
        # the real package imports KNN_CUDA at module scope
        _stub_module("datasets", get_dataset=lambda *a, **kw: None,
                     NoFDataset=None, MoCoFlowDataset=None)

    import importlib
    ns = types.SimpleNamespace()
    ns.rendering = importlib.import_module("models.rendering")
    ns.embedding = importlib.import_module("models.embedding")
    ns.nerf = importlib.import_module("models.nerf")
    ns.nof = importlib.import_module("models.nof")
    ns.smpl = importlib.import_module("utils.smpl.smpl_model")
    ns.trainer_moco = importlib.import_module("trainer.trainer_moco_flow")
    return ns


# ---------------------------------------------------------------------------
# layout permutation + weight mapping helpers
# ---------------------------------------------------------------------------

def block_perm(c: int, k: int) -> np.ndarray:
    """perm such that ``mine[:, i] == ref[:, perm[i]]`` for PE outputs."""
    perm = list(range(c))
    perm += [c + 2 * kk * c + cc for kk in range(k) for cc in range(c)]
    perm += [c + (2 * kk + 1) * c + cc for kk in range(k) for cc in range(c)]
    return np.asarray(perm)


def _wT(lin) -> np.ndarray:
    return lin.weight.detach().numpy().T.copy()


def _b(lin) -> np.ndarray:
    return lin.bias.detach().numpy().copy()


def map_nerf_params(ref_m, perm_xyz=None, perm_extra=None) -> dict:
    """Torch reference NeRF -> rebuild param pytree (optionally permuting
    first-layer rows from interleaved to block PE layout)."""
    cx = ref_m.in_channels_xyz
    trunk = []
    for i in range(ref_m.D):
        lin = getattr(ref_m, f"xyz_encoding_{i+1}")[0]
        w = _wT(lin)
        if perm_xyz is not None:
            if i == 0:
                w = w[perm_xyz]
            elif i in ref_m.skips:
                w = np.concatenate([w[:cx][perm_xyz], w[cx:]], axis=0)
        trunk.append({"w": jnp.asarray(w), "b": jnp.asarray(_b(lin))})
    we = _wT(ref_m.extra_encoding[0])
    if perm_extra is not None and ref_m.extra_feat_type != "none":
        width = ref_m.W
        we = np.concatenate([we[:width], we[width:][perm_extra]], axis=0)
    return {
        "trunk": trunk,
        "sigma": {"w": jnp.asarray(_wT(ref_m.sigma)),
                  "b": jnp.asarray(_b(ref_m.sigma))},
        "final": {"w": jnp.asarray(_wT(ref_m.xyz_encoding_final)),
                  "b": jnp.asarray(_b(ref_m.xyz_encoding_final))},
        "extra": {"w": jnp.asarray(we),
                  "b": jnp.asarray(_b(ref_m.extra_encoding[0]))},
        "rgb": {"w": jnp.asarray(_wT(ref_m.rgb[0])),
                "b": jnp.asarray(_b(ref_m.rgb[0]))},
    }


def map_nof_params(ref_m, cx: int, ce: int, perm_xyz=None, perm_ind=None) -> dict:
    layers = []
    for i in range(ref_m.D):
        lin = getattr(ref_m, f"nof_encoding_{i+1}")[0]
        w = _wT(lin)
        if perm_xyz is not None and (i == 0 or i in ref_m.skips):
            w = np.concatenate(
                [w[:cx][perm_xyz], w[cx:cx + ce][perm_ind], w[cx + ce:]],
                axis=0)
        layers.append({"w": jnp.asarray(w), "b": jnp.asarray(_b(lin))})
    return {"layers": layers,
            "head": {"w": jnp.asarray(_wT(ref_m.nof_encoding_final)),
                     "b": jnp.asarray(_b(ref_m.nof_encoding_final))}}


# ---------------------------------------------------------------------------
# sample_pdf
# ---------------------------------------------------------------------------

def test_sample_pdf_parity(ref, rng):
    from moco_flow_tpu.render.sampling import sample_pdf
    n, nb, ni = 32, 30, 24
    bins = np.sort(rng.uniform(2.0, 4.0, (n, nb + 1)).astype(np.float32), -1)
    weights = rng.uniform(0.0, 1.0, (n, nb)).astype(np.float32)
    weights[3] = 0.0  # exercise the denom<eps fallback
    with torch.no_grad():
        want = ref.rendering.sample_pdf(
            torch.from_numpy(bins), torch.from_numpy(weights), ni,
            det=True).numpy()
    got = np.asarray(sample_pdf(None, jnp.asarray(bins), jnp.asarray(weights),
                                ni, det=True))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# PE embedding + annealing schedule
# ---------------------------------------------------------------------------

def test_embedding_parity(ref, rng):
    from moco_flow_tpu.nn.embedding import posenc
    for c, k in ((3, 10), (1, 16), (3, 5)):
        emb = ref.embedding.Embedding(c, k)
        w = np.clip(np.linspace(-0.1, 1.2, k), 0, 1)
        emb.weights = list(w)
        x = rng.normal(size=(64, c)).astype(np.float32)
        with torch.no_grad():
            want = emb(torch.from_numpy(x)).numpy()
        got = np.asarray(posenc(jnp.asarray(x), k, True, jnp.asarray(w)))
        np.testing.assert_allclose(got, want[:, block_perm(c, k)], atol=1e-6)


def test_anneal_schedule_parity(ref):
    """Drive the REAL increase_xyzemb_dim (trainer_moco_flow.py:270-305) on a
    minimal fake trainer and compare against anneal_weights step by step."""
    from moco_flow_tpu.nn.embedding import anneal_weights
    start, end, kn, kf = 5000, 1005000, 10, 5
    nerf_emb = ref.embedding.Embedding(3, kn)
    nof_emb = ref.embedding.Embedding(3, kf)
    config = {"model": {"coarse_to_fine": True,
                        "nerf_embedding_xyz": {"N_freqs": kn},
                        "nof_embedding_xyz": {"N_freqs": kf}},
              "trainer": {"coarse2fine_start_iter": start,
                          "coarse2fine_end_iter": end}}
    for step in (0, start, start + 1, start + 12345, (start + end) // 2,
                 end - 1, end, end + 1, end + 999999):
        # the joint trainer zero-inits PE weights (ref :112-114); the method
        # only mutates them inside/after the window
        nerf_emb.weights = [0] * kn
        nof_emb.weights = [0] * kf
        fake = types.SimpleNamespace(
            config=config, clock=types.SimpleNamespace(step=step),
            nerf_embeddings=[nerf_emb], nof_embeddings=[nof_emb])
        ref.trainer_moco.MoCoFlowTrainer.increase_xyzemb_dim(fake)
        got_n = np.asarray(anneal_weights(jnp.asarray(step), kn, start, end))
        got_f = np.asarray(anneal_weights(jnp.asarray(step), kf, start, end))
        np.testing.assert_allclose(
            got_n, np.asarray(nerf_emb.weights, np.float64), atol=1e-5,
            err_msg=f"nerf weights @ step {step}")
        np.testing.assert_allclose(
            got_f, np.asarray(nof_emb.weights, np.float64), atol=1e-5,
            err_msg=f"nof weights @ step {step}")


# ---------------------------------------------------------------------------
# NoF / NeRF MLP forward
# ---------------------------------------------------------------------------

def test_nof_forward_parity(ref, rng):
    from moco_flow_tpu.nn.nof import NoFConfig, nof_apply
    torch.manual_seed(0)
    for use_quat in (True, False):
        ref_m = ref.nof.NoF(D=4, W=128, in_channels_xyz=33, skips=[2],
                            extra_feat_type="ind", extra_feat_dim=33,
                            use_quat=use_quat)
        cfg = NoFConfig(depth=4, width=128, in_channels_xyz=33, skips=(2,),
                        extra_feat_dim=33, use_quat=use_quat)
        params = map_nof_params(ref_m, 33, 33)
        inputs = rng.normal(size=(256, 66)).astype(np.float32)
        xyz = rng.normal(size=(256, 3)).astype(np.float32)
        with torch.no_grad():
            want = ref_m(torch.from_numpy(inputs),
                         torch.from_numpy(xyz)).numpy()
        got = np.asarray(nof_apply(params, jnp.asarray(inputs),
                                   jnp.asarray(xyz), cfg))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_nerf_forward_parity(ref, rng):
    from moco_flow_tpu.nn.nerf import NeRFConfig, nerf_apply, nerf_sigma
    torch.manual_seed(1)
    ref_m = ref.nerf.NeRF(D=8, W=256, in_channels_xyz=63, skips=[4],
                          extra_feat_type="ind", extra_feat_dim=5)
    cfg = NeRFConfig(depth=8, width=256, in_channels_xyz=63, skips=(4,),
                     extra_feat_type="ind", extra_feat_dim=5)
    params = map_nerf_params(ref_m)
    inputs = rng.normal(size=(256, 68)).astype(np.float32)
    with torch.no_grad():
        want = ref_m(torch.from_numpy(inputs)).numpy()
        want_sigma = ref_m(torch.from_numpy(inputs[:, :63]),
                           sigma_only=True).numpy()
    got = np.asarray(nerf_apply(params, jnp.asarray(inputs[:, :63]),
                                jnp.asarray(inputs[:, 63:]), cfg))
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-4)
    got_sigma = np.asarray(nerf_sigma(params, jnp.asarray(inputs[:, :63]), cfg))
    np.testing.assert_allclose(got_sigma, want_sigma, atol=5e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# SMPL FK/LBS on a fabricated pickle
# ---------------------------------------------------------------------------

@pytest.fixture()
def smpl_pickle(tmp_path):
    """A fabricated-but-schema-exact SMPL pickle (scipy-sparse J_regressor,
    chumpy-free arrays) written under tmp, shaped like the real
    basicmodel_*_lbs_10_207_0_v1.1.0.pkl."""
    scipy_sparse = pytest.importorskip("scipy.sparse")
    from moco_flow_tpu.geometry.smpl import synthetic_smpl_data
    data = synthetic_smpl_data(num_vertices=128, seed=3)
    kintree = np.zeros((2, 24), np.uint32)
    kintree[1] = np.arange(24)
    kintree[0, 0] = 4294967295 & 0xFFFFFFFF
    kintree[0, 1:] = data.parents
    m = {
        "v_template": data.v_template.astype(np.float64),
        "shapedirs": data.shapedirs.astype(np.float64),
        "posedirs": data.posedirs.astype(np.float64),
        "J_regressor": scipy_sparse.csr_matrix(data.j_regressor),
        "weights": data.lbs_weights.astype(np.float64),
        "kintree_table": kintree,
        "f": data.faces.astype(np.uint32),
    }
    d = tmp_path / "data"
    d.mkdir()
    with open(d / "basicmodel_neutral_lbs_10_207_0_v1.1.0.pkl", "wb") as f:
        pickle.dump(m, f)
    return tmp_path


def test_smpl_parity(ref, smpl_pickle, rng):
    from moco_flow_tpu.geometry.smpl import (
        load_smpl_data, smpl_forward, smpl_vertex_transforms)
    data = load_smpl_data("neutral", model_dir=str(smpl_pickle / "data"))
    assert data.num_vertices == 128 and data.parents.shape == (23,)

    saved = ref.smpl.os
    ref.smpl.os = types.SimpleNamespace(path=types.SimpleNamespace(
        dirname=lambda _: str(smpl_pickle)))
    try:
        ref_model = ref.smpl.SMPL("neutral")
    finally:
        ref.smpl.os = saved

    pose = (rng.normal(scale=0.3, size=(2, 72))).astype(np.float32)
    betas = rng.normal(scale=0.5, size=(2, 10)).astype(np.float32)
    with torch.no_grad():
        want_v = ref_model(torch.from_numpy(pose),
                           torch.from_numpy(betas)).numpy()
        want_t = ref_model.get_vertex_transformation(
            torch.from_numpy(pose), torch.from_numpy(betas)).numpy()
    got_v = np.asarray(smpl_forward(data, jnp.asarray(pose),
                                    jnp.asarray(betas)))
    got_t = np.asarray(smpl_vertex_transforms(data, jnp.asarray(pose),
                                              jnp.asarray(betas)))
    np.testing.assert_allclose(got_v, want_v, atol=1e-4)
    np.testing.assert_allclose(got_t, want_t, atol=1e-4)


# ---------------------------------------------------------------------------
# full render_rays
# ---------------------------------------------------------------------------

def _build_ref_stack(ref):
    """Reference embeddings + coarse/fine NeRF + bw/fw NoF, torch-default
    init, plus the mapped JAX params/statics for the same weights."""
    from moco_flow_tpu.nn.nerf import NeRFConfig
    from moco_flow_tpu.nn.nof import NoFConfig
    from moco_flow_tpu.render.volume import EmbeddingSpec, ModelStatics

    torch.manual_seed(7)
    emb_xyz = ref.embedding.Embedding(3, 10)    # 63
    emb_ind = ref.embedding.Embedding(1, 2)     # 5
    nof_emb_xyz = ref.embedding.Embedding(3, 5)   # 33
    nof_emb_ind = ref.embedding.Embedding(1, 16)  # 33
    nerf_kw = dict(D=8, W=64, in_channels_xyz=63, skips=[4],
                   extra_feat_type="ind", extra_feat_dim=5)
    nof_kw = dict(D=4, W=32, in_channels_xyz=33, skips=[2],
                  extra_feat_type="ind", extra_feat_dim=33, use_quat=True)
    nerf_c, nerf_f = ref.nerf.NeRF(**nerf_kw), ref.nerf.NeRF(**nerf_kw)
    bw, fw = ref.nof.NoF(**nof_kw), ref.nof.NoF(**nof_kw)

    p_xyz, p_ind = block_perm(3, 10), block_perm(1, 2)
    p_nof_xyz, p_nof_ind = block_perm(3, 5), block_perm(1, 16)
    params = {
        "coarse_NeRF": map_nerf_params(nerf_c, p_xyz, p_ind),
        "fine_NeRF": map_nerf_params(nerf_f, p_xyz, p_ind),
        "bw_NoF": map_nof_params(bw, 33, 33, p_nof_xyz, p_nof_ind),
        "fw_NoF": map_nof_params(fw, 33, 33, p_nof_xyz, p_nof_ind),
    }
    statics = ModelStatics(
        coarse=NeRFConfig(depth=8, width=64, in_channels_xyz=63, skips=(4,),
                          extra_feat_type="ind", extra_feat_dim=5),
        fine=NeRFConfig(depth=8, width=64, in_channels_xyz=63, skips=(4,),
                        extra_feat_type="ind", extra_feat_dim=5),
        nof=NoFConfig(depth=4, width=32, in_channels_xyz=33, skips=(2,),
                      extra_feat_dim=33, use_quat=True),
        nerf_xyz=EmbeddingSpec(10), nerf_ind=EmbeddingSpec(2, in_channels=1),
        nof_xyz=EmbeddingSpec(5), nof_ind=EmbeddingSpec(16, in_channels=1))
    ref_stack = dict(nerf_embeddings=[emb_xyz, emb_ind, None],
                     nerf_models=[nerf_c, nerf_f],
                     nof_embeddings=[nof_emb_xyz, nof_emb_ind],
                     nof_models=[bw, fw])
    return ref_stack, params, statics


def _make_rays(rng, n=24):
    o = np.tile([0.0, 0.0, 3.0], (n, 1)) + rng.normal(scale=0.05, size=(n, 3))
    d = rng.normal(size=(n, 3))
    d = -np.abs(d)  # non-unit on purpose: exercises the |d|*delta scaling
    ind = np.full((n, 1), 0.25)
    chained = np.full((n, 1), -0.5)
    rays = np.concatenate(
        [o, d, np.full((n, 1), 2.0), np.full((n, 1), 4.0), ind, chained],
        axis=-1).astype(np.float32)
    bg = rng.uniform(size=(n, 3)).astype(np.float32)
    return rays, bg


@pytest.mark.parametrize("test_time", [False, True])
def test_render_rays_parity(ref, rng, test_time):
    from moco_flow_tpu.render.volume import RenderConfig, render_rays
    ref_stack, params, statics = _build_ref_stack(ref)
    rays, bg = _make_rays(rng)
    with torch.no_grad():
        want = ref.rendering.render_rays(
            torch.from_numpy(rays), torch.from_numpy(bg),
            chain_local=True, chain_global=True,
            N_samples=16, N_importance=16, use_disp=False, perturb=0,
            noise_std=0, nerf_activate_type="relu", test_time=test_time,
            **ref_stack)
    rcfg = RenderConfig(n_samples=16, n_importance=16, perturb=0.0,
                        noise_std=0.0, use_nof=True, chain_local=True,
                        chain_global=True, test_time=test_time)
    got = render_rays(params, statics, {}, jnp.asarray(rays),
                      jnp.asarray(bg), jax.random.key(0), rcfg)

    def cmp(key, atol):
        np.testing.assert_allclose(
            np.asarray(got[key]), want[key].numpy(), atol=atol, rtol=1e-3,
            err_msg=key)

    cmp("opacity_coarse", 1e-4)
    cmp("rgb_fine", 2e-4)
    cmp("depth_fine", 1e-3)
    cmp("opacity_fine", 1e-4)
    if not test_time:
        cmp("rgb_coarse", 2e-4)
        cmp("depth_coarse", 1e-3)
        # consensus terms: the rebuild returns the masked MEAN (the reference
        # returns the masked vector that its trainer immediately means)
        for key in ("nof_local_disp_coarse", "nof_global_disp_coarse",
                    "nof_local_disp_fine", "nof_global_disp_fine"):
            np.testing.assert_allclose(
                float(got[key]), float(want[key].mean()), atol=1e-5,
                err_msg=key)


def test_render_rays_parity_no_nof(ref, rng):
    """Stage-1 configuration: plain coarse+fine NeRF, no NoF warps."""
    from moco_flow_tpu.render.volume import RenderConfig, render_rays
    ref_stack, params, statics = _build_ref_stack(ref)
    rays, bg = _make_rays(rng)
    with torch.no_grad():
        want = ref.rendering.render_rays(
            torch.from_numpy(rays[:, :9]), torch.from_numpy(bg),
            nerf_embeddings=ref_stack["nerf_embeddings"],
            nerf_models=ref_stack["nerf_models"],
            N_samples=16, N_importance=16, perturb=0, noise_std=0,
            nerf_activate_type="relu", test_time=False)
    rcfg = RenderConfig(n_samples=16, n_importance=16, perturb=0.0,
                        noise_std=0.0, use_nof=False)
    got = render_rays(params, statics, {}, jnp.asarray(rays[:, :9]),
                      jnp.asarray(bg), jax.random.key(0), rcfg)
    for key, atol in (("rgb_coarse", 2e-4), ("rgb_fine", 2e-4),
                      ("depth_fine", 1e-3), ("opacity_fine", 1e-4)):
        np.testing.assert_allclose(np.asarray(got[key]), want[key].numpy(),
                                   atol=atol, rtol=1e-3, err_msg=key)


# ---------------------------------------------------------------------------
# torch checkpoint converter (scripts/convert_ref_ckpt.py)
# ---------------------------------------------------------------------------

def test_ckpt_converter_roundtrip(ref, rng, tmp_path):
    """A reference trainer save_dict (.pth, trainer/base.py:289-299) converts
    to an .npz whose params exactly equal the proven-parity weight mapping,
    whose clock survives, and whose weights render identically to the torch
    reference through the full render_rays."""
    from scripts.convert_ref_ckpt import convert_checkpoint
    from moco_flow_tpu.render.volume import RenderConfig, render_rays
    from moco_flow_tpu.train.checkpoint import (load_checkpoint,
                                                save_checkpoint)

    ref_stack, params, statics = _build_ref_stack(ref)
    save_dict = {
        "clock": {"epoch": 3, "minibatch": 5, "step": 777},
        "coarse_NeRF_net": ref_stack["nerf_models"][0].state_dict(),
        "fine_NeRF_net": ref_stack["nerf_models"][1].state_dict(),
        "bw_NoF_net": ref_stack["nof_models"][0].state_dict(),
        "fw_NoF_net": ref_stack["nof_models"][1].state_dict(),
        "moco_optimizer": {"state": {}, "param_groups": []},
        "moco_scheduler": {"last_epoch": 3},
    }
    pth = str(tmp_path / "epoch3_iter777.pth")
    torch.save(save_dict, pth)

    ckpt = torch.load(pth, map_location="cpu", weights_only=False)
    tree, extra, skipped = convert_checkpoint(ckpt)
    dst = str(tmp_path / "epoch3_iter777")
    save_checkpoint(dst, tree, extra=extra)
    loaded, ext = load_checkpoint(dst)

    assert ext["clock"] == {"epoch": 3, "minibatch": 5, "step": 777}
    assert set(skipped) == {"moco_optimizer", "moco_scheduler"}

    # bit-exact equality with the parity-proven in-memory mapping
    want_flat = jax.tree_util.tree_flatten_with_path(params)[0]
    got_flat = jax.tree_util.tree_flatten_with_path(loaded["params"])[0]
    assert len(want_flat) == len(got_flat)
    for (pw, w), (pg, g) in zip(want_flat, got_flat):
        assert jax.tree_util.keystr(pw) == jax.tree_util.keystr(pg)
        np.testing.assert_array_equal(
            np.asarray(w), np.asarray(g),
            err_msg=jax.tree_util.keystr(pw))

    # and the converted checkpoint renders identically to the torch model
    rays, bg = _make_rays(rng)
    with torch.no_grad():
        want = ref.rendering.render_rays(
            torch.from_numpy(rays), torch.from_numpy(bg),
            chain_local=True, chain_global=True,
            N_samples=16, N_importance=16, use_disp=False, perturb=0,
            noise_std=0, nerf_activate_type="relu", test_time=True,
            **ref_stack)
    rcfg = RenderConfig(n_samples=16, n_importance=16, perturb=0.0,
                        noise_std=0.0, use_nof=True, chain_local=True,
                        chain_global=True, test_time=True)
    got = render_rays(loaded["params"], statics, {}, jnp.asarray(rays),
                      jnp.asarray(bg), jax.random.key(0), rcfg)
    np.testing.assert_allclose(np.asarray(got["rgb_fine"]),
                               want["rgb_fine"].numpy(), atol=2e-4,
                               rtol=1e-3)


def test_ckpt_converter_cli(ref, tmp_path, monkeypatch, capsys):
    """The CLI entry converts a .pth and reports skipped torch-only state."""
    import scripts.convert_ref_ckpt as cli

    torch.manual_seed(11)
    nerf = ref.nerf.NeRF(D=2, W=16, in_channels_xyz=63, skips=[1],
                         extra_feat_type="ind", extra_feat_dim=5)
    pth = str(tmp_path / "epoch1_iter10.pth")
    torch.save({"clock": {"epoch": 1, "minibatch": 0, "step": 10},
                "fine_NeRF_net": nerf.state_dict(),
                "moco_optimizer": {"state": {}}}, pth)
    dst = str(tmp_path / "converted")
    monkeypatch.setattr("sys.argv", ["convert_ref_ckpt.py", pth, dst])
    cli.main()
    out = capsys.readouterr().out
    assert "fine_NeRF" in out and "moco_optimizer" in out
    from moco_flow_tpu.train.checkpoint import load_checkpoint
    loaded, ext = load_checkpoint(dst)
    assert ext["clock"]["step"] == 10
    assert loaded["params"]["fine_NeRF"]["trunk"][0]["w"].shape == (63, 16)


def test_ckpt_converter_reverse(ref, rng, tmp_path):
    """--reverse: our checkpoint -> reference .pth. forward(reverse(x)) is
    tensor-exact, and the reversed state dicts strict-load into the actual
    reference modules and produce the same render as the rebuild."""
    from scripts.convert_ref_ckpt import (convert_checkpoint,
                                          reverse_checkpoint)
    from moco_flow_tpu.render.volume import RenderConfig, render_rays

    ref_stack, params, statics = _build_ref_stack(ref)
    save_dict = {
        "clock": {"epoch": 2, "minibatch": 1, "step": 55},
        "coarse_NeRF_net": ref_stack["nerf_models"][0].state_dict(),
        "fine_NeRF_net": ref_stack["nerf_models"][1].state_dict(),
        "bw_NoF_net": ref_stack["nof_models"][0].state_dict(),
        "fw_NoF_net": ref_stack["nof_models"][1].state_dict(),
    }
    tree, extra, _ = convert_checkpoint(save_dict)
    back, skipped = reverse_checkpoint(tree, extra)

    assert back["clock"] == save_dict["clock"] and not skipped
    for net, sd in save_dict.items():
        if not net.endswith("_net"):
            continue
        assert set(back[net]) == set(sd), net
        for k in sd:
            np.testing.assert_array_equal(
                back[net][k].numpy(), sd[k].numpy(), err_msg=f"{net}.{k}")

    # strict-load the reversed dicts into FRESH reference modules and render
    torch.manual_seed(99)
    nerf_kw = dict(D=8, W=64, in_channels_xyz=63, skips=[4],
                   extra_feat_type="ind", extra_feat_dim=5)
    nof_kw = dict(D=4, W=32, in_channels_xyz=33, skips=[2],
                  extra_feat_type="ind", extra_feat_dim=33, use_quat=True)
    fresh = dict(
        nerf_models=[ref.nerf.NeRF(**nerf_kw), ref.nerf.NeRF(**nerf_kw)],
        nof_models=[ref.nof.NoF(**nof_kw), ref.nof.NoF(**nof_kw)],
        nerf_embeddings=ref_stack["nerf_embeddings"],
        nof_embeddings=ref_stack["nof_embeddings"])
    fresh["nerf_models"][0].load_state_dict(back["coarse_NeRF_net"])
    fresh["nerf_models"][1].load_state_dict(back["fine_NeRF_net"])
    fresh["nof_models"][0].load_state_dict(back["bw_NoF_net"])
    fresh["nof_models"][1].load_state_dict(back["fw_NoF_net"])

    rays, bg = _make_rays(rng)
    with torch.no_grad():
        want = ref.rendering.render_rays(
            torch.from_numpy(rays), torch.from_numpy(bg),
            chain_local=True, chain_global=True,
            N_samples=16, N_importance=16, use_disp=False, perturb=0,
            noise_std=0, nerf_activate_type="relu", test_time=True, **fresh)
    rcfg = RenderConfig(n_samples=16, n_importance=16, perturb=0.0,
                        noise_std=0.0, use_nof=True, chain_local=True,
                        chain_global=True, test_time=True)
    got = render_rays(params, statics, {}, jnp.asarray(rays),
                      jnp.asarray(bg), jax.random.key(0), rcfg)
    np.testing.assert_allclose(np.asarray(got["rgb_fine"]),
                               want["rgb_fine"].numpy(), atol=2e-4,
                               rtol=1e-3)
