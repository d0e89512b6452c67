"""Megabatch volume renderer.

TPU-native re-design of the reference render stack (models/rendering.py:49-375):
one pure, fully-jittable function over an ``(N_rays, ...)`` megabatch —
stratified sampling, backward/forward NoF warps, coarse NeRF, inverse-CDF fine
sampling, fine NeRF, alpha compositing, and motion-consensus disparities. No
host-side chunk loop (the reference chunks at 32768 rays in Python,
trainer_moco_flow.py:196-224); XLA tiles the megabatch onto the MXU, and the
optional fused Pallas MLP path keeps activations in VMEM across layers.

Static-shape substitutions vs the reference (documented in SURVEY.md §7):
  - the alpha>=0.01 consensus masks use masked means instead of boolean gathers
    (same value; models/rendering.py:306-314).
  - consensus disparities are returned as masked-mean *scalars* (the trainer
    immediately averages them, trainer_moco_flow.py:319-328).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..nn.embedding import posenc
from ..nn.losses import masked_mean
from ..nn.nerf import NeRFConfig, nerf_apply, nerf_apply_perray_extra, nerf_sigma
from ..nn.nof import NoFConfig, nof_apply, nof_apply_split
from .sampling import (compact_fine_samples, merge_cano_by_z,
                       merge_cano_by_z_t, sample_pdf, stratified_zvals,
                       unsort_by_pos)


@dataclasses.dataclass(frozen=True)
class EmbeddingSpec:
    """Static positional-encoding spec (the annealing weights are dynamic)."""
    n_freqs: int
    logscale: bool = True
    in_channels: int = 3

    @classmethod
    def from_dict(cls, d: dict | None) -> "EmbeddingSpec | None":
        if d is None:
            return None
        return cls(n_freqs=d.get("N_freqs", 0), logscale=d.get("logscale", True),
                   in_channels=d.get("in_channels", 3))


@dataclasses.dataclass(frozen=True)
class ModelStatics:
    """Hashable bundle of every static model config (safe jit static arg)."""
    coarse: NeRFConfig
    fine: NeRFConfig | None = None
    nof: NoFConfig | None = None
    nerf_xyz: EmbeddingSpec = EmbeddingSpec(10)
    nerf_ind: EmbeddingSpec | None = None
    nerf_dir: EmbeddingSpec | None = None
    nof_xyz: EmbeddingSpec | None = None
    nof_ind: EmbeddingSpec | None = None


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static render-time options (mirrors render_rays kwargs,
    models/rendering.py:195-210 + the model block of the YAML configs)."""
    n_samples: int = 64
    n_importance: int = 0
    use_disp: bool = False
    perturb: float = 0.0
    noise_std: float = 0.0
    activation: str = "relu"  # 'relu' | 'softplus'
    use_nof: bool = False
    chain_local: bool = False
    chain_global: bool = False
    test_time: bool = False
    compute_dtype: str = "float32"  # 'float32' | 'bfloat16'
    mlp_impl: str = "xla"  # 'xla' | 'pallas' | 'fused' | 'fused_nof' |
    # 'fused_nerf'. 'fused' = whole-ray VMEM megakernels (ops/megakernel.py):
    # PE + MLP + heads in one Pallas kernel with a Pallas backward; the
    # fastest path on real TPUs (the XLA trunk is HBM-bound, see PERF.md).
    # The hybrids run only the NoF warps (resp. only the NeRF evals) through
    # the fused kernels, the rest through XLA — measurement knobs.

    @property
    def nof_fused(self) -> bool:
        return self.mlp_impl in ("fused", "fused_nof")

    @property
    def nerf_fused(self) -> bool:
        return self.mlp_impl in ("fused", "fused_nerf")
    remat: bool = False  # checkpoint each MLP eval: don't store trunk
    # activations for backward (recompute instead) — cuts backward HBM
    # residency ~8x, enabling much larger per-chip ray batches
    fine_budget: int = 0  # test-time empty-space skipping: keep the
    # fine samples whose coarse bins carry the most weight, compacted to
    # this budget (sampling.compact_fine_samples). 0 = evaluate all (exact
    # reference behavior). Render-throughput knob; error bounded by the
    # dropped bins' total weight.
    coarse_probe: int = 0  # test-time coarse subsampling: evaluate the
    # sigma-only coarse pass on this many strided stratified depths
    # (must divide n_samples) instead of all of them — the importance pdf
    # and skip scores then come from a coarser histogram. 0 = exact.
    share_coarse_warps: bool = True  # the fine sample set is the union of
    # the coarse depths and the new importance depths; the NoF warp chain
    # is the SAME networks for both passes, so the coarse subset's warps
    # are reused instead of re-evaluated (exact: identical values,
    # duplicated-point gradients sum) — halves the fine-pass warp FLOPs.
    # The reference re-evaluates the union (models/rendering.py:316-330).
    # Off: re-warp all fine samples like the reference. Inert on the
    # fused test-time path (warps live inside the pass megakernel).

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else None


def encode_nerf_xyz(nerf_params: dict, nerf_cfg: NeRFConfig,
                    statics: "ModelStatics", flat: jnp.ndarray,
                    anneal: dict) -> jnp.ndarray:
    """xyz -> the NeRF's input features: sinusoidal PE (reference path) or
    the trainable hash encoding (``encoding: hashgrid``, nn/hashgrid.py).
    The hash table rides in ``nerf_params['hash']`` so its gradient flows
    through the returned features."""
    if nerf_cfg.encoding == "hashgrid":
        from ..nn.hashgrid import hashgrid_encode
        return hashgrid_encode(nerf_params["hash"], flat, nerf_cfg.hash)
    return embed_padded(flat, statics.nerf_xyz, nerf_cfg.in_channels_xyz,
                        anneal.get("nerf_xyz"))


def embed_padded(x: jnp.ndarray, spec: EmbeddingSpec, target_dim: int,
                 weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """posenc + zero-pad to the model's static input width.

    The reference zero-pads embeddings into the model's ``in_channels_xyz`` /
    ``extra_feat_dim`` so the annealed (possibly narrower) PE keeps a static
    shape (models/rendering.py:127-129,134-142). Here the pad is a static
    concat, free after XLA fusion.
    """
    emb = posenc(x, spec.n_freqs, spec.logscale, weights)
    pad = target_dim - emb.shape[-1]
    if pad < 0:
        raise ValueError(
            f"embedding width {emb.shape[-1]} exceeds target {target_dim}")
    if pad:
        emb = jnp.concatenate(
            [emb, jnp.zeros((*emb.shape[:-1], pad), emb.dtype)], axis=-1)
    return emb


# ---------------------------------------------------------------------------
# MLP evaluation funnels — the single place the fused Pallas path plugs in.
# ---------------------------------------------------------------------------

def _eval_nerf(params: dict, cfg: NeRFConfig, x_emb: jnp.ndarray,
               extra_emb: jnp.ndarray | None, sigma_only: bool,
               rcfg: RenderConfig) -> jnp.ndarray:
    if rcfg.mlp_impl == "pallas":
        from ..ops.fused_mlp import nerf_fused
        return nerf_fused(params, cfg, x_emb, extra_emb, sigma_only,
                          compute_dtype=rcfg.dtype)
    if sigma_only:
        fn = lambda p, x: nerf_sigma(p, x, cfg, rcfg.dtype)
        if rcfg.remat:
            fn = jax.checkpoint(fn)
        return fn(params, x_emb)
    fn = lambda p, x, e: nerf_apply(p, x, e, cfg, rcfg.dtype)
    if rcfg.remat:
        fn = jax.checkpoint(fn)
    return fn(params, x_emb, extra_emb)


def _eval_nof(params: dict, cfg: NoFConfig, inputs: jnp.ndarray,
              xyz: jnp.ndarray, rcfg: RenderConfig) -> jnp.ndarray:
    if rcfg.mlp_impl == "pallas":
        from ..ops.fused_mlp import nof_fused
        return nof_fused(params, cfg, inputs, xyz, compute_dtype=rcfg.dtype)
    fn = lambda p, i, x: nof_apply(p, i, x, cfg, rcfg.dtype)
    if rcfg.remat:
        fn = jax.checkpoint(fn)
    return fn(params, inputs, xyz)


# ---------------------------------------------------------------------------
# NoF warp
# ---------------------------------------------------------------------------

def nof_warp(params: dict, statics: ModelStatics, anneal: dict,
             xyz: jnp.ndarray, ind: jnp.ndarray, rcfg: RenderConfig) -> jnp.ndarray:
    """Warp sampled points through a NoF MLP (ref models/rendering.py:49-83).

    Args:
      xyz: ``(N, S, 3)`` sampled positions.
      ind: ``(N, 1)`` normalized frame index per ray.

    Returns: ``(N, S, 3)`` warped positions.
    """
    cfg = statics.nof
    n, s = xyz.shape[0], xyz.shape[1]
    if rcfg.nof_fused:
        from ..ops.megakernel import nof_fused_rays
        ind_emb = embed_padded(ind, statics.nof_ind, cfg.extra_feat_dim)
        return nof_fused_rays(params, cfg, statics.nof_xyz.n_freqs,
                              statics.nof_xyz.logscale,
                              anneal.get("nof_xyz"), xyz, ind_emb,
                              compute_dtype=rcfg.dtype)
    flat = xyz.reshape(-1, 3)
    xyz_emb = embed_padded(flat, statics.nof_xyz, cfg.in_channels_xyz,
                           anneal.get("nof_xyz"))
    ind_emb = embed_padded(ind, statics.nof_ind, cfg.extra_feat_dim)  # (N, E)
    if rcfg.mlp_impl == "pallas":
        bc = jnp.broadcast_to(ind_emb[:, None, :], (n, s, cfg.extra_feat_dim))
        inputs = jnp.concatenate(
            [xyz_emb, bc.reshape(-1, cfg.extra_feat_dim)], axis=-1)
        out = _eval_nof(params, cfg, inputs, flat, rcfg)
    else:
        # split path: the per-ray index embedding never reaches sample rank
        fn = lambda p, xe, ie, fl: nof_apply_split(p, xe, ie, s, fl, cfg,
                                                   rcfg.dtype)
        if rcfg.remat:
            fn = jax.checkpoint(fn)
        out = fn(params, xyz_emb, ind_emb, flat)
    return out.reshape(n, s, 3)


# ---------------------------------------------------------------------------
# NeRF evaluation + compositing
# ---------------------------------------------------------------------------

def _extra_embedding(nerf_cfg: NeRFConfig, statics: ModelStatics,
                     ind: jnp.ndarray, direction: jnp.ndarray,
                     n: int, s: int) -> jnp.ndarray | None:
    """Per-ray extra feature (frame-index or view-dir PE), broadcast to samples
    (ref models/rendering.py:132-142)."""
    if nerf_cfg.extra_feat_type == "ind":
        e = embed_padded(ind, statics.nerf_ind, nerf_cfg.extra_feat_dim)
    elif nerf_cfg.extra_feat_type == "dir":
        e = embed_padded(direction, statics.nerf_dir, nerf_cfg.extra_feat_dim)
    else:
        return None
    e = jnp.broadcast_to(e[:, None, :], (n, s, nerf_cfg.extra_feat_dim))
    return e.reshape(-1, nerf_cfg.extra_feat_dim)


def composite(sigmas: jnp.ndarray, z_vals: jnp.ndarray, dir_norm: jnp.ndarray,
              noise: jnp.ndarray | None, activation: str,
              deltas: jnp.ndarray | None = None):
    """sigma -> (alphas, weights) via the NeRF quadrature
    (ref models/rendering.py:158-181). ``deltas`` overrides the adjacent-z
    spacing (compacted sample sets carry their original deltas)."""
    if deltas is None:
        deltas = z_vals[:, 1:] - z_vals[:, :-1]
        deltas = jnp.concatenate(
            [deltas, jnp.full_like(deltas[:, :1], 1e10)], axis=-1)
    deltas = deltas * dir_norm  # account for non-unit ray directions
    if noise is not None:
        sigmas = sigmas + noise
    act = jax.nn.relu if activation == "relu" else jax.nn.softplus
    alphas = 1.0 - jnp.exp(-deltas * act(sigmas))
    shifted = jnp.concatenate(
        [jnp.ones_like(alphas[:, :1]), 1.0 - alphas + 1e-10], axis=-1)
    weights = alphas * jnp.cumprod(shifted, axis=-1)[:, :-1]
    return alphas, weights


def _composite_tail(rgbs, sigmas, z_vals, dir_norm, noise,
                    rcfg: RenderConfig, background, deltas=None,
                    transposed_rgb: bool = False):
    """Shared per-pass epilogue: quadrature + weighted rgb/depth +
    background blend (ref models/rendering.py:176-191). One definition for
    the XLA, fused and test-time paths so they cannot diverge.
    ``transposed_rgb``: rgbs is (3, N, S) (the fused kernels' lane-efficient
    layout) instead of (N, S, 3); only the weighted sum differs."""
    alphas, weights = composite(sigmas, z_vals, dir_norm, noise,
                                rcfg.activation, deltas=deltas)
    if transposed_rgb:
        rgb = jnp.sum(weights[None] * rgbs, axis=-1).T     # (N, 3)
    else:
        rgb = jnp.sum(weights[..., None] * rgbs, axis=-2)
    depth = jnp.sum(weights * z_vals, axis=-1)
    if background is not None:
        rgb = rgb + background * (1.0 - jnp.sum(weights, axis=-1,
                                                keepdims=True))
    return rgb, depth, weights, alphas


def nerf_inference(params: dict, nerf_cfg: NeRFConfig, statics: ModelStatics,
                   anneal: dict, xyz: jnp.ndarray, ind: jnp.ndarray,
                   direction: jnp.ndarray, z_vals: jnp.ndarray,
                   key: jax.Array | None, rcfg: RenderConfig,
                   background: jnp.ndarray | None = None,
                   weights_only: bool = False, transposed: bool = False):
    """Evaluate a NeRF on all samples of a ray batch and composite
    (ref models/rendering.py:86-192).

    ``transposed``: xyz arrives as (3, N, S) — the fused train path keeps
    warp/sample tensors transposed end-to-end so nothing lane-pads 3->128;
    only meaningful with the fused kernels (other impls transpose back).

    Returns ``(rgb, depth, weights, alphas)``; rgb/depth are ``None`` when
    ``weights_only``.
    """
    if transposed and not rcfg.nerf_fused:
        xyz = jnp.moveaxis(xyz, 0, -1)
        transposed = False
    n, s = (xyz.shape[1], xyz.shape[2]) if transposed else \
        (xyz.shape[0], xyz.shape[1])
    dir_norm = jnp.linalg.norm(direction, axis=-1, keepdims=True)  # (N, 1)

    noise = None
    if rcfg.noise_std > 0 and not rcfg.test_time:
        noise = jax.random.normal(key, (n, s)) * rcfg.noise_std

    if rcfg.nerf_fused:
        assert nerf_cfg.encoding == "pe", \
            "hashgrid encoding has no fused-kernel path (factory.render_config " \
            "should have rejected mlp_impl=fused)"
        from ..ops.megakernel import nerf_fused_rays_t
        if weights_only or nerf_cfg.extra_feat_type == "none":
            extra = None
        elif nerf_cfg.extra_feat_type == "ind":
            extra = embed_padded(ind, statics.nerf_ind, nerf_cfg.extra_feat_dim)
        else:
            extra = embed_padded(direction, statics.nerf_dir,
                                 nerf_cfg.extra_feat_dim)
        xyz_t = xyz if transposed else jnp.moveaxis(xyz, -1, 0)
        out_t = nerf_fused_rays_t(params, nerf_cfg, statics.nerf_xyz.n_freqs,
                                  statics.nerf_xyz.logscale,
                                  anneal.get("nerf_xyz"), xyz_t, extra,
                                  sigma_only=weights_only,
                                  compute_dtype=rcfg.dtype)
        if weights_only:
            alphas, weights = composite(out_t[0], z_vals, dir_norm, noise,
                                        rcfg.activation)
            return None, None, weights, alphas
        return _composite_tail(out_t[0:3], out_t[3], z_vals, dir_norm,
                               noise, rcfg, background, transposed_rgb=True)

    flat = xyz.reshape(-1, 3)
    x_emb = encode_nerf_xyz(params, nerf_cfg, statics, flat, anneal)

    if weights_only:
        sigmas = _eval_nerf(params, nerf_cfg, x_emb, None, True, rcfg)
        sigmas = sigmas.reshape(n, s)
        alphas, weights = composite(sigmas, z_vals, dir_norm, noise,
                                    rcfg.activation)
        return None, None, weights, alphas

    if rcfg.mlp_impl == "pallas":
        extra = _extra_embedding(nerf_cfg, statics, ind, direction, n, s)
        out = _eval_nerf(params, nerf_cfg, x_emb, extra, False, rcfg)
    else:
        # per-ray extra: embedded at ray rank, broadcast after its matmul
        if nerf_cfg.extra_feat_type == "ind":
            extra = embed_padded(ind, statics.nerf_ind, nerf_cfg.extra_feat_dim)
        elif nerf_cfg.extra_feat_type == "dir":
            extra = embed_padded(direction, statics.nerf_dir,
                                 nerf_cfg.extra_feat_dim)
        else:
            extra = None
        fn = lambda p, x, e: nerf_apply_perray_extra(p, x, e, s, nerf_cfg,
                                                     rcfg.dtype)
        if rcfg.remat:
            fn = jax.checkpoint(fn)
        out = fn(params, x_emb, extra)
    out = out.reshape(n, s, 4)
    return _composite_tail(out[..., :3], out[..., 3], z_vals, dir_norm,
                           noise, rcfg, background)


# ---------------------------------------------------------------------------
# Full renderer
# ---------------------------------------------------------------------------

def _fused_test_pass(params: dict, nerf_key: str, statics: ModelStatics,
                     anneal: dict, rays_o, rays_d, img_ind, z_vals,
                     dir_norm, background, use_nof: bool, weights_only: bool,
                     rcfg: RenderConfig, deltas=None):
    """Test-time pass through the combined warp+NeRF megakernel: the
    (N, S, 3) sample/warp tensors never touch HBM (ops/megakernel.py)."""
    from ..ops.megakernel import render_pass_fused
    nerf_cfg = statics.coarse if nerf_key == "coarse_NeRF" else (
        statics.fine or statics.coarse)
    if weights_only or nerf_cfg.extra_feat_type == "none":
        extra = None
    elif nerf_cfg.extra_feat_type == "ind":
        extra = embed_padded(img_ind, statics.nerf_ind,
                             nerf_cfg.extra_feat_dim)
    else:
        extra = embed_padded(rays_d, statics.nerf_dir,
                             nerf_cfg.extra_feat_dim)
    ind_emb = None
    nof_cfg = statics.nof
    if use_nof:
        ind_emb = embed_padded(img_ind, statics.nof_ind,
                               nof_cfg.extra_feat_dim)
    sigmas, rgbs = render_pass_fused(
        params, nerf_key, nerf_cfg, nof_cfg,
        statics.nerf_xyz.n_freqs,
        statics.nof_xyz.n_freqs if statics.nof_xyz else 0,
        statics.nerf_xyz.logscale,
        statics.nof_xyz.logscale if statics.nof_xyz else True,
        anneal.get("nerf_xyz"), anneal.get("nof_xyz"),
        rays_o, rays_d, z_vals, extra, ind_emb,
        use_nof=use_nof, sigma_only=weights_only,
        compute_dtype=rcfg.dtype)
    if weights_only:
        alphas, weights = composite(sigmas, z_vals, dir_norm, None,
                                    rcfg.activation, deltas=deltas)
        return None, None, weights, alphas
    return _composite_tail(rgbs, sigmas, z_vals, dir_norm, None, rcfg,
                           background, deltas=deltas, transposed_rgb=True)


def _consensus(disp_src: jnp.ndarray, disp_rec: jnp.ndarray,
               alphas: jnp.ndarray, xyz_axis: int = -1) -> jnp.ndarray:
    """Masked-mean consensus disparity scalar (ref models/rendering.py:304-314:
    per-sample mean |src - recon| over xyz, masked by alpha>=0.01, then meaned
    by the trainer). ``xyz_axis``: -1 for (N, S, 3) tensors, 0 for the fused
    path's transposed (3, N, S) layout."""
    per_sample = jnp.mean(jnp.abs(disp_src - disp_rec), axis=xyz_axis)
    return masked_mean(per_sample, alphas >= 0.01)


def _consensus_parts(parts, xyz_axis: int = -1) -> jnp.ndarray:
    """:func:`_consensus` over the concatenation of ``parts`` (each
    ``(disp_src, disp_rec, alphas)``) WITHOUT concatenating: masked means
    decompose into summed numerators/denominators, so the fine pass's
    consensus can run on its coarse-subset and new-sample halves in concat
    order — no sorted (N, S, 3) payloads needed (see merge_cano_by_z).
    ``xyz_axis`` as in :func:`_consensus`."""
    num = den = tot = 0.0
    cnt = 0
    for src, rec, alphas in parts:
        per = jnp.mean(jnp.abs(src - rec), axis=xyz_axis)
        m = (alphas >= 0.01).astype(per.dtype)
        num = num + jnp.sum(per * m)
        den = den + jnp.sum(m)
        tot = tot + jnp.sum(per)
        cnt += per.size
    # masked_mean's empty-mask fallback (plain mean), decomposed
    return jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), tot / cnt)


def render_rays(params: dict, statics: ModelStatics, anneal: dict,
                rays: jnp.ndarray, background: jnp.ndarray | None,
                key: jax.Array, rcfg: RenderConfig) -> dict:
    """Render a megabatch of rays.

    Args:
      params: ``{'coarse_NeRF', 'fine_NeRF'?, 'bw_NoF'?, 'fw_NoF'?}``.
      statics: static model configs.
      anneal: ``{'nerf_xyz': (K,)|None, 'nof_xyz': (K,)|None}`` PE annealing
        weight arrays (dynamic — no recompile as they change).
      rays: ``(N, >=9)`` packed ``[o(3), d(3), near, far, ind, chained_ind?]``
        (ref ray layout, models/rendering.py:236-242 — 10-wide with the
        chain-global index, trainer_moco_flow.py:308-312).
      background: ``(N, 3)`` per-ray background or None.
      key: PRNG key.
      rcfg: static render options.

    Returns a dict of per-ray arrays ('rgb_coarse', 'depth_coarse',
    'opacity_coarse', 'rgb_fine', ...) and masked-mean consensus scalars
    ('nof_local_disp_coarse', 'nof_global_disp_coarse', ..._fine).
    """
    k_perturb, k_noise_c, k_pdf, k_noise_f = jax.random.split(key, 4)
    rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
    near, far = rays[:, 6:7], rays[:, 7:8]
    img_ind = rays[:, 8:9]
    if rcfg.use_nof and rcfg.chain_global:
        # guard against a silent (N, 0) slice when a caller passes 9-wide
        # frame rays with chain_global on (the chained index is column 9)
        assert rays.shape[-1] >= 10, (
            f"chain_global needs 10-wide rays (got {rays.shape[-1]}): "
            "append the chained-frame index column")
        chained_ind = rays[:, 9:10]
    else:
        chained_ind = None

    z_vals = stratified_zvals(k_perturb, near, far, rcfg.n_samples,
                              rcfg.use_disp, rcfg.perturb)

    result: dict = {}
    use_nof = rcfg.use_nof and statics.nof is not None

    # test time + fused: the whole warp+NeRF pass runs in ONE megakernel
    # from (o, d, z) — the (N, S, 3) sample/warp tensors never exist in HBM
    fused_tt = rcfg.test_time and rcfg.mlp_impl == "fused"
    if fused_tt:
        dir_norm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        coarse_weights_only = rcfg.n_importance > 0
        # opt-in coarse probe (PARITY.md): evaluate the sigma-only coarse
        # pass on a strided subset of the stratified depths — its only
        # test-time consumers are the importance pdf and the skip scores,
        # so a P-bin histogram suffices; the fine pass still evaluates the
        # full stratified + importance sample set
        probe = (rcfg.coarse_probe
                 if coarse_weights_only and rcfg.coarse_probe else 0)
        if probe and (probe > rcfg.n_samples
                      or rcfg.n_samples % probe != 0):
            raise ValueError(
                f"coarse_probe={probe} must divide n_samples="
                f"{rcfg.n_samples} (and be <= it)")
        z_c = z_vals[:, ::rcfg.n_samples // probe] if probe else z_vals
        rgb_c, depth_c, weights_c, _ = _fused_test_pass(
            params, "coarse_NeRF", statics, anneal, rays_o, rays_d, img_ind,
            z_c, dir_norm, background, use_nof, coarse_weights_only, rcfg)
        result["opacity_coarse"] = jnp.sum(weights_c, axis=1)
        if not coarse_weights_only:
            result["rgb_coarse"] = rgb_c
            result["depth_coarse"] = depth_c
        if rcfg.n_importance > 0:
            z_mid = 0.5 * (z_c[:, :-1] + z_c[:, 1:])
            z_fine = sample_pdf(k_pdf, z_mid, weights_c[:, 1:-1],
                                rcfg.n_importance, det=(rcfg.perturb == 0))
            z_all = jnp.sort(jnp.concatenate([z_vals, z_fine], axis=-1),
                             axis=-1)
            deltas = None
            if rcfg.fine_budget:
                z_all, deltas = compact_fine_samples(
                    z_all, z_mid, weights_c[:, 1:-1], rcfg.fine_budget)
            rgb_f, depth_f, weights_f, _ = _fused_test_pass(
                params, "fine_NeRF", statics, anneal, rays_o, rays_d,
                img_ind, z_all, dir_norm, background, use_nof, False, rcfg,
                deltas=deltas)
            result["rgb_fine"] = rgb_f
            result["depth_fine"] = depth_f
            result["opacity_fine"] = jnp.sum(weights_f, axis=1)
        return result

    # TRANSPOSED tensor flow: with the fully fused kernels, xyz / warp /
    # rgb tensors live as (3, N, S) (components on sublanes) from sampling
    # through warping, merging and NeRF eval — the row-major (N, S, 3)
    # layout lane-pads 3 -> 128 on TPU, taxing every HBM touch and
    # elementwise op on the way (PERF.md round 3: ~7 ms of relayout glue
    # plus ~2 GB/step of 42x-padded kernel DMA at the bench shape)
    t_mode = use_nof and rcfg.nof_fused and rcfg.nerf_fused
    xyz_axis = 0 if t_mode else -1
    if t_mode:
        o_t, d_t = rays_o.T, rays_d.T                        # (3, N)
        xyz_coarse = o_t[:, :, None] + d_t[:, :, None] * z_vals[None]
    else:
        xyz_coarse = (rays_o[:, None, :]
                      + rays_d[:, None, :] * z_vals[..., None])

    def warp_stack(xyz_sampled):
        """bw warp (+ local/global chains) for one sample set
        (ref models/rendering.py:270-282,335-344). Layout follows
        ``t_mode``: (3, N, S) tensors in and out when transposed."""
        out = {}
        if (rcfg.nof_fused and not rcfg.test_time
                and (rcfg.chain_local or rcfg.chain_global)):
            # whole chain (up to 5 NoF evals) in ONE kernel: intermediates
            # stay in VMEM instead of 4 lane-padded HBM round trips
            from ..ops.megakernel import nof_chain_rays, nof_chain_rays_t
            cfg = statics.nof
            ind_emb = embed_padded(img_ind, statics.nof_ind,
                                   cfg.extra_feat_dim)
            ch_emb = (embed_padded(chained_ind, statics.nof_ind,
                                   cfg.extra_feat_dim)
                      if rcfg.chain_global else None)
            chain_fn = nof_chain_rays_t if t_mode else nof_chain_rays
            cano, recon, chain_recon = chain_fn(
                params, cfg, statics.nof_xyz.n_freqs,
                statics.nof_xyz.logscale, anneal.get("nof_xyz"),
                xyz_sampled, ind_emb, ch_emb, rcfg.chain_local,
                rcfg.chain_global, compute_dtype=rcfg.dtype)
            out["cano"] = cano
            if recon is not None:
                out["recon"] = recon
            if chain_recon is not None:
                out["chain_recon"] = chain_recon
            return out
        xyz_rm = jnp.moveaxis(xyz_sampled, 0, -1) if t_mode else xyz_sampled
        cano = nof_warp(params["bw_NoF"], statics, anneal, xyz_rm,
                        img_ind, rcfg)
        out["cano"] = cano
        if rcfg.chain_local and not rcfg.test_time:
            out["recon"] = nof_warp(params["fw_NoF"], statics, anneal, cano,
                                    img_ind, rcfg)
        if rcfg.chain_global and not rcfg.test_time:
            chained = nof_warp(params["fw_NoF"], statics, anneal, cano,
                               chained_ind, rcfg)
            chained_cano = nof_warp(params["bw_NoF"], statics, anneal, chained,
                                    chained_ind, rcfg)
            out["chain_recon"] = nof_warp(params["fw_NoF"], statics, anneal,
                                          chained_cano, img_ind, rcfg)
        if t_mode:
            out = {k: jnp.moveaxis(v, -1, 0) for k, v in out.items()}
        return out

    if use_nof:
        warped_c = warp_stack(xyz_coarse)
        coarse_input = warped_c["cano"]
    else:
        coarse_input = xyz_coarse

    # coarse pass: sigma-only at test time when a fine pass follows
    # (ref models/rendering.py:290-302)
    coarse_weights_only = rcfg.n_importance > 0 and rcfg.test_time
    rgb_c, depth_c, weights_c, alphas_c = nerf_inference(
        params["coarse_NeRF"], statics.coarse, statics, anneal, coarse_input,
        img_ind, rays_d, z_vals, k_noise_c, rcfg, background=background,
        weights_only=coarse_weights_only, transposed=t_mode)
    result["opacity_coarse"] = jnp.sum(weights_c, axis=1)
    if not coarse_weights_only:
        result["rgb_coarse"] = rgb_c
        result["depth_coarse"] = depth_c

    if use_nof and not rcfg.test_time:
        if rcfg.chain_local:
            result["nof_local_disp_coarse"] = _consensus(
                xyz_coarse, warped_c["recon"], alphas_c, xyz_axis=xyz_axis)
        if rcfg.chain_global:
            result["nof_global_disp_coarse"] = _consensus(
                xyz_coarse, warped_c["chain_recon"], alphas_c,
                xyz_axis=xyz_axis)

    if rcfg.n_importance > 0:
        z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
        z_fine = sample_pdf(k_pdf, z_mid, weights_c[:, 1:-1],
                            rcfg.n_importance, det=(rcfg.perturb == 0))
        z_fine = jax.lax.stop_gradient(z_fine)
        if use_nof and rcfg.share_coarse_warps:
            # the fine set is the union of the coarse depths and the new
            # importance depths, and the NoF warp chain is the same
            # networks for both passes: warp only the NEW samples and
            # depth-merge with the coarse pass's warps (exact — identical
            # values; gradients of duplicated points sum through the
            # shared eval). Halves the fine warp-chain kernels, the
            # largest train-step cost (PERF.md round-3 profile). The
            # reference re-warps the whole union
            # (models/rendering.py:316-330).
            if t_mode:
                xyz_new = o_t[:, :, None] + d_t[:, :, None] * z_fine[None]
            else:
                xyz_new = (rays_o[:, None, :]
                           + rays_d[:, None, :] * z_fine[..., None])
            warped_new = warp_stack(xyz_new)
            # sort ONLY cano (the fine NeRF input); recon/chain_recon feed
            # order-free consensus means, computed on the concat halves
            # below with inverse-permuted alphas (_consensus_parts)
            merge = merge_cano_by_z_t if t_mode else merge_cano_by_z
            z_all, fine_input, fine_pos = merge(
                z_vals, z_fine, warped_c["cano"], warped_new["cano"])
            xyz_fine = None  # consensus uses the per-half sample positions
        else:
            z_all = jnp.sort(jnp.concatenate([z_vals, z_fine], axis=-1),
                             axis=-1)
            if t_mode:
                xyz_fine = o_t[:, :, None] + d_t[:, :, None] * z_all[None]
            else:
                xyz_fine = (rays_o[:, None, :]
                            + rays_d[:, None, :] * z_all[..., None])
            if use_nof:
                warped_f = warp_stack(xyz_fine)
                fine_input = warped_f["cano"]
            else:
                fine_input = xyz_fine

        rgb_f, depth_f, weights_f, alphas_f = nerf_inference(
            params["fine_NeRF"], statics.fine or statics.coarse, statics,
            anneal, fine_input, img_ind, rays_d, z_all, k_noise_f, rcfg,
            background=background, weights_only=False, transposed=t_mode)
        result["rgb_fine"] = rgb_f
        result["depth_fine"] = depth_f
        result["opacity_fine"] = jnp.sum(weights_f, axis=1)

        if use_nof and not rcfg.test_time:
            if rcfg.share_coarse_warps:
                # alphas back to concat order (one cheap (N, S) sort);
                # consensus over the coarse-subset + new-sample halves is
                # exactly the consensus over the sorted union
                alphas_cat = unsort_by_pos(fine_pos, alphas_f)
                a_c = alphas_cat[:, :rcfg.n_samples]
                a_n = alphas_cat[:, rcfg.n_samples:]
                if rcfg.chain_local:
                    result["nof_local_disp_fine"] = _consensus_parts([
                        (xyz_coarse, warped_c["recon"], a_c),
                        (xyz_new, warped_new["recon"], a_n)],
                        xyz_axis=xyz_axis)
                if rcfg.chain_global:
                    result["nof_global_disp_fine"] = _consensus_parts([
                        (xyz_coarse, warped_c["chain_recon"], a_c),
                        (xyz_new, warped_new["chain_recon"], a_n)],
                        xyz_axis=xyz_axis)
            else:
                if rcfg.chain_local:
                    result["nof_local_disp_fine"] = _consensus(
                        xyz_fine, warped_f["recon"], alphas_f,
                        xyz_axis=xyz_axis)
                if rcfg.chain_global:
                    result["nof_global_disp_fine"] = _consensus(
                        xyz_fine, warped_f["chain_recon"], alphas_f,
                        xyz_axis=xyz_axis)

    return result
