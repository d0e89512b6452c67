"""Canonical NeRF MLP as pure functions over a parameter pytree.

Same architecture as the reference (models/nerf.py:5-102): a D=8, W=256 density
trunk over zero-padded positional-encoded xyz with a skip connection, a sigma
head, and an rgb branch conditioned on an extra feature (view direction, frame
index embedding, or nothing).

TPU-native notes:
  - A pure ``apply`` over a ``(B, C)`` megabatch — callers flatten
    (rays x samples) so every layer is one large MXU matmul.
  - The rgb-branch / sigma-branch split is explicit in the param tree
    (``trunk``/``sigma`` vs ``final``/``extra``/``rgb``), which makes the
    reference's cross-stage "load sigma branch only" surgery
    (trainer/trainer_moco_flow.py:54-62) a trivial subtree copy.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .hashgrid import HashGridConfig, init_hashgrid
from .mlp import init_linear, linear, linear_relu


@dataclasses.dataclass(frozen=True)
class NeRFConfig:
    """Static architecture config (hashable: safe as a jit static arg)."""
    depth: int = 8
    width: int = 256
    in_channels_xyz: int = 63
    skips: tuple = (4,)
    extra_feat_type: str = "none"  # none | ind | dir  (latent_code: unsupported, as in ref)
    extra_feat_dim: int = 0
    # xyz encoding: 'pe' = the reference's sinusoidal PE (embedded outside
    # the net, models/embedding.py); 'hashgrid' = trainable multiresolution
    # hash encoding (nn/hashgrid.py, the BASELINE.json configs[4] stretch),
    # whose table lives in the param pytree under 'hash' and whose features
    # replace the PE tensor — pair it with a tiny trunk (D: 2, W: 64).
    encoding: str = "pe"
    hash: HashGridConfig | None = None

    @classmethod
    def from_dict(cls, d: dict) -> "NeRFConfig":
        encoding = d.get("encoding", "pe")
        hash_cfg = None
        in_xyz = d.get("in_channels_xyz", 63)
        if encoding == "hashgrid":
            hash_cfg = HashGridConfig.from_dict(d.get("hash"))
            in_xyz = hash_cfg.out_dim  # MLP input width = L*F features
        elif encoding != "pe":
            raise ValueError(f"unknown NeRF encoding '{encoding}' "
                             f"(expected 'pe' or 'hashgrid')")
        return cls(
            depth=d.get("D", 8),
            width=d.get("W", 256),
            in_channels_xyz=in_xyz,
            skips=tuple(d.get("skips", (4,))),
            extra_feat_type=d.get("extra_feat_type", "none"),
            extra_feat_dim=d.get("extra_feat_dim", 0),
            encoding=encoding,
            hash=hash_cfg,
        )


def init_nerf(key: jax.Array, cfg: NeRFConfig) -> dict:
    """Parameter pytree for the NeRF MLP."""
    if cfg.extra_feat_type not in ("none", "ind", "dir"):
        raise ValueError(f"extra_feat_type {cfg.extra_feat_type} not supported")
    # depth+4 keys exactly as the PE-only model always drew — the hash
    # table (when present) folds its own key so enabling/disabling the
    # hash-grid never perturbs seeded PE initializations
    keys = jax.random.split(key, cfg.depth + 4)
    trunk = []
    for i in range(cfg.depth):
        in_dim = cfg.in_channels_xyz if i == 0 else cfg.width
        if i in cfg.skips:
            in_dim = cfg.width + cfg.in_channels_xyz
        trunk.append(init_linear(keys[i], in_dim, cfg.width))
    extra_in = cfg.width + (cfg.extra_feat_dim if cfg.extra_feat_type != "none" else 0)
    params = {
        "trunk": trunk,
        "sigma": init_linear(keys[cfg.depth], cfg.width, 1),
        "final": init_linear(keys[cfg.depth + 1], cfg.width, cfg.width),
        "extra": init_linear(keys[cfg.depth + 2], extra_in, cfg.width // 2),
        "rgb": init_linear(keys[cfg.depth + 3], cfg.width // 2, 3),
    }
    if cfg.encoding == "hashgrid":
        params["hash"] = init_hashgrid(jax.random.fold_in(key, 0x4a5), cfg.hash)
    return params


def sigma_branch_params(params: dict) -> dict:
    """The subtree transferred between stages ('xyz'/'sigma' keys in the
    reference filter, trainer_moco_flow.py:54-57: trunk, sigma head, and
    xyz_encoding_final — the rgb/extra branch is re-initialized). The hash
    table (when present) carries the density field and transfers with it."""
    out = {"trunk": params["trunk"], "sigma": params["sigma"],
           "final": params["final"]}
    if "hash" in params:
        out["hash"] = params["hash"]
    return out


def nerf_trunk(params: dict, x_emb: jnp.ndarray, cfg: NeRFConfig,
               compute_dtype=None) -> jnp.ndarray:
    if compute_dtype is not None:
        x_emb = x_emb.astype(compute_dtype)  # one cast; skip concat stays low-p
    h = x_emb
    for i in range(cfg.depth):
        if i in cfg.skips:
            h = jnp.concatenate([x_emb, h], axis=-1)
        h = linear_relu(params["trunk"][i], h, compute_dtype)
    return h


def nerf_sigma(params: dict, x_emb: jnp.ndarray, cfg: NeRFConfig,
               compute_dtype=None) -> jnp.ndarray:
    """Density-only path (``sigma_only=True`` in the reference), (B, 1)."""
    h = nerf_trunk(params, x_emb, cfg, compute_dtype)
    return linear(params["sigma"], h, compute_dtype)


def nerf_apply_perray_extra(params: dict, x_emb: jnp.ndarray,
                            extra_emb: jnp.ndarray | None, n_samples: int,
                            cfg: NeRFConfig, compute_dtype=None) -> jnp.ndarray:
    """Like :func:`nerf_apply`, but the extra feature (view-dir or frame-index
    embedding) stays at *ray* rank (N, E): its weight rows are applied per ray
    and the result broadcast across samples — the (N*S, E) tensor is never
    materialized (the reference repeat_interleaves it,
    models/rendering.py:134-142)."""
    h = nerf_trunk(params, x_emb, cfg, compute_dtype)
    sigma = linear(params["sigma"], h, compute_dtype)
    hf = linear(params["final"], h, compute_dtype,
                out_dtype=compute_dtype)  # intermediate: stays low-precision
    we, be = params["extra"]["w"], params["extra"]["b"]
    if cfg.extra_feat_type != "none":
        assert extra_emb is not None
        w_f, w_e = we[:cfg.width], we[cfg.width:]
        per_ray = linear({"w": w_e, "b": jnp.zeros_like(be)}, extra_emb,
                         compute_dtype, out_dtype=compute_dtype)  # (N, W/2)
        n = extra_emb.shape[0]
        bcast = jnp.broadcast_to(per_ray[:, None, :],
                                 (n, n_samples, per_ray.shape[-1])
                                 ).reshape(-1, per_ray.shape[-1])
        he = jax.nn.relu(
            linear({"w": w_f, "b": be}, hf, compute_dtype,
                   out_dtype=compute_dtype) + bcast)
    else:
        he = jax.nn.relu(linear(params["extra"], hf, compute_dtype))
    rgb = jax.nn.sigmoid(linear(params["rgb"], he, compute_dtype))
    return jnp.concatenate([rgb, sigma], axis=-1)


def nerf_apply(params: dict, x_emb: jnp.ndarray, extra_emb: jnp.ndarray | None,
               cfg: NeRFConfig, compute_dtype=None) -> jnp.ndarray:
    """Full forward: (B, in_channels_xyz) [+ (B, extra_feat_dim)] -> (B, 4) rgb+sigma.

    ``x_emb`` must already be zero-padded to ``cfg.in_channels_xyz`` (the
    annealed PE may be narrower; padding keeps shapes static — reference
    models/rendering.py:127-129).
    """
    h = nerf_trunk(params, x_emb, cfg, compute_dtype)
    sigma = linear(params["sigma"], h, compute_dtype)
    hf = linear(params["final"], h, compute_dtype)
    if cfg.extra_feat_type != "none":
        assert extra_emb is not None
        hf = jnp.concatenate([hf, extra_emb.astype(hf.dtype)], axis=-1)
    he = jax.nn.relu(linear(params["extra"], hf, compute_dtype))
    rgb = jax.nn.sigmoid(linear(params["rgb"], he, compute_dtype))
    return jnp.concatenate([rgb, sigma], axis=-1)
