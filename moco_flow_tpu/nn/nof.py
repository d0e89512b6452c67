"""Neural motion Flow (NoF) MLP as pure functions over a parameter pytree.

Same capability as the reference (models/nof.py:6-85): a D=4, W=128 MLP over
positional-encoded xyz concatenated with an embedded (normalized) frame index,
with a skip connection, predicting either a direct 3-D offset or a rigid-ish
transform head — 3 log-quaternion rotation coords, a 3-D pivot ``s`` and a 3-D
translation ``t`` applied as ``(x - s) @ R + s + t``
(reference models/nof.py:75-82; the reference's row-vector ``bmm`` multiplies
by R on the right, which we match).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .mlp import init_linear, linear, linear_relu
from .quaternion import log_quaternion_to_rotation_matrix


@dataclasses.dataclass(frozen=True)
class NoFConfig:
    depth: int = 4
    width: int = 128
    in_channels_xyz: int = 33
    skips: tuple = (2,)
    extra_feat_type: str = "ind"
    extra_feat_dim: int = 33
    use_quat: bool = True

    @property
    def in_dim(self) -> int:
        return self.in_channels_xyz + self.extra_feat_dim

    @classmethod
    def from_dict(cls, d: dict) -> "NoFConfig":
        return cls(
            depth=d.get("D", 4),
            width=d.get("W", 128),
            in_channels_xyz=d.get("in_channels_xyz", 33),
            skips=tuple(d.get("skips", (2,))),
            extra_feat_type=d.get("extra_feat_type", "ind"),
            extra_feat_dim=d.get("extra_feat_dim", 33),
            use_quat=d.get("use_quat", True),
        )


def init_nof(key: jax.Array, cfg: NoFConfig) -> dict:
    if cfg.extra_feat_type != "ind":
        raise ValueError(f"extra_feat_type {cfg.extra_feat_type} not supported")
    keys = jax.random.split(key, cfg.depth + 1)
    layers = []
    for i in range(cfg.depth):
        in_dim = cfg.in_dim if i == 0 else cfg.width
        if i in cfg.skips:
            in_dim = cfg.width + cfg.in_dim
        layers.append(init_linear(keys[i], in_dim, cfg.width))
    head_out = 9 if cfg.use_quat else 3
    return {"layers": layers, "head": init_linear(keys[cfg.depth], cfg.width, head_out)}


def _head(params: dict, h: jnp.ndarray, xyz: jnp.ndarray, cfg: NoFConfig,
          compute_dtype=None) -> jnp.ndarray:
    out = linear(params["head"], h, compute_dtype)
    if cfg.use_quat:
        v, s, t = out[..., 0:3], out[..., 3:6], out[..., 6:9]
        r = log_quaternion_to_rotation_matrix(v)
        # row-vector convention: (x - s) @ R + s + t  (ref models/nof.py:80)
        rotated = jnp.einsum("...i,...ij->...j", xyz - s, r)
        return rotated + s + t
    return out + xyz


def nof_apply_split(params: dict, xyz_emb: jnp.ndarray, ind_emb: jnp.ndarray,
                    n_samples: int, xyz: jnp.ndarray, cfg: NoFConfig,
                    compute_dtype=None) -> jnp.ndarray:
    """Sample-rank/ray-rank split forward: numerically identical to
    ``nof_apply`` on ``concat([xyz_emb, broadcast(ind_emb)], -1)`` but the
    per-ray frame-index embedding is multiplied by its weight rows at ray
    rank (N) and broadcast *after* the matmul — the (N*S, extra_dim) index
    tensor is never materialized and concat relayouts disappear.

    Args:
      xyz_emb: (N*S, in_channels_xyz) per-sample position embedding.
      ind_emb: (N, extra_feat_dim) per-ray index embedding.
      xyz: (N*S, 3) raw positions for the transform head.
    """
    cx, ce, wdt = cfg.in_channels_xyz, cfg.extra_feat_dim, cfg.width
    n = ind_emb.shape[0]

    def bcast(per_ray):
        return jnp.broadcast_to(per_ray[:, None, :],
                                (n, n_samples, per_ray.shape[-1])
                                ).reshape(-1, per_ray.shape[-1])

    def dotp(x, w):
        if compute_dtype is not None:
            x = x.astype(compute_dtype)
            w = w.astype(compute_dtype)
        return jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=compute_dtype or jnp.float32)

    h = None
    for i in range(cfg.depth):
        w, b = params["layers"][i]["w"], params["layers"][i]["b"]
        if compute_dtype is not None:
            b = b.astype(compute_dtype)
        if i == 0:
            h = jax.nn.relu(dotp(xyz_emb, w[:cx]) +
                            bcast(dotp(ind_emb, w[cx:])) + b)
        elif i in cfg.skips:
            h = jax.nn.relu(dotp(xyz_emb, w[:cx]) +
                            bcast(dotp(ind_emb, w[cx:cx + ce])) +
                            dotp(h, w[cx + ce:]) + b)
        else:
            h = jax.nn.relu(dotp(h, w) + b)
    return _head(params, h, xyz, cfg, compute_dtype)


def nof_apply(params: dict, inputs: jnp.ndarray, xyz: jnp.ndarray,
              cfg: NoFConfig, compute_dtype=None) -> jnp.ndarray:
    """(B, in_channels_xyz + extra_feat_dim), (B, 3) -> warped (B, 3)."""
    h = inputs
    for i in range(cfg.depth):
        if i in cfg.skips:
            h = jnp.concatenate([inputs, h], axis=-1)
        h = linear_relu(params["layers"][i], h, compute_dtype)
    return _head(params, h, xyz, cfg, compute_dtype)
