"""Multiresolution hash-grid encoding (instant-ngp style) for the NeRF xyz.

The BASELINE.json stretch config swaps the sinusoidal PE (reference
models/embedding.py:4-47) for a trainable multiresolution hash encoding
[Mueller et al. 2022] paired with a tiny MLP: the (63 -> 8x256) PE+trunk
stack — the FLOP floor of the whole trainer (PERF.md) — becomes an
(L*F -> 2x64) network whose cost is dominated by table lookups instead of
matmuls.

TPU-native design notes:
  - The per-level tables are ONE stacked ``(L, T, F)`` array so every level
    is the same static shape (jit-friendly); per-level resolutions are
    host-computed constants baked into the trace.
  - Lookups are plain XLA gathers (``jnp.take``). Pallas/Mosaic has no
    per-lane vector gather, so a hand-written kernel cannot beat XLA here;
    the tables are small enough (L*2^log2_T*F floats, ~4 MB at defaults)
    that XLA keeps them HBM-resident with decent gather throughput, and the
    gather's transpose (scatter-add into the table gradient) is generated
    automatically.
  - Trilinear weights are computed in f32 (8 corners, VPU elementwise);
    gathered features interpolate in f32 and cast to the compute dtype at
    the end, matching the bf16 policy boundary of nn/mlp.py.

The encoding is selected per-NeRF via ``encoding: hashgrid`` in the model
YAML block (see NeRFConfig.from_dict) and replaces ``embed_padded`` on the
xyz path only — frame-index / view-dir embeddings are unchanged.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

# the classic spatial-hash primes (Teschner et al. 2003; instant-ngp uses
# the same pair with pi_1 = 1)
_PRIMES = (1, 2654435761, 805459861)


@dataclasses.dataclass(frozen=True)
class HashGridConfig:
    """Static hash-encoding config (hashable: safe as a jit static arg)."""
    n_levels: int = 8
    n_features: int = 2          # features per level
    log2_table_size: int = 16    # T = 2^this, per level
    base_res: int = 16
    max_res: int = 256
    extent: float = 1.5          # world AABB [-extent, extent]^3

    @classmethod
    def from_dict(cls, d: dict | None) -> "HashGridConfig":
        d = d or {}
        return cls(
            n_levels=int(d.get("n_levels", 8)),
            n_features=int(d.get("n_features", 2)),
            log2_table_size=int(d.get("log2_table_size", 16)),
            base_res=int(d.get("base_res", 16)),
            max_res=int(d.get("max_res", 256)),
            extent=float(d.get("extent", 1.5)),
        )

    @property
    def table_size(self) -> int:
        return 1 << self.log2_table_size

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features

    def level_resolutions(self) -> np.ndarray:
        """Per-level grid resolutions, geometric from base_res to max_res
        (instant-ngp eq. 2-3)."""
        if self.n_levels == 1:
            return np.array([self.base_res], dtype=np.int64)
        b = np.exp((np.log(self.max_res) - np.log(self.base_res))
                   / (self.n_levels - 1))
        return np.floor(self.base_res * b ** np.arange(self.n_levels)
                        ).astype(np.int64)


def init_hashgrid(key: jax.Array, cfg: HashGridConfig) -> jnp.ndarray:
    """(L, T, F) table, U(-1e-4, 1e-4) per instant-ngp's init."""
    return jax.random.uniform(
        key, (cfg.n_levels, cfg.table_size, cfg.n_features),
        minval=-1e-4, maxval=1e-4, dtype=jnp.float32)


def _corner_indices(i0: jnp.ndarray, res: int, table_size: int) -> jnp.ndarray:
    """Table indices for the 8 cell corners of integer coords ``i0``.

    i0: (B, 3) int32 lattice coords of the cell's min corner (already
    clipped to [0, res-1]). Returns (B, 8) int32 indices into the level's
    table. Dense (collision-free) linear indexing when the level's lattice
    fits in the table, spatial hashing otherwise — same rule as
    instant-ngp's grid_resolution check.
    """
    offs = np.array([[x, y, z] for x in (0, 1) for y in (0, 1)
                     for z in (0, 1)], dtype=np.int32)  # (8, 3)
    c = i0[:, None, :] + offs[None]                     # (B, 8, 3)
    n_verts = res + 1
    if n_verts ** 3 <= table_size:
        idx = (c[..., 0] * n_verts + c[..., 1]) * n_verts + c[..., 2]
    else:
        # xor-hash of the scaled coords, masked to the table size (power of
        # 2); uint32 arithmetic for the defined mod-2^32 wraparound
        cu = c.astype(jnp.uint32)
        h = cu[..., 0] * jnp.uint32(_PRIMES[0])
        h = h ^ (cu[..., 1] * jnp.uint32(_PRIMES[1]))
        h = h ^ (cu[..., 2] * jnp.uint32(_PRIMES[2]))
        idx = (h & jnp.uint32(table_size - 1)).astype(jnp.int32)
    return idx


def hashgrid_encode(table: jnp.ndarray, x: jnp.ndarray,
                    cfg: HashGridConfig,
                    compute_dtype=None) -> jnp.ndarray:
    """Encode positions through every level: (B, 3) -> (B, L*F).

    ``x`` in world coords; positions outside the [-extent, extent] AABB
    clamp to the boundary cell (consistent with the renderer's bounded
    sampling interval).
    """
    b_sz = x.shape[0]
    x01 = jnp.clip((x.astype(jnp.float32) / cfg.extent) * 0.5 + 0.5, 0.0, 1.0)
    feats = []
    for lvl, res in enumerate(cfg.level_resolutions()):
        res = int(res)
        pos = x01 * res
        i0 = jnp.clip(pos.astype(jnp.int32), 0, res - 1)     # (B, 3)
        frac = pos - i0.astype(jnp.float32)                  # (B, 3) in [0,1]
        idx = _corner_indices(i0, res, cfg.table_size)       # (B, 8)
        corner = jnp.take(table[lvl], idx.reshape(-1), axis=0,
                          indices_are_sorted=False, unique_indices=False)
        corner = corner.reshape(b_sz, 8, cfg.n_features)     # (B, 8, F)
        # trilerp weights in the same (x,y,z)-major corner order as offs
        wx = jnp.stack([1.0 - frac[:, 0], frac[:, 0]], axis=1)  # (B, 2)
        wy = jnp.stack([1.0 - frac[:, 1], frac[:, 1]], axis=1)
        wz = jnp.stack([1.0 - frac[:, 2], frac[:, 2]], axis=1)
        w = (wx[:, :, None, None] * wy[:, None, :, None]
             * wz[:, None, None, :]).reshape(b_sz, 8)        # (B, 8)
        feats.append(jnp.sum(w[..., None] * corner, axis=1))  # (B, F)
    out = jnp.concatenate(feats, axis=-1)
    if compute_dtype is not None:
        out = out.astype(compute_dtype)
    return out
