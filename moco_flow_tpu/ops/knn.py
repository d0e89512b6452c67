"""Brute-force nearest-neighbor search as MXU matmuls.

TPU-native replacement for the reference's KNN_CUDA wheel
(datasets/moco_flow_dataset.py:13,35,120-121: k=1 nearest SMPL vertex for each
query point). At SMPL scale (6890 reference points) exact brute force *is* the
speed-of-light algorithm on TPU: the (Q, 3) x (3, V) distance expansion is one
matmul and the reduction fuses into it.

Queries are processed in fixed-size chunks via ``lax.map`` so the (chunk, V)
distance tile stays small enough for VMEM/HBM no matter how large Q is
(stage 2 uses Q = 200k, datasets' N_sampled=100000 x 2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _chunk_nn(refs: jnp.ndarray, ref_sq: jnp.ndarray, queries: jnp.ndarray):
    """(C, 3) queries vs (V, 3) refs -> (dist, idx) each (C,)."""
    # |q - v|^2 = |q|^2 - 2 q.v + |v|^2 ; |q|^2 is constant per row for argmin
    dots = jax.lax.dot_general(
        queries, refs,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (C, V)
    d2 = ref_sq[None, :] - 2.0 * dots
    idx = jnp.argmin(d2, axis=-1)
    best = jnp.take_along_axis(d2, idx[:, None], axis=-1)[:, 0]
    q_sq = jnp.sum(queries * queries, axis=-1)
    dist = jnp.sqrt(jnp.maximum(best + q_sq, 0.0))
    return dist, idx


@functools.partial(jax.jit, static_argnames=("chunk",))
def nearest_neighbor(refs: jnp.ndarray, queries: jnp.ndarray,
                     chunk: int = 8192):
    """k=1 nearest neighbor.

    Args:
      refs: (V, 3) reference points (e.g. posed SMPL vertices).
      queries: (Q, 3) query points; Q is padded internally to a chunk multiple.
      chunk: queries per tile (static).

    Returns:
      (dist, idx): each (Q,) — Euclidean distance to and index of the nearest
      reference point.
    """
    q = queries.shape[0]
    ref_sq = jnp.sum(refs * refs, axis=-1)
    pad = (-q) % chunk
    padded = jnp.concatenate(
        [queries, jnp.zeros((pad, 3), queries.dtype)], axis=0) if pad else queries
    tiles = padded.reshape(-1, chunk, 3)
    dist, idx = jax.lax.map(lambda t: _chunk_nn(refs, ref_sq, t), tiles)
    return dist.reshape(-1)[:q], idx.reshape(-1)[:q]
