"""Device-resident SMPL frame-correspondence sampler.

TPU-native re-design of the reference's ``get_frame_correspondence``
(datasets/moco_flow_dataset.py:87-142, datasets/nof_dataset.py:46-101): where
the reference recomputes SMPL FK + a CUDA KNN *synchronously inside every
training step*, we precompute the step-invariant pieces once at dataset init —
per-frame posed vertices and the per-vertex src->canonical 4x4 chain
(``T_tgt @ inv(T_src)``, moco_flow_dataset.py:98-100) — and keep them in HBM.
The per-step work is then a fully-jitted sampler: uniform cube points +
near-surface points, one KNN matmul, a gather, and one batched 4x4 apply.

Static-shape note: the reference splits points into variable-length
inside/outside sets by ``dist < thickness`` (moco_flow_dataset.py:123-125);
we return all ``2*num_sampled`` points with a boolean ``inside`` mask and the
trainers use masked means (same loss values, no dynamic shapes).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..geometry.smpl import SMPLData, smpl_forward, smpl_vertex_transforms
from ..ops.knn import nearest_neighbor


@functools.partial(jax.tree_util.register_dataclass,
                   data_fields=["verts", "src_to_cano"], meta_fields=[])
@dataclasses.dataclass
class CorrespondenceTable:
    """Per-frame precomputed SMPL quantities (device arrays; a pytree, so it
    passes straight through jit/shard_map)."""
    verts: jnp.ndarray        # (F, V, 3) posed vertices
    src_to_cano: jnp.ndarray  # (F, V, 4, 4) per-vertex src -> canonical-frame

    @property
    def num_frames(self) -> int:
        return self.verts.shape[0]


def build_correspondence_table(data: SMPLData, poses: jnp.ndarray,
                               betas: jnp.ndarray, tgt_frame: int = 0,
                               batch: int = 32) -> CorrespondenceTable:
    """Precompute the table for all frames.

    Args:
      poses: (F, 72) axis-angle SMPL poses.
      betas: (F, 10) shape coefficients.
      tgt_frame: the canonical frame (the reference always uses 0,
        moco_flow_dataset.py:87).
      batch: frames per FK batch (bounds peak memory: V x 4 x 4 per frame).
    """
    f = poses.shape[0]

    @jax.jit
    def fk(p, b):
        v = smpl_forward(data, p, b)
        t = smpl_vertex_transforms(data, p, b)
        return v, t

    verts_list, trans_list = [], []
    for i in range(0, f, batch):
        v, t = fk(poses[i:i + batch], betas[i:i + batch])
        verts_list.append(v)
        trans_list.append(t)
    verts = jnp.concatenate(verts_list, axis=0)
    trans = jnp.concatenate(trans_list, axis=0)  # (F, V, 4, 4) rest -> posed

    t_tgt = trans[tgt_frame]  # (V, 4, 4)
    inv_src = jnp.linalg.inv(trans)  # (F, V, 4, 4) posed -> rest
    src_to_cano = jnp.einsum("vab,fvbc->fvac", t_tgt, inv_src)
    return CorrespondenceTable(verts=verts, src_to_cano=src_to_cano)


@functools.partial(jax.jit, static_argnames=("num_sampled",))
def sample_correspondences(table: CorrespondenceTable, frame: jnp.ndarray,
                           key: jax.Array, num_sampled: int = 10000,
                           thickness: float = 0.2,
                           cube_half_extent: float = 1.5) -> dict:
    """Draw query points and their canonical correspondences for one frame.

    Mirrors moco_flow_dataset.py:102-132: ``num_sampled`` uniform points in a
    3x3x3 cube + ``num_sampled`` near-surface points (random vertices +
    N(0, thickness) noise), mapped through the nearest vertex's chain.

    Returns ``{'query': (2N, 3), 'cano': (2N, 3), 'inside': (2N,) bool}``.
    """
    k_cube, k_vert, k_noise = jax.random.split(key, 3)
    verts = table.verts[frame]          # (V, 3)
    chain = table.src_to_cano[frame]    # (V, 4, 4)
    v = verts.shape[0]

    cube = jax.random.uniform(k_cube, (num_sampled, 3),
                              minval=-cube_half_extent, maxval=cube_half_extent)
    pick = jax.random.randint(k_vert, (num_sampled,), 0, v)
    surf = verts[pick] + jax.random.normal(k_noise, (num_sampled, 3)) * thickness
    query = jnp.concatenate([cube, surf], axis=0)  # (2N, 3)

    dist, idx = nearest_neighbor(verts, query)
    inside = dist < thickness

    t = chain[idx]  # (2N, 4, 4)
    homo = jnp.concatenate([query, jnp.ones_like(query[:, :1])], axis=-1)
    cano = jnp.einsum("nab,nb->na", t, homo)[:, :3]
    return {"query": query, "cano": cano, "inside": inside}
