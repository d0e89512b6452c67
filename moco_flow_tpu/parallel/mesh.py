"""Data-parallel training over a JAX device mesh.

Replaces the reference's torch DDP/NCCL stack (trainer/base.py:94-106, 251-256)
with the TPU-native recipe: a 1-D ``Mesh`` over the 'data' axis, ``shard_map``
around the whole train step, per-chip PRNG folding, and a ``psum``-mean of
gradients over ICI. Parameters and optimizer state stay replicated (the models
total ~1.5 M params — sharding them would only add collective latency,
SURVEY.md §2.2); what is sharded is the *work*: each chip draws its own
``N_rand`` rays (so the global batch is ``N_rand x n_chips``, matching the
reference's per-GPU ray count semantics, c2f.yaml:34 + README.md:139-145).
"""

from __future__ import annotations

from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (DATA_AXIS,))


def pmean_if(axis_name: str | None, tree):
    """Gradient/metric reduction that degrades to identity single-chip."""
    if axis_name is None:
        return tree
    return jax.lax.pmean(tree, axis_name)


def fold_key_if(axis_name: str | None, key: jax.Array) -> jax.Array:
    """Distinct per-chip PRNG streams from one replicated key."""
    if axis_name is None:
        return key
    return jax.random.fold_in(key, jax.lax.axis_index(axis_name))


def epoch_perm_frame(seed: int, axis_name: str | None, step_idx,
                     num_frames: int):
    """In-graph without-replacement frame visitation (`model.frame_sampling:
    epoch_perm`): every consecutive block of ``num_frames`` steps visits
    each frame exactly once in a per-epoch shuffled order — the reference's
    DDP ``DistributedSampler`` epoch semantics (trainer_moco_flow.py:26 +
    train.py:48-49 ``set_epoch``; its single-GPU loader is ``shuffle=False``
    i.e. plain sequential — `frame_sampling: sequential`), vs the rebuild's
    historical iid-uniform draw. Each chip draws an independent permutation
    (the per-rank DistributedSampler analog for ray-sharded DP).

    Jit-safe: the permutation key depends only on ``step_idx //
    num_frames``, so it is a pure function of the step carried in-graph —
    no host sampling, no recompiles.
    """
    step_idx = jnp.asarray(step_idx)
    epoch = step_idx // num_frames
    # distinct stream from the per-step loss/ray keys (constant salt)
    ek = jax.random.fold_in(jax.random.key(seed), 0x5EED)
    ek = fold_key_if(axis_name, jax.random.fold_in(ek, epoch))
    perm = jax.random.permutation(ek, num_frames)
    return perm[step_idx % num_frames]


FRAME_SAMPLING_POLICIES = ("uniform", "sequential", "epoch_perm")


def sample_frame(policy: str, seed: int, axis_name: str | None, step_idx,
                 num_frames: int, key: jax.Array):
    """Draw the training frame for one step under `model.frame_sampling`:

    - ``uniform``: iid draw from ``key`` (the rebuild's historical default)
    - ``sequential``: ``step % num_frames`` — the reference's single-GPU
      DataLoader order (``shuffle=False``, trainer_moco_flow.py:31)
    - ``epoch_perm``: per-epoch shuffled without-replacement visits
      (:func:`epoch_perm_frame` — the DDP ``DistributedSampler`` analog)

    All three are pure in-graph functions of ``(seed, step)`` — no host
    sampling, no recompiles. Raises on unknown policies (host-side: the
    policy string is static config).
    """
    if policy == "uniform":
        return jax.random.randint(key, (), 0, num_frames)
    if policy == "sequential":
        return jnp.asarray(step_idx) % num_frames
    if policy == "epoch_perm":
        return epoch_perm_frame(seed, axis_name, step_idx, num_frames)
    raise ValueError("model.frame_sampling must be one of "
                     f"{FRAME_SAMPLING_POLICIES}, got {policy!r}")


def dp_jit(make_step: Callable[[str | None], Callable], mesh: Mesh | None,
           donate_argnums=(0, 1)):
    """Compile a train step for a mesh (or single device).

    ``make_step(axis_name)`` must return a pure
    ``step(params, opt_state, *args) -> (params, opt_state, metrics)`` that
    internally calls :func:`pmean_if`/:func:`fold_key_if` with ``axis_name``.
    All inputs/outputs are replicated (P() specs): sharding happens *inside*
    the step via the folded PRNG streams, so no array ever crosses chips
    except the gradient psum.
    """
    if mesh is None or np.prod(mesh.devices.shape) == 1:
        return jax.jit(make_step(None), donate_argnums=donate_argnums)
    # check_vma=False: the fused Pallas kernels' out_shape structs carry no
    # varying-mesh-axes annotation, and jax's static vma lint rejects them
    # under shard_map; the collective structure is still exercised (psum)
    # and fused==xla inside dp_jit is asserted by tests/test_render_dp.py
    step = shard_map(make_step(DATA_AXIS), mesh=mesh,
                     in_specs=P(), out_specs=P(), check_vma=False)
    return jax.jit(step, donate_argnums=donate_argnums)
