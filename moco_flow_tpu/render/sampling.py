"""Ray depth sampling: stratified coarse samples and inverse-CDF importance
sampling.

Functional equivalents of the reference's ``sample_pdf`` + the stratified
sampling block of ``render_rays`` (models/rendering.py:5-46, 244-260), built on
XLA-native ``jnp.searchsorted`` instead of the ATen kernel, with explicit PRNG
keys instead of global torch RNG.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stratified_zvals(key: jax.Array | None, near: jnp.ndarray, far: jnp.ndarray,
                     n_samples: int, use_disp: bool = False,
                     perturb: float = 0.0) -> jnp.ndarray:
    """Coarse depth values along each ray.

    Args:
      key: PRNG key for jitter (required if ``perturb > 0``).
      near, far: ``(N, 1)`` depth bounds.
      n_samples: samples per ray (static).
      use_disp: sample linearly in disparity instead of depth.
      perturb: jitter factor in [0, 1].

    Returns:
      ``(N, n_samples)`` depths. Matches models/rendering.py:245-260.
    """
    z_steps = jnp.linspace(0.0, 1.0, n_samples)  # (S,)
    if not use_disp:
        z_vals = near * (1.0 - z_steps) + far * z_steps
    else:
        z_vals = 1.0 / (1.0 / near * (1.0 - z_steps) + 1.0 / far * z_steps)
    if perturb > 0:
        mids = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
        upper = jnp.concatenate([mids, z_vals[:, -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[:, :1], mids], axis=-1)
        u = perturb * jax.random.uniform(key, z_vals.shape)
        z_vals = lower + (upper - lower) * u
    return z_vals


def compact_fine_samples(z_all: jnp.ndarray, bins: jnp.ndarray,
                         weights: jnp.ndarray, budget: int):
    """Empty-space skipping for the fine pass: keep the ``budget`` samples
    whose enclosing coarse intervals carry the MOST compositing weight.

    The coarse pass's compositing weights are a free occupancy estimate
    along each ray (the same quantity sample_pdf importance-samples from).
    Uniform coarse samples mostly land in empty space, so the fine pass —
    which re-evaluates all sorted coarse+importance depths (reference
    models/rendering.py:316-330) — wastes most of its FLOPs. Here each
    sample is scored with its bin's weight, the top-``budget`` are kept
    (NOT a nearest-first truncation — on diffuse, partially-trained fields
    that would drop real far-side contributions), and the kept set is
    re-sorted by depth for the quadrature. Each sample carries its
    ORIGINAL delta so skipped space composites as empty — the standard
    occupancy-skipping approximation; the error is bounded by the total
    weight of the dropped bins.

    No gathers: the per-sample bin weight is a difference of two
    prefix-masked reductions, and the compaction is two key sorts — all
    VPU-parallel (gathers cost ~21 ms each at this shape, PERF.md).

    Args:
      z_all: (N, S) sorted fine depths.
      bins: (N, B+1) coarse bin edges (interval midpoints, as sample_pdf).
      weights: (N, B) coarse compositing weights for those bins.
      budget: number of samples to keep (static).

    Returns (z_k (N, budget), deltas_k (N, budget)), z-ascending. A full
    budget reproduces the exact sample set bit-for-bit.
    """
    s = z_all.shape[1]
    budget = min(budget, s)
    # original per-sample deltas (with the reference's 1e10 tail)
    deltas = jnp.concatenate(
        [z_all[:, 1:] - z_all[:, :-1],
         jnp.full_like(z_all[:, :1], 1e10)], axis=-1)
    # bin weight at each sample: sum_b w_b * [e_b <= z < e_{b+1}] as a
    # difference of two prefix reductions (gather-free)
    lo = jnp.sum(jnp.where(bins[:, None, :-1] <= z_all[:, :, None],
                           weights[:, None, :], 0.0), axis=-1)
    hi = jnp.sum(jnp.where(bins[:, None, 1:] <= z_all[:, :, None],
                           weights[:, None, :], 0.0), axis=-1)
    w_sample = lo - hi  # (N, S); 0 outside the binned range
    # samples outside [bins[0], bins[-1]] have no coarse estimate — rank
    # them first (they are the boundary strata the reference always
    # evaluates, and there are only a couple per ray)
    outside = (z_all < bins[:, :1]) | (z_all >= bins[:, -1:])
    score = jnp.where(outside, jnp.asarray(jnp.finfo(z_all.dtype).max,
                                           z_all.dtype), w_sample)
    _, z_top, d_top = jax.lax.sort((-score, z_all, deltas), num_keys=1)
    z_k, d_k = jax.lax.sort((z_top[:, :budget], d_top[:, :budget]),
                            num_keys=1)
    return z_k, d_k


def sample_pdf(key: jax.Array | None, bins: jnp.ndarray, weights: jnp.ndarray,
               n_importance: int, det: bool = False,
               eps: float = 1e-5) -> jnp.ndarray:
    """Draw ``n_importance`` samples from the piecewise-constant pdf over ``bins``.

    Args:
      bins: ``(N, B+1)`` bin edges (coarse interval midpoints).
      weights: ``(N, B)`` unnormalized weights.
      det: evenly-spaced samples instead of random (test time).

    Matches models/rendering.py:5-46 exactly (same eps guard, same
    right-searchsorted, same denom-zero fallback).
    """
    n_rays, n_bins = weights.shape
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # (N, B+1)

    if det:
        u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, n_importance),
                             (n_rays, n_importance))
    else:
        u = jax.random.uniform(key, (n_rays, n_importance))

    # Gather-free inverse CDF, built for the TPU VPU. ``cdf`` is sorted, so
    # the right-searchsorted mask M[n,i,j] = (cdf[n,j] <= u[n,i]) is a prefix
    # mask, and the four index gathers of the classic implementation
    # (cdf/bins at below/above) are masked max/min reductions over M — XLA
    # fuses them with the comparison, where take_along_axis lowers to scalar
    # gathers (~21 ms each at 16k x 128 on v5e; see PERF.md).
    big = jnp.asarray(jnp.finfo(cdf.dtype).max, cdf.dtype)
    m = cdf[:, None, :] <= u[:, :, None]  # (N, I, B+1), prefix along j
    # below = last j with M set (>= 0 since cdf[0] = 0); cdf, bins ascending
    cdf_below = jnp.max(jnp.where(m, cdf[:, None, :], 0.0), axis=-1)
    bins_below = jnp.max(jnp.where(m, bins[:, None, :], -big), axis=-1)
    # above = first j with M clear; if none (u >= cdf max), clamp to the last
    cdf_above = jnp.min(jnp.where(m, big, cdf[:, None, :]), axis=-1)
    cdf_above = jnp.minimum(cdf_above, cdf[:, -1:])
    bins_above = jnp.min(jnp.where(m, big, bins[:, None, :]), axis=-1)
    bins_above = jnp.minimum(bins_above, bins[:, -1:])

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < eps, 1.0, denom)
    return bins_below + (u - cdf_below) / denom * (bins_above - bins_below)


@jax.custom_vjp
def _sorted_permute(keys: jnp.ndarray, channels: tuple):
    """Sort ``channels`` (each ``(N, S)``) along the last axis by ``keys``
    (``(N, S)``), returning ``(keys_sorted, channels_sorted)``.

    One variadic stable ``lax.sort`` — no gathers (scalar gathers are
    catastrophically slow on TPU, PERF.md round-1 #2b). The backward pass
    is ANOTHER variadic sort keyed on the forward permutation's positions
    (a scatter-free inverse permutation), defined via custom_vjp because
    jax's builtin sort transpose materializes gather/scatter HLOs.
    """
    out = jax.lax.sort((keys,) + tuple(channels), dimension=-1,
                       is_stable=True, num_keys=1)
    return out[0], tuple(out[1:])


def _sorted_permute_fwd(keys, channels):
    n, s = keys.shape
    pos = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (n, s))
    out = jax.lax.sort((keys, pos) + tuple(channels), dimension=-1,
                       is_stable=True, num_keys=1)
    return (out[0], tuple(out[2:])), out[1]


def _sorted_permute_bwd(pos, g):
    g_keys, g_channels = g
    # rows of ``pos`` are permutations of 0..S-1: sorting cotangents with
    # pos as the key lands every cotangent back at its pre-sort slot
    out = jax.lax.sort((pos, g_keys) + tuple(g_channels), dimension=-1,
                       is_stable=True, num_keys=1)
    return out[1], tuple(out[2:])


_sorted_permute.defvjp(_sorted_permute_fwd, _sorted_permute_bwd)


@jax.custom_vjp
def _sorted_permute_pos(keys: jnp.ndarray, channels: tuple):
    """:func:`_sorted_permute` that ALSO returns each sorted slot's
    pre-sort position (``pos``, int32) — the iota payload the backward
    pass needs anyway, exposed so callers that want ``pos`` (the cano
    merges) don't pay a second identical sort for it."""
    n, s = keys.shape
    iota = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (n, s))
    out = jax.lax.sort((keys, iota) + tuple(channels), dimension=-1,
                       is_stable=True, num_keys=1)
    return out[0], tuple(out[2:]), out[1]


def _sorted_permute_pos_fwd(keys, channels):
    n, s = keys.shape
    iota = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (n, s))
    out = jax.lax.sort((keys, iota) + tuple(channels), dimension=-1,
                       is_stable=True, num_keys=1)
    return (out[0], tuple(out[2:]), out[1]), out[1]


def _sorted_permute_pos_bwd(pos, g):
    g_keys, g_channels, _ = g   # pos is int: its cotangent is float0
    out = jax.lax.sort((pos, g_keys) + tuple(g_channels), dimension=-1,
                       is_stable=True, num_keys=1)
    return out[1], tuple(out[2:])


_sorted_permute_pos.defvjp(_sorted_permute_pos_fwd, _sorted_permute_pos_bwd)


def merge_sorted_samples(z_a: jnp.ndarray, z_b: jnp.ndarray,
                         payload_a: dict, payload_b: dict):
    """Merge two per-ray sample sets into depth-sorted order, carrying
    per-sample payload arrays through the same permutation.

    Args:
      z_a, z_b: ``(N, Sa)`` / ``(N, Sb)`` depths (any order).
      payload_a, payload_b: dicts with identical keys of ``(N, S*, C)``
        arrays aligned with ``z_a`` / ``z_b``.

    Returns ``(z_all, payload)``: ``(N, Sa+Sb)`` ascending depths and the
    payloads permuted identically — ``jnp.sort(concat(z_a, z_b))``'s exact
    result plus aligned payloads, differentiable w.r.t. the payloads (and
    keys) at the cost of one extra sort in the backward pass.

    This is what lets the fine render pass REUSE the coarse pass's NoF
    warps instead of re-warping the duplicated sample positions (the
    reference re-evaluates the union, models/rendering.py:316-330; the
    values are identical because the warp networks and inputs are) —
    see render_rays.
    """
    assert set(payload_a) == set(payload_b), (payload_a.keys(),
                                              payload_b.keys())
    keys = jnp.concatenate([z_a, z_b], axis=-1)
    names = sorted(payload_a)
    chans, splits = [], []
    for nm in names:
        pa, pb = payload_a[nm], payload_b[nm]
        cat = jnp.concatenate([pa, pb], axis=1)
        splits.append((nm, cat.shape[-1], cat.dtype))
        for c in range(cat.shape[-1]):
            chans.append(cat[..., c].astype(jnp.float32))
    z_all, sorted_chans = _sorted_permute(keys, tuple(chans))
    payload, i = {}, 0
    for nm, width, dt in splits:
        payload[nm] = jnp.stack(
            [sorted_chans[i + c] for c in range(width)], axis=-1).astype(dt)
        i += width
    return z_all, payload


@jax.custom_vjp
def unsort_by_pos(pos: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Permute ``x`` (N, S) from sorted order back to pre-sort order, given
    ``pos`` (N, S) = the pre-sort index each sorted slot came from (the
    position payload of the forward sort). Row-wise: out[pos[i]] = x[i],
    done as a 2-operand sort keyed on pos (scatter-free); differentiable in
    ``x`` via the mirrored sort in the backward pass."""
    return jax.lax.sort((pos, x), dimension=-1, is_stable=True,
                        num_keys=1)[1]


def _unsort_by_pos_fwd(pos, x):
    n, s = pos.shape
    iota = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32), (n, s))
    # rank[j] = sorted slot that concat element j occupies
    rank = jax.lax.sort((pos, iota), dimension=-1, is_stable=True,
                        num_keys=1)[1]
    return unsort_by_pos(pos, x), rank


def _unsort_by_pos_bwd(rank, g):
    g_sorted = jax.lax.sort((rank, g), dimension=-1, is_stable=True,
                            num_keys=1)[1]
    return None, g_sorted


unsort_by_pos.defvjp(_unsort_by_pos_fwd, _unsort_by_pos_bwd)


def merge_cano_by_z(z_a: jnp.ndarray, z_b: jnp.ndarray,
                    cano_a: jnp.ndarray, cano_b: jnp.ndarray):
    """Depth-merge two per-ray sample sets, sorting ONLY the canonical
    warp payload (the fine NeRF's input — the one consumer that needs
    sorted order).

    Returns ``(z_all, cano, pos)``: sorted depths ``(N, Sa+Sb)``, the
    warps permuted identically, and the int32 pre-sort position of each
    sorted slot (``pos < Sa`` = from set a). ``pos`` lets order-free
    consumers (consensus losses, via :func:`unsort_by_pos` on the
    compositing alphas) stay in cheap concat order instead of paying the
    lane-padded (N, S, 3) slice/stack tax for every payload — measured at
    ~1.5 ms per (1024, 256, 3) stack on v5e, the difference between this
    merge costing ~1 ms and ~6 ms per train step."""
    keys = jnp.concatenate([z_a, z_b], axis=-1)
    cat = jnp.concatenate([cano_a, cano_b], axis=1)
    chans = tuple(cat[..., c] for c in range(cat.shape[-1]))
    z_all, sorted_chans, pos = _sorted_permute_pos(keys, chans)
    cano = jnp.stack(sorted_chans, axis=-1)
    return z_all, cano, pos


def merge_cano_by_z_t(z_a: jnp.ndarray, z_b: jnp.ndarray,
                      cano_a_t: jnp.ndarray, cano_b_t: jnp.ndarray):
    """:func:`merge_cano_by_z` for TRANSPOSED payloads: ``cano_*_t`` are
    ``(3, N, S*)`` (the fused kernels' layout), returned merged as
    ``(3, N, Sa+Sb)``. The sort channels are leading-axis rows — no
    lane-padded (N, S, 3) slice/stack at all."""
    keys = jnp.concatenate([z_a, z_b], axis=-1)
    cat = jnp.concatenate([cano_a_t, cano_b_t], axis=2)
    chans = tuple(cat[c] for c in range(cat.shape[0]))
    z_all, sorted_chans, pos = _sorted_permute_pos(keys, chans)
    return z_all, jnp.stack(sorted_chans, axis=0), pos
