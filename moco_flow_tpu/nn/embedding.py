"""Sinusoidal positional encoding with coarse-to-fine frequency annealing.

Functional equivalent of the reference ``models/embedding.py`` (Embedding module,
reference models/embedding.py:4-47): embeds ``x`` to
``(x, w_0*sin(f_0 x), w_0*cos(f_0 x), ..., w_{K-1}*sin(f_{K-1} x), w_{K-1}*cos(f_{K-1} x))``
keeping the raw input, with a per-frequency weight vector that implements the
windowed coarse-to-fine annealing of the joint stage
(reference trainer/trainer_moco_flow.py:270-305).

TPU-native design: the annealing weights are a plain ``(N_freqs,)`` array argument
(not mutable module state), so the whole schedule stays inside ``jit`` — the
weights are computed from the step counter by :func:`anneal_weights`, which is a
pure function and therefore never triggers recompilation.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def freq_bands(n_freqs: int, logscale: bool = True) -> np.ndarray:
    """Frequency bands ``2^0 .. 2^{K-1}`` (log) or linear ``1 .. 2^{K-1}``.

    Matches reference models/embedding.py:18-21.
    """
    if n_freqs <= 0:
        return np.zeros((0,), dtype=np.float32)
    if logscale:
        return (2.0 ** np.linspace(0.0, n_freqs - 1, n_freqs)).astype(np.float32)
    return np.linspace(1.0, 2.0 ** (n_freqs - 1), n_freqs).astype(np.float32)


def out_channels(in_channels: int, n_freqs: int) -> int:
    """Embedded width: ``in_channels * (2*N_freqs + 1)`` (models/embedding.py:14)."""
    return in_channels * (2 * n_freqs + 1)


def posenc(x: jnp.ndarray, n_freqs: int, logscale: bool = True,
           weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Positional-encode ``x`` along the last axis.

    Args:
      x: ``(..., C)`` input.
      n_freqs: number of frequency bands (static).
      logscale: static flag for band spacing.
      weights: optional ``(n_freqs,)`` per-frequency annealing weights; ``None``
        means all-ones (fully annealed).

    Returns:
      ``(..., C * (2*n_freqs + 1))`` embedding laid out as
      ``[x, sin(f0 x)..sin(f_{K-1} x), cos(f0 x)..cos(f_{K-1} x)]`` (each
      sin_k/cos_k block spanning all C channels, weighted by ``weights[k]``).

      Note: this is a *fixed permutation* of the reference's interleaved
      layout (models/embedding.py:42-46: sin_k, cos_k pairs). Block layout
      needs no interleaving stack+reshape — on TPU the whole embedding is two
      transcendentals and one contiguous concat, with no relayout copies.
      Feature order is internal (it only permutes first-layer weight rows),
      and every component of this framework uses the same order.
    """
    if n_freqs == 0:
        return x
    c = x.shape[-1]
    bands = jnp.asarray(freq_bands(n_freqs, logscale))  # (K,)
    scaled = (x[..., None, :] * bands[..., :, None]).reshape(
        *x.shape[:-1], n_freqs * c)  # freq-major, contiguous
    s, co = jnp.sin(scaled), jnp.cos(scaled)
    if weights is not None:
        w = jnp.repeat(weights, c, total_repeat_length=n_freqs * c)
        s = s * w
        co = co * w
    return jnp.concatenate([x, s, co], axis=-1)


def anneal_weights(step: jnp.ndarray, n_freqs: int, start_iter: int,
                   end_iter: int) -> jnp.ndarray:
    """Windowed coarse-to-fine annealing weights as a pure function of ``step``.

    Reproduces the reference schedule (trainer/trainer_moco_flow.py:275-305):
    with ``delta = (end-start) // n_freqs`` and ``cur = step - start``, frequency
    ``k`` gets weight ``clip(cur/delta - k, 0, 1)``; before ``start`` everything
    is 0 (the c2f init zeroes PE weights, trainer_moco_flow.py:112-114), after
    ``end`` everything is 1.

    Note the reference only updates weights when ``step > start`` so at exactly
    ``start`` the weights remain at their initial 0 — ``cur/delta - k <= 0`` for
    ``cur = 0`` reproduces that.
    """
    if n_freqs == 0:
        return jnp.zeros((0,), dtype=jnp.float32)
    n_iters = end_iter - start_iter
    delta = max(n_iters // n_freqs, 1)
    cur = jnp.clip(step - start_iter, 0, n_iters).astype(jnp.float32)
    k = jnp.arange(n_freqs, dtype=jnp.float32)
    w = jnp.clip(cur / delta - k, 0.0, 1.0)
    # after end_iter everything fully on (the clip above may leave the last
    # band partially on if n_iters % n_freqs != 0)
    return jnp.where(step >= end_iter, jnp.ones_like(w), w)
