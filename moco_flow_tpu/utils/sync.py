"""Reliable device-queue fences for timing on the tunneled TPU backend.

``jax.block_until_ready`` has been observed to return immediately while
real kernels were still in flight on the tunneled "axon" backend
(CLAUDE.md pitfall 7): one round-4 bench recorded a physically
impossible 11.8M rays/s render axis (~60x the chip's roofline) because
the per-iteration fence never waited. An actual value readback of the
last dispatched output is the only fence that cannot lie: the host
blocks until the scalar arrives, and a single device executes programs
in dispatch order, so one readback bounds the whole queue. The readback
costs the ~28 ms tunnel round-trip once per timed loop; callers should
measure that floor with :func:`fence_floor` and subtract it.
"""

from __future__ import annotations

import time

import numpy as np

import jax

__all__ = ["fence", "fence_floor"]


def fence(tree) -> float:
    """Block until every array in ``tree`` is computed.

    Calls ``jax.block_until_ready`` (the cheap fence, when it works) and
    then reads ONE element of one leaf back to the host (the fence that
    can't lie). Returns the value read so callers can create a data
    dependence on it.
    """
    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if isinstance(x, jax.Array)]
    if not leaves:
        return 0.0
    jax.block_until_ready(leaves)
    return float(np.asarray(jax.device_get(leaves[-1].ravel()[:1]))[0])


def fence_floor(tree, reps: int = 2) -> float:
    """Measure the pure cost of :func:`fence` on an already-computed
    ``tree`` (slice dispatch + tunnel readback round-trip), so timed
    loops can subtract it. Returns seconds (min over ``reps``)."""
    fence(tree)  # make sure it really is computed
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fence(tree)
        best = min(best, time.perf_counter() - t0)
    return best
