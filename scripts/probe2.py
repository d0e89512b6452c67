#!/usr/bin/env python
"""Re-probe kernel costs with a forced D2H readback as the sync point
(block_until_ready on the tunneled backend appears not to wait for
execution of some programs)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit_sync(fn, *args, iters=5):
    """Time with a scalar readback each iter (subtract ~28 ms tunnel cost
    by comparing against the empty control)."""
    s = float(jnp.sum(fn(*args)))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        s = float(jnp.sum(fn(*args)))
    dt = (time.perf_counter() - t0) / iters
    return dt, s


def main():
    from moco_flow_tpu.nn.nof import NoFConfig, init_nof
    from moco_flow_tpu.ops import megakernel as mk
    from moco_flow_tpu.render.volume import EmbeddingSpec, embed_padded

    n, s = 16384, 256
    xyz = jax.random.normal(jax.random.key(2), (n, s, 3))
    ind = jax.random.uniform(jax.random.key(3), (n, 1)) * 2 - 1
    ind_emb = embed_padded(ind, EmbeddingSpec(16, in_channels=1), 33)

    # control: trivial op (measures readback floor)
    @jax.jit
    def control(x):
        return x[:8, :8, :] * 2.0

    dt, _ = timeit_sync(control, xyz)
    print(f"control readback floor: {dt*1e3:8.2f} ms", flush=True)

    r = 8

    def pass_kernel(x_ref, out_ref):
        out_ref[...] = x_ref[...] * 2.0

    @jax.jit
    def passthrough(x):
        return pl.pallas_call(
            pass_kernel,
            grid=(n // r,),
            in_specs=[pl.BlockSpec((r, s, 3), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((r, s, 3), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, s, 3), jnp.float32),
        )(x)

    dt, chk = timeit_sync(passthrough, xyz)
    print(f"passthrough r=8: {dt*1e3:8.2f} ms (chk {chk:.3e})", flush=True)

    fcfg_nq = NoFConfig(use_quat=False)
    p_nq = init_nof(jax.random.key(1), fcfg_nq)

    @jax.jit
    def nof_noquat(p, x, e):
        return mk.nof_fused_rays(p, fcfg_nq, 5, True, None, x, e,
                                 jnp.bfloat16)

    dt, chk = timeit_sync(nof_noquat, p_nq, xyz, ind_emb)
    print(f"nof fwd use_quat=False: {dt*1e3:8.2f} ms (chk {chk:.3e})",
          flush=True)

    fcfg = NoFConfig()
    p_q = init_nof(jax.random.key(1), fcfg)

    @jax.jit
    def nof_quat(p, x, e):
        return mk.nof_fused_rays(p, fcfg, 5, True, None, x, e, jnp.bfloat16)

    dt, chk = timeit_sync(nof_quat, p_q, xyz, ind_emb)
    print(f"nof fwd use_quat=True:  {dt*1e3:8.2f} ms (chk {chk:.3e})",
          flush=True)


if __name__ == "__main__":
    main()
