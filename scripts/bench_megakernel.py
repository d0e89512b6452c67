#!/usr/bin/env python
"""Microbenchmark the fused megakernels vs the XLA funnels on the real TPU.

    python scripts/bench_megakernel.py [--smoke-only] [--rows 2048]

Smoke-tests Mosaic lowering at small shapes first (fast failure), then times
forward and forward+backward at the render/train hot shapes. One process,
one compile each — the remote compile service is slow (CLAUDE.md #5).
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=10):
    """Time with a scalar READBACK per iteration: on the tunneled backend
    `block_until_ready` does not reliably wait for execution (CLAUDE.md #7),
    so sync through a device->host read and subtract the measured floor."""
    import jax.numpy as jnp

    def read(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.sum(leaf))

    read(fn(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        read(fn(*args))
    per = (time.perf_counter() - t0) / iters
    return max(per - 0.027, 1e-6)  # ~27 ms tunnel readback floor


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke-only", action="store_true")
    ap.add_argument("--rows", type=int, default=0,
                    help="override _FWD_ROWS/_BWD_ROWS")
    ap.add_argument("--bwd-rows", type=int, default=0)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    from moco_flow_tpu.nn.nerf import (NeRFConfig, init_nerf, nerf_apply)
    from moco_flow_tpu.nn.nof import NoFConfig, init_nof, nof_apply
    from moco_flow_tpu.ops import megakernel as mk
    from moco_flow_tpu.render.volume import EmbeddingSpec, embed_padded

    if args.rows:
        mk._FWD_ROWS = args.rows
    if args.bwd_rows:
        mk._BWD_ROWS = args.bwd_rows
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else None

    ncfg = NeRFConfig(in_channels_xyz=63, extra_feat_type="ind",
                      extra_feat_dim=5)
    fcfg = NoFConfig()
    nerf_params = init_nerf(jax.random.key(0), ncfg)
    nof_params = init_nof(jax.random.key(1), fcfg)

    def make_inputs(n, s):
        xyz = jax.random.normal(jax.random.key(2), (n, s, 3))
        ind = jax.random.uniform(jax.random.key(3), (n, 1)) * 2 - 1
        extra = embed_padded(ind, EmbeddingSpec(2, in_channels=1), 5)
        ind_emb = embed_padded(ind, EmbeddingSpec(16, in_channels=1), 33)
        return xyz, extra, ind_emb

    @jax.jit
    def nerf_fused(p, xyz, extra):
        return mk.nerf_fused_rays(p, ncfg, 10, True, None, xyz, extra,
                                  False, dt)

    @jax.jit
    def nerf_fused_sigma(p, xyz):
        return mk.nerf_fused_rays(p, ncfg, 10, True, None, xyz, None,
                                  True, dt)

    @jax.jit
    def nof_fused(p, xyz, ind_emb):
        return mk.nof_fused_rays(p, fcfg, 5, True, None, xyz, ind_emb, dt)

    @jax.jit
    def nerf_fused_grad(p, xyz, extra):
        def loss(p, xyz):
            return jnp.sum(mk.nerf_fused_rays(p, ncfg, 10, True, None, xyz,
                                              extra, False, dt) ** 2)
        return jax.grad(loss, argnums=(0, 1))(p, xyz)

    @jax.jit
    def nof_fused_grad(p, xyz, ind_emb):
        def loss(p, xyz):
            return jnp.sum(mk.nof_fused_rays(p, fcfg, 5, True, None, xyz,
                                             ind_emb, dt) ** 2)
        return jax.grad(loss, argnums=(0, 1))(p, xyz)

    # XLA oracles at the same shapes
    @jax.jit
    def nerf_xla(p, xyz, extra):
        n, s = xyz.shape[0], xyz.shape[1]
        x_emb = embed_padded(xyz.reshape(-1, 3), EmbeddingSpec(10), 63)
        e = jnp.broadcast_to(extra[:, None, :], (n, s, 5)).reshape(-1, 5)
        return nerf_apply(p, x_emb, e, ncfg, dt).reshape(n, s, 4)

    @jax.jit
    def nof_xla(p, xyz, ind_emb):
        n, s = xyz.shape[0], xyz.shape[1]
        x_emb = embed_padded(xyz.reshape(-1, 3), EmbeddingSpec(5), 33)
        e = jnp.broadcast_to(ind_emb[:, None, :], (n, s, 33)).reshape(-1, 33)
        return nof_apply(p, jnp.concatenate([x_emb, e], -1),
                         xyz.reshape(-1, 3), fcfg, dt).reshape(n, s, 3)

    # ---- smoke: small shapes, verify lowering + numerics vs XLA -----------
    print("== smoke (n=64, s=128) ==", flush=True)
    xyz, extra, ind_emb = make_inputs(64, 128)
    t0 = time.perf_counter()
    a = nerf_fused(nerf_params, xyz, extra)
    b = nerf_xla(nerf_params, xyz, extra)
    err = float(jnp.max(jnp.abs(a - b)))
    print(f"nerf fwd: max|err|={err:.2e} compile+run "
          f"{time.perf_counter()-t0:.1f}s", flush=True)
    assert err < (0.1 if dt is not None else 1e-3), err

    t0 = time.perf_counter()
    s1 = nerf_fused_sigma(nerf_params, xyz)
    print(f"nerf sigma fwd ok ({time.perf_counter()-t0:.1f}s)", flush=True)

    t0 = time.perf_counter()
    a = nof_fused(nof_params, xyz, ind_emb)
    b = nof_xla(nof_params, xyz, ind_emb)
    err = float(jnp.max(jnp.abs(a - b)))
    print(f"nof fwd: max|err|={err:.2e} ({time.perf_counter()-t0:.1f}s)",
          flush=True)
    assert err < (0.1 if dt is not None else 1e-3), err

    t0 = time.perf_counter()
    g = nerf_fused_grad(nerf_params, xyz, extra)
    jax.block_until_ready(g)
    print(f"nerf bwd ok ({time.perf_counter()-t0:.1f}s)", flush=True)
    t0 = time.perf_counter()
    g = nof_fused_grad(nof_params, xyz, ind_emb)
    jax.block_until_ready(g)
    print(f"nof bwd ok ({time.perf_counter()-t0:.1f}s)", flush=True)
    if args.smoke_only:
        return

    # ---- render-shape timing ----------------------------------------------
    n, s = 16384, 256
    xyz, extra, ind_emb = make_inputs(n, s)
    flops_nerf = n * s * 2 * (63 * 256 + 6 * 256 * 256 + 319 * 256
                              + 256 + 256 * 256 + 261 * 128 + 128 * 3)
    flops_nof = n * s * 2 * (66 * 128 + 2 * 128 * 128 + 194 * 128 + 128 * 9)

    for name, fn, fl in [("nerf fused fwd", nerf_fused, flops_nerf),
                         ("nerf xla   fwd", nerf_xla, flops_nerf)]:
        dt_s = timeit(fn, nerf_params, xyz, extra, iters=5)
        print(f"{name}: {dt_s*1e3:8.2f} ms  {fl/dt_s/1e12:6.1f} TFLOP/s",
              flush=True)
    for name, fn, fl in [("nof  fused fwd", nof_fused, flops_nof),
                         ("nof  xla   fwd", nof_xla, flops_nof)]:
        dt_s = timeit(fn, nof_params, xyz, ind_emb, iters=5)
        print(f"{name}: {dt_s*1e3:8.2f} ms  {fl/dt_s/1e12:6.1f} TFLOP/s",
              flush=True)

    # ---- train-shape fwd+bwd ----------------------------------------------
    n, s = 1024, 256
    xyz, extra, ind_emb = make_inputs(n, s)
    dt_s = timeit(nerf_fused_grad, nerf_params, xyz, extra, iters=10)
    print(f"nerf fused fwd+bwd (1024x256): {dt_s*1e3:8.2f} ms  "
          f"{3*flops_nerf/16*(1024/16384)/dt_s/1e12*16:6.1f} ~TFLOP/s",
          flush=True)
    dt_s = timeit(nof_fused_grad, nof_params, xyz, ind_emb, iters=10)
    print(f"nof  fused fwd+bwd (1024x256): {dt_s*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
