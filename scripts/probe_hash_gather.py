#!/usr/bin/env python
"""Microprobe: where does the hash-grid's 31x train slowdown live?

Times, on the real TPU, for a render-shaped batch B:
  - hash encode FORWARD (the render-time cost)
  - hash encode FWD+BWD (the train-time cost: gather + scatter-add grad)
  - the tiny 2x64 MLP on the encoded features (for scale)
  - the reference PE(63) + 8x256 trunk forward (the FLOP floor it replaces)

Timing follows CLAUDE.md rule 5/7: lax.fori_loop inside one jit + a single
scalar readback; subtract nothing (relative numbers only, same harness).

Usage: python scripts/probe_hash_gather.py [--b 131072] [--iters 20]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def timed(fn, *args, iters):
    """fn(*args, i) must DEPEND on the loop index i — a loop-invariant body
    gets hoisted out of fori_loop by XLA and times as ~0 (measured: the
    8x256 trunk 'ran' in -0.05 ms before this guard)."""
    import jax

    @jax.jit
    def loop(*a):
        def body(i, acc):
            return acc + fn(*a, i)
        return jax.lax.fori_loop(0, iters, body, 0.0)

    r = float(loop(*args))  # compile + run once
    t0 = time.perf_counter()
    r = float(loop(*args))
    dt = (time.perf_counter() - t0 - 0.028) / iters
    return dt, r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=131072)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--levels", type=int, default=8)
    ap.add_argument("--log2_table", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from moco_flow_tpu.nn.hashgrid import (HashGridConfig, hashgrid_encode,
                                           init_hashgrid)

    cfg = HashGridConfig(n_levels=args.levels, n_features=2,
                         log2_table_size=args.log2_table, base_res=16,
                         max_res=256, extent=1.5)
    key = jax.random.key(0)
    table = init_hashgrid(key, cfg)
    x = jax.random.uniform(jax.random.key(1), (args.b, 3),
                           minval=-1.4, maxval=1.4)

    out = {"b": args.b, "iters": args.iters, "levels": args.levels}

    def shift(xx, i):
        return xx + i.astype(jnp.float32) * 1e-6

    def enc_sum(t, xx, i):
        return hashgrid_encode(t, shift(xx, i), cfg).sum()

    dt, _ = timed(enc_sum, table, x, iters=args.iters)
    out["hash_fwd_ms"] = round(dt * 1e3, 2)

    def enc_grad(t, xx, i):
        g = jax.grad(lambda tt: hashgrid_encode(tt, shift(xx, i),
                                                cfg).sum())(t)
        return g.sum()

    dt, _ = timed(enc_grad, table, x, iters=args.iters)
    out["hash_fwdbwd_ms"] = round(dt * 1e3, 2)

    # tiny MLP on encoded features, bf16 matmuls
    w1 = jax.random.normal(jax.random.key(2), (cfg.out_dim, 64),
                           dtype=jnp.bfloat16)
    w2 = jax.random.normal(jax.random.key(3), (64, 64), dtype=jnp.bfloat16)

    def tiny_mlp(t, xx, i):
        h = hashgrid_encode(t, shift(xx, i), cfg,
                            compute_dtype=jnp.bfloat16)
        h = jax.nn.relu(h @ w1)
        return (h @ w2).astype(jnp.float32).sum()

    dt, _ = timed(tiny_mlp, table, x, iters=args.iters)
    out["hash_plus_mlp_fwd_ms"] = round(dt * 1e3, 2)

    # reference PE + 8x256 trunk forward (bf16), for scale
    freqs = 2.0 ** jnp.arange(10)

    def pe(xx):
        ang = xx[:, None, :] * freqs[None, :, None]
        return jnp.concatenate(
            [xx, jnp.sin(ang).reshape(xx.shape[0], -1),
             jnp.cos(ang).reshape(xx.shape[0], -1)], axis=-1)

    ws = [jax.random.normal(jax.random.key(10 + i),
                            (63 if i == 0 else 256, 256),
                            dtype=jnp.bfloat16) * 0.05 for i in range(8)]

    def trunk(t, xx, i):
        h = pe(shift(xx, i)).astype(jnp.bfloat16)
        for w in ws:
            h = jax.nn.relu(h @ w)
        return h.astype(jnp.float32).sum()

    dt, _ = timed(trunk, table, x, iters=args.iters)
    out["pe_trunk8x256_fwd_ms"] = round(dt * 1e3, 2)

    def _trunk_loss(ww, xx):
        h = pe(xx).astype(jnp.bfloat16)
        for w in ww:
            h = jax.nn.relu(h @ w)
        return h.astype(jnp.float32).sum()

    def trunk_grad(t, xx, i):
        gs = jax.grad(_trunk_loss)(ws, shift(xx, i))
        return sum(g.astype(jnp.float32).sum() for g in gs)

    dt, _ = timed(trunk_grad, table, x, iters=args.iters)
    out["pe_trunk8x256_fwdbwd_ms"] = round(dt * 1e3, 2)

    # single merged gather (all levels, one take) — is per-level dispatch
    # the problem, or the gather itself?
    merged = table.reshape(-1, cfg.n_features)
    idx0 = jax.random.randint(jax.random.key(4),
                              (args.b * 8 * args.levels,), 0,
                              merged.shape[0] - args.iters - 1)

    def one_take(t, xx, i):
        return jnp.take(t, idx0 + i, axis=0).sum()

    dt, _ = timed(one_take, merged, x, iters=args.iters)
    out["merged_single_take_ms"] = round(dt * 1e3, 2)

    # scatter-add alone (the gather's transpose): grad of the merged take
    def one_scatter(t, xx, i):
        g = jax.grad(lambda tt: jnp.take(tt, idx0 + i, axis=0).sum())(t)
        return g.sum()

    dt, _ = timed(one_scatter, merged, x, iters=args.iters)
    out["merged_single_scatter_ms"] = round(dt * 1e3, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
