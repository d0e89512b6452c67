#!/usr/bin/env python
"""Probe: NoF chain-kernel backward throughput vs VMEM block rows.

    python scripts/probe_chain_rows.py --bwd_rows 512

The chain backward runs ~30-40 TFLOP/s at the default 512-row blocks (the
profile's biggest single cost); the MXU wants larger M. One invocation = one
row setting = one compile (the remote compile service is slow, and the call
builders are lru_cached per process).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bwd_rows", type=int, default=512)
    ap.add_argument("--fwd_rows", type=int, default=0)
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--s", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from moco_flow_tpu.nn.nof import NoFConfig, init_nof
    from moco_flow_tpu.ops import megakernel as mk
    from moco_flow_tpu.render.volume import EmbeddingSpec, embed_padded

    # the chain backward reads _CHAIN_BWD_ROWS (its VMEM budget differs from
    # the per-op backward's _BWD_ROWS — 5 stages of residuals); set both so
    # the sweep knob actually reaches the measured kernel
    mk._BWD_ROWS = args.bwd_rows
    mk._CHAIN_BWD_ROWS = args.bwd_rows
    if args.fwd_rows:
        mk._FWD_ROWS = args.fwd_rows

    fcfg = NoFConfig()
    params = {"bw_NoF": init_nof(jax.random.key(0), fcfg),
              "fw_NoF": init_nof(jax.random.key(1), fcfg)}
    n, s = args.n, args.s
    xyz = jax.random.normal(jax.random.key(2), (n, s, 3))
    ind = jax.random.uniform(jax.random.key(3), (n, 1)) * 2 - 1
    ind_emb = embed_padded(ind, EmbeddingSpec(16, in_channels=1), 33)
    ch_emb = embed_padded(-ind, EmbeddingSpec(16, in_channels=1), 33)

    @jax.jit
    def chain_grad(p, xyz, ind_emb, ch_emb):
        def loss(p, xyz):
            cano, recon, chain = mk.nof_chain_rays(
                p, fcfg, 5, True, None, xyz, ind_emb, ch_emb,
                True, True, jnp.bfloat16)
            return (jnp.sum(cano ** 2) + jnp.sum(recon ** 2)
                    + jnp.sum(chain ** 2))
        return jax.grad(loss, argnums=(0, 1))(p, xyz)

    def read(out):
        return float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))

    t0 = time.perf_counter()
    try:
        read(chain_grad(params, xyz, ind_emb, ch_emb))
    except Exception as e:
        print(f"bwd_rows={args.bwd_rows}: COMPILE FAILED: "
              f"{str(e)[-600:]}")
        return
    print(f"compile {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        read(chain_grad(params, xyz, ind_emb, ch_emb))
    per = (time.perf_counter() - t0) / args.iters - 0.027
    # 5 warps x ~118 kFLOP/sample fwd; fwd+bwd w/ recompute ~4x fwd
    fl = n * s * 5 * 2 * (66 * 128 + 2 * 128 * 128 + 194 * 128 + 128 * 9)
    print(f"bwd_rows={args.bwd_rows}: chain fwd+bwd {per*1e3:8.2f} ms "
          f"(~{4*fl/per/1e12:5.1f} TFLOP/s at 4x-fwd accounting)")


if __name__ == "__main__":
    main()
