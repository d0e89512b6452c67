"""Probe: why do the 128-wide NoF chain matmuls run at ~60 TFLOP/s when the
256-wide NeRF stacks run at ~108 (PERF.md round 3/4)?

Measures sustained in-kernel MXU rate for the candidate geometries of the
"256-wide chain pairing" lever (round-4 verdict item 3) BEFORE committing to
kernel surgery:

  a. chain128   — L sequential (T,128)@(128,128)+relu (the NoF layer loop)
  b. chain256   — L sequential (T,256)@(256,256)+relu (the NeRF reference)
  c. pair_diag  — L sequential (T,256)@(256,256) with BLOCK-DIAGONAL weights
                  = two independent 128-wide stages "two-abreast"; 2x the
                  useful FLOPs of (a) per step, 4x the total
  d. interleave — two independent 128-wide chains with their layer matmuls
                  interleaved in program order (tests whether serial
                  dependency bubbles, not MXU tile width, are the cost)
  e. chain128w  — (a) but M doubled (T*2 rows): is it an M-fill problem?

Timing: lax.fori_loop around the pallas_call with an iteration-dependent
input + one scalar readback (CLAUDE.md pitfall 7); reported TFLOP/s counts
USEFUL flops only (pair_diag's zeros are waste, so its useful rate is the
one comparable to (a)).

Run: python scripts/probe_chain_width.py [--t 2048] [--layers 8] [--iters 30]
"""

import argparse
import functools
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chain_kernel(n_layers, n_streams, *refs):
    """refs: x_1..x_S, w_1..w_{S*L}, out_1..out_S. Each stream s runs
    h = relu(h @ w) L times; streams' matmuls are interleaved per layer."""
    xs = [refs[i][...] for i in range(n_streams)]
    ws = [refs[n_streams + i][...] for i in range(n_streams * n_layers)]
    outs = refs[n_streams + n_streams * n_layers:]
    hs = list(xs)
    for li in range(n_layers):
        zs = [jax.lax.dot_general(
            hs[s], ws[li * n_streams + s], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) for s in range(n_streams)]
        hs = [jnp.maximum(z, 0.0).astype(xs[0].dtype) for z in zs]
    for s in range(n_streams):
        outs[s][...] = hs[s].astype(jnp.float32)


def make_case(t, width, n_layers, n_streams, key):
    kernel = functools.partial(_chain_kernel, n_layers, n_streams)
    xs = [jax.random.normal(jax.random.fold_in(key, s), (t, width),
                            jnp.bfloat16) for s in range(n_streams)]
    ws = [jax.random.normal(jax.random.fold_in(key, 100 + i),
                            (width, width), jnp.bfloat16) * 0.05
          for i in range(n_streams * n_layers)]
    call = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (
            n_streams + n_streams * n_layers),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * n_streams,
        out_shape=[jax.ShapeDtypeStruct((t, width), jnp.float32)] * n_streams,
    )

    @jax.jit
    def run(xs_in, n_iter):
        def body(i, carry):
            # iteration-dependent input so the loop body can't be hoisted
            bump = (i.astype(jnp.float32) * 1e-6).astype(jnp.bfloat16)
            outs = call(*[x + bump for x in carry], *ws)
            # real data dependence on the outputs (o*0 would be folded away
            # and the whole pallas_call DCE'd); 1e-9 keeps magnitudes put
            return [(c + o.astype(jnp.float32) * 1e-9).astype(jnp.bfloat16)
                    for o, c in zip(outs, carry)]
        outs = jax.lax.fori_loop(0, n_iter, body, list(xs_in))
        return outs[0][0, 0]

    return run, xs


def time_case(name, run, xs, iters, flops_per_iter):
    _ = float(run(xs, 2))  # compile + warm
    t0 = time.perf_counter()
    _ = float(run(xs, iters))
    dt = time.perf_counter() - t0 - 0.028  # readback floor
    tf = flops_per_iter * iters / dt / 1e12
    return {"case": name, "ms_per_iter": round(dt / iters * 1e3, 3),
            "useful_tflops": round(tf, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=2048)
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    t, L = args.t, args.layers
    key = jax.random.key(0)
    f128 = 2 * t * 128 * 128 * L          # useful flops of one 128 chain

    rows = []
    run, xs = make_case(t, 128, L, 1, key)
    rows.append(time_case("chain128", run, xs, args.iters, f128))

    run, xs = make_case(t, 256, L, 1, key)
    rows.append(time_case("chain256", run, xs, args.iters, f128 * 4))

    # block-diagonal pairing: two 128 stages in one 256 matmul; useful
    # flops = 2 chains, total = 4
    run, xs = make_case(t, 256, L, 1, key)
    rows.append(dict(time_case("pair_diag(total)", run, xs, args.iters,
                               f128 * 2), note="useful=2x128chain"))

    run, xs = make_case(t, 128, L, 2, key)
    rows.append(time_case("interleave2x128", run, xs, args.iters, f128 * 2))

    run, xs = make_case(2 * t, 128, L, 1, key)
    rows.append(time_case("chain128_2T", run, xs, args.iters, f128 * 2))

    for r in rows:
        print(json.dumps(r), file=sys.stderr, flush=True)
    print(json.dumps({"t": t, "layers": L, "rows": rows}))


if __name__ == "__main__":
    main()
