"""Probe: do the split PE matmuls (K=3/15/15 for NoF, K=3/30/30 for NeRF)
each cost a full MXU pass, and does packing them into ONE K=33/63 matmul
recover it?

Hypothesis (round 5): the chain kernels' ~60 TFLOP/s (vs ~170 for a pure
128-wide chain at the same T — probe_chain_width.py) is NOT 128-width or
M-fill but the per-layer PE structure: layer 0 and each skip layer issue
THREE tiny-K dot_generals (x/sin/cos against (3,W)/(kc,W)/(kc,W) weights),
and a K=3 matmul costs the MXU nearly what a K=128 one does. Packing the
three into one (3+2kc, W) weight with a concatenated (3+2kc, T) embedding
should cut a NoF stage from ~10 effective MXU passes to ~6.

Cases (all 5-stage chains of a production-shaped NoF stage — 4 layers,
W=128, skip at 2, 9-wide head, kc=15):

  split — layer 0 & skip as 3 separate PE dots (matches _nof_tile today)
  comb  — layer 0 & skip as one K=33 dot on an in-kernel concat embedding

Run: python scripts/probe_pe_pack.py [--t 4096] [--iters 2000]
"""

import argparse
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W = 128
KC = 15  # 3 * N_freqs(5)
N_STAGES = 5
LAYERS = 4          # D=4, skip at 2
HEAD = 9


def _dot_t(a_t, w):
    """(K, T) transposed activations @ (K, W) -> (T, W) f32."""
    return jax.lax.dot_general(a_t, w, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot(h, w):
    return jax.lax.dot_general(h, w, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _stage_split(x_t, s_t, c_t, ws):
    (wx0, ws0, wc0, w1, wx2, ws2, wc2, wh2, w3, whead) = ws
    z = _dot_t(x_t, wx0) + _dot_t(s_t, ws0) + _dot_t(c_t, wc0)
    h = jnp.maximum(z, 0.0).astype(jnp.bfloat16)
    h = jnp.maximum(_dot(h, w1), 0.0).astype(jnp.bfloat16)
    z = (_dot_t(x_t, wx2) + _dot_t(s_t, ws2) + _dot_t(c_t, wc2)
         + _dot(h, wh2))
    h = jnp.maximum(z, 0.0).astype(jnp.bfloat16)
    h = jnp.maximum(_dot(h, w3), 0.0).astype(jnp.bfloat16)
    out = jax.lax.dot_general(whead, h, (((0,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)  # (9, T)
    # fold the 9-wide head back to (3, T) so stages chain
    return (out[0:3] + out[3:6] + out[6:9]).astype(jnp.bfloat16)


def _stage_comb(e_t, ws):
    (we0, w1, we2, wh2, w3, whead) = ws
    z = _dot_t(e_t, we0)
    h = jnp.maximum(z, 0.0).astype(jnp.bfloat16)
    h = jnp.maximum(_dot(h, w1), 0.0).astype(jnp.bfloat16)
    z = _dot_t(e_t, we2) + _dot(h, wh2)
    h = jnp.maximum(z, 0.0).astype(jnp.bfloat16)
    h = jnp.maximum(_dot(h, w3), 0.0).astype(jnp.bfloat16)
    out = jax.lax.dot_general(whead, h, (((0,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return (out[0:3] + out[3:6] + out[6:9]).astype(jnp.bfloat16)


def _pe_trig(x_t):
    """Per-stage transcendental PE as _nof_tile does it today: sin/cos of
    the (KC, T) scaled coords (KC/3 = 5 freqs x 3 dims)."""
    tile5 = jnp.concatenate(
        [x_t.astype(jnp.float32) * (2.0 ** k) for k in range(KC // 3)],
        axis=0)                                        # (15, T)
    return jnp.sin(tile5), jnp.cos(tile5)


def _pe_recur(x_t):
    """Double-angle recurrence: sin/cos at the base frequency only (3
    transcendental pairs per point), freqs 2^1..2^4 by FMA recurrences."""
    xf = x_t.astype(jnp.float32)
    s, c = jnp.sin(xf), jnp.cos(xf)                    # (3, T) each
    ss, cs = [s], [c]
    for _ in range(KC // 3 - 1):
        s2 = 2.0 * ss[-1] * cs[-1]
        c2 = 1.0 - 2.0 * ss[-1] * ss[-1]
        ss.append(s2)
        cs.append(c2)
    return jnp.concatenate(ss, axis=0), jnp.concatenate(cs, axis=0)


def _kernel(mode, n_ws, *refs):
    x_ref = refs[0]
    ws = [refs[1 + i][...] for i in range(n_ws)]
    out_ref = refs[1 + n_ws]
    x_t = x_ref[...]                                  # (3, T)
    if mode == "comb_static":
        # e_t built ONCE: matmul/relu/head cost only (no per-stage trig)
        s_t, c_t = _pe_trig(x_t)
        e0 = jnp.concatenate([x_t.astype(jnp.bfloat16),
                              s_t.astype(jnp.bfloat16),
                              c_t.astype(jnp.bfloat16)], axis=0)
        for _ in range(N_STAGES):
            bump = (jnp.sum(x_t.astype(jnp.float32))
                    * 1e-9).astype(jnp.bfloat16)
            x_t = _stage_comb(e0 + bump, ws)
    elif mode == "split":
        for _ in range(N_STAGES):
            s_t, c_t = _pe_trig(x_t)
            x_t = _stage_split(x_t.astype(jnp.bfloat16),
                               s_t.astype(jnp.bfloat16),
                               c_t.astype(jnp.bfloat16), ws)
    elif mode == "comb_recur":
        for _ in range(N_STAGES):
            s_t, c_t = _pe_recur(x_t)
            e_t = jnp.concatenate([x_t.astype(jnp.bfloat16),
                                   s_t.astype(jnp.bfloat16),
                                   c_t.astype(jnp.bfloat16)], axis=0)
            x_t = _stage_comb(e_t, ws)
    else:                                             # comb (trig)
        for _ in range(N_STAGES):
            s_t, c_t = _pe_trig(x_t)
            e_t = jnp.concatenate([x_t.astype(jnp.bfloat16),
                                   s_t.astype(jnp.bfloat16),
                                   c_t.astype(jnp.bfloat16)], axis=0)
            x_t = _stage_comb(e_t, ws)
    out_ref[...] = x_t.astype(jnp.float32)


def make_case(mode, t, key):
    k = jax.random.fold_in(key, hash(mode) % 1000)
    if mode == "split":
        shapes = [(3, W), (KC, W), (KC, W), (W, W), (3, W), (KC, W),
                  (KC, W), (W, W), (W, W), (W, HEAD)]
    else:
        ke = 3 + 2 * KC
        shapes = [(ke, W), (W, W), (ke, W), (W, W), (W, W), (W, HEAD)]
    ws = [jax.random.normal(jax.random.fold_in(k, i), s, jnp.bfloat16) * 0.05
          for i, s in enumerate(shapes)]
    x = jax.random.normal(k, (3, t), jnp.bfloat16)
    kern = functools.partial(_kernel, mode, len(ws))
    call = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + len(ws)),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, t), jnp.float32),
    )

    @jax.jit
    def run(x_in, n_iter):
        def body(i, c):
            bump = (i.astype(jnp.float32) * 1e-6).astype(jnp.bfloat16)
            o = call(c + bump, *ws)
            return (c + o.astype(jnp.float32) * 1e-9).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, n_iter, body, x_in)[0, 0]

    return run, x


def useful_flops(t):
    # per stage: PE layers contribute K=33 each; plain W x W; head W x 9
    per_stage = 2 * t * W * (33 + W + (33 + W) + W + HEAD)
    return N_STAGES * per_stage


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=2000)
    args = ap.parse_args()
    key = jax.random.key(0)
    rows = []
    for mode in ("split", "comb", "comb_static", "comb_recur"):
        run, x = make_case(mode, args.t, key)
        _ = float(run(x, 2))
        t0 = time.perf_counter()
        _ = float(run(x, args.iters))
        dt = time.perf_counter() - t0 - 0.028
        tf = useful_flops(args.t) * args.iters / dt / 1e12
        rows.append({"case": mode, "us_per_iter": round(dt / args.iters
                                                        * 1e6, 2),
                     "useful_tflops": round(tf, 1)})
        print(json.dumps(rows[-1]), file=sys.stderr, flush=True)
    print(json.dumps({"t": args.t, "rows": rows}))


if __name__ == "__main__":
    main()
