"""Fused Pallas render megakernels: PE + MLP (+ heads) resident in VMEM.

Why: the render/train hot path is a stack of wide-M matmuls —
``bf16[N*S, 256] @ bf16[256, 256]`` for the NeRF trunk (reference hot loop
models/rendering.py:195-375) — and under plain XLA every layer's activation
(2.1 GB per 16k-ray render tile) round-trips HBM between matmuls. A device
profile (PERF.md round-2) shows those fusions running at ~37 TFLOP/s on a
~197 TFLOP/s chip: the trunk is HBM-bandwidth-bound. These kernels keep a
block of whole rays resident in VMEM through the *entire* network:

  HBM traffic per sample drops from ~10 x 512 B (layer activations) to
  12 B in (raw xyz) + 16 B out (rgb + sigma).

Design (differs from ops/fused_mlp.py, which is kept as the simpler
reference implementation):

  - **Raw xyz in, PE in-kernel.** The sinusoidal embedding is computed
    inside the kernel (one tiny matmul against the static frequency matrix
    + sin/cos on the VPU), so the (N*S, 63) embedding never exists in HBM.
  - **Annealing folded into weights.** The coarse-to-fine PE weights
    (reference trainer_moco_flow.py:270-305) scale the sin/cos *columns*
    before the first-layer matmul; scaling the corresponding first-layer
    weight ROWS outside the kernel is algebraically identical, keeps the
    kernel anneal-free, and XLA differentiates the fold automatically.
  - **Whole-ray blocks.** The grid tiles rays, with blocks shaped
    ``(R, S, C)``; per-ray features (frame-index / view-dir embeddings,
    already matmul'd to width at ray rank) enter as ``(R, 1, width)`` and
    broadcast across samples inside the kernel — the reference
    repeat_interleaves them to sample rank in HBM
    (models/rendering.py:134-142).
  - **Pallas backward.** A custom VJP whose backward is also a Pallas
    kernel: it re-computes the forward activations in VMEM (flash-style
    rematerialization — no activation tensor is ever stored to HBM) and
    produces dxyz / d(per-ray) tiles plus weight gradients accumulated
    across the sequential TPU grid into VMEM-resident fp32 blocks.

All matmuls run on the MXU in the compute dtype (bf16 operands, fp32
accumulation); heads and gradients accumulate in fp32.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..nn.embedding import freq_bands
from ..nn.nerf import NeRFConfig
from ..nn.nof import NoFConfig

# Row budget per VMEM block (R = rows_budget // S rays per grid step).
# Bigger blocks amortize per-grid-step overhead but are bounded by VMEM —
# xyz/cotangent blocks are TRANSPOSED (C, rows) — lane-dense, so they cost
# ~C/128 of a full 128-wide activation per row (they were the VMEM item
# that capped backward blocks at 512 rows before the transposed layout).
_FWD_ROWS = int(os.environ.get("MOCO_FWD_ROWS", 4096))
_BWD_ROWS = int(os.environ.get("MOCO_BWD_ROWS", 1024))
# the chain backward holds 5 stages of residuals: 1024 rows measured
# 17.32M scoped VMEM (1.32M over), 768 fits
_CHAIN_BWD_ROWS = int(os.environ.get("MOCO_CHAIN_BWD_ROWS", 768))
# test-time pass kernels (forward-only, fewer live buffers) take bigger
# blocks: 3072 rows measured fastest (4096 regresses — VMEM pressure,
# re-measure after layout changes)
# (MOCO_*_ROWS env overrides exist for block-size sweeps on the real TPU —
# the defaults are the measured-fastest values; see PERF.md)
_PASS_ROWS = int(os.environ.get("MOCO_PASS_ROWS", 3072))


def _rows_budget(base: int, width: int) -> int:
    return base * max(1, min(2, 256 // max(width, 1)))


def _interpret() -> bool:
    """Pallas TPU kernels only compile on TPU; interpret on the CPU test
    backend (tests/conftest.py forces cpu)."""
    return jax.default_backend() == "cpu"


def _dtype(name: str):
    return jnp.bfloat16 if name == "bfloat16" else jnp.float32


def _freq_matrix(n_freqs: int, logscale: bool, c: int = 3) -> np.ndarray:
    """(c, n_freqs*c) matrix B with x @ B = [f_0*x, f_1*x, ...] laid out
    freq-major — matches nn.embedding.posenc's block layout."""
    bands = freq_bands(n_freqs, logscale)
    b = np.zeros((c, n_freqs * c), dtype=np.float32)
    for k in range(n_freqs):
        for j in range(c):
            b[j, k * c + j] = bands[k]
    return b


def _pick_r(n: int, s: int, rows: int, align: int = 1) -> int:
    r = max(1, min(n, rows // max(s, 1)))
    if align > 1 and r < n:
        # kernels with 2-D (r, s) blocks (the pass kernel's z / sigma maps)
        # need the ray dim — their second-minor — divisible by the sublane
        # tile (Mosaic block-shape rule); 3-D (r, s, c) blocks have no
        # constraint on the leading ray dim. A single block (r == n) is
        # always legal (equals the array dim).
        if align > r:
            # rounding UP to the alignment would silently exceed the VMEM
            # row budget (align can reach lcm(8, 128/gcd(s,128)) = 128 for
            # odd sample counts) — reject with the fix spelled out instead
            # of risking a VMEM OOM at compile time
            raise ValueError(
                f"sample count {s} needs ray-block alignment {align}, but "
                f"the VMEM row budget ({rows} rows) only allows "
                f"{rows // max(s, 1)} rays per block. Use a sample count "
                f"whose alignment fits (even counts align to 8; multiples "
                f"of 128 align to 8) or lower the per-ray sample count.")
        r = (r // align) * align
    return r


def _pad_rays(x: jnp.ndarray, n_pad: int) -> jnp.ndarray:
    if n_pad == 0:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((n_pad, *x.shape[1:]), x.dtype)], axis=0)


def _pick_r_t(n: int, s: int, rows: int) -> int:
    """Rays per block for TRANSPOSED (C, r*s) blocks: the flat row count
    r*s is the LANE dim, so it must be a multiple of 128 (or cover the
    whole array in one block); the tiny leading component dim (3/4/9) is
    sublanes and unconstrained."""
    import math as _math
    r = max(1, min(n, rows // max(s, 1)))
    if r >= n:
        return r
    align = 128 // _math.gcd(s, 128)
    if align > r:
        # rounding UP to the alignment exceeds the soft row budget; allow
        # it only while the block stays trivially small in absolute terms
        # (the budget exists to bound VMEM, not to forbid 128-row blocks)
        if align * s <= max(rows, 1024):
            return min(n, align)
        raise ValueError(
            f"sample count {s} needs ray-block lane alignment {align} "
            f"({align * s} flat rows), far above the VMEM row budget "
            f"({rows}); lower the per-ray sample count or use one "
            f"divisible by 128.")
    return (r // align) * align


def _pad_t(x_t: jnp.ndarray, pad_cols: int) -> jnp.ndarray:
    """Pad the flat-row (lane) dim of a (C, T) transposed array."""
    if pad_cols == 0:
        return x_t
    return jnp.concatenate(
        [x_t, jnp.zeros((*x_t.shape[:-1], pad_cols), x_t.dtype)], axis=-1)


def _dot(a, b, dtype, out_dtype=None):
    """(..., K) @ (K, N) on the MXU; operands cast to the compute dtype,
    accumulation fp32 (out bf16 only for hidden activations)."""
    if dtype is not None:
        a = a.astype(dtype)
        b = b.astype(dtype)
    return jax.lax.dot_general(
        a, b, (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=out_dtype or jnp.float32)


def _dot_nt(a, w, dtype):
    """(..., K) x (N, K) -> (..., N): contract against the weight's SECOND
    dim — the backward-pass "x @ W^T" without materializing a transpose
    inside the kernel (Mosaic feeds the MXU the transposed operand)."""
    if dtype is not None:
        a = a.astype(dtype)
        w = w.astype(dtype)
    return jax.lax.dot_general(
        a, w, (((a.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def _dot_t(a, b):
    """Weight-gradient contraction a^T @ b over rows: (T, I), (T, J) ->
    (I, J) fp32 — one MXU matmul contracting the row dim."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_pe(a_t, w, dtype):
    """Transposed-PE forward contraction: (K, T) x (K, C) -> (T, C).

    The sin/cos feature blocks live TRANSPOSED (features on sublanes) so
    the transcendentals and casts run on (kc, T) tiles instead of
    lane-padded (T, kc->128) ones; the MXU contracts their sublane dim
    directly — no transpose op ever materializes."""
    if dtype is not None:
        a_t = a_t.astype(dtype)
        w = w.astype(dtype)
    return jax.lax.dot_general(a_t, w, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_pe_t(a_t, dz, dtype):
    """Transposed-PE weight gradient: (K, T) x (T, C) -> (K, C)."""
    if dtype is not None:
        a_t = a_t.astype(dtype)
        dz = dz.astype(dtype)
    return jax.lax.dot_general(a_t, dz, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_pe_x(w, dz, dtype):
    """Transposed-PE input gradient: (K, C) x (T, C) -> (K, T)."""
    if dtype is not None:
        w = w.astype(dtype)
        dz = dz.astype(dtype)
    return jax.lax.dot_general(w, dz, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)



def _cast_matrices(ws, dtype_name: str):
    """Cast true weight matrices (shape[0] > 1) to the compute dtype just
    before a pallas_call; biases and the (1, W) sigma row stay fp32 (they
    are applied in fp32 on the VPU).

    Called INSIDE the custom_vjp boundary (both forward and backward
    wrappers), NOT before it: primals then stay fp32, so the fp32 weight
    gradients accumulated in-kernel are NOT quantized to bf16 at the vjp
    boundary — matching the XLA path's gradient precision."""
    if dtype_name != "bfloat16":
        return list(ws)
    return [w.astype(jnp.bfloat16) if w.shape[0] > 1 else w for w in ws]


# ===========================================================================
# NeRF megakernel
# ===========================================================================

@dataclasses.dataclass(frozen=True)
class _NerfSpec:
    """Static kernel config (hashable -> one compiled kernel per spec)."""
    depth: int
    width: int
    kc: int                # 3 * n_freqs (sin block width)
    skips: tuple
    sigma_only: bool
    has_extra: bool
    dtype_name: str
    logscale: bool


def _nerf_fold(params: dict, cfg: NeRFConfig, n_freqs: int,
               anneal: jnp.ndarray | None, extra_emb: jnp.ndarray | None,
               sigma_only: bool):
    """Split + anneal-fold the NeRF weights into the kernel's flat operand
    list. Differentiable (XLA chains gradients back through the fold)."""
    kc = 3 * n_freqs
    w_rep = None
    if anneal is not None and kc:
        w_rep = jnp.repeat(anneal, 3, total_repeat_length=kc)[:, None]
    ws = []

    def pe_rows(w):
        """PE-consuming weight matrix, packed as ONE (3+2kc, W) operand:
        [x(3); sin(kc); cos(kc)] rows concatenated — the kernels contract
        it against the concatenated (3+2kc, T) embedding in a single MXU
        pass (three tiny-K dots measured ~30% slower per stage,
        scripts/probe_pe_pack.py, round 5). Rows past 3+2kc are the static
        zero-padding of embed_padded and multiply zeros — dropped.
        n_freqs == 0 (the reference's shipped init_nerf/init_nof quirk:
        RAW xyz zero-padded to in_channels_xyz) runs the kernel as a
        synthetic 1-freq spec whose sin/cos weight rows are constant
        zeros — Mosaic rejects 0-width vector loads, and the constants
        give the pad rows exactly the zero gradient the true model's zero
        inputs give them (the VJP through this fold drops their
        cotangents)."""
        if kc == 0:
            z = jnp.zeros((6, w.shape[-1]), w.dtype)
            return [jnp.concatenate([w[:3], z], axis=0)]
        wx, wsin, wcos = w[:3], w[3:3 + kc], w[3 + kc:3 + 2 * kc]
        if w_rep is not None:
            wsin = wsin * w_rep
            wcos = wcos * w_rep
        return [jnp.concatenate([wx, wsin, wcos], axis=0)]

    in_ch = cfg.in_channels_xyz
    for i, layer in enumerate(params["trunk"]):
        w, b = layer["w"], layer["b"]
        if i == 0:
            ws += pe_rows(w) + [b[None]]
        elif i in cfg.skips:
            ws += pe_rows(w[:in_ch]) + [w[in_ch:], b[None]]
        else:
            ws += [w, b[None]]
    ws += [params["sigma"]["w"].T, params["sigma"]["b"][None]]  # (1, W), (1, 1)
    p_extra = None
    if not sigma_only:
        ws += [params["final"]["w"], params["final"]["b"][None]]
        we, be = params["extra"]["w"], params["extra"]["b"]
        if extra_emb is not None:
            ws += [we[:cfg.width], be[None]]
            p_extra = _dot(extra_emb, we[cfg.width:], None)  # (N, W/2) fp32
        else:
            ws += [we, be[None]]
        ws += [params["rgb"]["w"], params["rgb"]["b"][None]]
    return ws, p_extra


def _nerf_tile(x, p_e, ws, spec: _NerfSpec, b_mat, rs=None):
    """Forward for one flattened (R*S, ...) row block; returns intermediates
    for reuse by the backward kernel. The kernels collapse whole-ray blocks
    (R, S, C) to 2-D rows so every layer is ONE wide MXU matmul (batched 3-D
    dots lower as R small matmuls and were measurably slower); p_e arrives
    pre-broadcast to row rank (a VMEM-local copy).

    With ``rs=(r, s)`` (test-time pass kernels) the sigma head is computed
    TRANSPOSED off the MXU and returned as a dense (R, S) map alongside rgb
    (T, 3) — the packed (T, 4) output would lane-pad to 128 in HBM and XLA
    would slice/relayout sigma back out (~14 ms per render tile measured)."""
    dt = _dtype(spec.dtype_name)
    # FULLY TRANSPOSED xyz I/O: x arrives (3, T) (components on sublanes),
    # so the PE, the first-layer x rows, the heads and the HBM DMA all run
    # without the 3 -> 128 lane padding of row-major (T, 3) tensors
    # (PERF.md rounds 2-3)
    scaled_t = jax.lax.dot_general(b_mat, x, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    sin_t, cos_t = jnp.sin(scaled_t), jnp.cos(scaled_t)
    xb_t = x.astype(dt)
    # packed PE embedding (3+2kc, T): ONE K=3+2kc MXU pass per PE layer
    # against the fold's concatenated weight (probe_pe_pack.py round 5:
    # the three tiny-K dots cost ~a full pass each)
    e_t = jnp.concatenate([xb_t, sin_t.astype(dt), cos_t.astype(dt)],
                          axis=0)

    acts = []
    it = iter(ws)
    h = None
    for i in range(spec.depth):
        if i == 0:
            wpe, b = next(it), next(it)
            z = _dot_pe(e_t, wpe, dt) + b.astype(jnp.float32)
        elif i in spec.skips:
            wpe, wh, b = next(it), next(it), next(it)
            z = (_dot_pe(e_t, wpe, dt) + _dot(h, wh, dt)
                 + b.astype(jnp.float32))
        else:
            w, b = next(it), next(it)
            z = _dot(h, w, dt) + b.astype(jnp.float32)
        h = jnp.maximum(z, 0.0).astype(dt)
        acts.append(h)
    wsig, bsig = next(it), next(it)
    # sigma head TRANSPOSED off the MXU: (1, W) x (T, W) -> (1, T)
    hh = h if dt is None else h.astype(dt)
    ww = wsig if dt is None else wsig.astype(dt)
    sigma_t = jax.lax.dot_general(
        ww, hh, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) \
        + bsig[:, 0:1].astype(jnp.float32)                 # (1, T)
    if spec.sigma_only:
        if rs is not None:
            return (None, sigma_t), None
        return sigma_t, (sin_t, cos_t, acts, None, None, None)
    wf, bf = next(it), next(it)
    hf = (_dot(h, wf, dt) + bf.astype(jnp.float32)).astype(dt)
    we, be = next(it), next(it)
    ze = _dot(hf, we, dt) + be.astype(jnp.float32)
    if spec.has_extra:
        ze = ze + p_e.astype(jnp.float32)             # (T, W/2), pre-broadcast
    he = jnp.maximum(ze, 0.0).astype(dt)
    wr, br = next(it), next(it)
    # rgb head TRANSPOSED: (W/2, 3) x (T, W/2) -> (3, T)
    wrr = wr if dt is None else wr.astype(dt)
    rgb_t = jax.nn.sigmoid(jax.lax.dot_general(
        wrr, he, (((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) + br.T.astype(jnp.float32))
    if rs is not None:
        return (rgb_t, sigma_t), None
    out_t = jnp.concatenate([rgb_t, sigma_t], axis=0)      # (4, T)
    return out_t, (sin_t, cos_t, acts, hf, he, rgb_t)


@functools.lru_cache(maxsize=64)
def _nerf_fwd_call(spec: _NerfSpec, n: int, s: int, n_ws: int,
                   ws_shapes: tuple, interpret: bool):
    b_mat = _freq_matrix(spec.kc // 3, spec.logscale)
    r = _pick_r_t(n, s, _FWD_ROWS)
    grid = pl.cdiv(n, r)
    out_dim = 1 if spec.sigma_only else 4

    def kernel(*refs):
        x_ref = refs[0]                              # (3, r*s)
        off = 1
        p_e = None
        if spec.has_extra:
            e = spec.width // 2
            p_e = jnp.broadcast_to(refs[1][...], (r, s, e)).reshape(r * s, e)
            off = 2
        b_ref = refs[off]
        ws = [refs[off + 1 + i][...] for i in range(n_ws)]
        out_ref = refs[off + 1 + n_ws]
        out_t, _ = _nerf_tile(x_ref[...], p_e, ws, spec, b_ref[...])
        out_ref[...] = out_t                         # (out_dim, r*s)

    in_specs = [pl.BlockSpec((3, r * s), lambda i: (0, i),
                             memory_space=pltpu.VMEM)]
    if spec.has_extra:
        e = spec.width // 2
        in_specs.append(pl.BlockSpec((r, 1, e), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec(b_mat.shape, (lambda i: (0, 0)),
                                 memory_space=pltpu.VMEM))
    for shp in ws_shapes:
        in_specs.append(pl.BlockSpec(shp, (lambda i: (0, 0)),
                                     memory_space=pltpu.VMEM))

    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((out_dim, r * s), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((out_dim, grid * r * s),
                                       jnp.float32),
        interpret=interpret,
    ), grid * r - n


def _nerf_forward(spec: _NerfSpec, xyz_t, p_e, ws):
    """xyz_t: (3, N, S); returns (out_dim, N, S)."""
    n, s = xyz_t.shape[1], xyz_t.shape[2]
    ws = _cast_matrices(ws, spec.dtype_name)
    call, n_pad = _nerf_fwd_call(spec, n, s, len(ws),
                                 tuple(w.shape for w in ws), _interpret())
    b_mat = jnp.asarray(_freq_matrix(spec.kc // 3, spec.logscale))
    args = [_pad_t(xyz_t.reshape(3, n * s), n_pad * s)]
    if spec.has_extra:
        args.append(_pad_rays(p_e, n_pad))
    out = call(*args, b_mat, *ws)
    return out[:, :n * s].reshape(-1, n, s)


def _nerf_bwd_tile(x_t, p_e, ws, g_t, spec: _NerfSpec, b_mat, r, s):
    """Recompute forward, then hand-chained backward for one flattened row
    block, transposed xyz I/O: ``x_t`` (3, T), ``g_t`` (4|1, T). Returns
    (dx_t (3, T), dp_e (R, 1, E)|None, [dws...]) — dws fp32, same order
    as ws."""
    dt = _dtype(spec.dtype_name)
    _, (sin_t, cos_t, acts, hf, he, rgb_t) = _nerf_tile(x_t, p_e, ws, spec,
                                                        b_mat)
    xb_t = x_t.astype(dt)
    eb_t = jnp.concatenate([xb_t, sin_t.astype(dt), cos_t.astype(dt)],
                           axis=0)                    # (3+2kc, T) packed PE

    it = iter(ws)
    layers = []  # (kind, weights...) aligned with ws order
    for i in range(spec.depth):
        if i == 0 or i in spec.skips:
            entry = [next(it) for _ in range(3 if i in spec.skips else 2)]
            layers.append(("pe_skip" if i in spec.skips else "pe", entry))
        else:
            layers.append(("plain", [next(it), next(it)]))
    wsig, bsig = next(it), next(it)
    if not spec.sigma_only:
        wf, bf = next(it), next(it)
        we, be = next(it), next(it)
        wr, br = next(it), next(it)

    dws = {}
    h_last = acts[-1]
    if spec.sigma_only:
        dsigma_t = g_t                                     # (1, T)
        dh = jax.lax.dot_general(                          # outer: (T, W)
            dsigma_t, wsig.astype(jnp.float32),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    else:
        # rgb/sigma cotangents arrive transposed — the sigmoid chain and
        # the 3-wide products run on (3, T) sublane tiles, not lane-padded
        # (T, 3) ones
        drgb_t = g_t[0:3] * rgb_t * (1.0 - rgb_t)          # (3, T) f32
        dsigma_t = g_t[3:4]                                # (1, T)
        d3 = drgb_t.astype(dt)
        dws["wr"] = jax.lax.dot_general(                   # (W/2, 3)
            he, d3, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dws["br"] = jnp.sum(drgb_t, axis=1, keepdims=True).T
        dhe = jax.lax.dot_general(                         # (T, W/2)
            d3, wr.astype(dt) if dt is not None else wr,
            (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        dhe = jnp.where(he.astype(jnp.float32) > 0.0, dhe, 0.0).astype(dt)
        dws["we"] = _dot_t(hf, dhe)
        dws["be"] = jnp.sum(dhe.astype(jnp.float32), axis=0, keepdims=True)
        if spec.has_extra:
            dp_e = jnp.sum(dhe.astype(jnp.float32).reshape(r, s, -1),
                           axis=1, keepdims=True)
        dhf = _dot_nt(dhe, we, dt)
        dws["wf"] = _dot_t(h_last, dhf)
        dws["bf"] = jnp.sum(dhf.astype(jnp.float32), axis=0, keepdims=True)
        dh = (_dot_nt(dhf, wf, dt).astype(jnp.float32)
              + jax.lax.dot_general(                       # sigma outer
                  dsigma_t, wsig.astype(jnp.float32),
                  (((0,), (0,)), ((), ())),
                  preferred_element_type=jnp.float32))
    dws["wsig"] = jax.lax.dot_general(                     # (1, W)
        dsigma_t, h_last.astype(jnp.float32),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dws["bsig"] = jnp.sum(dsigma_t, axis=1, keepdims=True)

    de_t = jnp.zeros((eb_t.shape[0], eb_t.shape[1]), jnp.float32)
    dlayers = [None] * spec.depth
    for i in range(spec.depth - 1, -1, -1):
        kind, entry = layers[i]
        h_in = acts[i - 1] if i > 0 else None
        dz = jnp.where(acts[i].astype(jnp.float32) > 0.0, dh, 0.0).astype(dt)
        db = jnp.sum(dz.astype(jnp.float32), axis=0, keepdims=True)
        if kind == "plain":
            w, _ = entry
            dlayers[i] = [_dot_t(h_in, dz), db]
            dh = _dot_nt(dz, w, dt).astype(jnp.float32)
        else:
            if kind == "pe_skip":
                wpe, wh, _ = entry
                dlayers[i] = [_dot_pe_t(eb_t, dz, dt), _dot_t(h_in, dz), db]
                dh = _dot_nt(dz, wh, dt).astype(jnp.float32)
            else:
                wpe, _ = entry
                dlayers[i] = [_dot_pe_t(eb_t, dz, dt), db]
                dh = None
            de_t = de_t + _dot_pe_x(wpe, dz, dt)
    # split the packed-embedding cotangent back into x / sin / cos rows;
    # PE chain (transposed): d(scaled_t) = dsin_t*cos_t - dcos_t*sin_t;
    # dx_t (3, T) += B^T @ dscaled_t — one dot_general, no transposes
    kcz = sin_t.shape[0]
    dx_t = de_t[0:3]
    dscaled_t = de_t[3:3 + kcz] * cos_t - de_t[3 + kcz:] * sin_t
    dx_t = dx_t + jax.lax.dot_general(
        b_mat, dscaled_t, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    out_dws = []
    for i in range(spec.depth):
        out_dws += dlayers[i]
    out_dws += [dws["wsig"], dws["bsig"]]
    if not spec.sigma_only:
        out_dws += [dws["wf"], dws["bf"], dws["we"], dws["be"],
                    dws["wr"], dws["br"]]
    return dx_t, \
        (dp_e if (not spec.sigma_only and spec.has_extra) else None), \
        out_dws


@functools.lru_cache(maxsize=64)
def _nerf_bwd_call(spec: _NerfSpec, n: int, s: int, n_ws: int,
                   ws_shapes: tuple, interpret: bool):
    b_mat = _freq_matrix(spec.kc // 3, spec.logscale)
    r = _pick_r_t(n, s, _rows_budget(_BWD_ROWS, spec.width))
    grid = pl.cdiv(n, r)
    out_dim = 1 if spec.sigma_only else 4
    e = spec.width // 2

    def kernel(*refs):
        x_ref = refs[0]                              # (3, r*s)
        off = 1
        p_e = None
        if spec.has_extra:
            p_e = jnp.broadcast_to(refs[1][...], (r, s, e)).reshape(r * s, e)
            off = 2
        b_ref = refs[off]
        ws = [refs[off + 1 + i][...] for i in range(n_ws)]
        g_ref = refs[off + 1 + n_ws]                 # (out_dim, r*s)
        outs = refs[off + 2 + n_ws:]
        dx_ref = outs[0]
        o = 1
        if spec.has_extra:
            dpe_ref = outs[1]
            o = 2
        dw_refs = outs[o:]
        dx_t, dpe, dws = _nerf_bwd_tile(
            x_ref[...], p_e, ws, g_ref[...], spec, b_ref[...], r, s)
        dx_ref[...] = dx_t
        if spec.has_extra:
            dpe_ref[...] = dpe

        @pl.when(pl.program_id(0) == 0)
        def _():
            for ref, dw in zip(dw_refs, dws):
                ref[...] = dw

        @pl.when(pl.program_id(0) > 0)
        def _():
            for ref, dw in zip(dw_refs, dws):
                ref[...] = ref[...] + dw

    in_specs = [pl.BlockSpec((3, r * s), lambda i: (0, i),
                             memory_space=pltpu.VMEM)]
    if spec.has_extra:
        in_specs.append(pl.BlockSpec((r, 1, e), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec(b_mat.shape, (lambda i: (0, 0)),
                                 memory_space=pltpu.VMEM))
    for shp in ws_shapes:
        in_specs.append(pl.BlockSpec(shp, (lambda i: (0, 0)),
                                     memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((out_dim, r * s), lambda i: (0, i),
                                 memory_space=pltpu.VMEM))

    out_shapes = [jax.ShapeDtypeStruct((3, grid * r * s), jnp.float32)]
    out_specs = [pl.BlockSpec((3, r * s), lambda i: (0, i),
                              memory_space=pltpu.VMEM)]
    if spec.has_extra:
        out_shapes.append(jax.ShapeDtypeStruct((grid * r, 1, e), jnp.float32))
        out_specs.append(pl.BlockSpec((r, 1, e), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM))
    for shp in ws_shapes:
        out_shapes.append(jax.ShapeDtypeStruct(shp, jnp.float32))
        out_specs.append(pl.BlockSpec(shp, (lambda i: (0, 0)),
                                      memory_space=pltpu.VMEM))

    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    ), grid * r - n


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _nerf_op(spec: _NerfSpec, xyz, p_e, *ws):
    return _nerf_forward(spec, xyz, p_e if spec.has_extra else None, list(ws))


def _nerf_op_fwd(spec, xyz, p_e, *ws):
    return _nerf_op(spec, xyz, p_e, *ws), (xyz, p_e, ws)


def _nerf_op_bwd(spec, res, g):
    xyz_t, p_e, ws = res
    n, s = xyz_t.shape[1], xyz_t.shape[2]
    ws_k = _cast_matrices(ws, spec.dtype_name)  # kernel operands only
    call, n_pad = _nerf_bwd_call(spec, n, s, len(ws_k),
                                 tuple(w.shape for w in ws_k), _interpret())
    b_mat = jnp.asarray(_freq_matrix(spec.kc // 3, spec.logscale))
    args = [_pad_t(xyz_t.reshape(3, n * s), n_pad * s)]
    if spec.has_extra:
        args.append(_pad_rays(p_e, n_pad))
    out_dim = 1 if spec.sigma_only else 4
    outs = call(*args, b_mat, *ws_k,
                _pad_t(g.reshape(out_dim, n * s), n_pad * s))
    dx = outs[0][:, :n * s].reshape(3, n, s)
    o = 1
    dp_e = None
    if spec.has_extra:
        dp_e = outs[1][:n]
        o = 2
    # cotangent dtypes follow the ORIGINAL (fp32) primals — the fp32 dW
    # accumulated in-kernel is never quantized to bf16
    dws = tuple(d.astype(w.dtype) for d, w in zip(outs[o:], ws))
    return (dx, dp_e, *dws)


_nerf_op.defvjp(_nerf_op_fwd, _nerf_op_bwd)


def nerf_fused_rays(params: dict, cfg: NeRFConfig, n_freqs: int,
                    logscale: bool, anneal: jnp.ndarray | None,
                    xyz: jnp.ndarray, extra_emb: jnp.ndarray | None,
                    sigma_only: bool, compute_dtype=None) -> jnp.ndarray:
    """Row-major adapter over :func:`nerf_fused_rays_t` — (N, S, 3) xyz in,
    (N, S, 4|1) out. The fused train path calls the transposed variant
    directly."""
    out_t = nerf_fused_rays_t(params, cfg, n_freqs, logscale, anneal,
                              jnp.moveaxis(xyz, -1, 0), extra_emb,
                              sigma_only, compute_dtype)
    return jnp.moveaxis(out_t, 0, -1)


def nerf_fused_rays_t(params: dict, cfg: NeRFConfig, n_freqs: int,
                      logscale: bool, anneal: jnp.ndarray | None,
                      xyz_t: jnp.ndarray, extra_emb: jnp.ndarray | None,
                      sigma_only: bool, compute_dtype=None) -> jnp.ndarray:
    """Fused NeRF over whole rays, TRANSPOSED xyz I/O.

    Args:
      xyz_t: (3, N, S) raw sample positions, components leading.
      extra_emb: (N, E) per-ray extra feature embedding (already PE'd) or
        None.
      anneal: (n_freqs,) PE annealing weights or None.

    Returns (4, N, S) rgb+sigma fp32, or (1, N, S) sigma if ``sigma_only``.
    """
    has_extra = (extra_emb is not None and not sigma_only
                 and cfg.extra_feat_type != "none")
    ws, p_extra = _nerf_fold(params, cfg, n_freqs, anneal,
                             extra_emb if has_extra else None, sigma_only)
    spec = _NerfSpec(
        depth=cfg.depth, width=cfg.width, kc=3 * max(n_freqs, 1),
        skips=tuple(cfg.skips), sigma_only=sigma_only, has_extra=has_extra,
        dtype_name="bfloat16" if compute_dtype == jnp.bfloat16 else "float32",
        logscale=logscale)
    p_e = p_extra[:, None, :] if has_extra else None
    return _nerf_op(spec, xyz_t, p_e, *ws)


# ===========================================================================
# NoF megakernel
# ===========================================================================

@dataclasses.dataclass(frozen=True)
class _NofSpec:
    depth: int
    width: int
    kc: int
    skips: tuple
    use_quat: bool
    dtype_name: str
    logscale: bool


def _nof_fold(params: dict, cfg: NoFConfig, n_freqs: int,
              anneal: jnp.ndarray | None, ind_emb: jnp.ndarray):
    """Weight split for the NoF kernel. The frame-index embedding columns
    are applied at ray rank here (tiny (N, E) @ (E, W) matmuls) and enter
    the kernel as per-ray partials."""
    kc = 3 * n_freqs
    w_rep = None
    if anneal is not None and kc:
        w_rep = jnp.repeat(anneal, 3, total_repeat_length=kc)[:, None]

    def pe_rows(w):
        # packed single (3+2kc, W) PE weight — see _nerf_fold.pe_rows
        if kc == 0:  # raw-xyz quirk — see _nerf_fold.pe_rows
            z = jnp.zeros((6, w.shape[-1]), w.dtype)
            return [jnp.concatenate([w[:3], z], axis=0)]
        wx, wsin, wcos = w[:3], w[3:3 + kc], w[3 + kc:3 + 2 * kc]
        if w_rep is not None:
            wsin = wsin * w_rep
            wcos = wcos * w_rep
        return [jnp.concatenate([wx, wsin, wcos], axis=0)]

    cx, ce = cfg.in_channels_xyz, cfg.extra_feat_dim
    ws, partials = [], []
    for i, layer in enumerate(params["layers"]):
        w, b = layer["w"], layer["b"]
        if i == 0:
            ws += pe_rows(w[:cx]) + [b[None]]
            partials.append(_dot(ind_emb, w[cx:cx + ce], None))
        elif i in cfg.skips:
            ws += pe_rows(w[:cx]) + [w[cx + ce:], b[None]]
            partials.append(_dot(ind_emb, w[cx:cx + ce], None))
        else:
            ws += [w, b[None]]
    ws += [params["head"]["w"], params["head"]["b"][None]]
    return ws, partials


def _nof_quat_fwd_t(out_t, x_t):
    """Row-vector log-quaternion transform (nn/nof.py::_head; reference
    models/nof.py:75-82), computed TRANSPOSED: components on sublanes,
    samples on lanes — row-major (T, 3) slices are lane-padded to 128 so
    each of the ~30 elementwise ops here would cost a full wide-op;
    transposed they run dense (measured 27 ms -> ~2 ms per render tile).

    Args: out_t (9, T) head output; x_t (3, T) positions.
    Returns ((3, T) warped, residuals)."""
    eps = 1e-8
    v, s, t = out_t[0:3], out_t[3:6], out_t[6:9]
    d = x_t - s
    theta = jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True) + eps * eps)
    w = jnp.cos(theta)
    k = jnp.sin(theta) / theta
    qv = -v * k
    t1 = _cross_t(qv, d) + w * d
    warped = d + 2.0 * _cross_t(qv, t1) + s + t
    return warped, (v, s, d, theta, w, k, qv, t1)


def _cross_t(a, b):
    a0, a1, a2 = a[0:1], a[1:2], a[2:3]
    b0, b1, b2 = b[0:1], b[1:2], b[2:3]
    return jnp.concatenate(
        [a1 * b2 - a2 * b1, a2 * b0 - a0 * b2, a0 * b1 - a1 * b0], axis=0)


def _nof_quat_bwd_t(res, g):
    """Hand-chained VJP of _nof_quat_fwd_t ((3,T) cotangent g):
    returns (dout9 (9,T), dxyz (3,T))."""
    v, s, d, theta, w, k, qv, t1 = res
    # warped = d + 2*cross(qv, t1) + s + t
    dqv = _cross_t(t1, 2.0 * g)          # da = b x dc
    dt1 = _cross_t(2.0 * g, qv)          # db = dc x a
    dd = g
    ds = g
    dt = g
    # t1 = cross(qv, d) + w*d
    dqv = dqv + _cross_t(d, dt1)
    dd = dd + _cross_t(dt1, qv) + w * dt1
    dw = jnp.sum(dt1 * d, axis=0, keepdims=True)
    # qv = -v*k
    dv = -k * dqv
    dk = jnp.sum(-v * dqv, axis=0, keepdims=True)
    # w = cos(theta), k = sin(theta)/theta
    sin_t = k * theta
    dtheta = -sin_t * dw + dk * (w / theta - sin_t / (theta * theta))
    # theta = sqrt(sum v^2 + eps^2)
    dv = dv + dtheta * v / theta
    # d = xyz - s
    dxyz = dd
    ds = ds - dd
    dout9 = jnp.concatenate([dv, ds, dt], axis=0)
    return dout9, dxyz


def _nof_tile(x_t, partials, ws, spec: _NofSpec, b_mat):
    """NoF forward for one row block, FULLY TRANSPOSED xyz I/O: ``x_t`` is
    ``(3, T)`` (components on sublanes) and the warped output is ``(3, T)``.
    Row-major (T, 3) tensors lane-pad 3 -> 128, so every HBM touch and
    every elementwise op on them costs a full wide op (PERF.md round 2 /
    round 3); keeping xyz transposed end-to-end removes that tax from the
    kernel DMA, the quat head, and the XLA glue between kernels."""
    dt = _dtype(spec.dtype_name)
    # PE transposed: (kc, 3) @ (3, T) -> (kc, T) straight off the MXU
    scaled_t = jax.lax.dot_general(b_mat, x_t, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    sin_t, cos_t = jnp.sin(scaled_t), jnp.cos(scaled_t)
    xb_t = x_t.astype(dt)
    # packed PE embedding — one K=3+2kc MXU pass per PE layer (see
    # _nerf_tile / probe_pe_pack.py)
    e_t = jnp.concatenate([xb_t, sin_t.astype(dt), cos_t.astype(dt)],
                          axis=0)

    acts = []
    it = iter(ws)
    pit = iter(partials)
    h = None
    for i in range(spec.depth):
        if i == 0:
            wpe, b = next(it), next(it)
            z = (_dot_pe(e_t, wpe, dt)
                 + next(pit).astype(jnp.float32) + b.astype(jnp.float32))
        elif i in spec.skips:
            wpe, wh, b = next(it), next(it), next(it)
            z = (_dot_pe(e_t, wpe, dt) + _dot(h, wh, dt)
                 + next(pit).astype(jnp.float32) + b.astype(jnp.float32))
        else:
            w, b = next(it), next(it)
            z = _dot(h, w, dt) + b.astype(jnp.float32)
        h = jnp.maximum(z, 0.0).astype(dt)
        acts.append(h)
    whead, bhead = next(it), next(it)
    if spec.use_quat:
        # head emitted TRANSPOSED straight off the MXU (contract whead's
        # input dim with h's feature dim); x is already transposed
        hh = h if dt is None else h.astype(dt)
        wh = whead if dt is None else whead.astype(dt)
        out_t = jax.lax.dot_general(wh, hh, (((0,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        out_t = out_t + bhead.T.astype(jnp.float32)   # (9, T)
        warped_t, qres = _nof_quat_fwd_t(out_t, x_t)
        return warped_t, (sin_t, cos_t, acts, None, qres)
    hh = h if dt is None else h.astype(dt)
    wh = whead if dt is None else whead.astype(dt)
    out_t = jax.lax.dot_general(wh, hh, (((0,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) \
        + bhead.T.astype(jnp.float32)                 # (3, T)
    return out_t + x_t, (sin_t, cos_t, acts, None, None)


@functools.lru_cache(maxsize=64)
def _nof_fwd_call(spec: _NofSpec, n: int, s: int, n_ws: int, n_part: int,
                  ws_shapes: tuple, interpret: bool):
    b_mat = _freq_matrix(spec.kc // 3, spec.logscale)
    r = _pick_r_t(n, s, _FWD_ROWS)
    grid = pl.cdiv(n, r)

    def kernel(*refs):
        x_ref = refs[0]                              # (3, r*s)
        w = spec.width
        partials = [
            jnp.broadcast_to(refs[1 + i][...], (r, s, w)).reshape(r * s, w)
            for i in range(n_part)]
        b_ref = refs[1 + n_part]
        ws = [refs[2 + n_part + i][...] for i in range(n_ws)]
        out_ref = refs[2 + n_part + n_ws]
        out_t, _ = _nof_tile(x_ref[...], partials, ws, spec, b_ref[...])
        out_ref[...] = out_t                         # (3, r*s)

    in_specs = [pl.BlockSpec((3, r * s), lambda i: (0, i),
                             memory_space=pltpu.VMEM)]
    for _ in range(n_part):
        in_specs.append(pl.BlockSpec((r, 1, spec.width), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec(b_mat.shape, (lambda i: (0, 0)),
                                 memory_space=pltpu.VMEM))
    for shp in ws_shapes:
        in_specs.append(pl.BlockSpec(shp, (lambda i: (0, 0)),
                                     memory_space=pltpu.VMEM))

    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((3, r * s), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, grid * r * s), jnp.float32),
        interpret=interpret,
    ), grid * r - n


def _nof_bwd_tile(x_t, partials, ws, g_t, spec: _NofSpec, b_mat, r, s,
                  res=None):
    """Per-warp VJP tile, transposed xyz I/O: ``x_t``/``g_t``/returned
    ``dx_t`` are ``(3, T)``. ``res`` passes the forward residuals
    (sin_t, cos_t, acts, _, qres) when the caller already ran the
    forward (the chain backward computes every stage's input anyway —
    recomputing the same forward again inside the VJP was ~25% of the
    chain backward's FLOPs)."""
    dt = _dtype(spec.dtype_name)
    if res is None:
        _, res = _nof_tile(x_t, partials, ws, spec, b_mat)
    sin_t, cos_t, acts, _, qres = res
    xb_t = x_t.astype(dt)
    eb_t = jnp.concatenate([xb_t, sin_t.astype(dt), cos_t.astype(dt)],
                           axis=0)                    # (3+2kc, T) packed PE

    it = iter(ws)
    layers = []
    for i in range(spec.depth):
        if i == 0:
            layers.append(("pe", [next(it) for _ in range(2)]))
        elif i in spec.skips:
            layers.append(("pe_skip", [next(it) for _ in range(3)]))
        else:
            layers.append(("plain", [next(it), next(it)]))
    whead, bhead = next(it), next(it)

    h_last = acts[-1]
    if spec.use_quat:
        dout9_t, dx_t = _nof_quat_bwd_t(qres, g_t)    # (9,T), (3,T)
        d9 = dout9_t if dt is None else dout9_t.astype(dt)
        hh = h_last if dt is None else h_last.astype(dt)
        wh = whead if dt is None else whead.astype(dt)
        # dwhead (W, 9) = h^T @ dout9; dh (T, W) = dout9 @ whead^T — both
        # contracted directly against the transposed head output
        dwhead = jax.lax.dot_general(hh, d9, (((0,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        dbhead = jnp.sum(dout9_t, axis=1, keepdims=True).T
        dh = jax.lax.dot_general(d9, wh, (((0,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    else:
        dx_t = g_t
        d3 = g_t.astype(dt) if dt is not None else g_t
        hh = h_last if dt is None else h_last.astype(dt)
        wh = whead if dt is None else whead.astype(dt)
        dwhead = jax.lax.dot_general(hh, d3, (((0,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        dbhead = jnp.sum(g_t, axis=1, keepdims=True).T
        dh = jax.lax.dot_general(d3, wh, (((0,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)

    dlayers = [None] * spec.depth
    de_t = jnp.zeros((eb_t.shape[0], eb_t.shape[1]), jnp.float32)
    # pe layers in forward order, one per-ray partial slot each
    pe_order = [i for i in range(spec.depth)
                if i == 0 or i in spec.skips]
    dpartials = [None] * len(pe_order)
    for i in range(spec.depth - 1, -1, -1):
        kind, entry = layers[i]
        h_in = acts[i - 1] if i > 0 else None
        dz = jnp.where(acts[i].astype(jnp.float32) > 0.0, dh, 0.0).astype(dt)
        db = jnp.sum(dz.astype(jnp.float32), axis=0, keepdims=True)
        if kind == "plain":
            w, _ = entry
            dlayers[i] = [_dot_t(h_in, dz), db]
            dh = _dot_nt(dz, w, dt).astype(jnp.float32)
        else:
            if kind == "pe_skip":
                wpe, wh, _ = entry
                dlayers[i] = [_dot_pe_t(eb_t, dz, dt), _dot_t(h_in, dz), db]
                dh = _dot_nt(dz, wh, dt).astype(jnp.float32)
            else:
                wpe, _ = entry
                dlayers[i] = [_dot_pe_t(eb_t, dz, dt), db]
                dh = None
            dpartials[pe_order.index(i)] = jnp.sum(
                dz.astype(jnp.float32).reshape(r, s, -1), axis=1,
                keepdims=True)
            de_t = de_t + _dot_pe_x(wpe, dz, dt)
    # split the packed-embedding cotangent: x rows add to dx_t, sin/cos
    # rows chain through the PE trig (see _nerf_bwd_tile)
    kcz = sin_t.shape[0]
    dx_t = dx_t + de_t[0:3]
    dscaled_t = de_t[3:3 + kcz] * cos_t - de_t[3 + kcz:] * sin_t
    dx_t = dx_t + jax.lax.dot_general(
        b_mat, dscaled_t, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    out_dws = []
    for i in range(spec.depth):
        out_dws += dlayers[i]
    out_dws += [dwhead, dbhead]
    return dx_t, [d for d in dpartials if d is not None], out_dws


@functools.lru_cache(maxsize=64)
def _nof_bwd_call(spec: _NofSpec, n: int, s: int, n_ws: int, n_part: int,
                  ws_shapes: tuple, interpret: bool):
    b_mat = _freq_matrix(spec.kc // 3, spec.logscale)
    r = _pick_r_t(n, s, _rows_budget(_BWD_ROWS, spec.width))
    grid = pl.cdiv(n, r)

    def kernel(*refs):
        x_ref = refs[0]                              # (3, r*s)
        w = spec.width
        partials = [
            jnp.broadcast_to(refs[1 + i][...], (r, s, w)).reshape(r * s, w)
            for i in range(n_part)]
        b_ref = refs[1 + n_part]
        ws = [refs[2 + n_part + i][...] for i in range(n_ws)]
        g_ref = refs[2 + n_part + n_ws]              # (3, r*s)
        outs = refs[3 + n_part + n_ws:]
        dx_ref = outs[0]
        dpart_refs = outs[1:1 + n_part]
        dw_refs = outs[1 + n_part:]
        dx_t, dparts, dws = _nof_bwd_tile(
            x_ref[...], partials, ws, g_ref[...], spec, b_ref[...], r, s)
        dx_ref[...] = dx_t
        for ref, dp in zip(dpart_refs, dparts):
            ref[...] = dp

        @pl.when(pl.program_id(0) == 0)
        def _():
            for ref, dw in zip(dw_refs, dws):
                ref[...] = dw

        @pl.when(pl.program_id(0) > 0)
        def _():
            for ref, dw in zip(dw_refs, dws):
                ref[...] = ref[...] + dw

    in_specs = [pl.BlockSpec((3, r * s), lambda i: (0, i),
                             memory_space=pltpu.VMEM)]
    for _ in range(n_part):
        in_specs.append(pl.BlockSpec((r, 1, spec.width), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec(b_mat.shape, (lambda i: (0, 0)),
                                 memory_space=pltpu.VMEM))
    for shp in ws_shapes:
        in_specs.append(pl.BlockSpec(shp, (lambda i: (0, 0)),
                                     memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec((3, r * s), lambda i: (0, i),
                                 memory_space=pltpu.VMEM))

    out_shapes = [jax.ShapeDtypeStruct((3, grid * r * s), jnp.float32)]
    out_specs = [pl.BlockSpec((3, r * s), lambda i: (0, i),
                              memory_space=pltpu.VMEM)]
    for _ in range(n_part):
        out_shapes.append(
            jax.ShapeDtypeStruct((grid * r, 1, spec.width), jnp.float32))
        out_specs.append(pl.BlockSpec((r, 1, spec.width), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM))
    for shp in ws_shapes:
        out_shapes.append(jax.ShapeDtypeStruct(shp, jnp.float32))
        out_specs.append(pl.BlockSpec(shp, (lambda i: (0, 0)),
                                      memory_space=pltpu.VMEM))

    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    ), grid * r - n


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _nof_op(spec: _NofSpec, n_part: int, xyz_t, *arrs):
    """xyz_t: (3, N, S) transposed samples; returns warped (3, N, S)."""
    partials, ws = list(arrs[:n_part]), list(arrs[n_part:])
    ws = _cast_matrices(ws, spec.dtype_name)
    n, s = xyz_t.shape[1], xyz_t.shape[2]
    call, n_pad = _nof_fwd_call(spec, n, s, len(ws), n_part,
                                tuple(w.shape for w in ws), _interpret())
    b_mat = jnp.asarray(_freq_matrix(spec.kc // 3, spec.logscale))
    args = ([_pad_t(xyz_t.reshape(3, n * s), n_pad * s)]
            + [_pad_rays(p, n_pad) for p in partials])
    out = call(*args, b_mat, *ws)
    return out[:, :n * s].reshape(3, n, s)


def _nof_op_fwd(spec, n_part, xyz_t, *arrs):
    return _nof_op(spec, n_part, xyz_t, *arrs), (xyz_t, arrs)


def _nof_op_bwd(spec, n_part, res, g):
    xyz_t, arrs = res
    partials, ws = list(arrs[:n_part]), list(arrs[n_part:])
    ws_k = _cast_matrices(ws, spec.dtype_name)  # kernel operands only
    n, s = xyz_t.shape[1], xyz_t.shape[2]
    call, n_pad = _nof_bwd_call(spec, n, s, len(ws_k), n_part,
                                tuple(w.shape for w in ws_k), _interpret())
    b_mat = jnp.asarray(_freq_matrix(spec.kc // 3, spec.logscale))
    args = ([_pad_t(xyz_t.reshape(3, n * s), n_pad * s)]
            + [_pad_rays(p, n_pad) for p in partials])
    outs = call(*args, b_mat, *ws_k,
                _pad_t(g.reshape(3, n * s), n_pad * s))
    dx = outs[0][:, :n * s].reshape(3, n, s)
    dparts = tuple(outs[1 + i][:n] for i in range(n_part))
    dws = tuple(d.astype(w.dtype)
                for d, w in zip(outs[1 + n_part:], ws))
    return (dx, *dparts, *dws)


_nof_op.defvjp(_nof_op_fwd, _nof_op_bwd)


# ===========================================================================
# Fused NoF warp CHAIN (training): bw warp + local fw reconstruction +
# global chain fw/bw/fw — up to five sequential NoF evaluations whose
# intermediates stay in VMEM (the reference evaluates them as five separate
# passes, models/rendering.py:270-282; as separate kernels each intermediate
# (N, S, 3) costs a lane-padded HBM round trip). One custom VJP backs the
# whole chain: the backward kernel recomputes the stage inputs once and
# reuses the per-warp VJP tile, accumulating bw/fw weight gradients across
# warps AND grid steps in VMEM.
# ===========================================================================

@dataclasses.dataclass(frozen=True)
class _ChainSpec:
    nof: _NofSpec
    chain_local: bool
    chain_global: bool


def _chain_stages(spec: _ChainSpec):
    """Static chain layout: (net, partial-set) per stage. Partial sets:
    0 = bw@ind, 1 = fw@ind, 2 = fw@chained, 3 = bw@chained."""
    stages = [("bw", 0)]
    if spec.chain_local:
        stages.append(("fw", 1))
    if spec.chain_global:
        stages += [("fw", 2), ("bw", 3), ("fw", 1)]
    return stages


@functools.lru_cache(maxsize=32)
def _chain_fwd_call(spec: _ChainSpec, n: int, s: int, n_ws: int, n_pe: int,
                    n_sets: int, ws_shapes: tuple, interpret: bool):
    b_mat = _freq_matrix(spec.nof.kc // 3, spec.nof.logscale)
    r = _pick_r_t(n, s, _FWD_ROWS)
    grid = pl.cdiv(n, r)
    w = spec.nof.width
    n_out = 1 + int(spec.chain_local) + int(spec.chain_global)

    def kernel(*refs):
        x_t = refs[0][...]                           # (3, r*s)
        sets = []
        for k in range(n_sets):
            sets.append([jnp.broadcast_to(
                refs[1 + k * n_pe + j][...], (r, s, w)).reshape(r * s, w)
                for j in range(n_pe)])
        i = 1 + n_sets * n_pe
        b_ref = refs[i][...]
        ws_bw = [refs[i + 1 + k][...] for k in range(n_ws)]
        ws_fw = [refs[i + 1 + n_ws + k][...] for k in range(n_ws)]
        outs = refs[i + 1 + 2 * n_ws:]
        ws_by = {"bw": ws_bw, "fw": ws_fw}

        o = 0
        cano = None
        cur = x_t
        for si, (net, ps) in enumerate(_chain_stages(spec)):
            cur, _ = _nof_tile(cur, sets[ps], ws_by[net], spec.nof, b_ref)
            if si == 0:
                cano = cur
                outs[o][...] = cur
                o += 1
            elif spec.chain_local and si == 1:
                outs[o][...] = cur                    # recon
                o += 1
                cur = cano                            # global chain restarts
        if spec.chain_global:
            outs[o][...] = cur                        # chain_recon

    in_specs = [pl.BlockSpec((3, r * s), lambda i: (0, i),
                             memory_space=pltpu.VMEM)]
    for _ in range(n_sets * n_pe):
        in_specs.append(pl.BlockSpec((r, 1, w), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec(b_mat.shape, (lambda i: (0, 0)),
                                 memory_space=pltpu.VMEM))
    for shp in ws_shapes + ws_shapes:
        in_specs.append(pl.BlockSpec(shp, (lambda i: (0, 0)),
                                     memory_space=pltpu.VMEM))

    out_specs = [pl.BlockSpec((3, r * s), lambda i: (0, i),
                              memory_space=pltpu.VMEM)] * n_out
    out_shapes = [jax.ShapeDtypeStruct((3, grid * r * s),
                                       jnp.float32)] * n_out
    return pl.pallas_call(
        kernel, grid=(grid,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shapes, interpret=interpret,
    ), grid * r - n


@functools.lru_cache(maxsize=32)
def _chain_bwd_call(spec: _ChainSpec, n: int, s: int, n_ws: int, n_pe: int,
                    n_sets: int, ws_shapes: tuple, interpret: bool):
    b_mat = _freq_matrix(spec.nof.kc // 3, spec.nof.logscale)
    # the chain backward holds 5 stage inputs + a per-warp VJP footprint:
    # its own (smaller) row budget
    r = _pick_r_t(n, s, _CHAIN_BWD_ROWS)
    grid = pl.cdiv(n, r)
    w = spec.nof.width
    n_out = 1 + int(spec.chain_local) + int(spec.chain_global)

    def kernel(*refs):
        x_t = refs[0][...]                           # (3, r*s)
        sets = []
        for k in range(n_sets):
            sets.append([jnp.broadcast_to(
                refs[1 + k * n_pe + j][...], (r, s, w)).reshape(r * s, w)
                for j in range(n_pe)])
        i = 1 + n_sets * n_pe
        b_ref = refs[i][...]
        ws_bw = [refs[i + 1 + k][...] for k in range(n_ws)]
        ws_fw = [refs[i + 1 + n_ws + k][...] for k in range(n_ws)]
        i = i + 1 + 2 * n_ws
        gs = [refs[i + k][...] for k in range(n_out)]  # (3, r*s) each
        outs = refs[i + n_out:]
        ws_by = {"bw": ws_bw, "fw": ws_fw}

        # ONE forward over the chain, keeping every stage's input AND
        # residuals — the per-warp VJPs below then skip their own forward
        # recompute entirely (was 5 duplicate _nof_tile evaluations)
        stages = _chain_stages(spec)
        inputs, residuals = [], []
        cano = None
        cur = x_t
        for si, (net, ps) in enumerate(stages):
            inputs.append(cur)
            cur, res_si = _nof_tile(cur, sets[ps], ws_by[net], spec.nof,
                                    b_ref)
            residuals.append(res_si)
            if si == 0:
                cano = cur
            elif spec.chain_local and si == 1:
                cur = cano

        # reverse chain rule over the stored residuals
        g_cano = gs[0]
        g_recon = gs[1] if spec.chain_local else None
        g_chain = gs[-1] if spec.chain_global else None
        zero_ws = [jnp.zeros(shp, jnp.float32) for shp in ws_shapes]
        dws = {"bw": list(zero_ws), "fw": [jnp.zeros(shp, jnp.float32)
                                           for shp in ws_shapes]}
        dsets = [[jnp.zeros((r, 1, w), jnp.float32) for _ in range(n_pe)]
                 for _ in range(n_sets)]
        d_cano = g_cano
        local_i = 1 if spec.chain_local else None
        glob0 = (2 if spec.chain_local else 1)

        def warp_vjp(si, g):
            net, ps = stages[si]
            dx_, dps_, dws_ = _nof_bwd_tile(inputs[si], sets[ps],
                                            ws_by[net], g, spec.nof,
                                            b_ref, r, s,
                                            res=residuals[si])
            dws[net] = [a + b for a, b in zip(dws[net], dws_)]
            dsets[ps] = [a + b for a, b in zip(dsets[ps], dps_)]
            return dx_

        if spec.chain_global:
            d_ch_cano = warp_vjp(glob0 + 2, g_chain)
            d_chained = warp_vjp(glob0 + 1, d_ch_cano)
            d_cano = d_cano + warp_vjp(glob0, d_chained)
        if spec.chain_local:
            d_cano = d_cano + warp_vjp(local_i, g_recon)
        dx_t = warp_vjp(0, d_cano)

        outs[0][...] = dx_t
        o = 1
        for k in range(n_sets):
            for j in range(n_pe):
                outs[o][...] = dsets[k][j]
                o += 1

        @pl.when(pl.program_id(0) == 0)
        def _():
            oo = o
            for net in ("bw", "fw"):
                for dw in dws[net]:
                    outs[oo][...] = dw
                    oo += 1

        @pl.when(pl.program_id(0) > 0)
        def _():
            oo = o
            for net in ("bw", "fw"):
                for dw in dws[net]:
                    outs[oo][...] = outs[oo][...] + dw
                    oo += 1

    in_specs = [pl.BlockSpec((3, r * s), lambda i: (0, i),
                             memory_space=pltpu.VMEM)]
    for _ in range(n_sets * n_pe):
        in_specs.append(pl.BlockSpec((r, 1, w), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec(b_mat.shape, (lambda i: (0, 0)),
                                 memory_space=pltpu.VMEM))
    for shp in ws_shapes + ws_shapes:
        in_specs.append(pl.BlockSpec(shp, (lambda i: (0, 0)),
                                     memory_space=pltpu.VMEM))
    for _ in range(n_out):
        in_specs.append(pl.BlockSpec((3, r * s), lambda i: (0, i),
                                     memory_space=pltpu.VMEM))

    out_specs = [pl.BlockSpec((3, r * s), lambda i: (0, i),
                              memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((3, grid * r * s), jnp.float32)]
    for _ in range(n_sets * n_pe):
        out_specs.append(pl.BlockSpec((r, 1, w), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(
            jax.ShapeDtypeStruct((grid * r, 1, w), jnp.float32))
    for shp in ws_shapes + ws_shapes:
        out_specs.append(pl.BlockSpec(shp, (lambda i: (0, 0)),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct(shp, jnp.float32))
    return pl.pallas_call(
        kernel, grid=(grid,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shapes, interpret=interpret,
    ), grid * r - n


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _chain_op(spec: _ChainSpec, n_pe: int, n_sets: int, xyz_t, *arrs):
    """xyz_t: (3, N, S); returns (cano, recon?, chain_recon?) as (3, N, S)
    each — transposed end-to-end (see _nof_tile)."""
    n, s = xyz_t.shape[1], xyz_t.shape[2]
    n_parts = n_sets * n_pe
    n_ws = (len(arrs) - n_parts) // 2
    ws_cast = _cast_matrices(arrs[n_parts:], spec.nof.dtype_name)
    ws_shapes = tuple(a.shape for a in ws_cast[:n_ws])
    call, n_pad = _chain_fwd_call(spec, n, s, n_ws, n_pe, n_sets, ws_shapes,
                                  _interpret())
    b_mat = jnp.asarray(_freq_matrix(spec.nof.kc // 3, spec.nof.logscale))
    args = ([_pad_t(xyz_t.reshape(3, n * s), n_pad * s)]
            + [_pad_rays(p, n_pad) for p in arrs[:n_parts]]
            + [b_mat] + ws_cast)
    outs = call(*args)
    return tuple(o[:, :n * s].reshape(3, n, s) for o in outs)


def _chain_op_fwd(spec, n_pe, n_sets, xyz_t, *arrs):
    return _chain_op(spec, n_pe, n_sets, xyz_t, *arrs), (xyz_t, arrs)


def _chain_op_bwd(spec, n_pe, n_sets, res, gs):
    xyz_t, arrs = res
    n, s = xyz_t.shape[1], xyz_t.shape[2]
    n_parts = n_sets * n_pe
    n_ws = (len(arrs) - n_parts) // 2
    ws_cast = _cast_matrices(arrs[n_parts:], spec.nof.dtype_name)
    ws_shapes = tuple(a.shape for a in ws_cast[:n_ws])
    call, n_pad = _chain_bwd_call(spec, n, s, n_ws, n_pe, n_sets, ws_shapes,
                                  _interpret())
    # cotangent dtypes follow the ORIGINAL primals (arrs), not ws_cast
    b_mat = jnp.asarray(_freq_matrix(spec.nof.kc // 3, spec.nof.logscale))
    args = ([_pad_t(xyz_t.reshape(3, n * s), n_pad * s)]
            + [_pad_rays(p, n_pad) for p in arrs[:n_parts]]
            + [b_mat] + ws_cast
            + [_pad_t(g.reshape(3, n * s), n_pad * s) for g in gs])
    outs = call(*args)
    dx = outs[0][:, :n * s].reshape(3, n, s)
    dparts = tuple(outs[1 + i][:n] for i in range(n_parts))
    dws = tuple(d.astype(a.dtype)
                for d, a in zip(outs[1 + n_parts:], arrs[n_parts:]))
    return (dx, *dparts, *dws)


_chain_op.defvjp(_chain_op_fwd, _chain_op_bwd)


def nof_chain_rays(params: dict, cfg: NoFConfig, n_freqs: int,
                   logscale: bool, anneal, xyz: jnp.ndarray,
                   ind_emb: jnp.ndarray, chained_emb,
                   chain_local: bool, chain_global: bool,
                   compute_dtype=None):
    """Row-major adapter over :func:`nof_chain_rays_t` — xyz (N, S, 3) in,
    (N, S, 3) outs. The fused train path uses the transposed variant
    directly so the warp tensors never take the lane-padded layout."""
    outs = nof_chain_rays_t(params, cfg, n_freqs, logscale, anneal,
                            jnp.moveaxis(xyz, -1, 0), ind_emb, chained_emb,
                            chain_local, chain_global, compute_dtype)
    return tuple(jnp.moveaxis(o, 0, -1) if o is not None else None
                 for o in outs)


def nof_chain_rays_t(params: dict, cfg: NoFConfig, n_freqs: int,
                     logscale: bool, anneal, xyz_t: jnp.ndarray,
                     ind_emb: jnp.ndarray, chained_emb,
                     chain_local: bool, chain_global: bool,
                     compute_dtype=None):
    """Run the full training NoF warp chain in one fused kernel,
    TRANSPOSED xyz I/O (components on sublanes — no 3->128 lane padding
    anywhere in the chain's HBM traffic).

    Args:
      xyz_t: (3, N, S); ind_emb / chained_emb: (N, E) per-ray embedded
        frame indices (chained_emb only needed when chain_global).

    Returns (cano, recon | None, chain_recon | None), each (3, N, S).
    """
    dtype_name = "bfloat16" if compute_dtype == jnp.bfloat16 else "float32"
    nof_spec = _NofSpec(
        depth=cfg.depth, width=cfg.width, kc=3 * max(n_freqs, 1),
        skips=tuple(cfg.skips), use_quat=cfg.use_quat,
        dtype_name=dtype_name, logscale=logscale)
    spec = _ChainSpec(nof=nof_spec, chain_local=chain_local,
                      chain_global=chain_global)
    with_fw = chain_local or chain_global

    ws_bw, p_bw_ind = _nof_fold(params["bw_NoF"], cfg, n_freqs, anneal,
                                ind_emb)
    ws_fw, p_fw_ind = (_nof_fold(params["fw_NoF"], cfg, n_freqs, anneal,
                                 ind_emb) if with_fw else (ws_bw, p_bw_ind))
    sets = [p_bw_ind, p_fw_ind]
    if chain_global:
        _, p_fw_ch = _nof_fold(params["fw_NoF"], cfg, n_freqs, anneal,
                               chained_emb)
        _, p_bw_ch = _nof_fold(params["bw_NoF"], cfg, n_freqs, anneal,
                               chained_emb)
        sets += [p_fw_ch, p_bw_ch]
    n_pe = len(p_bw_ind)
    parts = [p[:, None, :] for st in sets for p in st]
    outs = _chain_op(spec, n_pe, len(sets), xyz_t, *parts, *ws_bw, *ws_fw)
    cano = outs[0]
    recon = outs[1] if chain_local else None
    chain_recon = outs[-1] if chain_global else None
    return cano, recon, chain_recon


# ===========================================================================
# Combined test-time render pass: rays+z in -> (bw-NoF warp ->) NeRF -> out.
# One kernel per pass: the (N, S, 3) xyz and warped-xyz tensors never exist
# in HBM (each would cost ~2.1 GB lane-padded per 16k-ray tile), and the
# sample positions are reconstructed from o + d*z inside VMEM. Forward-only
# (the renderer skips consensus losses at test time, so no VJP is needed).
# ===========================================================================

@dataclasses.dataclass(frozen=True)
class _PassSpec:
    nerf: _NerfSpec
    nof: "_NofSpec | None"


@functools.lru_cache(maxsize=64)
def _pass_call(spec: _PassSpec, n: int, s: int, n_nof_ws: int, n_part: int,
               n_nerf_ws: int, shapes: tuple, interpret: bool):
    nerf_b = _freq_matrix(spec.nerf.kc // 3, spec.nerf.logscale)
    # the 2-D z block (r, s) needs r % 8 == 0, and the (1, r*s) sigma out
    # block needs r*s % 128 == 0 — unless a single block covers everything
    lane_align = 128 // math.gcd(s, 128)
    r = _pick_r(n, s, _PASS_ROWS, align=8 * lane_align // math.gcd(8, lane_align))
    grid = pl.cdiv(n, r)
    has_nof = spec.nof is not None
    nof_b = (_freq_matrix(spec.nof.kc // 3, spec.nof.logscale)
             if has_nof else None)

    def kernel(*refs):
        od = refs[0][...]                       # (R, 1, 6)
        z = refs[1][...]                        # (R, S)
        xyz3 = od[:, :, 0:3] + od[:, :, 3:6] * z[:, :, None]
        # the tile fns take TRANSPOSED xyz (components on sublanes); one
        # in-kernel relayout here, then warp -> NeRF flows transposed with
        # no further transposes (the quat head and PE want it that way)
        x = xyz3.reshape(r * s, 3).T            # (3, r*s)
        i = 2
        if has_nof:
            w = spec.nof.width
            partials = [
                jnp.broadcast_to(refs[i + k][...], (r, s, w)).reshape(
                    r * s, w) for k in range(n_part)]
            i += n_part
            nof_bref = refs[i][...]
            i += 1
            nof_ws = [refs[i + k][...] for k in range(n_nof_ws)]
            i += n_nof_ws
            x, _ = _nof_tile(x, partials, nof_ws, spec.nof, nof_bref)
        p_e = None
        if spec.nerf.has_extra:
            e = spec.nerf.width // 2
            p_e = jnp.broadcast_to(refs[i][...], (r, s, e)).reshape(r * s, e)
            i += 1
        nerf_bref = refs[i][...]
        i += 1
        nerf_ws = [refs[i + k][...] for k in range(n_nerf_ws)]
        (rgb_t, sigma_row), _ = _nerf_tile(x, p_e, nerf_ws, spec.nerf,
                                           nerf_bref, rs=(r, s))
        refs[i + n_nerf_ws][...] = sigma_row                # (1, r*s)
        if not spec.nerf.sigma_only:
            refs[i + n_nerf_ws + 1][...] = rgb_t            # (3, r*s)

    in_specs = [pl.BlockSpec((r, 1, 6), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((r, s), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    if has_nof:
        for _ in range(n_part):
            in_specs.append(pl.BlockSpec((r, 1, spec.nof.width),
                                         lambda i: (i, 0, 0),
                                         memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(nof_b.shape, (lambda i: (0, 0)),
                                     memory_space=pltpu.VMEM))
        for k in range(n_nof_ws):
            in_specs.append(pl.BlockSpec(shapes[k], (lambda i: (0, 0)),
                                         memory_space=pltpu.VMEM))
    if spec.nerf.has_extra:
        in_specs.append(pl.BlockSpec((r, 1, spec.nerf.width // 2),
                                     lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
    in_specs.append(pl.BlockSpec(nerf_b.shape, (lambda i: (0, 0)),
                                 memory_space=pltpu.VMEM))
    for k in range(n_nerf_ws):
        in_specs.append(pl.BlockSpec(shapes[n_nof_ws + k],
                                     (lambda i: (0, 0)),
                                     memory_space=pltpu.VMEM))

    out_specs = [pl.BlockSpec((1, r * s), lambda i: (0, i),
                              memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((1, grid * r * s), jnp.float32)]
    if not spec.nerf.sigma_only:
        out_specs.append(pl.BlockSpec((3, r * s), lambda i: (0, i),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(
            jax.ShapeDtypeStruct((3, grid * r * s), jnp.float32))
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
    ), grid * r - n


def render_pass_fused(params: dict, nerf_key: str, nerf_cfg: NeRFConfig,
                      nof_cfg, nerf_freqs: int, nof_freqs: int,
                      nerf_logscale: bool, nof_logscale: bool,
                      anneal_nerf, anneal_nof,
                      rays_o: jnp.ndarray, rays_d: jnp.ndarray,
                      z_vals: jnp.ndarray, extra_emb, ind_emb,
                      use_nof: bool, sigma_only: bool,
                      compute_dtype=None) -> jnp.ndarray:
    """One fused test-time render pass over whole rays.

    Args:
      rays_o, rays_d: (N, 3); z_vals: (N, S) sample depths.
      extra_emb: (N, E) per-ray NeRF extra embedding (None if sigma_only or
        extra_feat_type none); ind_emb: (N, E') per-ray NoF frame embedding.

    Returns ``(sigma (N, S), rgb_t (3, N, S) | None)`` fp32 — both in
    dense lane-efficient layouts (no (N, S, 3/4) lane padding for XLA to
    relayout).
    """
    has_extra = (extra_emb is not None and not sigma_only
                 and nerf_cfg.extra_feat_type != "none")
    nerf_ws, p_extra = _nerf_fold(params[nerf_key], nerf_cfg, nerf_freqs,
                                  anneal_nerf,
                                  extra_emb if has_extra else None,
                                  sigma_only)
    dtype_name = "bfloat16" if compute_dtype == jnp.bfloat16 else "float32"
    nerf_ws = _cast_matrices(nerf_ws, dtype_name)
    nerf_spec = _NerfSpec(
        depth=nerf_cfg.depth, width=nerf_cfg.width, kc=3 * max(nerf_freqs, 1),
        skips=tuple(nerf_cfg.skips), sigma_only=sigma_only,
        has_extra=has_extra, dtype_name=dtype_name, logscale=nerf_logscale)

    nof_ws, partials, nof_spec = [], [], None
    if use_nof:
        nof_ws, partials = _nof_fold(params["bw_NoF"], nof_cfg, nof_freqs,
                                     anneal_nof, ind_emb)
        nof_ws = _cast_matrices(nof_ws, dtype_name)
        nof_spec = _NofSpec(
            depth=nof_cfg.depth, width=nof_cfg.width, kc=3 * max(nof_freqs, 1),
            skips=tuple(nof_cfg.skips), use_quat=nof_cfg.use_quat,
            dtype_name=dtype_name, logscale=nof_logscale)

    spec = _PassSpec(nerf=nerf_spec, nof=nof_spec)
    n, s = z_vals.shape[0], z_vals.shape[1]
    shapes = tuple(w.shape for w in nof_ws) + tuple(w.shape for w in nerf_ws)
    call, n_pad = _pass_call(spec, n, s, len(nof_ws), len(partials),
                             len(nerf_ws), shapes, _interpret())
    od = jnp.concatenate([rays_o, rays_d], axis=-1)[:, None, :]  # (N, 1, 6)
    args = [_pad_rays(od, n_pad), _pad_rays(z_vals, n_pad)]
    if use_nof:
        args += [_pad_rays(p[:, None, :], n_pad) for p in partials]
        args.append(jnp.asarray(_freq_matrix(nof_spec.kc // 3,
                                             nof_spec.logscale)))
        args += nof_ws
    if has_extra:
        args.append(_pad_rays(p_extra[:, None, :], n_pad))
    args.append(jnp.asarray(_freq_matrix(nerf_spec.kc // 3,
                                         nerf_spec.logscale)))
    args += nerf_ws
    outs = call(*args)
    sigma = outs[0].reshape(-1, s)[:n]   # (1, N_pad*S) row -> (N, S)
    rgb_t = (None if sigma_only
             else outs[1][:, :n * s].reshape(3, n, s))
    return sigma, rgb_t


def nof_fused_rays(params: dict, cfg: NoFConfig, n_freqs: int, logscale: bool,
                   anneal: jnp.ndarray | None, xyz: jnp.ndarray,
                   ind_emb: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    """Fused NoF warp over whole rays (row-major adapter over the
    transposed kernel).

    Args:
      xyz: (N, S, 3) sample positions.
      ind_emb: (N, E) per-ray embedded (PE'd) frame index.

    Returns (N, S, 3) warped positions fp32.
    """
    n, s = xyz.shape[0], xyz.shape[1]
    if n == 1 and s > _FWD_ROWS:
        # single-"ray" point-set warp (train/stage_nof.py::nof_points feeds
        # up to 100k points as one ray): re-chunk the sample axis into
        # VMEM-sized rows, replicating the single frame-index embedding
        sub = _FWD_ROWS
        pad = (-s) % sub
        flat = xyz.reshape(-1, 3)
        if pad:
            flat = jnp.concatenate(
                [flat, jnp.zeros((pad, 3), flat.dtype)], axis=0)
        xyz_c = flat.reshape(-1, sub, 3)
        ind_c = jnp.broadcast_to(ind_emb, (xyz_c.shape[0], ind_emb.shape[-1]))
        out = nof_fused_rays(params, cfg, n_freqs, logscale, anneal, xyz_c,
                             ind_c, compute_dtype)
        return out.reshape(1, -1, 3)[:, :s]
    ws, partials = _nof_fold(params, cfg, n_freqs, anneal, ind_emb)
    spec = _NofSpec(
        depth=cfg.depth, width=cfg.width, kc=3 * max(n_freqs, 1),
        skips=tuple(cfg.skips), use_quat=cfg.use_quat,
        dtype_name="bfloat16" if compute_dtype == jnp.bfloat16 else "float32",
        logscale=logscale)
    parts = [p[:, None, :] for p in partials]
    out_t = _nof_op(spec, len(parts), jnp.moveaxis(xyz, -1, 0), *parts, *ws)
    return jnp.moveaxis(out_t, 0, -1)
