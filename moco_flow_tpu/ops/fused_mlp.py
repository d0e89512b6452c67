"""Fused Pallas MLP kernels for the render hot path.

The stage-3 hot loop evaluates a D=8/W=256 NeRF and up to five D=4/W=128 NoF
MLPs over (rays x samples) megabatches (SURVEY.md §3.1). Under plain XLA each
layer's activation — e.g. (16384 rays x 256 samples, 256) = 4 GB fp32 per
render chunk — round-trips HBM between matmuls. These kernels keep a row tile
resident in VMEM through *all* layers: HBM traffic drops to input + output +
weights (the weights fit VMEM: NeRF ~0.6M params = 2.4 MB), which moves the
MLP stack from HBM-bandwidth-bound toward MXU-bound.

Skip connections are computed as split matmuls (x @ W_in + h @ W_h) instead of
concatenation, so the tile never changes shape inside the kernel.

Gradients: wrapped in ``jax.custom_vjp`` whose backward recomputes through the
plain-XLA MLP (rematerialization — trades one forward for not storing
activations). Training can therefore also use ``mlp_impl: pallas``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..nn.nerf import NeRFConfig, nerf_apply, nerf_sigma
from ..nn.nof import NoFConfig, nof_apply

_TILE = 1024


def _interpret() -> bool:
    """Pallas only compiles on TPU; interpret on the CPU test backend."""
    return jax.default_backend() == "cpu"


def _dot(a, b, dtype):
    if dtype is not None:
        a = a.astype(dtype)
        b = b.astype(dtype)
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# NeRF kernel
# ---------------------------------------------------------------------------

def _nerf_weights_flat(params: dict, cfg: NeRFConfig, sigma_only: bool):
    ws = []
    for layer in params["trunk"]:
        ws += [layer["w"], layer["b"]]
    ws += [params["sigma"]["w"], params["sigma"]["b"]]
    if not sigma_only:
        ws += [params["final"]["w"], params["final"]["b"],
               params["extra"]["w"], params["extra"]["b"],
               params["rgb"]["w"], params["rgb"]["b"]]
    return ws


def _nerf_tile_forward(x, extra, ws, cfg: NeRFConfig, sigma_only: bool, dtype):
    """One VMEM tile through the whole NeRF (mirrors nn.nerf.nerf_apply)."""
    it = iter(range(0, 2 * cfg.depth, 2))
    h = None
    for i in range(cfg.depth):
        w, b = ws[2 * i], ws[2 * i + 1]
        if i == 0:
            h = jax.nn.relu(_dot(x, w, dtype) + b)
        elif i in cfg.skips:
            w_in = w[:cfg.in_channels_xyz]
            w_h = w[cfg.in_channels_xyz:]
            h = jax.nn.relu(_dot(x, w_in, dtype) + _dot(h, w_h, dtype) + b)
        else:
            h = jax.nn.relu(_dot(h, w, dtype) + b)
    del it
    k = 2 * cfg.depth
    sigma = _dot(h, ws[k], dtype) + ws[k + 1]
    if sigma_only:
        return sigma
    hf = _dot(h, ws[k + 2], dtype) + ws[k + 3]
    we, be = ws[k + 4], ws[k + 5]
    if cfg.extra_feat_type != "none":
        w_f = we[:cfg.width]
        w_e = we[cfg.width:]
        he = jax.nn.relu(_dot(hf, w_f, dtype) + _dot(extra, w_e, dtype) + be)
    else:
        he = jax.nn.relu(_dot(hf, we, dtype) + be)
    rgb = jax.nn.sigmoid(_dot(he, ws[k + 6], dtype) + ws[k + 7])
    return jnp.concatenate([rgb, sigma], axis=-1)


def _nerf_pallas(params: dict, cfg: NeRFConfig, x: jnp.ndarray,
                 extra: jnp.ndarray | None, sigma_only: bool, dtype,
                 tile: int = _TILE) -> jnp.ndarray:
    n = x.shape[0]
    pad = (-n) % tile
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)])
        if extra is not None:
            extra = jnp.concatenate(
                [extra, jnp.zeros((pad, extra.shape[1]), extra.dtype)])
    ws = _nerf_weights_flat(params, cfg, sigma_only)
    has_extra = extra is not None and not sigma_only
    out_dim = 1 if sigma_only else 4
    n_ws = len(ws)

    def kernel(*refs):
        x_ref = refs[0]
        off = 1
        extra_val = None
        if has_extra:
            extra_val = refs[1][...]
            off = 2
        w_vals = [refs[off + i][...] for i in range(n_ws)]
        out_ref = refs[off + n_ws]
        out_ref[...] = _nerf_tile_forward(
            x_ref[...], extra_val, w_vals, cfg, sigma_only, dtype)

    in_specs = [pl.BlockSpec((tile, x.shape[1]), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    inputs = [x]
    if has_extra:
        in_specs.append(pl.BlockSpec((tile, extra.shape[1]), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(extra)
    for w in ws:
        shape = w.shape if w.ndim == 2 else (1, w.shape[0])
        in_specs.append(pl.BlockSpec(
            shape, (lambda i: (0, 0)), memory_space=pltpu.VMEM))
        inputs.append(w if w.ndim == 2 else w[None])

    out = pl.pallas_call(
        kernel,
        grid=((n + pad) // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, out_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n + pad, out_dim), jnp.float32),
        interpret=_interpret(),
    )(*inputs)
    return out[:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4, 5))
def _nerf_fused_vjp(params, cfg, x, extra, sigma_only, dtype):
    return _nerf_pallas(params, cfg, x, extra if extra is not None else None,
                        sigma_only, dtype)


def _nerf_ref(params, cfg, x, extra, sigma_only, dtype):
    if sigma_only:
        return nerf_sigma(params, x, cfg, dtype)
    return nerf_apply(params, x, extra, cfg, dtype)


def _nerf_fwd(params, cfg, x, extra, sigma_only, dtype):
    return _nerf_pallas(params, cfg, x, extra, sigma_only, dtype), \
        (params, x, extra)


def _nerf_bwd(cfg, sigma_only, dtype, res, g):
    params, x, extra = res
    _, vjp = jax.vjp(
        lambda p, xx, ee: _nerf_ref(p, cfg, xx, ee, sigma_only, dtype),
        params, x, extra)
    return vjp(g)


_nerf_fused_vjp.defvjp(_nerf_fwd, _nerf_bwd)


def nerf_fused(params: dict, cfg: NeRFConfig, x: jnp.ndarray,
               extra: jnp.ndarray | None, sigma_only: bool,
               compute_dtype=None) -> jnp.ndarray:
    """Drop-in fused replacement for nerf_apply/nerf_sigma over a megabatch."""
    return _nerf_fused_vjp(params, cfg, x, extra, sigma_only, compute_dtype)


# ---------------------------------------------------------------------------
# NoF kernel
# ---------------------------------------------------------------------------

def _nof_weights_flat(params: dict):
    ws = []
    for layer in params["layers"]:
        ws += [layer["w"], layer["b"]]
    ws += [params["head"]["w"], params["head"]["b"]]
    return ws


def _nof_tile_forward(inp, xyz, ws, cfg: NoFConfig, dtype):
    h = None
    for i in range(cfg.depth):
        w, b = ws[2 * i], ws[2 * i + 1]
        if i == 0:
            h = jax.nn.relu(_dot(inp, w, dtype) + b)
        elif i in cfg.skips:
            w_in = w[:cfg.in_dim]
            w_h = w[cfg.in_dim:]
            h = jax.nn.relu(_dot(inp, w_in, dtype) + _dot(h, w_h, dtype) + b)
        else:
            h = jax.nn.relu(_dot(h, w, dtype) + b)
    out = _dot(h, ws[2 * cfg.depth], dtype) + ws[2 * cfg.depth + 1]
    if cfg.use_quat:
        v, s, t = out[:, 0:3], out[:, 3:6], out[:, 6:9]
        return _quat_apply_rowvec(v, xyz - s) + s + t
    return out + xyz


def _cross(a, b):
    """Elementwise 3-vector cross product on (N, 3) lane slices (Mosaic can't
    lower batched 3x3 matmuls, so the quaternion rotation is computed with
    VPU-only ops)."""
    a0, a1, a2 = a[:, 0:1], a[:, 1:2], a[:, 2:3]
    b0, b1, b2 = b[:, 0:1], b[:, 1:2], b[:, 2:3]
    return jnp.concatenate(
        [a1 * b2 - a2 * b1, a2 * b0 - a0 * b2, a0 * b1 - a1 * b0], axis=-1)


def _quat_apply_rowvec(vlog, d):
    """Rotate row-vectors: d @ R(exp(vlog)) == rotation of d by the conjugate
    quaternion — matches the nn.nof row-vector convention
    (v' = d + 2 q_v x (q_v x d + w d) with q_v negated)."""
    eps = 1e-8
    theta = jnp.sqrt(jnp.sum(vlog * vlog, axis=-1, keepdims=True) + eps * eps)
    w = jnp.cos(theta)
    q_v = -vlog * (jnp.sin(theta) / theta)  # conjugate
    return d + 2.0 * _cross(q_v, _cross(q_v, d) + w * d)


def _nof_pallas(params: dict, cfg: NoFConfig, inputs: jnp.ndarray,
                xyz: jnp.ndarray, dtype, tile: int = _TILE) -> jnp.ndarray:
    n = inputs.shape[0]
    pad = (-n) % tile
    if pad:
        inputs = jnp.concatenate(
            [inputs, jnp.zeros((pad, inputs.shape[1]), inputs.dtype)])
        xyz = jnp.concatenate([xyz, jnp.zeros((pad, 3), xyz.dtype)])
    ws = _nof_weights_flat(params)
    n_ws = len(ws)

    def kernel(*refs):
        inp_ref, xyz_ref = refs[0], refs[1]
        w_vals = [refs[2 + i][...] for i in range(n_ws)]
        out_ref = refs[2 + n_ws]
        out_ref[...] = _nof_tile_forward(inp_ref[...], xyz_ref[...], w_vals,
                                         cfg, dtype)

    in_specs = [
        pl.BlockSpec((tile, inputs.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    args = [inputs, xyz]
    for w in ws:
        shape = w.shape if w.ndim == 2 else (1, w.shape[0])
        in_specs.append(pl.BlockSpec(
            shape, (lambda i: (0, 0)), memory_space=pltpu.VMEM))
        args.append(w if w.ndim == 2 else w[None])

    out = pl.pallas_call(
        kernel,
        grid=((n + pad) // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, 3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n + pad, 3), jnp.float32),
        interpret=_interpret(),
    )(*args)
    return out[:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4))
def _nof_fused_vjp(params, cfg, inputs, xyz, dtype):
    return _nof_pallas(params, cfg, inputs, xyz, dtype)


def _nof_fwd(params, cfg, inputs, xyz, dtype):
    return _nof_pallas(params, cfg, inputs, xyz, dtype), (params, inputs, xyz)


def _nof_bwd(cfg, dtype, res, g):
    params, inputs, xyz = res
    _, vjp = jax.vjp(
        lambda p, i, x: nof_apply(p, i, x, cfg, dtype), params, inputs, xyz)
    return vjp(g)


_nof_fused_vjp.defvjp(_nof_fwd, _nof_bwd)


def nof_fused(params: dict, cfg: NoFConfig, inputs: jnp.ndarray,
              xyz: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    """Drop-in fused replacement for nof_apply over a megabatch."""
    return _nof_fused_vjp(params, cfg, inputs, xyz, compute_dtype)
