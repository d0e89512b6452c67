"""Linear-layer primitives over parameter pytrees.

Pure functions + pytree params (no module objects): this is what makes
checkpoint surgery (partial loads, branch filtering — reference
trainer/trainer_moco_flow.py:54-62), optax masking, and pjit sharding trivial.

Initialization matches torch ``nn.Linear`` defaults (kaiming-uniform with
a=sqrt(5), i.e. ``U(-1/sqrt(fan_in), 1/sqrt(fan_in))`` for both weight and bias)
so that training dynamics start from the same distribution as the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_linear(key: jax.Array, in_dim: int, out_dim: int,
                dtype=jnp.float32) -> dict:
    """torch-default init: W, b ~ U(-1/sqrt(in_dim), 1/sqrt(in_dim)).

    Weights are stored ``(in_dim, out_dim)`` — activations-row-major — so the
    forward pass is a plain ``x @ W + b`` that XLA maps straight onto the MXU.
    """
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(jnp.asarray(in_dim, dtype=jnp.float32))
    w = jax.random.uniform(kw, (in_dim, out_dim), dtype, -bound, bound)
    b = jax.random.uniform(kb, (out_dim,), dtype, -bound, bound)
    return {"w": w, "b": b}


def linear(params: dict, x: jnp.ndarray, compute_dtype=None,
           out_dtype=None) -> jnp.ndarray:
    """``x @ W + b`` with optional low-precision matmul.

    With ``compute_dtype=bfloat16`` the operands are cast to bf16 while the
    MXU accumulates in fp32; ``out_dtype`` controls the emitted activation
    dtype (fp32 by default — heads; hidden layers emit ``compute_dtype`` so
    the trunk never round-trips casts through HBM).
    """
    w, b = params["w"], params["b"]
    if compute_dtype is not None and x.dtype != compute_dtype:
        x = x.astype(compute_dtype)
    if compute_dtype is not None and w.dtype != compute_dtype:
        w = w.astype(compute_dtype)
    y = jax.lax.dot_general(
        x, w,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=out_dtype or jnp.float32,
    )
    return y + b.astype(y.dtype)


def linear_relu(params: dict, x: jnp.ndarray, compute_dtype=None) -> jnp.ndarray:
    """Hidden layer: activation stays in the compute dtype."""
    return jax.nn.relu(linear(params, x, compute_dtype,
                              out_dtype=compute_dtype))
