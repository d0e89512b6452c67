"""Quaternion math in jnp, replacing the reference's kornia dependency
(reference models/nof.py:4,75-80: ``quaternion_log_to_exp`` +
``quaternion_to_rotation_matrix``).

The NoF head predicts a *log quaternion* ``v`` (3-vector). The exponential map
gives the unit quaternion ``q = (cos|v|, sin|v| * v/|v|)`` which encodes a
rotation by angle ``2|v|`` about axis ``v/|v|``.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def quaternion_log_to_exp(v: jnp.ndarray) -> jnp.ndarray:
    """Log quaternion ``(..., 3)`` -> unit quaternion ``(..., 4)`` as (w, x, y, z)."""
    theta = jnp.sqrt(jnp.sum(v * v, axis=-1, keepdims=True) + _EPS * _EPS)
    w = jnp.cos(theta)
    xyz = v * (jnp.sin(theta) / theta)
    return jnp.concatenate([w, xyz], axis=-1)


def quaternion_to_rotation_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) ``(..., 4)`` -> rotation matrix ``(..., 3, 3)``.

    Standard right-handed convention (same matrix kornia produces).
    """
    q = q / jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + _EPS * _EPS)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    ww, xx, yy, zz = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    r = jnp.stack([
        ww + xx - yy - zz, 2 * (xy - wz), 2 * (wy + xz),
        2 * (wz + xy), ww - xx + yy - zz, 2 * (yz - wx),
        2 * (xz - wy), 2 * (wx + yz), ww - xx - yy + zz,
    ], axis=-1)
    return r.reshape(*q.shape[:-1], 3, 3)


def log_quaternion_to_rotation_matrix(v: jnp.ndarray) -> jnp.ndarray:
    """Fused path used by the NoF head."""
    return quaternion_to_rotation_matrix(quaternion_log_to_exp(v))
