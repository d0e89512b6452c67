"""Loss functions.

Mirrors the reference loss surface (models/losses.py, models/__init__.py:31-39):
MSE/L1 image losses applied to coarse (+ fine, if present) rgb, elementwise BCE
for the alpha mask loss, plus the masked-mean helpers that replace the
reference's data-dependent boolean indexing (static shapes for XLA).
"""

from __future__ import annotations

import jax.numpy as jnp


def mse(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def l1(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def bce(pred: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Binary cross entropy on probabilities (torch nn.BCELoss semantics;
    clamped for stability — torch clamps log to -100 internally)."""
    p = jnp.clip(pred, eps, 1.0 - eps)
    return jnp.mean(-(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p)))


_ELEMENTWISE = {"MSE": lambda p, t: (p - t) ** 2, "L1": lambda p, t: jnp.abs(p - t)}


def image_loss(results: dict, target: jnp.ndarray, kind: str = "MSE") -> jnp.ndarray:
    """Coarse (+ fine) rgb loss (reference models/losses.py:9-26)."""
    fn = _ELEMENTWISE[kind]
    loss = jnp.mean(fn(results["rgb_coarse"], target))
    if "rgb_fine" in results:
        loss = loss + jnp.mean(fn(results["rgb_fine"], target))
    return loss


def masked_mean(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of ``values`` where ``mask`` is nonzero; if the mask is empty, the
    plain mean (the reference falls back to an all-ones mask,
    models/rendering.py:307-308)."""
    mask = mask.astype(values.dtype)
    total = jnp.sum(mask)
    safe = jnp.where(total > 0, mask, jnp.ones_like(mask))
    return jnp.sum(values * safe) / jnp.sum(safe)


def masked_loss(pred: jnp.ndarray, target: jnp.ndarray, mask: jnp.ndarray,
                kind: str = "L1") -> jnp.ndarray:
    """Masked-mean elementwise loss; ``mask`` broadcasts over the last axis.

    Static-shape replacement for the reference's ``tensor[bool_idx]`` gathers
    (e.g. inside/outside correspondence splits, trainer_moco_flow.py:330-363).
    """
    elem = _ELEMENTWISE[kind](pred, target)
    mask = jnp.broadcast_to(mask[..., None], elem.shape)
    return masked_mean(elem, mask)


def masked_bce(pred: jnp.ndarray, mask: jnp.ndarray, target_value: float = 0.0,
               eps: float = 1e-7) -> jnp.ndarray:
    """Masked BCE against a constant target (alpha mask loss)."""
    p = jnp.clip(pred, eps, 1.0 - eps)
    t = jnp.full_like(p, target_value)
    elem = -(t * jnp.log(p) + (1.0 - t) * jnp.log(1.0 - p))
    mask = jnp.broadcast_to(mask.reshape(mask.shape + (1,) * (elem.ndim - mask.ndim)), elem.shape)
    return masked_mean(elem, mask)
