"""LPIPS perceptual distance (AlexNet backbone) in JAX.

The reference never computes LPIPS, but it is a BASELINE.md target metric for
People-Snapshot parity, so the rebuild ships it as a first-class metric.

Architecture follows the official LPIPS v0.1 'alex' configuration (Zhang et
al., CVPR 2018): inputs in [0,1] are mapped to [-1,1], passed through the
ImageNet scaling layer, then the 5 AlexNet conv feature taps are
channel-unit-normalized, squared-differenced, reduced by the learned 1x1
linear calibration weights, spatially averaged and summed.

Pretrained weights cannot ship with this repo (and this environment has no
network egress + no torchvision), so weights load from an ``.npz``:

  - point ``$LPIPS_WEIGHTS_NPZ`` at the file, or pass ``weights=`` directly;
  - create the file once, anywhere with the ``lpips`` pip package installed,
    via ``python scripts/export_lpips_weights.py out.npz``.

Without weights the metric raises a clear error (callers gate on
:func:`available`); everything else in the metric (architecture, reductions)
is unit-tested with random weights.
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

# AlexNet 'features' stack: (out_ch, kernel, stride, pad); taps after each relu
_CONVS = (
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
)
_POOL_AFTER = (0, 1)  # maxpool k3 s2 after relu1 and relu2
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def available(weights=None) -> bool:
    return weights is not None or bool(os.environ.get("LPIPS_WEIGHTS_NPZ"))


def load_weights(path: str | None = None) -> dict:
    """Load {conv{i}_w (O,I,kh,kw), conv{i}_b, lin{i}_w (C,)} from npz."""
    path = path or os.environ.get("LPIPS_WEIGHTS_NPZ")
    if not path or not os.path.exists(path):
        raise FileNotFoundError(
            "LPIPS weights npz not found; set $LPIPS_WEIGHTS_NPZ or export "
            "them with scripts/export_lpips_weights.py (needs the `lpips` "
            "pip package, not available in this environment).")
    with np.load(path) as z:
        return {k: np.asarray(z[k], np.float32) for k in z.files}


def random_weights(key: jax.Array) -> dict:
    """Random-but-shaped weights (tests / smoke only — NOT perceptual)."""
    out = {}
    in_ch = 3
    for i, (oc, k, _, _) in enumerate(_CONVS):
        key, k1, k2 = jax.random.split(key, 3)
        out[f"conv{i}_w"] = np.asarray(
            jax.random.normal(k1, (oc, in_ch, k, k)) * 0.05, np.float32)
        out[f"conv{i}_b"] = np.zeros((oc,), np.float32)
        out[f"lin{i}_w"] = np.asarray(
            jnp.abs(jax.random.normal(k2, (oc,))) * 0.01, np.float32)
        in_ch = oc
    return out


def _features(weights: dict, x: jnp.ndarray) -> list[jnp.ndarray]:
    """x: (B, 3, H, W) in [-1, 1] -> 5 conv taps (post-relu)."""
    x = (x - jnp.asarray(_SHIFT)[None, :, None, None]) / \
        jnp.asarray(_SCALE)[None, :, None, None]
    taps = []
    for i, (_, _, stride, pad) in enumerate(_CONVS):
        w = jnp.asarray(weights[f"conv{i}_w"])
        b = jnp.asarray(weights[f"conv{i}_b"])
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(stride, stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = jax.nn.relu(x + b[None, :, None, None])
        taps.append(x)
        if i in _POOL_AFTER:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
                "VALID")
    return taps


def _unit_normalize(t: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    return t / jnp.sqrt(jnp.sum(t * t, axis=1, keepdims=True) + eps)


def lpips(weights: dict, img0: jnp.ndarray, img1: jnp.ndarray) -> jnp.ndarray:
    """Perceptual distance between (B, 3, H, W) images in [0, 1] -> (B,)."""
    a = _features(weights, img0 * 2.0 - 1.0)
    b = _features(weights, img1 * 2.0 - 1.0)
    total = 0.0
    for i, (fa, fb) in enumerate(zip(a, b)):
        d = (_unit_normalize(fa) - _unit_normalize(fb)) ** 2
        lin = jnp.asarray(weights[f"lin{i}_w"])[None, :, None, None]
        total = total + jnp.mean(jnp.sum(d * lin, axis=1), axis=(1, 2))
    return total
