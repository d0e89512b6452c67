"""LPIPS metric: architecture/reduction correctness with random weights (the
pretrained npz cannot exist in this env — see nn/lpips.py docstring)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moco_flow_tpu.nn import lpips as L


@pytest.fixture(scope="module")
def weights():
    return L.random_weights(jax.random.key(0))


def test_identity_is_zero(weights, rng):
    img = jnp.asarray(rng.uniform(size=(2, 3, 64, 64)).astype(np.float32))
    d = np.asarray(L.lpips(weights, img, img))
    np.testing.assert_allclose(d, 0.0, atol=1e-6)


def test_positive_and_symmetric(weights, rng):
    a = jnp.asarray(rng.uniform(size=(1, 3, 64, 64)).astype(np.float32))
    b = jnp.asarray(rng.uniform(size=(1, 3, 64, 64)).astype(np.float32))
    dab = float(L.lpips(weights, a, b)[0])
    dba = float(L.lpips(weights, b, a)[0])
    assert dab > 0
    np.testing.assert_allclose(dab, dba, rtol=1e-5)


def test_monotone_in_perturbation(weights, rng):
    """Bigger pixel perturbations should not shrink the distance (sanity of
    the tap-normalize-diff-reduce pipeline)."""
    a = jnp.asarray(rng.uniform(0.2, 0.8, size=(1, 3, 64, 64)).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=(1, 3, 64, 64)).astype(np.float32))
    d_small = float(L.lpips(weights, a, a + 0.01 * noise)[0])
    d_big = float(L.lpips(weights, a, a + 0.2 * noise)[0])
    assert d_big > d_small > 0


def test_feature_shapes(weights):
    """AlexNet tap geometry at 64x64 input (strides/pools as in torchvision)."""
    x = jnp.zeros((1, 3, 64, 64))
    taps = L._features(weights, x)
    assert [t.shape[1] for t in taps] == [64, 192, 384, 256, 256]
    assert taps[0].shape[2] == 15  # (64+2*2-11)//4+1
    assert taps[1].shape[2] == 7   # pool(15)->7, conv5 pad2 keeps 7


def test_gated_when_no_weights(monkeypatch):
    monkeypatch.delenv("LPIPS_WEIGHTS_NPZ", raising=False)
    assert not L.available()
    with pytest.raises(FileNotFoundError):
        L.load_weights()


def test_load_weights_roundtrip(tmp_path, weights, rng, monkeypatch):
    np.savez(tmp_path / "w.npz", **weights)
    monkeypatch.setenv("LPIPS_WEIGHTS_NPZ", str(tmp_path / "w.npz"))
    assert L.available()
    w2 = L.load_weights()
    a = jnp.asarray(rng.uniform(size=(1, 3, 32, 32)).astype(np.float32))
    b = jnp.asarray(rng.uniform(size=(1, 3, 32, 32)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(L.lpips(weights, a, b)),
                               np.asarray(L.lpips(w2, a, b)), rtol=1e-6)
