import jax.numpy as jnp
import numpy as np

from moco_flow_tpu.nn.losses import bce, image_loss, masked_bce, masked_loss, masked_mean
from moco_flow_tpu.nn.metrics import dssim, psnr, ssim


def test_psnr_closed_form():
    a = jnp.zeros((4, 4))
    b = jnp.full((4, 4), 0.1)
    np.testing.assert_allclose(float(psnr(a, b)), -10 * np.log10(0.01), rtol=1e-4)


def test_ssim_identical_is_one():
    img = jnp.asarray(np.random.default_rng(0).uniform(size=(1, 3, 16, 16)),
                      jnp.float32)
    assert abs(float(ssim(img, img)) - 1.0) < 1e-5
    assert abs(float(dssim(img, img))) < 1e-5


def test_ssim_decreases_with_noise():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(size=(1, 3, 32, 32)), jnp.float32)
    noisy = img + jnp.asarray(rng.normal(scale=0.2, size=(1, 3, 32, 32)),
                              jnp.float32)
    assert float(ssim(img, noisy)) < 0.9


def test_image_loss_coarse_plus_fine():
    r = {"rgb_coarse": jnp.zeros((8, 3)), "rgb_fine": jnp.full((8, 3), 0.5)}
    t = jnp.zeros((8, 3))
    np.testing.assert_allclose(float(image_loss(r, t, "MSE")), 0.25, rtol=1e-6)
    np.testing.assert_allclose(float(image_loss(r, t, "L1")), 0.5, rtol=1e-6)


def test_masked_mean_and_fallback():
    v = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    m = jnp.asarray([True, False, True, False])
    assert float(masked_mean(v, m)) == 2.0
    # empty mask falls back to the plain mean (ref rendering.py:307-308)
    assert float(masked_mean(v, jnp.zeros(4, bool))) == 2.5


def test_masked_loss():
    pred = jnp.asarray([[1.0, 1.0], [0.0, 0.0], [3.0, 5.0]])
    tgt = jnp.zeros((3, 2))
    m = jnp.asarray([True, True, False])
    assert float(masked_loss(pred, tgt, m, "L1")) == 0.5


def test_bce_matches_formula():
    p = jnp.asarray([0.9, 0.1])
    t = jnp.asarray([1.0, 0.0])
    want = -np.mean([np.log(0.9), np.log(0.9)])
    np.testing.assert_allclose(float(bce(p, t)), want, rtol=1e-3)


def test_masked_bce_zero_target():
    alphas = jnp.asarray([0.001, 0.999])
    m = jnp.asarray([True, False])
    want = -np.log(1 - 0.001)
    np.testing.assert_allclose(float(masked_bce(alphas, m, 0.0)), want, rtol=1e-4)
