import jax
import jax.numpy as jnp
import numpy as np

from moco_flow_tpu.render.sampling import sample_pdf, stratified_zvals


def np_sample_pdf(bins, weights, n_importance, u, eps=1e-5):
    """Independent numpy oracle of inverse-CDF sampling (same contract as the
    published NeRF sample_pdf)."""
    n_rays, n_bins = weights.shape
    w = weights + eps
    pdf = w / w.sum(-1, keepdims=True)
    cdf = np.cumsum(pdf, -1)
    cdf = np.concatenate([np.zeros_like(cdf[:, :1]), cdf], -1)
    out = np.zeros((n_rays, n_importance))
    for r in range(n_rays):
        inds = np.searchsorted(cdf[r], u[r], side="right")
        below = np.clip(inds - 1, 0, None)
        above = np.clip(inds, None, n_bins)
        cg0, cg1 = cdf[r][below], cdf[r][above]
        bg0, bg1 = bins[r][below], bins[r][above]
        denom = cg1 - cg0
        denom[denom < eps] = 1
        out[r] = bg0 + (u[r] - cg0) / denom * (bg1 - bg0)
    return out


def test_sample_pdf_matches_oracle():
    rng = np.random.default_rng(0)
    bins = np.sort(rng.uniform(0, 4, size=(6, 17)), axis=-1).astype(np.float32)
    weights = rng.uniform(0, 1, size=(6, 16)).astype(np.float32)
    n_imp = 32
    u = np.broadcast_to(np.linspace(0, 1, n_imp, dtype=np.float32), (6, n_imp))
    got = np.asarray(sample_pdf(None, jnp.asarray(bins), jnp.asarray(weights),
                                n_imp, det=True))
    want = np_sample_pdf(bins, weights, n_imp, u)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_sample_pdf_random_within_bins():
    key = jax.random.key(1)
    bins = jnp.broadcast_to(jnp.linspace(1.0, 3.0, 33), (4, 33))
    weights = jnp.ones((4, 32))
    s = np.asarray(sample_pdf(key, bins, weights, 64, det=False))
    assert s.shape == (4, 64)
    assert np.all(s >= 1.0 - 1e-5) and np.all(s <= 3.0 + 1e-5)


def test_sample_pdf_concentrates_on_heavy_bins():
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 11), (1, 11))
    w = np.full((1, 10), 1e-4, np.float32)
    w[0, 7] = 1.0  # bin [0.7, 0.8] gets almost all mass
    s = np.asarray(sample_pdf(jax.random.key(2), bins, jnp.asarray(w), 256))
    frac = np.mean((s >= 0.7) & (s <= 0.8))
    assert frac > 0.9


def test_stratified_zvals_linear_and_disp():
    near = jnp.full((5, 1), 2.0)
    far = jnp.full((5, 1), 6.0)
    z = np.asarray(stratified_zvals(None, near, far, 8))
    np.testing.assert_allclose(z[0], np.linspace(2.0, 6.0, 8), rtol=1e-6)
    zd = np.asarray(stratified_zvals(None, near, far, 8, use_disp=True))
    np.testing.assert_allclose(1 / zd[0], np.linspace(1 / 2.0, 1 / 6.0, 8),
                               rtol=1e-6)


def test_stratified_zvals_perturb_within_intervals():
    key = jax.random.key(3)
    near, far = jnp.full((3, 1), 1.0), jnp.full((3, 1), 5.0)
    z0 = np.asarray(stratified_zvals(None, near, far, 16))
    z = np.asarray(stratified_zvals(key, near, far, 16, perturb=1.0))
    assert z.shape == (3, 16)
    assert np.all(np.diff(z, axis=-1) > -1e-6)  # still sorted
    assert np.all(z >= z0[:, :1]) and np.all(z <= z0[:, -1:] + 1e-6)
