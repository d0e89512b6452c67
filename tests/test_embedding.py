import jax
import jax.numpy as jnp
import numpy as np

from moco_flow_tpu.nn.embedding import anneal_weights, freq_bands, out_channels, posenc


def ref_posenc(x, n_freqs, logscale=True, weights=None):
    """Numpy oracle of the block layout:
    [x, w0 sin(f0 x).. , w0 cos(f0 x)..] (sin block then cos block —
    a fixed permutation of the reference's interleaved layout)."""
    if weights is None:
        weights = [1.0] * n_freqs
    bands = freq_bands(n_freqs, logscale)
    sins = [w * np.sin(f * x) for w, f in zip(weights, bands)]
    coss = [w * np.cos(f * x) for w, f in zip(weights, bands)]
    return np.concatenate([x] + sins + coss, axis=-1)


def test_posenc_matches_oracle():
    x = np.random.default_rng(1).normal(size=(17, 3)).astype(np.float32)
    for n_freqs, logscale in [(10, True), (4, True), (5, False), (16, True)]:
        got = np.asarray(posenc(jnp.asarray(x), n_freqs, logscale))
        want = ref_posenc(x, n_freqs, logscale)
        assert got.shape == (17, out_channels(3, n_freqs))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_posenc_weights():
    x = np.random.default_rng(2).normal(size=(5, 1)).astype(np.float32)
    w = np.array([1.0, 0.5, 0.0], dtype=np.float32)
    got = np.asarray(posenc(jnp.asarray(x), 3, True, jnp.asarray(w)))
    want = ref_posenc(x, 3, True, w)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # zeroed band really is zero (sin_2 at col 3, cos_2 at col 6 in block layout)
    assert np.all(got[:, 3] == 0) and np.all(got[:, 6] == 0)


def test_posenc_zero_freqs_identity():
    x = jnp.ones((4, 3))
    np.testing.assert_array_equal(np.asarray(posenc(x, 0)), np.asarray(x))


def ref_anneal(step, n_freqs, start, end):
    """Oracle mirroring the reference's windowed schedule
    (trainer_moco_flow.py:275-305)."""
    if step <= start:
        return [0.0] * n_freqs
    if step > end:
        return [1.0] * n_freqs
    n_iters = end - start
    cur = step - start
    delta = n_iters // n_freqs
    cur_freq = cur // delta
    frac = cur / delta - cur_freq
    w = [0.0] * (n_freqs + 1)
    w[:cur_freq] = [1.0] * cur_freq
    w[cur_freq] = frac
    return w[:n_freqs]


def test_anneal_weights_matches_reference_schedule():
    n_freqs, start, end = 10, 5000, 1005000
    for step in [0, 5000, 5001, 105000, 200000, 505000, 999999, 1004999,
                 1005001, 2000000]:
        got = np.asarray(anneal_weights(jnp.asarray(step), n_freqs, start, end))
        want = np.asarray(ref_anneal(step, n_freqs, start, end))
        np.testing.assert_allclose(got, want, atol=1e-5), step


def test_anneal_weights_jits_without_recompile():
    f = jax.jit(lambda s: anneal_weights(s, 10, 100, 1100))
    a = f(jnp.asarray(200))
    b = f(jnp.asarray(900))
    assert a.shape == b.shape == (10,)
    assert float(jnp.sum(b)) > float(jnp.sum(a))
