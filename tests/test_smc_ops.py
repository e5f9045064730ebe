"""Unit tests for the pure SMC kernels: weight math, resampling, moments,
tempering bisection, L-kernels — each against an independent numpy/scipy
oracle re-deriving the reference semantics (SURVEY.md §4 test strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.optimize
import scipy.special
import scipy.stats as sps

from smcnuts_tpu.ops import (
    ess,
    ess_at_phi,
    gaussian_lkernel_logpdf,
    multinomial_ancestors,
    next_temperature,
    normalise_weights,
    systematic_ancestors,
    weighted_moments,
)


class TestNormaliseWeights:
    def test_matches_scipy_logsumexp(self):
        rng = np.random.default_rng(0)
        logw = rng.normal(size=50) * 10
        wn, ll = normalise_weights(jnp.asarray(logw, jnp.float32))
        expected_ll = scipy.special.logsumexp(logw)
        np.testing.assert_allclose(float(ll), expected_ll, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(wn), np.exp(logw - expected_ll), rtol=1e-4, atol=1e-8
        )
        np.testing.assert_allclose(np.asarray(wn).sum(), 1.0, rtol=1e-5)

    def test_neginf_masked(self):
        # Reference masks -inf entries before logsumexp (samples.py:96-102).
        logw = np.array([0.0, -np.inf, 1.0, -np.inf])
        wn, ll = normalise_weights(jnp.asarray(logw, jnp.float32))
        expected = scipy.special.logsumexp([0.0, 1.0])
        np.testing.assert_allclose(float(ll), expected, rtol=1e-6)
        assert wn[1] == 0.0 and wn[3] == 0.0

    def test_all_neginf(self):
        wn, ll = normalise_weights(jnp.full(4, -jnp.inf))
        assert float(ll) == -np.inf
        assert np.all(np.asarray(wn) == 0)
        assert np.isposinf(float(ess(wn)))  # reference 1/0 behavior

    def test_ess_uniform(self):
        wn = jnp.full(64, 1 / 64)
        np.testing.assert_allclose(float(ess(wn)), 64.0, rtol=1e-5)


class TestResampling:
    def test_multinomial_distribution(self):
        wn = jnp.asarray([0.5, 0.3, 0.2, 0.0])
        keys = jax.random.split(jax.random.key(0), 2000)
        anc = jax.vmap(lambda k: multinomial_ancestors(k, wn))(keys)
        counts = np.bincount(np.asarray(anc).ravel(), minlength=4) / anc.size
        np.testing.assert_allclose(counts, [0.5, 0.3, 0.2, 0.0], atol=0.02)

    def test_systematic_counts_near_exact(self):
        wn = jnp.asarray([0.5, 0.25, 0.25, 0.0])
        anc = systematic_ancestors(jax.random.key(1), wn)
        counts = np.bincount(np.asarray(anc), minlength=4)
        # Systematic resampling gives counts within 1 of N*w.
        np.testing.assert_array_equal(counts, [2, 1, 1, 0])

    def test_zero_weight_never_drawn(self):
        wn = jnp.asarray([0.0, 1.0, 0.0])
        anc = multinomial_ancestors(jax.random.key(2), wn)
        assert np.all(np.asarray(anc) == 1)


class TestMoments:
    def test_weighted_moments_vs_numpy(self):
        rng = np.random.default_rng(3)
        x = rng.normal(size=(100, 3))
        w = rng.random(100)
        w /= w.sum()
        mean, var = weighted_moments(jnp.asarray(x, jnp.float32), jnp.asarray(w, jnp.float32))
        np.testing.assert_allclose(np.asarray(mean), w @ x, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(var), w @ (x - w @ x) ** 2, rtol=1e-3, atol=1e-6
        )


class TestTempering:
    def _oracle_phi(self, loglik, phi_old, n, alpha):
        """Reference tempering re-derived with scipy bisect
        (adaptive_tempering.py:41-63)."""

        def f(phi):
            logw = (phi - phi_old) * loglik
            ll = scipy.special.logsumexp(logw)
            wn = np.exp(logw - ll)
            return 1 / np.sum(wn**2) - n * alpha

        if f(1.0) >= 0:
            return 1.0
        return scipy.optimize.bisect(f, phi_old, 1.0)

    @pytest.mark.parametrize("seed,phi_old", [(0, 0.0), (1, 0.2), (2, 0.55)])
    def test_matches_scipy_bisect(self, seed, phi_old):
        rng = np.random.default_rng(seed)
        n = 256
        loglik = rng.normal(-50, 30, size=n)
        expected = self._oracle_phi(loglik, phi_old, n, 0.5)
        got = float(
            next_temperature(jnp.asarray(loglik, jnp.float32), phi_old, n, alpha=0.5)
        )
        assert np.isclose(got, expected, atol=2e-4), (got, expected)

    def test_returns_exactly_one_when_ess_ok(self):
        loglik = jnp.zeros(128)  # flat likelihood: ESS(1.0) = N >= N/2
        got = float(next_temperature(loglik, 0.0, 128))
        assert got == 1.0

    def test_ess_at_phi(self):
        loglik = jnp.asarray(np.random.default_rng(4).normal(size=64), jnp.float32)
        e = float(ess_at_phi(loglik, 0.0, 0.0))
        np.testing.assert_allclose(e, 64.0, rtol=1e-5)


class TestGaussianLKernel:
    def _oracle(self, r_new, x_new):
        """Reference Gaussian-approx L-kernel re-derived with numpy/scipy
        (gaussian_lkernel.py:41-84)."""
        D = x_new.shape[1]
        X = np.hstack([-r_new, x_new])
        mu_X = np.mean(X, axis=0)
        cov_X = np.cov(X.T)
        mu_r, mu_x = mu_X[:D], mu_X[D:]
        c_rr, c_rx = cov_X[:D, :D], cov_X[:D, D:]
        c_xr, c_xx = cov_X[D:, :D], cov_X[D:, D:]
        pinv = np.linalg.pinv(c_xx)
        cov = c_rr - c_rx @ pinv @ c_xr + 1e-6 * np.eye(D)
        out = np.zeros(len(x_new))
        for i in range(len(x_new)):
            mu = mu_r + c_rx @ pinv @ (x_new[i] - mu_x)
            out[i] = sps.multivariate_normal.logpdf(-r_new[i], mu, cov)
        return out

    def test_matches_reference_formula(self):
        rng = np.random.default_rng(5)
        N, D = 200, 3
        x_new = rng.normal(size=(N, D))
        r_new = 0.3 * x_new + rng.normal(size=(N, D))
        expected = self._oracle(r_new, x_new)
        got = np.asarray(
            gaussian_lkernel_logpdf(
                jnp.asarray(r_new, jnp.float32), jnp.asarray(x_new, jnp.float32)
            )
        )
        np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-3)


def test_invert_cdf_dense_matches_searchsorted():
    """The dense (N,N) inversion below the cutoff and the sort-based
    searchsorted above it must agree exactly with the definitional
    searchsorted(cdf, u, 'right') on the same inputs (ops/resampling.py)."""
    from smcnuts_tpu.ops.resampling import _DENSE_INVERT_MAX_N, _invert_cdf

    rng = np.random.default_rng(3)
    for n in (512, _DENSE_INVERT_MAX_N, 2 * _DENSE_INVERT_MAX_N):
        w = rng.random(n).astype(np.float32)
        w[rng.random(n) < 0.3] = 0.0  # zero-weight particles
        cdf = jnp.cumsum(jnp.asarray(w / w.sum()))
        u = jnp.asarray(
            rng.random(n).astype(np.float32) * float(cdf[-1])
        )
        got = np.asarray(_invert_cdf(cdf, u))
        want = np.searchsorted(np.asarray(cdf), np.asarray(u), side="right")
        np.testing.assert_array_equal(got, want)
        assert got.min() >= 0 and got.max() < n


def test_multinomial_large_n_sort_path():
    """Above the dense cutoff (sort-based searchsorted): ancestor counts of
    each index still follow the weights."""
    n = 8192
    rng = np.random.default_rng(5)
    w = rng.random(n).astype(np.float32)
    wn = jnp.asarray(w / w.sum())
    anc = multinomial_ancestors(jax.random.key(11), wn)
    counts = np.bincount(np.asarray(anc), minlength=n)
    # Expected count of index j is n*wn_j ~ 2 on average; aggregate check.
    corr = np.corrcoef(counts, np.asarray(wn) * n)[0, 1]
    assert corr > 0.5
    assert counts.sum() == n


def test_onehot_take_rows_bitwise_equals_gather():
    """The one-hot MXU-matmul resampling gather (bf16x3 split) must be
    BITWISE equal to ancestors + jnp.take for both schemes (same key ->
    same choices), for (N,) and (N, D) arrays."""
    import jax

    from smcnuts_tpu.ops.resampling import (
        multinomial_ancestors,
        multinomial_take_rows,
        systematic_ancestors,
        systematic_take_rows,
    )

    n, d = 257, 3
    key = jax.random.key(7)
    kx, kw, kr = jax.random.split(key, 3)
    x = jax.random.normal(kx, (n, d), jnp.float32)
    v = jax.random.normal(kx, (n,), jnp.float32)
    logw = jax.random.normal(kw, (n,))
    wn = jnp.exp(logw - jax.scipy.special.logsumexp(logw))

    anc = multinomial_ancestors(kr, wn)
    x_r, v_r = multinomial_take_rows(kr, wn, [x, v])
    np.testing.assert_array_equal(
        np.asarray(x_r), np.asarray(jnp.take(x, anc, axis=0))
    )
    np.testing.assert_array_equal(
        np.asarray(v_r), np.asarray(jnp.take(v, anc))
    )

    anc_s = systematic_ancestors(kr, wn)
    (x_s,) = systematic_take_rows(kr, wn, [x])
    np.testing.assert_array_equal(
        np.asarray(x_s), np.asarray(jnp.take(x, anc_s, axis=0))
    )
