"""Model-layer tests: JAX tempered log-densities vs independent scipy oracles.

The reference validates nothing at this layer (it trusts BridgeStan); here
each hand-built model is checked against a straight scipy/numpy recomputation
of the Stan density (reference stan_models/arma/arma.stan,
stan_models/PRMwCD/PRMwCD.stan), including transform Jacobians and the
tempered identity logp(theta, phi) = logprior + phi*loglik.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as sps

from smcnuts_tpu.models import make_arma, make_gaussian, make_prmwcd, get_model
from smcnuts_tpu.models.arma import _ASSET as ARMA_ASSET


@pytest.fixture(scope="module")
def arma_data():
    return np.load(ARMA_ASSET)


def arma_oracle(theta, y, phi):
    """Independent numpy recomputation of the ARMA(1,1) Stan density."""
    mu, beta, th, log_sigma = theta
    sigma = np.exp(log_sigma)
    lp = sps.norm.logpdf(mu, 0, 10)
    lp += sps.norm.logpdf(beta, 0, 2)
    lp += sps.norm.logpdf(th, 0, 2)
    lp += sps.cauchy.logpdf(sigma, 0, 2.5)
    lp += log_sigma  # Jacobian
    err = np.zeros_like(y)
    err[0] = y[0] - (mu + beta * mu)
    for t in range(1, len(y)):
        nu = mu + beta * y[t - 1] + th * err[t - 1]
        err[t] = y[t] - nu
    loglik = sps.norm.logpdf(err, 0, sigma).sum()
    return lp + phi * loglik, lp, loglik


def test_arma_matches_oracle(arma_data):
    model = make_arma()
    y = np.asarray(arma_data["y"])
    rng = np.random.default_rng(0)
    for _ in range(5):
        theta = rng.normal(0, 0.5, size=4)
        for phi in (0.0, 0.3, 1.0):
            expected, lp, ll = arma_oracle(theta, y, phi)
            got = float(model.logp(jnp.asarray(theta, jnp.float32), phi))
            assert np.isclose(got, expected, rtol=2e-4), (phi, got, expected)
        assert np.isclose(float(model.logprior(jnp.asarray(theta, jnp.float32))), lp, rtol=1e-4)
        assert np.isclose(float(model.loglik(jnp.asarray(theta, jnp.float32))), ll, rtol=2e-4)


def test_arma_gradient_finite_difference(arma_data):
    model = make_arma()
    theta = jnp.asarray([0.05, 0.6, -0.1, -1.2])
    g = jax.grad(lambda t: model.logp(t, 0.7))(theta)
    eps = 1e-3
    for i in range(4):
        e = jnp.zeros(4).at[i].set(eps)
        fd = (model.logp(theta + e, 0.7) - model.logp(theta - e, 0.7)) / (2 * eps)
        assert np.isclose(float(g[i]), float(fd), rtol=2e-2, atol=1e-2)


def prmwcd_oracle(theta, y, X, q, phi):
    beta = theta[:12]
    log_gamma = theta[12]
    gamma = np.exp(log_gamma)
    lp = sps.invgamma.logpdf(gamma, 2, scale=1.3) + log_gamma
    lp += np.sum(-np.log(gamma) - np.abs(beta[1:] / gamma) ** q)
    eta = beta[0] + X @ beta[1:]
    loglik = sps.poisson.logpmf(y.astype(int), np.exp(eta)).sum()
    return lp + phi * loglik, lp, loglik


def test_prmwcd_matches_oracle():
    model = make_prmwcd()
    data = np.load(ARMA_ASSET.replace("arma", "prmwcd"))
    y, X, q = np.asarray(data["y"]), np.asarray(data["X"]), float(data["q"])
    rng = np.random.default_rng(1)
    for _ in range(5):
        theta = rng.normal(0, 0.3, size=13)
        for phi in (0.0, 0.5, 1.0):
            expected, lp, ll = prmwcd_oracle(theta, y, X, q, phi)
            got = float(model.logp(jnp.asarray(theta, jnp.float32), phi))
            assert np.isclose(got, expected, rtol=2e-4), (phi, got, expected)


def test_prmwcd_gradient_finite():
    model = make_prmwcd()
    theta = jnp.asarray(np.random.default_rng(2).normal(0, 0.3, 13), jnp.float32)
    g = jax.grad(lambda t: model.logp(t, 1.0))(theta)
    assert np.all(np.isfinite(np.asarray(g)))


def test_constrain():
    model = make_arma()
    theta = jnp.asarray([0.1, 0.2, 0.3, -1.0])
    c = np.asarray(model.constrain(theta))
    np.testing.assert_allclose(c, [0.1, 0.2, 0.3, np.exp(-1.0)], rtol=1e-6)

    pm = make_prmwcd()
    tp = jnp.asarray(np.arange(13, dtype=np.float32) / 10)
    cp = np.asarray(pm.constrain(tp))
    np.testing.assert_allclose(cp[:12], np.arange(12) / 10, rtol=1e-6)
    np.testing.assert_allclose(cp[12], np.exp(1.2), rtol=1e-5)


def test_registry():
    assert get_model("arma").name == "arma"
    assert get_model("PRMwCD").name == "prmwcd"
    with pytest.raises(KeyError):
        get_model("nope")


def test_gaussian_tempered_identity():
    from smcnuts_tpu.models import tempered_moments

    mean, var, pvar = np.array([1.0, -1.0]), np.array([0.5, 2.0]), np.array([4.0, 4.0])
    model = make_gaussian(mean, var, prior_var=pvar)
    theta = jnp.asarray([0.3, 0.7])
    # phi=1 recovers the target density.
    expected = sps.norm.logpdf([0.3, 0.7], mean, np.sqrt(var)).sum()
    assert np.isclose(float(model.logp(theta, 1.0)), expected, rtol=1e-5)
    # phi=0 recovers the prior.
    expected0 = sps.norm.logpdf([0.3, 0.7], 0, np.sqrt(pvar)).sum()
    assert np.isclose(float(model.logp(theta, 0.0)), expected0, rtol=1e-5)
    # tempered moments formula matches direct normalization at phi=0.5.
    m, v = tempered_moments(mean, var, pvar, 0.5)
    prec = 0.5 / pvar + 0.5 / var
    np.testing.assert_allclose(v, 1 / prec, rtol=1e-12)


def test_batched_consistency():
    model = make_arma()
    x = jnp.asarray(np.random.default_rng(3).normal(0, 0.5, (7, 4)), jnp.float32)
    batch = np.asarray(model.logp_batch(x, 0.6))
    single = np.array([float(model.logp(x[i], 0.6)) for i in range(7)])
    np.testing.assert_allclose(batch, single, rtol=1e-5)


class TestLogistic:
    def test_tile_model_matches_autodiff_depth0(self):
        """Logistic regression through the in-kernel autodiff adapter: a
        depth-0 tree is one leapfrog, checked against jax.value_and_grad."""
        from smcnuts_tpu.models import make_logistic
        from smcnuts_tpu.ops.nuts_pallas import nuts_batch_pallas

        m = make_logistic()
        n, D = 16, m.dim
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(0, 0.3, (n, D)), jnp.float32)
        r = jnp.asarray(rng.normal(size=(n, D)), jnp.float32)
        phi, eps = 0.6, 0.05
        x1, r1, st = nuts_batch_pallas(
            m.tile_model, x, r, seed=0, step_size=eps, phi=phi, max_depth=0,
            interpret=True,
        )
        vg = jax.vmap(jax.value_and_grad(lambda t: m.logp(t, phi)))
        lp0, g0 = vg(x)
        r_half = r + 0.5 * eps * g0
        x_exp = x + eps * r_half
        _, g1 = vg(x_exp)
        r_exp = r_half + 0.5 * eps * g1
        np.testing.assert_allclose(
            np.asarray(x1), np.asarray(x_exp), atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(r1), np.asarray(r_exp), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(st["logp0"]), np.asarray(lp0), rtol=1e-5, atol=1e-4
        )

    def test_end_to_end_moments_match_long_nuts(self):
        """SMC posterior mean agrees with a plain long NUTS-MCMC estimate on
        the same synthetic data (XLA backend, CPU)."""
        from smcnuts_tpu import SMCConfig, run_smc
        from smcnuts_tpu.models import make_logistic

        m = make_logistic()
        cfg = SMCConfig(
            n_particles=512, n_iterations=15, step_size=0.2,
            max_tree_depth=6, lkernel="forwardsLKernel", tempering=True,
            save_history=False,
        )
        res = jax.jit(lambda k: run_smc(m, cfg, k))(jax.random.key(0))
        assert float(res.ess[-1]) > 100
        smc_mean = np.asarray(res.mean_estimate[-1])

        # Long-chain oracle: persistent NUTS from the SMC answer.
        from smcnuts_tpu.ops.nuts import nuts_batch

        logp_vg = lambda t: jax.value_and_grad(lambda u: m.logp(u, 1.0))(t)
        n = 256
        key = jax.random.key(1)
        x = jnp.broadcast_to(jnp.asarray(smc_mean), (n, m.dim))

        def body(carry, k):
            x, key = carry
            key, km, kn = jax.random.split(key, 3)
            r = jax.random.normal(km, x.shape)
            x1, _, _ = nuts_batch(
                logp_vg, x, r, jax.random.split(kn, n), 0.2, max_depth=6
            )
            return (x1, key), x1

        (_, _), xs = jax.lax.scan(body, (x, key), None, length=20)
        mcmc_mean = np.asarray(xs[10:].reshape(-1, m.dim).mean(0))
        np.testing.assert_allclose(smc_mean, mcmc_mean, atol=0.25)
