"""Eight-schools hierarchical model: density vs scipy oracle and posterior
sanity via the tempered asymptotic SMC path (published posterior:
mu ~ 4.4, tau ~ 3.6 with wide spread)."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats as sps

from smcnuts_tpu import SMCConfig, run_smc
from smcnuts_tpu.models import get_model, make_eightschools
from smcnuts_tpu.models.eightschools import SIGMA, Y


def oracle_logp(theta, phi):
    mu, log_tau = theta[0], theta[1]
    tt = theta[2:]
    tau = np.exp(log_tau)
    lp = sps.norm.logpdf(mu, 0, 5)
    lp += sps.cauchy.logpdf(tau, 0, 5) + np.log(2.0) + log_tau
    lp += sps.norm.logpdf(tt, 0, 1).sum()
    ll = sps.norm.logpdf(Y, mu + tau * tt, SIGMA).sum()
    return lp + phi * ll


def test_matches_oracle():
    model = make_eightschools()
    rng = np.random.default_rng(0)
    for _ in range(5):
        theta = rng.normal(0, 0.7, size=10)
        for phi in (0.0, 0.5, 1.0):
            got = float(model.logp(jnp.asarray(theta, jnp.float32), phi))
            want = oracle_logp(theta, phi)
            assert np.isclose(got, want, rtol=2e-4), (phi, got, want)


def test_constrain():
    model = make_eightschools()
    theta = jnp.asarray([1.0, 0.0] + [0.5] * 8, jnp.float32)
    c = np.asarray(model.constrain(theta))
    assert np.isclose(c[1], 1.0)  # tau = exp(0)
    np.testing.assert_allclose(c[2:], 1.5, rtol=1e-6)  # mu + tau*tt


def test_registry():
    assert get_model("eightschools").dim == 10


def test_posterior_sanity():
    model = make_eightschools()
    cfg = SMCConfig(
        n_particles=512, n_iterations=15, step_size=0.2,
        lkernel="asymptoticLKernel", tempering=True, max_tree_depth=6,
    )
    res = run_smc(model, cfg, jax.random.key(0))
    mean = np.asarray(res.mean_estimate[-1])
    mu_est, tau_est = mean[0], mean[1]
    # Published posterior: mu ~ 4.4 (sd ~3.3), tau ~ 3.6 (half-Cauchy tail).
    assert 1.5 < mu_est < 8.0, mu_est
    assert 1.0 < tau_est < 8.0, tau_est
    assert float(res.phi[-1]) == 1.0
