"""New continuous distribution families vs scipy (lpdf, lcdf, lccdf, rng).

Widens the frontend's univariate coverage toward the full Stan Math set
BridgeStan hands the reference (reference smcnuts/model/bridgestan.py:18):
logistic, gumbel, weibull, frechet, pareto(+type_2), rayleigh,
inv_chi_square(+scaled), skew_normal, von_mises, exp_mod_normal.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from smcnuts_tpu.stan import compile_stan_program
from smcnuts_tpu.stan.math import (
    ELEMENTWISE_DENSITIES,
    ELEMENTWISE_LCCDFS,
    ELEMENTWISE_LCDFS,
    RNG_FUNCTIONS,
)

# (name, args-after-y, scipy frozen dist, y grid, has_cdf)
_CASES = [
    ("logistic", (0.4, 1.3), stats.logistic(0.4, 1.3),
     [-4.0, 0.0, 0.4, 3.0], True),
    ("gumbel", (0.2, 0.9), stats.gumbel_r(0.2, 0.9),
     [-1.5, 0.2, 2.0], True),
    ("weibull", (1.7, 2.2), stats.weibull_min(1.7, scale=2.2),
     [0.3, 1.5, 5.0], True),
    ("frechet", (2.5, 1.4), stats.invweibull(2.5, scale=1.4),
     [0.5, 1.4, 4.0], True),
    ("pareto", (1.5, 2.0), stats.pareto(2.0, scale=1.5),
     [1.6, 3.0, 10.0], True),
    ("pareto_type_2", (0.5, 2.0, 3.0), stats.lomax(3.0, loc=0.5, scale=2.0),
     [0.7, 2.0, 6.0], True),
    ("rayleigh", (1.2,), stats.rayleigh(scale=1.2),
     [0.3, 1.2, 3.5], True),
    ("inv_chi_square", (4.0,), stats.invgamma(2.0, scale=0.5),
     [0.1, 0.3, 1.0], True),
    ("scaled_inv_chi_square", (4.0, 1.5),
     stats.invgamma(2.0, scale=4.0 * 1.5 * 1.5 / 2.0),
     [1.0, 3.0, 8.0], True),
    ("skew_normal", (0.3, 1.2, 2.0), stats.skewnorm(2.0, loc=0.3, scale=1.2),
     [-1.0, 0.3, 2.0], False),
    ("von_mises", (0.5, 2.5), stats.vonmises(2.5, loc=0.5),
     [-1.0, 0.5, 2.0], False),
    ("exp_mod_normal", (0.2, 1.1, 0.7),
     stats.exponnorm(1.0 / (1.1 * 0.7), loc=0.2, scale=1.1),
     [-1.0, 0.5, 4.0], False),
]


@pytest.mark.parametrize("name,args,frozen,ys,has_cdf", _CASES,
                         ids=[c[0] for c in _CASES])
def test_lpdf_and_cdfs_match_scipy(name, args, frozen, ys, has_cdf):
    lpdf = ELEMENTWISE_DENSITIES[name]
    for y in ys:
        np.testing.assert_allclose(
            float(lpdf(jnp.float32(y), *map(jnp.float32, args))),
            frozen.logpdf(y), rtol=3e-4, atol=1e-5,
        )
    if has_cdf:
        lcdf = ELEMENTWISE_LCDFS[name]
        lccdf = ELEMENTWISE_LCCDFS[name]
        for y in ys:
            np.testing.assert_allclose(
                float(lcdf(jnp.float32(y), *map(jnp.float32, args))),
                frozen.logcdf(y), rtol=3e-4, atol=1e-6,
            )
            np.testing.assert_allclose(
                float(lccdf(jnp.float32(y), *map(jnp.float32, args))),
                frozen.logsf(y), rtol=3e-4, atol=1e-6,
            )
    else:
        assert name not in ELEMENTWISE_LCDFS


@pytest.mark.parametrize("name,args,frozen,ys,has_cdf", _CASES,
                         ids=[c[0] for c in _CASES])
def test_gradients_finite(name, args, frozen, ys, has_cdf):
    lpdf = ELEMENTWISE_DENSITIES[name]
    y = jnp.float32(ys[1])
    g = jax.grad(
        lambda a: lpdf(y, *a)
    )(tuple(jnp.float32(v) for v in args))
    assert all(np.isfinite(float(x)) for x in g), (name, g)


@pytest.mark.parametrize(
    "name", [c[0] for c in _CASES if c[0] in RNG_FUNCTIONS]
)
def test_rng_means(name):
    args = dict(_CASES_BY_NAME[name])["args"]
    frozen = dict(_CASES_BY_NAME[name])["frozen"]
    key = jax.random.key(0)
    draws = jax.vmap(
        lambda k: RNG_FUNCTIONS[name](k, *map(jnp.float32, args))
    )(jax.random.split(key, 4000))
    m_want = frozen.mean()
    sd = float(np.sqrt(frozen.var()))
    assert abs(float(jnp.mean(draws)) - m_want) < 5 * sd / np.sqrt(4000), (
        name, float(jnp.mean(draws)), m_want
    )


_CASES_BY_NAME = {
    c[0]: {"args": c[1], "frozen": c[2]} for c in _CASES
}


def test_new_families_reachable_from_stan_source():
    """Sampling statements + truncation through the new families e2e."""
    src = """
    data { real y; }
    parameters { real<lower=0> s; }
    model {
      s ~ rayleigh(2.0);
      y ~ weibull(1.5, s) T[0.5,];
    }
    """
    m = compile_stan_program(src, {"y": 1.8}, name="newfam")
    th = jnp.asarray([0.3], jnp.float32)
    sv = float(np.exp(0.3))
    w = stats.weibull_min(1.5, scale=sv)
    want = (
        stats.rayleigh(scale=2.0).logpdf(sv) + 0.3  # exp-transform Jacobian
        + w.logpdf(1.8) - w.logsf(0.5)
    )
    np.testing.assert_allclose(float(m.logp(th, 1.0)), want, rtol=1e-4)
    g = jax.grad(lambda t: m.logp(t, 1.0))(th)
    assert np.isfinite(float(g[0]))


def test_von_mises_large_kappa_stable():
    """log I0 via kappa + log(i0e): no overflow at large concentration."""
    v = float(
        ELEMENTWISE_DENSITIES["von_mises"](
            jnp.float32(0.1), jnp.float32(0.0), jnp.float32(500.0)
        )
    )
    np.testing.assert_allclose(
        v, stats.vonmises(500.0).logpdf(0.1), rtol=1e-3
    )


def test_exp_mod_normal_gaussian_tail_stable():
    """Where erfc underflows (deep Gaussian-dominated tail) the log_ndtr
    form must stay finite and match scipy's logpdf."""
    frozen = stats.exponnorm(1.0 / (1.0 * 0.5), loc=0.0, scale=1.0)
    v = float(
        ELEMENTWISE_DENSITIES["exp_mod_normal"](
            jnp.float32(-12.0), 0.0, 1.0, 0.5
        )
    )
    np.testing.assert_allclose(v, frozen.logpdf(-12.0), rtol=1e-3)


def test_inv_phi_and_phi_approx():
    src = """
    data { real u; }
    parameters { real m; }
    model { target += inv_Phi(u) + Phi_approx(m) + m; }
    """
    m = compile_stan_program(src, {"u": 0.8}, name="phis")
    got = float(m.logp(jnp.asarray([0.5], jnp.float32), 1.0))
    want = (
        stats.norm.ppf(0.8)
        + 1.0 / (1.0 + np.exp(-(0.07056 * 0.125 + 1.5976 * 0.5)))
        + 0.5
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_neg_binomial_2_log_and_binomial_logit():
    from smcnuts_tpu.stan.math import DISTRIBUTIONS

    eta, phi = 1.3, 2.5
    mu = np.exp(eta)
    for y in [0.0, 2.0, 7.0]:
        np.testing.assert_allclose(
            float(DISTRIBUTIONS["neg_binomial_2_log"](
                jnp.float32(y), jnp.float32(eta), jnp.float32(phi)
            )),
            stats.nbinom(phi, phi / (phi + mu)).logpmf(y), rtol=1e-4,
        )
    a = 0.8
    for y in [0.0, 3.0, 10.0]:
        np.testing.assert_allclose(
            float(DISTRIBUTIONS["binomial_logit"](
                jnp.float32(y), jnp.float32(10.0), jnp.float32(a)
            )),
            stats.binom(10, 1.0 / (1.0 + np.exp(-a))).logpmf(y), rtol=1e-4,
        )


def test_glm_densities_match_composition():
    """The fused *_glm forms must equal alpha + X @ beta fed through the
    base density, via a real .stan program."""
    rng = np.random.default_rng(5)
    n, d = 12, 3
    X = rng.normal(size=(n, d))
    yb = (rng.uniform(size=n) < 0.5).astype(float)
    yp = rng.poisson(2.0, size=n).astype(float)
    yn = rng.normal(size=n)
    src = """
    data {
      int<lower=1> n; int<lower=1> d; matrix[n, d] X;
      vector[n] yb; vector[n] yp; vector[n] yn;
    }
    parameters { real alpha; vector[d] beta; real<lower=0> sigma; }
    model {
      yb ~ bernoulli_logit_glm(X, alpha, beta);
      yp ~ poisson_log_glm(X, alpha, beta);
      yn ~ normal_id_glm(X, alpha, beta, sigma);
      target += neg_binomial_2_log_glm_lpmf(yp | X, alpha, beta, 3.0);
    }
    """
    m = compile_stan_program(
        src,
        {"n": n, "d": d, "X": X.tolist(), "yb": yb.tolist(),
         "yp": yp.tolist(), "yn": yn.tolist()},
        name="glm",
    )
    th = np.concatenate([[0.4], [0.3, -0.2, 0.1], [0.25]])
    alpha, beta, sig = 0.4, np.array([0.3, -0.2, 0.1]), float(np.exp(0.25))
    eta = alpha + X @ beta
    p = 1.0 / (1.0 + np.exp(-eta))
    lam = np.exp(eta)
    phi = 3.0
    want = (
        stats.bernoulli(p).logpmf(yb).sum()
        + stats.poisson(lam).logpmf(yp).sum()
        + stats.norm(eta, sig).logpdf(yn).sum()
        + stats.nbinom(phi, phi / (phi + lam)).logpmf(yp).sum()
        + 0.25  # exp-transform Jacobian of sigma
    )
    got = float(m.logp(jnp.asarray(th, jnp.float32), 1.0))
    np.testing.assert_allclose(got, want, rtol=1e-4)
    g = jax.grad(lambda t: m.logp(t, 1.0))(jnp.asarray(th, jnp.float32))
    assert np.all(np.isfinite(np.asarray(g)))
