"""Stan frontend: CDF functions and truncated sampling statements.

BridgeStan gives the reference the full Stan truncation semantics and the
`_cdf` / `_lcdf` / `_lccdf` function families for free (reference
smcnuts/model/bridgestan.py:18); these tests pin our implementations to
scipy and to the Stan reference manual's truncation rule
(lpdf(y) - log(F(hi) - F(lo)), -inf outside the bounds).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from smcnuts_tpu.stan import (
    StanCompileError,
    compile_stan_program,
)
from smcnuts_tpu.stan.math import (
    ELEMENTWISE_LCCDFS,
    ELEMENTWISE_LCDFS,
    truncated_lp,
)

# (name, args-after-y, scipy frozen dist, y grid)
_CDF_CASES = [
    ("normal", (0.5, 1.3), stats.norm(0.5, 1.3), [-3.0, -0.5, 0.5, 2.7]),
    ("std_normal", (), stats.norm(), [-2.0, 0.0, 1.5]),
    ("cauchy", (0.2, 0.8), stats.cauchy(0.2, 0.8), [-30.0, -1.0, 0.2, 8.0]),
    ("student_t", (4.0, 0.3, 1.1), stats.t(4.0, 0.3, 1.1),
     [-5.0, -0.2, 0.3, 2.0]),
    ("exponential", (1.7,), stats.expon(scale=1 / 1.7), [0.05, 0.8, 4.0]),
    ("gamma", (2.5, 1.4), stats.gamma(2.5, scale=1 / 1.4), [0.2, 1.5, 6.0]),
    ("inv_gamma", (3.0, 2.0), stats.invgamma(3.0, scale=2.0),
     [0.3, 0.8, 3.0]),
    ("lognormal", (0.1, 0.6), stats.lognorm(0.6, scale=np.exp(0.1)),
     [0.2, 1.0, 4.0]),
    ("beta", (2.0, 3.5), stats.beta(2.0, 3.5), [0.05, 0.4, 0.9]),
    ("uniform", (-1.0, 2.0), stats.uniform(-1.0, 3.0), [-0.5, 0.0, 1.9]),
    ("double_exponential", (0.4, 1.2), stats.laplace(0.4, 1.2),
     [-4.0, 0.0, 0.4, 3.0]),
    ("chi_square", (3.0,), stats.chi2(3.0), [0.5, 2.0, 7.0]),
    ("poisson", (3.2,), stats.poisson(3.2), [0.0, 2.0, 6.0]),
    ("poisson_log", (np.log(3.2),), stats.poisson(3.2), [0.0, 2.0, 6.0]),
    ("bernoulli", (0.3,), stats.bernoulli(0.3), [0.0, 1.0]),
    ("binomial", (10.0, 0.35), stats.binom(10, 0.35), [0.0, 4.0, 10.0]),
    ("neg_binomial_2", (4.0, 2.5), None, [0.0, 3.0, 9.0]),
]


def _nb2_scipy(mu, phi):
    # scipy nbinom(n, p) with n = phi, p = phi / (phi + mu)
    return stats.nbinom(phi, phi / (phi + mu))


@pytest.mark.parametrize("name,args,frozen,ys", _CDF_CASES,
                         ids=[c[0] for c in _CDF_CASES])
def test_lcdf_lccdf_match_scipy(name, args, frozen, ys):
    if frozen is None:
        frozen = _nb2_scipy(*args)
    lcdf = ELEMENTWISE_LCDFS[name]
    lccdf = ELEMENTWISE_LCCDFS[name]
    for y in ys:
        np.testing.assert_allclose(
            float(lcdf(jnp.float32(y), *map(jnp.float32, args))),
            frozen.logcdf(y), rtol=2e-4, atol=1e-6,
        )
        np.testing.assert_allclose(
            float(lccdf(jnp.float32(y), *map(jnp.float32, args))),
            frozen.logsf(y), rtol=2e-4, atol=1e-6,
        )


def test_tail_stability():
    """Deep tails must stay finite/accurate where the naive log(cdf) would
    underflow to log(0): the stable forms carry the log directly."""
    v = float(ELEMENTWISE_LCDFS["normal"](jnp.float32(-30.0), 0.0, 1.0))
    np.testing.assert_allclose(v, stats.norm.logcdf(-30.0), rtol=1e-4)
    v = float(ELEMENTWISE_LCDFS["cauchy"](jnp.float32(-1e6), 0.0, 1.0))
    np.testing.assert_allclose(v, stats.cauchy.logcdf(-1e6), rtol=1e-4)
    v = float(ELEMENTWISE_LCCDFS["exponential"](jnp.float32(200.0), 1.0))
    np.testing.assert_allclose(v, -200.0)
    # gradients at the tails stay finite (clamped where-branches)
    g = jax.grad(
        lambda y: ELEMENTWISE_LCDFS["double_exponential"](y, 0.0, 1.0)
    )(jnp.float32(25.0))
    assert np.isfinite(float(g))


def test_truncated_half_normal():
    """sigma ~ normal(0, s) T[0,] is the half-normal prior; the compiled
    logp must equal lpdf - logsf(0) with the usual exp-transform Jacobian."""
    src = """
    data { int<lower=1> N; vector[N] y; }
    parameters { real mu; real<lower=0> sigma; }
    model {
      mu ~ normal(0, 5);
      sigma ~ normal(0, 2) T[0,];
      y ~ normal(mu, sigma);
    }
    """
    y = np.random.default_rng(0).normal(1.0, 0.5, size=8)
    m = compile_stan_program(src, {"N": 8, "y": y.tolist()}, name="hn")
    th = jnp.asarray([0.3, -0.4], jnp.float32)
    sig = float(np.exp(-0.4))
    want = (
        stats.norm(0, 5).logpdf(0.3)
        + stats.norm(0, 2).logpdf(sig) - stats.norm(0, 2).logsf(0.0)
        - 0.4  # log|d sigma / d theta|
        + stats.norm(0.3, sig).logpdf(y).sum()
    )
    np.testing.assert_allclose(float(m.logp(th, 1.0)), want, rtol=1e-5)
    g = jax.grad(lambda t: m.logp(t, 1.0))(th)
    assert np.all(np.isfinite(np.asarray(g)))


def test_truncated_two_sided_matches_truncnorm():
    src = "data { real y; } parameters { real mu; }" \
          " model { y ~ normal(mu, 1.5) T[-1, 2]; }"
    m = compile_stan_program(src, {"y": 0.7}, name="tn")
    muv = 0.2
    want = stats.truncnorm(
        (-1 - muv) / 1.5, (2 - muv) / 1.5, loc=muv, scale=1.5
    ).logpdf(0.7)
    np.testing.assert_allclose(
        float(m.logp(jnp.asarray([muv], jnp.float32), 1.0)), want, rtol=1e-4
    )
    # the truncation normalizer depends on mu -> it must shape the gradient
    g_trunc = float(jax.grad(
        lambda t: m.logp(t, 1.0)
    )(jnp.asarray([muv], jnp.float32))[0])
    eps = 1e-3
    fd = (
        stats.truncnorm((-1 - muv - eps) / 1.5, (2 - muv - eps) / 1.5,
                        loc=muv + eps, scale=1.5).logpdf(0.7)
        - stats.truncnorm((-1 - muv + eps) / 1.5, (2 - muv + eps) / 1.5,
                          loc=muv - eps, scale=1.5).logpdf(0.7)
    ) / (2 * eps)
    np.testing.assert_allclose(g_trunc, fd, rtol=2e-2)


def test_truncated_upper_only_and_out_of_range():
    src = "data { real y; } parameters { real r; }" \
          " model { y ~ exponential(exp(r)) T[, 3]; }"
    m = compile_stan_program(src, {"y": 1.1}, name="ub")
    r = 0.4
    rate = float(np.exp(r))
    want = (
        stats.expon(scale=1 / rate).logpdf(1.1)
        - stats.expon(scale=1 / rate).logcdf(3.0)
    )
    np.testing.assert_allclose(
        float(m.logp(jnp.asarray([r], jnp.float32), 1.0)), want, rtol=1e-4
    )
    m_out = compile_stan_program(src, {"y": 4.0}, name="ub_out")
    assert float(
        m_out.logp(jnp.asarray([r], jnp.float32), 1.0)
    ) == -np.inf


def test_truncated_vectorized_container():
    """Container y with scalar bounds: per-element normalization, summed."""
    src = """
    data { int<lower=1> N; vector[N] y; }
    parameters { real mu; }
    model { y ~ normal(mu, 1) T[0,]; }
    """
    y = np.array([0.4, 1.2, 0.1, 2.0])
    m = compile_stan_program(src, {"N": 4, "y": y.tolist()}, name="vec")
    muv = 0.6
    want = (
        stats.norm(muv, 1).logpdf(y) - stats.norm(muv, 1).logsf(0.0)
    ).sum()
    np.testing.assert_allclose(
        float(m.logp(jnp.asarray([muv], jnp.float32), 1.0)), want, rtol=1e-5
    )


def test_truncated_inside_long_loop():
    """Truncated statements inside a scan-lowered loop: the stream analyzer
    must walk the bound expressions and the scan interpreter must evaluate
    them (threshold for lowering is ~48 iterations)."""
    T = 64
    y = np.abs(np.random.default_rng(3).normal(1.0, 0.8, size=T))
    src = """
    data { int<lower=1> T; vector[T] y; }
    parameters { real mu; }
    model {
      for (t in 1:T) { y[t] ~ normal(mu, 1) T[0,]; }
    }
    """
    m = compile_stan_program(src, {"T": T, "y": y.tolist()}, name="loop")
    muv = 0.8
    want = (
        stats.norm(muv, 1).logpdf(y) - stats.norm(muv, 1).logsf(0.0)
    ).sum()
    np.testing.assert_allclose(
        float(m.logp(jnp.asarray([muv], jnp.float32), 1.0)), want, rtol=1e-5
    )


def test_truncated_discrete_rejected():
    src = "data { int y; } parameters { real l; }" \
          " model { y ~ poisson(exp(l)) T[1,]; }"
    with pytest.raises(StanCompileError, match="discrete"):
        compile_stan_program(src, {"y": 2}, name="disc")


def test_truncated_lp_rejects_unknown_cdf():
    with pytest.raises(ValueError, match="density|CDF"):
        truncated_lp("nope", [1.0, 0.0, 1.0], lo=0.0)


def test_cdf_function_calls():
    """User-callable `_lcdf` / `_lccdf` / `_cdf`: container lcdf sums,
    container cdf is the product (exp of the sum)."""
    src = """
    data { vector[3] y; }
    parameters { real m; }
    model {
      target += normal_lcdf(y | m, 2) + gamma_lccdf(2.0 | 3, 1)
              + normal_cdf(y | m, 2);
    }
    """
    yv = np.array([0.1, -0.5, 1.0])
    m = compile_stan_program(src, {"y": yv.tolist()}, name="cdfcalls")
    mv = 0.3
    want = (
        stats.norm(mv, 2).logcdf(yv).sum()
        + stats.gamma(3, scale=1.0).logsf(2.0)
        + np.prod(stats.norm(mv, 2).cdf(yv))
    )
    np.testing.assert_allclose(
        float(m.logp(jnp.asarray([mv], jnp.float32), 1.0)), want, rtol=1e-4
    )


def test_unknown_cdf_function_raises():
    src = ("data { real y; } parameters { real m; } "
           "model { target += wishart_lcdf(y | m, 1); }")
    with pytest.raises(StanCompileError, match="no CDF"):
        compile_stan_program(src, {"y": 0.5}, name="nocdf")
