"""Stan math library for the .stan frontend: builtins and log densities.

Replaces the Stan Math C++ library behind BridgeStan (reference
smcnuts/model/bridgestan.py:18) with jnp implementations. All densities
include their normalizing constants (BridgeStan `propto=False` semantics),
matching the convention of the hand-written models in `models/base.py` —
sampling (`~`) statements therefore also keep constants, a documented
deviation from Stan's dropped-constant `~` semantics that only shifts the
target by a constant (invisible to sampling; offsets log-evidence by the
same constant at every temperature).

Container arguments follow Stan semantics: `dist_lpdf(y | args)` broadcasts
elementwise and returns the SUM over all elements.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

# Python float, not a jnp scalar: module-level jnp values become captured
# constants in any Pallas kernel that traces these densities
# (ops/nuts_pallas.tile_model_from_logp), which pallas_call rejects.
LOG_SQRT_2PI = float(0.5 * math.log(2.0 * math.pi))


def _concrete_scalar(v):
    """float(v) when v is a non-traced scalar (Python number, np scalar,
    concrete 0-d array), else None — lets densities resolve data-dependent
    branches at trace time and fold data elements as immediates on the
    scalarize/tile path."""
    if isinstance(v, jax.core.Tracer):
        return None
    if np.ndim(v) != 0:
        return None
    try:
        return float(v)
    except (TypeError, ValueError):
        return None


def _lp(elementwise):
    """Wrap an elementwise log-density into Stan's summed-container form."""

    def f(*args):
        if all(np.ndim(a) == 0 for a in args):
            # All-scalar fast path: no broadcast_arrays — that would STAGE
            # concrete arguments onto the trace (broadcast_in_dim of a
            # constant is a tracer), defeating the trace-time branch
            # resolution concrete data elements enable (e.g.
            # _bernoulli_logit picking one branch per observation).
            vals = []
            for a in args:
                c = _concrete_scalar(a)
                vals.append(c if c is not None else jnp.asarray(a, float))
            return elementwise(*vals)
        return jnp.sum(elementwise(*jnp.broadcast_arrays(
            *(jnp.asarray(a, dtype=float) for a in args)
        )))

    return f


# ---- log densities (continuous) ----

def _normal(y, mu, sigma):
    z = (y - mu) / sigma
    return -0.5 * z * z - jnp.log(sigma) - LOG_SQRT_2PI


def _cauchy(y, mu, gamma):
    z = (y - mu) / gamma
    return -jnp.log(jnp.pi * gamma) - jnp.log1p(z * z)


def _student_t(y, nu, mu, sigma):
    z = (y - mu) / sigma
    return (
        jax.lax.lgamma((nu + 1.0) / 2.0)
        - jax.lax.lgamma(nu / 2.0)
        - 0.5 * jnp.log(nu * jnp.pi)
        - jnp.log(sigma)
        - (nu + 1.0) / 2.0 * jnp.log1p(z * z / nu)
    )


def _exponential(y, rate):
    return jnp.log(rate) - rate * y


def _gamma(y, alpha, beta):
    return (
        alpha * jnp.log(beta)
        - jax.lax.lgamma(alpha)
        + (alpha - 1.0) * jnp.log(y)
        - beta * y
    )


def _inv_gamma(y, alpha, beta):
    return (
        alpha * jnp.log(beta)
        - jax.lax.lgamma(alpha)
        - (alpha + 1.0) * jnp.log(y)
        - beta / y
    )


def _lognormal(y, mu, sigma):
    return _normal(jnp.log(y), mu, sigma) - jnp.log(y)


def _beta(y, a, b):
    return (
        (a - 1.0) * jnp.log(y)
        + (b - 1.0) * jnp.log1p(-y)
        + jax.lax.lgamma(a + b)
        - jax.lax.lgamma(a)
        - jax.lax.lgamma(b)
    )


def _uniform(y, a, b):
    inside = jnp.logical_and(y >= a, y <= b)
    return jnp.where(inside, -jnp.log(b - a), -jnp.inf)


def _double_exponential(y, mu, sigma):
    return -jnp.abs(y - mu) / sigma - jnp.log(2.0 * sigma)


def _chi_square(y, nu):
    return (
        -nu / 2.0 * math.log(2.0)
        - jax.lax.lgamma(nu / 2.0)
        + (nu / 2.0 - 1.0) * jnp.log(y)
        - y / 2.0
    )


def _inv_chi_square(y, nu):
    return (
        -nu / 2.0 * math.log(2.0)
        - jax.lax.lgamma(nu / 2.0)
        - (nu / 2.0 + 1.0) * jnp.log(y)
        - 0.5 / y
    )


def _scaled_inv_chi_square(y, nu, s):
    return (
        nu / 2.0 * jnp.log(nu / 2.0)
        + nu * jnp.log(s)
        - jax.lax.lgamma(nu / 2.0)
        - (nu / 2.0 + 1.0) * jnp.log(y)
        - nu * s * s / (2.0 * y)
    )


def _logistic(y, mu, sigma):
    z = (y - mu) / sigma
    return -z - jnp.log(sigma) - 2.0 * jax.nn.softplus(-z)


def _gumbel(y, mu, beta):
    z = (y - mu) / beta
    return -jnp.log(beta) - z - jnp.exp(-z)


def _weibull(y, alpha, sigma):
    return (
        jnp.log(alpha)
        - alpha * jnp.log(sigma)
        + (alpha - 1.0) * jnp.log(y)
        - (y / sigma) ** alpha
    )


def _frechet(y, alpha, sigma):
    return (
        jnp.log(alpha)
        - jnp.log(sigma)
        + (-alpha - 1.0) * jnp.log(y / sigma)
        - (y / sigma) ** (-alpha)
    )


def _pareto(y, y_min, alpha):
    lp = jnp.log(alpha) + alpha * jnp.log(y_min) - (alpha + 1.0) * jnp.log(y)
    return jnp.where(y >= y_min, lp, -jnp.inf)


def _pareto_type_2(y, mu, lam, alpha):
    lp = (
        jnp.log(alpha)
        - jnp.log(lam)
        - (alpha + 1.0) * jnp.log1p((y - mu) / lam)
    )
    return jnp.where(y >= mu, lp, -jnp.inf)


def _rayleigh(y, sigma):
    return jnp.log(y) - 2.0 * jnp.log(sigma) - y * y / (2.0 * sigma * sigma)


def _skew_normal(y, xi, omega, alpha):
    z = (y - xi) / omega
    return (
        math.log(2.0)
        - jnp.log(omega)
        - 0.5 * z * z
        - LOG_SQRT_2PI
        + jax.scipy.special.log_ndtr(alpha * z)
    )


def _von_mises(y, mu, kappa):
    # log I0(kappa) = kappa + log i0e(kappa), overflow-safe for large kappa
    return (
        kappa * jnp.cos(y - mu)
        - math.log(2.0 * math.pi)
        - (kappa + jnp.log(jax.scipy.special.i0e(kappa)))
    )


def _exp_mod_normal(y, mu, sigma, lam):
    # log erfc(x) = log 2 + log_ndtr(-x*sqrt(2)): keeps the density finite
    # where erfc underflows (y far into the Gaussian-dominated tail)
    arg = (mu + lam * sigma * sigma - y) / sigma
    return (
        jnp.log(lam / 2.0)
        + lam / 2.0 * (2.0 * mu + lam * sigma * sigma - 2.0 * y)
        + math.log(2.0)
        + jax.scipy.special.log_ndtr(-arg)
    )


# ---- log probability mass functions ----

def _poisson(y, lam):
    return y * jnp.log(lam) - lam - jax.lax.lgamma(y + 1.0)


def _poisson_log(y, log_lam):
    return y * log_lam - jnp.exp(log_lam) - jax.lax.lgamma(y + 1.0)


def _bernoulli(y, p):
    return jnp.where(y > 0.5, jnp.log(p), jnp.log1p(-p))


def _log_sigmoid_stable(z):
    """log sigmoid(z) = (z - |z|)/2 - log1p(exp(-|z|)) — exact and stable
    for all z, in RAW elementwise primitives. jax.nn.log_sigmoid is
    deliberately avoided: it traces to a custom_jvp-wrapped call that (a)
    passes opaquely through the tile simplifier's cross-pass CSE (the
    forward-mode adapter then keeps D duplicated primal chains) and (b)
    has batched-vjp lowerings Mosaic cannot legalize inside Pallas tile
    bodies (see compiler._bounded)."""
    a = jnp.abs(z)
    return 0.5 * (z - a) - jnp.log1p(jnp.exp(-a))


def _bernoulli_logit(y, alpha):
    # log sigmoid(alpha) if y==1 else log sigmoid(-alpha). With concrete y
    # (the scalarize/tile path reads data elements as scalars) the branch
    # resolves at trace time — no select, only the taken branch's ops.
    yv = _concrete_scalar(y)
    if yv is not None:
        return _log_sigmoid_stable(alpha if yv > 0.5 else -alpha)
    return jnp.where(y > 0.5, _log_sigmoid_stable(alpha),
                     _log_sigmoid_stable(-alpha))


def _binomial(y, n, p):
    return (
        jax.lax.lgamma(n + 1.0)
        - jax.lax.lgamma(y + 1.0)
        - jax.lax.lgamma(n - y + 1.0)
        + y * jnp.log(p)
        + (n - y) * jnp.log1p(-p)
    )


def _neg_binomial_2(y, mu, phi):
    return (
        jax.lax.lgamma(y + phi)
        - jax.lax.lgamma(phi)
        - jax.lax.lgamma(y + 1.0)
        + phi * jnp.log(phi / (phi + mu))
        + y * jnp.log(mu / (phi + mu))
    )


def _neg_binomial_2_log(y, eta, phi):
    # log-mean parameterization, stable via softplus: log(phi + mu) =
    # log phi + softplus(eta - log phi)
    log_phi = jnp.log(phi)
    log_phi_mu = log_phi + jax.nn.softplus(eta - log_phi)
    return (
        jax.lax.lgamma(y + phi)
        - jax.lax.lgamma(phi)
        - jax.lax.lgamma(y + 1.0)
        + phi * (log_phi - log_phi_mu)
        + y * (eta - log_phi_mu)
    )


def _binomial_logit(y, n, alpha):
    return (
        jax.lax.lgamma(n + 1.0)
        - jax.lax.lgamma(y + 1.0)
        - jax.lax.lgamma(n - y + 1.0)
        + y * jax.nn.log_sigmoid(alpha)
        + (n - y) * jax.nn.log_sigmoid(-alpha)
    )


# ---- log CDFs / CCDFs ----
#
# Elementwise, matching the parameterizations above. They serve (a) the
# user-callable `<dist>_lcdf` / `<dist>_lccdf` / `<dist>_cdf` functions
# (Stan container semantics: lcdf/lccdf SUM over elements, cdf is the
# product) and (b) truncated sampling statements `y ~ dist(...) T[lo, hi]`
# (`truncated_lp` below). Written in log-stable forms; `where` branches use
# clamped inputs so the untaken branch cannot poison gradients (the
# where-vjp multiplies BOTH branch cotangents before selecting).

def _normal_lcdf(y, mu, sigma):
    return jax.scipy.special.log_ndtr((y - mu) / sigma)


def _normal_lccdf(y, mu, sigma):
    return jax.scipy.special.log_ndtr(-(y - mu) / sigma)


def _cauchy_lcdf_z(z):
    # cdf = 1/2 + atan(z)/pi = atan2(1, -z)/pi; atan2 keeps the tail
    # cdf ~ 1/(pi*|z|) representable, so the log is accurate to -inf.
    return jnp.log(jnp.arctan2(1.0, -z)) - jnp.log(jnp.pi)


def _student_t_lcdf_z(z, nu):
    # F(z) = 1/2 I_x(nu/2, 1/2) for z <= 0, x = nu/(nu + z^2); mirrored
    # above zero. (betainc has no d/da in JAX: nu must be data to grad.)
    x = nu / (nu + z * z)
    ib = jax.scipy.special.betainc(nu / 2.0, 0.5, x)
    return jnp.where(z <= 0.0, jnp.log(0.5 * ib), jnp.log1p(-0.5 * ib))


def _exponential_lcdf(y, rate):
    return jnp.log(-jnp.expm1(-rate * y))


def _gamma_lcdf(y, alpha, beta):
    return jnp.log(jax.scipy.special.gammainc(alpha, beta * y))


def _gamma_lccdf(y, alpha, beta):
    return jnp.log(jax.scipy.special.gammaincc(alpha, beta * y))


def _inv_gamma_lcdf(y, alpha, beta):
    return jnp.log(jax.scipy.special.gammaincc(alpha, beta / y))


def _inv_gamma_lccdf(y, alpha, beta):
    return jnp.log(jax.scipy.special.gammainc(alpha, beta / y))


def _beta_lcdf(y, a, b):
    return jnp.log(jax.scipy.special.betainc(a, b, y))


def _beta_lccdf(y, a, b):
    # 1 - I_y(a, b) = I_{1-y}(b, a), exact in log space
    return jnp.log(jax.scipy.special.betainc(b, a, 1.0 - y))


def _uniform_lcdf(y, a, b):
    return jnp.log(jnp.clip((y - a) / (b - a), 0.0, 1.0))


def _uniform_lccdf(y, a, b):
    return jnp.log(jnp.clip((b - y) / (b - a), 0.0, 1.0))


def _dexp_lcdf_z(z):
    zn = jnp.minimum(z, 0.0)
    zp = jnp.maximum(z, 0.0)
    return jnp.where(
        z <= 0.0, math.log(0.5) + zn, jnp.log1p(-0.5 * jnp.exp(-zp))
    )


def _chi_square_lcdf(y, nu):
    return jnp.log(jax.scipy.special.gammainc(nu / 2.0, y / 2.0))


def _chi_square_lccdf(y, nu):
    return jnp.log(jax.scipy.special.gammaincc(nu / 2.0, y / 2.0))


def _lognormal_lcdf(y, mu, sigma):
    return _normal_lcdf(jnp.log(y), mu, sigma)


def _lognormal_lccdf(y, mu, sigma):
    return _normal_lccdf(jnp.log(y), mu, sigma)


def _poisson_lcdf(y, lam):
    # P(Y <= y) = Q(floor(y) + 1, lam), the regularized upper gamma.
    # y < 0 would hand gammaincc a non-positive shape (nan); select -inf.
    yc = jnp.maximum(y, 0.0)
    v = jnp.log(jax.scipy.special.gammaincc(jnp.floor(yc) + 1.0, lam))
    return jnp.where(y < 0.0, -jnp.inf, v)


def _poisson_lccdf(y, lam):
    yc = jnp.maximum(y, 0.0)
    v = jnp.log(jax.scipy.special.gammainc(jnp.floor(yc) + 1.0, lam))
    return jnp.where(y < 0.0, 0.0, v)


def _binomial_lcdf(y, n, p):
    # P(Y <= y) = I_{1-p}(n - y, y + 1); y == n clamps to 0 (cdf = 1),
    # y < 0 selects -inf (betainc's shape args must stay positive).
    yc = jnp.clip(y, 0.0, n)
    a = jnp.maximum(n - yc, 1.0)
    v = jax.scipy.special.betainc(a, yc + 1.0, 1.0 - p)
    return jnp.where(y < 0.0, -jnp.inf, jnp.where(y >= n, 0.0, jnp.log(v)))


def _binomial_lccdf(y, n, p):
    yc = jnp.clip(y, 0.0, n)
    b = jnp.maximum(n - yc, 1.0)
    v = jax.scipy.special.betainc(yc + 1.0, b, p)
    return jnp.where(y < 0.0, 0.0, jnp.where(y >= n, -jnp.inf, jnp.log(v)))


def _nb2_lcdf(y, mu, phi):
    yc = jnp.maximum(y, 0.0)
    v = jnp.log(jax.scipy.special.betainc(phi, yc + 1.0, phi / (phi + mu)))
    return jnp.where(y < 0.0, -jnp.inf, v)


def _nb2_lccdf(y, mu, phi):
    yc = jnp.maximum(y, 0.0)
    v = jnp.log(jax.scipy.special.betainc(yc + 1.0, phi, mu / (phi + mu)))
    return jnp.where(y < 0.0, 0.0, v)


def _log1m_exp(x):
    """log(1 - exp(x)) for x <= 0."""
    return jnp.log(-jnp.expm1(x))


def _pareto_lccdf(y, y_min, alpha):
    return jnp.where(
        y >= y_min, alpha * (jnp.log(y_min) - jnp.log(jnp.maximum(y, y_min))),
        0.0,
    )


def _pareto2_lccdf(y, mu, lam, alpha):
    return jnp.where(
        y >= mu, -alpha * jnp.log1p(jnp.maximum(y - mu, 0.0) / lam), 0.0
    )


ELEMENTWISE_LCDFS = {
    "inv_chi_square": lambda y, nu: jnp.log(
        jax.scipy.special.gammaincc(nu / 2.0, 0.5 / y)
    ),
    "scaled_inv_chi_square": lambda y, nu, s: jnp.log(
        jax.scipy.special.gammaincc(nu / 2.0, nu * s * s / (2.0 * y))
    ),
    "logistic": lambda y, mu, s: jax.nn.log_sigmoid((y - mu) / s),
    "gumbel": lambda y, mu, b: -jnp.exp(-(y - mu) / b),
    "weibull": lambda y, a, s: _log1m_exp(-((y / s) ** a)),
    "frechet": lambda y, a, s: -((y / s) ** (-a)),
    "pareto": lambda y, ym, a: _log1m_exp(_pareto_lccdf(y, ym, a)),
    "pareto_type_2": lambda y, mu, lam, a: _log1m_exp(
        _pareto2_lccdf(y, mu, lam, a)
    ),
    "rayleigh": lambda y, s: _log1m_exp(-y * y / (2.0 * s * s)),
    "normal": _normal_lcdf,
    "std_normal": lambda y: _normal_lcdf(y, 0.0, 1.0),
    "cauchy": lambda y, mu, g: _cauchy_lcdf_z((y - mu) / g),
    "student_t": lambda y, nu, mu, s: _student_t_lcdf_z((y - mu) / s, nu),
    "exponential": _exponential_lcdf,
    "gamma": _gamma_lcdf,
    "inv_gamma": _inv_gamma_lcdf,
    "lognormal": _lognormal_lcdf,
    "beta": _beta_lcdf,
    "uniform": _uniform_lcdf,
    "double_exponential": lambda y, mu, s: _dexp_lcdf_z((y - mu) / s),
    "chi_square": _chi_square_lcdf,
    "poisson": _poisson_lcdf,
    "poisson_log": lambda y, eta: _poisson_lcdf(y, jnp.exp(eta)),
    "bernoulli": lambda y, p: jnp.where(
        y < 0.0, -jnp.inf, jnp.where(y >= 1.0, 0.0, jnp.log1p(-p))
    ),
    "bernoulli_logit": lambda y, a: jnp.where(
        y < 0.0, -jnp.inf, jnp.where(y >= 1.0, 0.0, jax.nn.log_sigmoid(-a))
    ),
    "binomial": _binomial_lcdf,
    "neg_binomial_2": _nb2_lcdf,
}

ELEMENTWISE_LCCDFS = {
    "inv_chi_square": lambda y, nu: jnp.log(
        jax.scipy.special.gammainc(nu / 2.0, 0.5 / y)
    ),
    "scaled_inv_chi_square": lambda y, nu, s: jnp.log(
        jax.scipy.special.gammainc(nu / 2.0, nu * s * s / (2.0 * y))
    ),
    "logistic": lambda y, mu, s: jax.nn.log_sigmoid(-(y - mu) / s),
    "gumbel": lambda y, mu, b: _log1m_exp(-jnp.exp(-(y - mu) / b)),
    "weibull": lambda y, a, s: -((y / s) ** a),
    "frechet": lambda y, a, s: _log1m_exp(-((y / s) ** (-a))),
    "pareto": _pareto_lccdf,
    "pareto_type_2": _pareto2_lccdf,
    "rayleigh": lambda y, s: -y * y / (2.0 * s * s),
    "normal": _normal_lccdf,
    "std_normal": lambda y: _normal_lccdf(y, 0.0, 1.0),
    "cauchy": lambda y, mu, g: _cauchy_lcdf_z(-(y - mu) / g),
    "student_t": lambda y, nu, mu, s: _student_t_lcdf_z(-(y - mu) / s, nu),
    "exponential": lambda y, rate: -rate * y,
    "gamma": _gamma_lccdf,
    "inv_gamma": _inv_gamma_lccdf,
    "lognormal": _lognormal_lccdf,
    "beta": _beta_lccdf,
    "uniform": _uniform_lccdf,
    "double_exponential": lambda y, mu, s: _dexp_lcdf_z(-(y - mu) / s),
    "chi_square": _chi_square_lccdf,
    "poisson": _poisson_lccdf,
    "poisson_log": lambda y, eta: _poisson_lccdf(y, jnp.exp(eta)),
    "bernoulli": lambda y, p: jnp.where(
        y < 0.0, 0.0, jnp.where(y >= 1.0, -jnp.inf, jnp.log(p))
    ),
    "bernoulli_logit": lambda y, a: jnp.where(
        y < 0.0, 0.0, jnp.where(y >= 1.0, -jnp.inf, jax.nn.log_sigmoid(a))
    ),
    "binomial": _binomial_lccdf,
    "neg_binomial_2": _nb2_lccdf,
}

# Truncated sampling statements follow Stan's CONTINUOUS semantics
# (normalize by F(hi) - F(lo)); the discrete convention differs (the lower
# denominator term is F(lo - 1)), so discrete families are rejected rather
# than silently mis-normalized.
DISCRETE_DISTRIBUTIONS = frozenset({
    "poisson", "poisson_log", "bernoulli", "bernoulli_logit", "binomial",
    "binomial_logit", "neg_binomial_2", "neg_binomial_2_log", "categorical",
    "categorical_logit", "multinomial", "ordered_logistic",
})


def _check_truncatable(dist, lo, hi):
    if dist in DISCRETE_DISTRIBUTIONS:
        raise ValueError(
            f"truncation (T[,]) of the discrete distribution {dist!r} is "
            "not supported (Stan's discrete truncation normalizes by "
            "F(lo - 1); only continuous families are implemented)"
        )
    density = ELEMENTWISE_DENSITIES.get(dist)
    if density is None:
        raise ValueError(
            f"truncation requires an elementwise density for {dist!r}"
        )
    lcdf = ELEMENTWISE_LCDFS.get(dist)
    lccdf = ELEMENTWISE_LCCDFS.get(dist)
    if (hi is not None and lcdf is None) or (
        lo is not None and hi is None and lccdf is None
    ):
        raise ValueError(
            f"no CDF implemented for {dist!r}; truncation unavailable "
            f"(supported: {', '.join(sorted(ELEMENTWISE_LCDFS))})"
        )
    return density, lcdf, lccdf


def truncation_lognorm(dist, params, lo=None, hi=None):
    """log(F(hi) - F(lo)) of a truncated sampling statement — involves
    only bounds and parameters, NOT the outcome, so scalarized tile
    bodies hoist it out of per-element loops (one evaluation per
    statement), and with concrete bounds/params it folds to a constant
    before the Pallas trace ever sees it. That fold is load-bearing: a
    half-Cauchy `T[0,]` inside a kernel would otherwise trace an
    in-kernel arctan, which Mosaic cannot lower (atan2)."""
    _, lcdf, lccdf = _check_truncatable(dist, lo, hi)
    if not any(
        isinstance(v, jax.core.Tracer)
        for v in (*params, lo, hi)
        if v is not None
    ):
        # Concrete bounds/params: force the fold NOW — inside a trace,
        # ops on constants are STAGED, not evaluated, and Mosaic cannot
        # lower e.g. the Cauchy CDF's atan2 even on constants.
        with jax.ensure_compile_time_eval():
            return float(truncation_lognorm_traced(
                dist, params, lo, hi
            ))
    return truncation_lognorm_traced(dist, params, lo, hi)


def truncation_lognorm_traced(dist, params, lo=None, hi=None):
    _, lcdf, lccdf = _check_truncatable(dist, lo, hi)
    params = [jnp.asarray(a, dtype=float) for a in params]
    if lo is not None and hi is not None:
        la = lcdf(jnp.asarray(hi, dtype=float), *params)
        lb = lcdf(jnp.asarray(lo, dtype=float), *params)
        return la + jnp.log(-jnp.expm1(lb - la))
    if lo is not None:
        return lccdf(jnp.asarray(lo, dtype=float), *params)
    if hi is not None:
        return lcdf(jnp.asarray(hi, dtype=float), *params)
    return 0.0


def truncated_lp(dist, args, lo=None, hi=None, lnorm=None):
    """Summed log-density of the truncated sampling statement
    `y ~ dist(args) T[lo, hi]` (Stan reference manual, truncation chapter):
    per element, lpdf(y) - log(F(hi) - F(lo)) inside the bounds and -inf
    outside. `args` is [y, *params]; bounds broadcast like parameters and
    may be traced (gradients flow through the CDFs at the bounds).
    `lnorm` may be precomputed via truncation_lognorm (scalarized tile
    bodies hoist it).
    """
    density, _, _ = _check_truncatable(dist, lo, hi)
    y = jnp.asarray(args[0], dtype=float)
    params = [jnp.asarray(a, dtype=float) for a in args[1:]]
    lo_b = None if lo is None else jnp.asarray(lo, dtype=float)
    hi_b = None if hi is None else jnp.asarray(hi, dtype=float)
    ll = density(y, *params)
    in_range = jnp.broadcast_to(jnp.asarray(True), jnp.shape(ll))
    if lo_b is not None:
        in_range = jnp.logical_and(in_range, y >= lo_b)
    if hi_b is not None:
        in_range = jnp.logical_and(in_range, y <= hi_b)
    if lnorm is None:
        lnorm = truncation_lognorm(dist, args[1:], lo, hi)
    return jnp.sum(jnp.where(in_range, ll - lnorm, -jnp.inf))


# Raw per-element densities (no broadcast/sum wrapper). The compiler's
# scalarize mode (Pallas tile bodies) calls these one element at a time so
# terms fold straight into the unrolled chain with no container stacking.
ELEMENTWISE_DENSITIES = {
    "normal": _normal,
    "std_normal": lambda y: _normal(y, 0.0, 1.0),
    "cauchy": _cauchy,
    "student_t": _student_t,
    "exponential": _exponential,
    "gamma": _gamma,
    "inv_gamma": _inv_gamma,
    "lognormal": _lognormal,
    "beta": _beta,
    "uniform": _uniform,
    "double_exponential": _double_exponential,
    "chi_square": _chi_square,
    "inv_chi_square": _inv_chi_square,
    "scaled_inv_chi_square": _scaled_inv_chi_square,
    "logistic": _logistic,
    "gumbel": _gumbel,
    "weibull": _weibull,
    "frechet": _frechet,
    "pareto": _pareto,
    "pareto_type_2": _pareto_type_2,
    "rayleigh": _rayleigh,
    "skew_normal": _skew_normal,
    "von_mises": _von_mises,
    "exp_mod_normal": _exp_mod_normal,
    "poisson": _poisson,
    "poisson_log": _poisson_log,
    "bernoulli": _bernoulli,
    "bernoulli_logit": _bernoulli_logit,
    "binomial": _binomial,
    "binomial_logit": _binomial_logit,
    "neg_binomial_2": _neg_binomial_2,
    "neg_binomial_2_log": _neg_binomial_2_log,
}

DISTRIBUTIONS = {k: _lp(v) for k, v in ELEMENTWISE_DENSITIES.items()}

# User-callable `<dist>_lcdf(y | ...)` / `<dist>_lccdf(y | ...)`: Stan sums
# the elementwise log-CDFs over containers (and `<dist>_cdf` is the
# product, i.e. exp of the sum — handled in the compiler).
LCDFS = {k: _lp(v) for k, v in ELEMENTWISE_LCDFS.items()}
LCCDFS = {k: _lp(v) for k, v in ELEMENTWISE_LCCDFS.items()}


# ---- joint (non-elementwise) densities ----
# These take whole vectors/matrices and are NOT wrapped by _lp (no
# broadcast-and-sum semantics) and not scalarizable by the tile path (the
# compiler's _dist_scalarized only consults ELEMENTWISE_DENSITIES).

def _mvn_chol_core(y, mu, chol):
    """Shared MVN log-density given the lower Cholesky factor. `y` may be a
    single (D,) vector or Stan's vectorized (N, D) array-of-vectors (mu
    broadcasting across rows); the per-observation normalizer is counted
    once per ROW."""
    y2 = jnp.atleast_2d(jnp.asarray(y, dtype=float))  # (N, D)
    n, d = y2.shape
    diff = y2 - jnp.asarray(mu, dtype=float)
    z = jax.scipy.linalg.solve_triangular(chol, diff.T, lower=True)
    return (
        -0.5 * jnp.sum(z * z)
        - n * (jnp.sum(jnp.log(jnp.diagonal(chol))) + d * LOG_SQRT_2PI)
    )


def _multi_normal(y, mu, sigma):
    return _mvn_chol_core(
        y, mu, jnp.linalg.cholesky(jnp.asarray(sigma, dtype=float))
    )


def _multi_normal_cholesky(y, mu, chol):
    return _mvn_chol_core(y, mu, jnp.asarray(chol, dtype=float))


def _dirichlet(theta, alpha):
    theta = jnp.asarray(theta, dtype=float)
    alpha = jnp.asarray(alpha, dtype=float)
    return (
        jnp.sum((alpha - 1.0) * jnp.log(theta))
        + jax.lax.lgamma(jnp.sum(alpha))
        - jnp.sum(jax.lax.lgamma(alpha))
    )


def _lkj_corr_cholesky(chol, eta):
    """LKJ density on a correlation Cholesky factor, UNNORMALIZED (Stan's
    c_K(eta) constant is omitted; eta must be DATA, so the constant cancels
    in gradients, acceptance ratios, and the tempering split — it only
    offsets log-evidence when an LKJ term sits in the phi-scaled
    likelihood, which no standard model does). A traced (parameter) eta is
    rejected: the omitted constant depends on eta, so its gradient would be
    silently wrong."""
    if isinstance(eta, jax.core.Tracer):
        raise ValueError(
            "lkj_corr_cholesky requires a data-derived eta (its "
            "normalizing constant, omitted here, depends on eta — a "
            "parameter eta would get a wrong gradient)"
        )
    chol = jnp.asarray(chol, dtype=float)
    k = chol.shape[-1]
    diag = jnp.diagonal(chol)[1:]
    expo = (
        jnp.asarray(k, dtype=float)
        - jnp.arange(2, k + 1, dtype=float)
        + 2.0 * jnp.asarray(eta, dtype=float)
        - 2.0
    )
    return jnp.sum(expo * jnp.log(diag))


def _logdet_spd(m):
    """(log det, lower Cholesky factor) of a symmetric positive-definite
    matrix."""
    chol = jnp.linalg.cholesky(jnp.asarray(m, dtype=float))
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol))), chol


def _lmultigamma(k, a):
    """Log multivariate gamma log Γ_K(a) (Wishart normalizers); `k` is a
    static Python int, `a` may be traced."""
    j = jnp.arange(1, k + 1, dtype=float)
    return (k * (k - 1) / 4.0) * math.log(math.pi) + jnp.sum(
        jax.lax.lgamma(jnp.asarray(a, dtype=float) + (1.0 - j) / 2.0)
    )


def _lkj_corr(sigma, eta):
    """LKJ density on a full correlation matrix, UNNORMALIZED like
    _lkj_corr_cholesky (same data-eta requirement, same rationale):
    log p = (eta - 1) log det Sigma."""
    if isinstance(eta, jax.core.Tracer):
        raise ValueError(
            "lkj_corr requires a data-derived eta (its normalizing "
            "constant, omitted here, depends on eta — a parameter eta "
            "would get a wrong gradient)"
        )
    ld, _ = _logdet_spd(sigma)
    return (jnp.asarray(eta, dtype=float) - 1.0) * ld


def _wishart(w, nu, s):
    """Fully-normalized Wishart log-density W ~ Wishart(nu, S) — the
    constants stay because nu/S may be parameters (unlike the LKJ eta)."""
    w = jnp.asarray(w, dtype=float)
    k = w.shape[-1]
    kf = float(k)
    nu = jnp.asarray(nu, dtype=float)
    ldw, _ = _logdet_spd(w)
    lds, chol_s = _logdet_spd(s)
    tr = jnp.trace(jax.scipy.linalg.cho_solve((chol_s, True), w))
    return (
        0.5 * (nu - kf - 1.0) * ldw
        - 0.5 * tr
        - 0.5 * nu * kf * math.log(2.0)
        - 0.5 * nu * lds
        - _lmultigamma(k, 0.5 * nu)
    )


def _inv_wishart(w, nu, s):
    """Fully-normalized inverse-Wishart log-density W ~ InvWishart(nu, S)."""
    w = jnp.asarray(w, dtype=float)
    k = w.shape[-1]
    kf = float(k)
    nu = jnp.asarray(nu, dtype=float)
    ldw, chol_w = _logdet_spd(w)
    lds, _ = _logdet_spd(s)
    tr = jnp.trace(
        jax.scipy.linalg.cho_solve((chol_w, True), jnp.asarray(s, float))
    )
    return (
        0.5 * nu * lds
        - 0.5 * (nu + kf + 1.0) * ldw
        - 0.5 * tr
        - 0.5 * nu * kf * math.log(2.0)
        - _lmultigamma(k, 0.5 * nu)
    )


def _categorical(y, theta):
    """categorical_lpmf: y is 1-based data int(s), theta a simplex."""
    theta = jnp.asarray(theta, dtype=float)
    return jnp.sum(jnp.log(theta[jnp.asarray(y) - 1]))


def _categorical_logit(y, beta):
    ls = jax.nn.log_softmax(jnp.asarray(beta, dtype=float))
    return jnp.sum(ls[jnp.asarray(y) - 1])


def _multinomial(y, theta):
    y = jnp.asarray(y, dtype=float)
    theta = jnp.asarray(theta, dtype=float)
    return (
        jax.lax.lgamma(jnp.sum(y) + 1.0)
        - jnp.sum(jax.lax.lgamma(y + 1.0))
        + jnp.sum(y * jnp.log(theta))
    )


def _ordered_logistic(y, eta, c):
    """ordered_logistic_lpmf: P(y=k) = logit^-1(eta - c_{k-1}) -
    logit^-1(eta - c_k) with c_0 = -inf, c_K = +inf (pairs with the
    `ordered` cutpoint type). Stable via log_sigmoid + log1m_exp; y may be
    a data int array with eta broadcasting elementwise."""
    y = jnp.asarray(y)
    eta = jnp.asarray(eta, dtype=float)
    c = jnp.asarray(c, dtype=float)
    inf = jnp.asarray([jnp.inf], dtype=float)
    cpad = jnp.concatenate([-inf, c, inf])
    a = eta - cpad[y - 1]  # >= b elementwise
    b = eta - cpad[y]
    la = jax.nn.log_sigmoid(a)
    lb = jax.nn.log_sigmoid(b)
    return jnp.sum(la + jnp.log(-jnp.expm1(lb - la)))


def _multi_student_t(y, nu, mu, sigma):
    """Multivariate Student-t log-density; like _mvn_chol_core, `y` may be
    one (D,) vector or an (N, D) array-of-vectors (normalizer per row)."""
    y2 = jnp.atleast_2d(jnp.asarray(y, dtype=float))
    n, d = y2.shape
    nu = jnp.asarray(nu, dtype=float)
    chol = jnp.linalg.cholesky(jnp.asarray(sigma, dtype=float))
    diff = y2 - jnp.asarray(mu, dtype=float)
    z = jax.scipy.linalg.solve_triangular(chol, diff.T, lower=True)
    maha = jnp.sum(z * z, axis=0)  # (N,)
    df = float(d)
    norm = (
        jax.lax.lgamma((nu + df) / 2.0)
        - jax.lax.lgamma(nu / 2.0)
        - 0.5 * df * jnp.log(nu * math.pi)
        - jnp.sum(jnp.log(jnp.diagonal(chol)))
    )
    return jnp.sum(-(nu + df) / 2.0 * jnp.log1p(maha / nu)) + n * norm


# ---- GLM fused densities ----
# Stan Math's *_glm families: the linear predictor eta = alpha + X @ beta
# is computed ONCE as a matmul (the MXU-friendly form) and fed to the
# elementwise density, summed. alpha broadcasts (scalar or per-row vector).

def _glm_eta(x, alpha, beta):
    x = jnp.asarray(x, dtype=float)
    return jnp.asarray(alpha, dtype=float) + x @ jnp.asarray(
        beta, dtype=float
    )


def _normal_id_glm(y, x, alpha, beta, sigma):
    return jnp.sum(
        _normal(jnp.asarray(y, dtype=float), _glm_eta(x, alpha, beta),
                jnp.asarray(sigma, dtype=float))
    )


def _bernoulli_logit_glm(y, x, alpha, beta):
    return jnp.sum(
        _bernoulli_logit(
            jnp.asarray(y, dtype=float), _glm_eta(x, alpha, beta)
        )
    )


def _poisson_log_glm(y, x, alpha, beta):
    return jnp.sum(
        _poisson_log(jnp.asarray(y, dtype=float), _glm_eta(x, alpha, beta))
    )


def _neg_binomial_2_log_glm(y, x, alpha, beta, phi):
    return jnp.sum(
        _neg_binomial_2_log(
            jnp.asarray(y, dtype=float), _glm_eta(x, alpha, beta),
            jnp.asarray(phi, dtype=float),
        )
    )


def _ordered_logistic_glm(y, x, beta, c):
    return _ordered_logistic(y, _glm_eta(x, 0.0, beta), c)


DISTRIBUTIONS.update(
    normal_id_glm=_normal_id_glm,
    bernoulli_logit_glm=_bernoulli_logit_glm,
    poisson_log_glm=_poisson_log_glm,
    neg_binomial_2_log_glm=_neg_binomial_2_log_glm,
    ordered_logistic_glm=_ordered_logistic_glm,
    multi_student_t=_multi_student_t,
    categorical=_categorical,
    categorical_logit=_categorical_logit,
    multinomial=_multinomial,
    ordered_logistic=_ordered_logistic,
    multi_normal=_multi_normal,
    multi_normal_cholesky=_multi_normal_cholesky,
    dirichlet=_dirichlet,
    lkj_corr_cholesky=_lkj_corr_cholesky,
    lkj_corr=_lkj_corr,
    wishart=_wishart,
    inv_wishart=_inv_wishart,
)


# ---- orientation ----


class RowVector:
    """A 1-D value tagged with ROW orientation (Stan's `row_vector`).

    Stan distinguishes column vectors from row vectors in its type system;
    this frontend's value layer is shape-based (1-D = column vector), so row
    orientation rides as this lightweight tag. The payload is a 1-D array
    (np or jnp). Orientation-aware sites (transpose, `*`, append_row/col,
    indexing — compiler._binop / _index_read) inspect the tag; everything
    else unwraps through `_as_arr` / compiler's `_as_value` and treats the
    payload like any 1-D value (correct wherever Stan's semantics do not
    depend on orientation, e.g. distribution arguments and reductions).
    """

    __slots__ = ("data",)

    def __init__(self, data):
        self.data = data

    def __repr__(self):
        return f"RowVector({self.data!r})"


def is_row(v) -> bool:
    return isinstance(v, RowVector)


# ---- scalar / container builtins ----

def _as_arr(x):
    if isinstance(x, RowVector):
        x = x.data
    return jnp.asarray(x, dtype=float)


def _transpose(x):
    """Stan `'`: matrix -> matrix.T; vector <-> row_vector; scalar id."""
    if isinstance(x, RowVector):
        return _as_arr(x)
    a = _as_arr(x)
    if a.ndim == 2:
        return a.T
    if a.ndim == 1:
        return RowVector(a)
    return a


def _orient_preserving(f):
    """Wrap a vector->vector builtin so a RowVector input keeps its
    orientation (Stan: head/tail/segment/reverse/sort of a row_vector
    return a row_vector)."""

    def g(v, *rest):
        out = f(_as_arr(v), *rest)
        return RowVector(out) if isinstance(v, RowVector) else out

    return g


def _append_row(a, b):
    """Stan append_row: matrices/row_vectors stack rows; vectors/scalars
    concatenate. A row_vector argument acts as a 1-row matrix (so
    append_row(r1', r2') builds a 2 x N matrix, matching Stan)."""
    if is_row(a) or is_row(b):
        return jnp.vstack(
            [jnp.atleast_2d(_as_arr(a)), jnp.atleast_2d(_as_arr(b))]
        )
    a2, b2 = _as_arr(a), _as_arr(b)
    if a2.ndim <= 1 and b2.ndim <= 1:
        return jnp.concatenate([jnp.atleast_1d(a2), jnp.atleast_1d(b2)])
    return jnp.vstack([jnp.atleast_2d(a2), jnp.atleast_2d(b2)])


def _append_col(a, b):
    """Stan append_col: matrices/vectors stack columns; row_vectors and
    scalars CONCATENATE into a longer row_vector. For untracked 1-D values
    the legacy conventions hold: scalar+1-D concatenates (the row-vector
    idiom), 1-D+1-D column-stacks to (N, 2) (the design-matrix idiom)."""
    if is_row(a) or is_row(b):
        ar, br = _as_arr(a), _as_arr(b)
        if ar.ndim <= 1 and br.ndim <= 1:
            return RowVector(jnp.concatenate(
                [jnp.atleast_1d(ar), jnp.atleast_1d(br)]
            ))
        raise ValueError(
            "append_col: cannot mix a row_vector with a matrix/vector"
        )
    a2, b2 = _as_arr(a), _as_arr(b)
    if a2.ndim == 0 or b2.ndim == 0:
        return jnp.concatenate([jnp.atleast_1d(a2), jnp.atleast_1d(b2)])
    if a2.ndim == 1 and b2.ndim == 1:
        return jnp.stack([a2, b2], axis=1)
    if a2.ndim == 1:
        a2 = a2[:, None]
    if b2.ndim == 1:
        b2 = b2[:, None]
    return jnp.hstack([a2, b2])


def _rep_matrix(x, m, n=None):
    if n is None:  # rep_matrix(vector, n): the vector as n identical columns
        return jnp.tile(_as_arr(x)[:, None], (1, int(m)))
    return jnp.full((int(m), int(n)), x, dtype=float)


def _to_matrix(v, m=None, n=None):
    if m is None:
        return jnp.atleast_2d(_as_arr(v))
    # Stan fills COLUMN-major
    return jnp.reshape(_as_arr(v), (int(n), int(m))).T


def _flatten_colmajor(x):
    """Stan's to_vector/to_row_vector flatten matrices COLUMN-major
    (round-trips with _to_matrix's column-major fill)."""
    a = _as_arr(x)
    return jnp.ravel(a.T) if a.ndim == 2 else jnp.ravel(a)


def _lchoose(n, k):
    """log binomial coefficient; 0 outside 0 <= k <= n (Stan rejects
    there — we take the lccdf-friendly -inf) and lgamma-safe inside."""
    n2, k2 = _as_arr(n), _as_arr(k)
    valid = (k2 >= 0.0) & (k2 <= n2)
    ks = jnp.where(valid, k2, 0.0)
    val = (
        jax.lax.lgamma(n2 + 1.0)
        - jax.lax.lgamma(ks + 1.0)
        - jax.lax.lgamma(n2 - ks + 1.0)
    )
    return jnp.where(valid, val, -jnp.inf)


def _choose(n, k):
    n2, k2 = _as_arr(n), _as_arr(k)
    valid = (k2 >= 0.0) & (k2 <= n2)
    return jnp.where(valid, jnp.round(jnp.exp(_lchoose(n2, jnp.where(valid, k2, 0.0)))), 0.0)


def _hmm_marginal(log_omegas, gamma, rho):
    """Stan's hmm_marginal: log marginal likelihood of an HMM by the
    forward algorithm in log space. log_omegas is (K states, N obs)
    per-state observation log-likelihoods, Gamma the (K, K) transition
    matrix (row i = distribution from state i), rho the initial state
    distribution. One lax.scan over observations — jit/vmap-friendly."""
    lo = _as_arr(log_omegas)
    lg = jnp.log(_as_arr(gamma))
    l0 = jnp.log(_as_arr(rho)) + lo[:, 0]

    def step(lalpha, lo_t):
        return (
            jax.scipy.special.logsumexp(lalpha[:, None] + lg, axis=0)
            + lo_t,
            None,
        )

    l_last, _ = jax.lax.scan(step, l0, lo.T[1:])
    return jax.scipy.special.logsumexp(l_last)


def _gp_exp_quad_cov(*a):
    """cov_exp_quad(x, alpha, rho) / cov_exp_quad(x1, x2, alpha, rho)
    (and the 2.26+ gp_exp_quad_cov names): squared-exponential kernel
    alpha^2 exp(-d^2 / (2 rho^2)); x entries may be reals (1-D array) or
    vectors (rows of a 2-D array). One batched distance computation — the
    MXU/VPU-friendly form, not Stan's elementwise loop."""
    if len(a) == 3:
        x1, x2, (alpha, rho) = a[0], a[0], a[1:]
    else:
        x1, x2, (alpha, rho) = a[0], a[1], a[2:]
    xa, xb = _as_arr(x1), _as_arr(x2)
    alpha = _as_arr(alpha)
    rho = _as_arr(rho)
    if xa.ndim == 1:
        d2 = (xa[:, None] - xb[None, :]) ** 2
    else:
        d2 = jnp.sum((xa[:, None, :] - xb[None, :, :]) ** 2, axis=-1)
    return alpha * alpha * jnp.exp(-0.5 * d2 / (rho * rho))


def _log_mix(*a):
    if len(a) == 2:  # log_mix(simplex theta, vector lp)
        theta, lps = _as_arr(a[0]), _as_arr(a[1])
        return jax.scipy.special.logsumexp(jnp.log(theta) + lps)
    theta, lp1, lp2 = a
    theta = _as_arr(theta)
    return jnp.logaddexp(
        jnp.log(theta) + _as_arr(lp1), jnp.log1p(-theta) + _as_arr(lp2)
    )


FUNCTIONS = {
    "exp": jnp.exp,
    "log": jnp.log,
    "log1p": jnp.log1p,
    "log1m": lambda x: jnp.log1p(-_as_arr(x)),
    # log(1 + exp(x)) / log(exp(x) - 1), overflow-safe (Stan 2.x names).
    "log1p_exp": jax.nn.softplus,
    "log1m_exp": lambda x: jnp.log(-jnp.expm1(_as_arr(x))),
    "log_inv_logit": jax.nn.log_sigmoid,
    "log1m_inv_logit": lambda x: jax.nn.log_sigmoid(-_as_arr(x)),
    # Stan overloads log2/log10 by arity: nullary = the constant ln 2 /
    # ln 10 (Stan functions reference "mathematical constants").
    "log2": lambda *a: jnp.log2(*a) if a else math.log(2.0),
    "log10": lambda *a: jnp.log10(*a) if a else math.log(10.0),
    # Nullary constants (Stan functions reference 3.1-3.2).
    "pi": lambda: math.pi,
    "e": lambda: math.e,
    "sqrt2": lambda: math.sqrt(2.0),
    "positive_infinity": lambda: math.inf,
    "negative_infinity": lambda: -math.inf,
    "not_a_number": lambda: math.nan,
    "machine_precision": lambda: float(jnp.finfo(jnp.float32).eps),
    # Container slicing (static sizes, as everywhere in this frontend).
    "head": _orient_preserving(lambda v, n: v[: int(n)]),
    # explicit start index: [-0:] would be the WHOLE vector for n=0
    "tail": _orient_preserving(lambda v, n: v[v.shape[0] - int(n):]),
    "segment": _orient_preserving(
        lambda v, i, n: v[int(i) - 1 : int(i) - 1 + int(n)]
    ),
    # Matrix helpers for the Cholesky-factor hierarchical idiom.
    "diag_pre_multiply": lambda d, m: _as_arr(d)[:, None] * _as_arr(m),
    "diag_post_multiply": lambda m, d: _as_arr(m) * _as_arr(d)[None, :],
    "multiply_lower_tri_self_transpose": lambda L: _as_arr(L) @ _as_arr(L).T,
    "cholesky_decompose": lambda m: jnp.linalg.cholesky(_as_arr(m)),
    "sqrt": jnp.sqrt,
    "square": lambda x: _as_arr(x) ** 2,
    "cbrt": jnp.cbrt,
    "abs": jnp.abs,
    "fabs": jnp.abs,
    "inv": lambda x: 1.0 / _as_arr(x),
    "inv_sqrt": lambda x: 1.0 / jnp.sqrt(_as_arr(x)),
    "inv_logit": jax.nn.sigmoid,
    "logit": jax.scipy.special.logit,
    "lgamma": lambda x: jax.lax.lgamma(_as_arr(x)),
    "tgamma": lambda x: jnp.exp(jax.lax.lgamma(_as_arr(x))),
    "digamma": jax.scipy.special.digamma,
    "pow": lambda x, y: _as_arr(x) ** y,
    "fmin": jnp.minimum,
    "fmax": jnp.maximum,
    "fmod": jnp.fmod,
    "floor": jnp.floor,
    "ceil": jnp.ceil,
    "round": jnp.round,
    "sin": jnp.sin,
    "cos": jnp.cos,
    "tan": jnp.tan,
    "asin": jnp.arcsin,
    "acos": jnp.arccos,
    "atan": jnp.arctan,
    "atan2": jnp.arctan2,
    "sinh": jnp.sinh,
    "cosh": jnp.cosh,
    "tanh": jnp.tanh,
    "expm1": jnp.expm1,
    "erf": jax.scipy.special.erf,
    "erfc": jax.scipy.special.erfc,
    "Phi": lambda x: jax.scipy.stats.norm.cdf(_as_arr(x)),
    "inv_Phi": lambda x: jax.scipy.special.ndtri(_as_arr(x)),
    # Stan's logistic approximation to Phi (reference manual definition).
    "Phi_approx": lambda x: jax.nn.sigmoid(
        0.07056 * _as_arr(x) ** 3 + 1.5976 * _as_arr(x)
    ),
    "log_sum_exp": lambda *a: jax.scipy.special.logsumexp(
        jnp.stack([_as_arr(x) for x in a]) if len(a) > 1 else _as_arr(a[0])
    ),
    "log_mix": _log_mix,
    "log_diff_exp": lambda a, b: _as_arr(a) + jnp.log(
        -jnp.expm1(_as_arr(b) - _as_arr(a))
    ),
    "append_row": _append_row,
    "append_col": _append_col,
    "rep_matrix": _rep_matrix,
    "to_matrix": _to_matrix,
    "to_row_vector": lambda x: RowVector(_flatten_colmajor(x)),
    "columns_dot_product": lambda a, b: jnp.sum(
        _as_arr(a) * _as_arr(b), axis=0
    ),
    "rows_dot_product": lambda a, b: jnp.sum(
        _as_arr(a) * _as_arr(b), axis=1
    ),
    "cov_exp_quad": _gp_exp_quad_cov,
    "gp_exp_quad_cov": _gp_exp_quad_cov,
    "hmm_marginal": _hmm_marginal,
    # multiply_log/lmultiply: x * log(y) with the 0 * log(0) = 0 convention
    "multiply_log": lambda x, y: jnp.where(
        (_as_arr(x) == 0.0) & (_as_arr(y) == 0.0), 0.0,
        _as_arr(x) * jnp.log(_as_arr(y)),
    ),
    "lmultiply": lambda x, y: jnp.where(
        (_as_arr(x) == 0.0) & (_as_arr(y) == 0.0), 0.0,
        _as_arr(x) * jnp.log(_as_arr(y)),
    ),
    "lchoose": _lchoose,
    "choose": _choose,
    "step": lambda x: jnp.where(_as_arr(x) >= 0.0, 1.0, 0.0),
    "int_step": lambda x: jnp.where(_as_arr(x) > 0.0, 1.0, 0.0),
    "fdim": lambda x, y: jnp.maximum(_as_arr(x) - _as_arr(y), 0.0),
    "hypot": jnp.hypot,
    "sort_asc": _orient_preserving(jnp.sort),
    "sort_desc": _orient_preserving(lambda v: jnp.sort(v)[::-1]),
    "sort_indices_asc": lambda v: jnp.argsort(_as_arr(v)) + 1,
    "sort_indices_desc": lambda v: jnp.argsort(-_as_arr(v)) + 1,
    "rank": lambda v, i: jnp.sum(
        _as_arr(v) < _as_arr(v)[int(i) - 1]
    ),
    "add_diag": lambda m, v: _as_arr(m) + (
        jnp.diag(_as_arr(v))
        if jnp.ndim(v) == 1
        else jnp.eye(jnp.shape(m)[0]) * _as_arr(v)
    ),
    "softmax": jax.nn.softmax,
    "log_softmax": jax.nn.log_softmax,
    # containers
    "sum": lambda x: jnp.sum(_as_arr(x)),
    "prod": lambda x: jnp.prod(_as_arr(x)),
    "mean": lambda x: jnp.mean(_as_arr(x)),
    "sd": lambda x: jnp.std(_as_arr(x), ddof=1),
    "variance": lambda x: jnp.var(_as_arr(x), ddof=1),
    "min": lambda x: jnp.min(_as_arr(x)),
    "max": lambda x: jnp.max(_as_arr(x)),
    "dot_product": lambda a, b: jnp.dot(_as_arr(a), _as_arr(b)),
    "dot_self": lambda a: jnp.dot(_as_arr(a), _as_arr(a)),
    "cumulative_sum": _orient_preserving(jnp.cumsum),
    "reverse": _orient_preserving(lambda x: x[::-1]),
    "transpose": _transpose,
    "col": lambda m, j: _as_arr(m)[:, j - 1],
    "row": lambda m, i: RowVector(_as_arr(m)[i - 1, :]),
    "diag_matrix": lambda v: jnp.diag(_as_arr(v)),
    "diagonal": lambda m: jnp.diag(_as_arr(m)),
    "rep_vector": lambda v, n: jnp.full((n,), v, dtype=float),
    "rep_row_vector": lambda v, n: RowVector(
        jnp.full((n,), v, dtype=float)
    ),
    "rep_array": lambda v, n: jnp.full((n,), v),
    "to_vector": _flatten_colmajor,
    "to_array_1d": lambda x: jnp.ravel(_as_arr(x)),
    # matrix algebra (pairs with the corr_matrix/cov_matrix parameter types)
    "trace": lambda m: jnp.trace(_as_arr(m)),
    "inverse": lambda m: jnp.linalg.inv(_as_arr(m)),
    "inverse_spd": lambda m: jnp.linalg.inv(_as_arr(m)),
    "determinant": lambda m: jnp.linalg.det(_as_arr(m)),
    "log_determinant": lambda m: jnp.linalg.slogdet(_as_arr(m))[1],
    # quad_form(A, B) = B' A B; a vector B gives a scalar, a matrix B a
    # matrix — one expression covers both.
    "quad_form": lambda a, b: _as_arr(b).T @ _as_arr(a) @ _as_arr(b),
    "quad_form_sym": lambda a, b: _as_arr(b).T @ _as_arr(a) @ _as_arr(b),
    "quad_form_diag": lambda m, v: _as_arr(m)
    * jnp.outer(_as_arr(v), _as_arr(v)),
    "crossprod": lambda m: _as_arr(m).T @ _as_arr(m),
    "tcrossprod": lambda m: _as_arr(m) @ _as_arr(m).T,
    "mdivide_left_tri_low": lambda a, b: jax.scipy.linalg.solve_triangular(
        _as_arr(a), _as_arr(b), lower=True
    ),
    "mdivide_left_spd": lambda a, b: jax.scipy.linalg.cho_solve(
        (jnp.linalg.cholesky(_as_arr(a)), True), _as_arr(b)
    ),
    "squared_distance": lambda a, b: jnp.sum(
        (_as_arr(a) - _as_arr(b)) ** 2
    ),
    "distance": lambda a, b: jnp.sqrt(
        jnp.sum((_as_arr(a) - _as_arr(b)) ** 2)
    ),
    # Shape queries return static Python ints (usable as loop bounds).
    "rows": lambda m: int(jnp.shape(m)[0]),
    "cols": lambda m: int(jnp.shape(m)[1]),
    "num_elements": lambda m: int(_as_arr(m).size),
    "size": lambda m: int(jnp.shape(m)[0]) if jnp.shape(m) else 1,
}


# ---- RNG functions (generated quantities only) ----
#
# The reference evaluates generated quantities inside `constrain` with a
# FIXED-SEED RNG (bridgestan.py:106-120, new_rng(seed=0)) so constrained
# estimates are deterministic; the compiler mirrors that by threading a fixed
# jax.random key through these, one fold_in per call site per evaluation.

def _bshape(*args):
    return jnp.broadcast_shapes(*(jnp.shape(a) for a in args))


def _normal_rng(key, mu, sigma):
    return mu + sigma * jax.random.normal(key, _bshape(mu, sigma))


RNG_FUNCTIONS = {
    "normal": _normal_rng,
    "std_normal": lambda key: jax.random.normal(key),
    "uniform": lambda key, a, b: a + (b - a) * jax.random.uniform(
        key, _bshape(a, b)
    ),
    "exponential": lambda key, rate: jax.random.exponential(
        key, _bshape(rate)
    ) / rate,
    "gamma": lambda key, alpha, beta: jax.random.gamma(
        key, jnp.broadcast_to(jnp.asarray(alpha, float), _bshape(alpha, beta))
    ) / beta,
    "inv_gamma": lambda key, alpha, beta: beta / jax.random.gamma(
        key, jnp.broadcast_to(jnp.asarray(alpha, float), _bshape(alpha, beta))
    ),
    "beta": lambda key, a, b: jax.random.beta(key, a, b, _bshape(a, b)),
    "lognormal": lambda key, mu, sigma: jnp.exp(_normal_rng(key, mu, sigma)),
    "cauchy": lambda key, mu, gamma: mu + gamma * jax.random.cauchy(
        key, _bshape(mu, gamma)
    ),
    "student_t": lambda key, nu, mu, sigma: mu + sigma * jax.random.t(
        key, nu, _bshape(nu, mu, sigma)
    ),
    "chi_square": lambda key, nu: 2.0 * jax.random.gamma(
        key, jnp.asarray(nu, float) / 2.0
    ),
    "inv_chi_square": lambda key, nu: 0.5 / jax.random.gamma(
        key, jnp.asarray(nu, float) / 2.0
    ),
    "scaled_inv_chi_square": lambda key, nu, s: (
        jnp.asarray(nu, float) * jnp.asarray(s, float) ** 2 / 2.0
    ) / jax.random.gamma(key, jnp.asarray(nu, float) / 2.0),
    "logistic": lambda key, mu, s: mu + s * jax.scipy.special.logit(
        jax.random.uniform(key, _bshape(mu, s))
    ),
    "gumbel": lambda key, mu, b: mu - b * jnp.log(
        jax.random.exponential(key, _bshape(mu, b))
    ),
    "weibull": lambda key, a, s: s * jax.random.exponential(
        key, _bshape(a, s)
    ) ** (1.0 / jnp.asarray(a, float)),
    "frechet": lambda key, a, s: s * jax.random.exponential(
        key, _bshape(a, s)
    ) ** (-1.0 / jnp.asarray(a, float)),
    "pareto": lambda key, ym, a: ym * jnp.exp(
        jax.random.exponential(key, _bshape(ym, a)) / jnp.asarray(a, float)
    ),
    "pareto_type_2": lambda key, mu, lam, a: mu + lam * (
        jnp.exp(
            jax.random.exponential(key, _bshape(mu, lam, a))
            / jnp.asarray(a, float)
        )
        - 1.0
    ),
    "rayleigh": lambda key, s: s * jnp.sqrt(
        2.0 * jax.random.exponential(key, _bshape(s))
    ),
    "double_exponential": lambda key, mu, sigma: mu - sigma * jnp.sign(
        jax.random.uniform(key, _bshape(mu, sigma)) - 0.5
    ) * jnp.log1p(-jnp.abs(
        2.0 * jax.random.uniform(jax.random.fold_in(key, 1),
                                 _bshape(mu, sigma)) - 1.0
    )),
    "poisson": lambda key, lam: jax.random.poisson(
        key, lam, _bshape(lam)
    ).astype(float),
    "poisson_log": lambda key, log_lam: jax.random.poisson(
        key, jnp.exp(log_lam), _bshape(log_lam)
    ).astype(float),
    "bernoulli": lambda key, p: jax.random.bernoulli(
        key, p, _bshape(p)
    ).astype(float),
    "bernoulli_logit": lambda key, alpha: jax.random.bernoulli(
        key, jax.nn.sigmoid(alpha), _bshape(alpha)
    ).astype(float),
    "binomial": lambda key, n, p: jax.random.binomial(
        key, n, p, _bshape(n, p)
    ).astype(float),
    "categorical": lambda key, theta: (
        jax.random.categorical(key, jnp.log(jnp.asarray(theta, float)))
        + 1
    ).astype(float),
    "categorical_logit": lambda key, beta: (
        jax.random.categorical(key, jnp.asarray(beta, float)) + 1
    ).astype(float),
    "dirichlet": lambda key, alpha: jax.random.dirichlet(
        key, jnp.asarray(alpha, float)
    ),
    "multi_normal": lambda key, mu, sigma: jax.random.multivariate_normal(
        key, jnp.asarray(mu, float), jnp.asarray(sigma, float)
    ),
    "multi_normal_cholesky": lambda key, mu, chol: jnp.asarray(mu, float)
    + jnp.asarray(chol, float) @ jax.random.normal(
        key, (jnp.shape(chol)[0],)
    ),
}
