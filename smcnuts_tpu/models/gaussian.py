"""Analytically tractable Gaussian target for golden-value tests and benches.

Not present in the reference (which validates only against Stan ground-truth
files, reference experiments/plot_experiments.py:14); this model gives the test
pyramid closed-form posterior moments, normalizing constants, and the exact
optimal L-kernel. Structured as prior N(0, s0^2 I) x "likelihood" so the
tempered path logp(theta, phi) = logprior + phi*loglik interpolates between two
Gaussians with known moments at every phi.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .base import LOG_SQRT_2PI, Model


def make_gaussian(mean, var, prior_var=None) -> Model:
    """Target N(mean, diag(var)).

    If prior_var is given, logprior = N(0, diag(prior_var)) and loglik is the
    Gaussian correction so that logprior + loglik equals the target density;
    at temperature phi the implied distribution is the (Gaussian) product
    N(m_phi, v_phi) with 1/v_phi = (1-phi)/prior_var + phi'/..., computed by
    `tempered_moments`. If prior_var is None, the whole density is the prior
    (untempered target) and loglik = 0 contributes nothing.
    """
    # numpy, not jnp: see models/arma.py — construction must work under jit.
    mean = np.asarray(mean, dtype=float)
    var = np.asarray(var, dtype=float)
    D = mean.shape[0]

    def target_logpdf(theta):
        z2 = (theta - mean) ** 2 / var
        return jnp.sum(-0.5 * z2 - 0.5 * jnp.log(var)) - D * LOG_SQRT_2PI

    if prior_var is None:
        logprior = target_logpdf

        def loglik(theta):
            return jnp.zeros(())

    else:
        pvar = np.asarray(prior_var, dtype=float)

        def logprior(theta):
            z2 = theta**2 / pvar
            return jnp.sum(-0.5 * z2 - 0.5 * jnp.log(pvar)) - D * LOG_SQRT_2PI

        def loglik(theta):
            return target_logpdf(theta) - logprior(theta)

    def constrain(theta):
        return theta

    # Whole-tree Pallas backend plug-in via in-kernel autodiff (see
    # ops/nuts_pallas.elementwise_tile_model). Tempered density matches
    # logprior + phi*loglik exactly: (1-phi)*logprior + phi*log target.
    from ..ops.nuts_pallas import elementwise_tile_model

    mean_f = np.asarray(mean, np.float32)
    var_f = np.asarray(var, np.float32)
    pvar_f = None if prior_var is None else np.asarray(prior_var, np.float32)
    log_var_sum = float(np.sum(np.log(var_f)))
    const_t = float(-0.5 * log_var_sum - D * LOG_SQRT_2PI)
    if pvar_f is not None:
        const_p = float(-0.5 * np.sum(np.log(pvar_f)) - D * LOG_SQRT_2PI)

    def logp_tiles(vals, xt, phi):
        lt = xt[0] * 0.0  # materialized zero (Mosaic layout)
        for d in range(D):
            dx = xt[d] - float(mean_f[d])
            lt = lt - 0.5 * dx * dx / float(var_f[d])
        lt = lt + const_t
        if pvar_f is None:
            return lt + phi * 0.0
        lp = xt[0] * 0.0
        for d in range(D):
            lp = lp - 0.5 * xt[d] * xt[d] / float(pvar_f[d])
        lp = lp + const_p
        return lp + phi * (lt - lp)

    tile_model = elementwise_tile_model(D, (), logp_tiles)

    return Model(
        tile_model=tile_model,
        name="gaussian",
        dim=D,
        constrained_dim=D,
        param_names=tuple(f"x{i}" for i in range(D)),
        logprior=logprior,
        loglik=loglik,
        constrain=constrain,
    )


def tempered_moments(mean, var, prior_var, phi):
    """Moments of exp(logprior + phi*loglik) for the tempered Gaussian model.

    logprior + phi*loglik = (1-phi)*logprior + phi*log target, a product of
    Gaussian powers: precision = (1-phi)/prior_var + phi/var,
    precision*mean_phi = phi*mean/var.
    """
    import numpy as np

    mean, var, pvar = map(np.asarray, (mean, var, prior_var))
    prec = (1.0 - phi) / pvar + phi / var
    v = 1.0 / prec
    m = v * (phi * mean / var)
    return m, v
