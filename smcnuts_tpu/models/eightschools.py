"""Eight-schools hierarchical model (non-centered parameterization).

Not part of the reference's model assets — included to demonstrate that the
Model protocol covers the classic hierarchical/funnel class beyond the
reference's two Stan models (SURVEY.md §2 #14-15). Standard data from
Rubin (1981) / Gelman et al., as used across Stan's documentation.

Unconstrained parameters theta = [mu, log_tau, tt_1..tt_8] (D = 10):
    mu ~ N(0, 5); tau ~ HalfCauchy(0, 5) with exp transform (+log_tau
    Jacobian); tt_j ~ N(0, 1); y_j ~ N(mu + tau * tt_j, sigma_j).
Constrained output: [mu, tau, theta_1..theta_8] with
theta_j = mu + tau * tt_j (the transformed parameters a Stan model would
emit via param_constrain).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .base import Model, cauchy_lpdf, normal_lpdf

Y = np.array([28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0])
SIGMA = np.array([15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0])


def _tile_model(y, sig):
    """Whole-tree Pallas backend plug-in: elementwise tile log-density with
    in-kernel autodiff gradients (ops/nuts_pallas.elementwise_tile_model).
    Same density as logprior + phi*loglik below; the data are static, so they
    are baked in as immediate constants and the J-loop Python-unrolled (no
    SMEM loads — straight-line vector code)."""
    import numpy as np

    from ..ops.nuts_pallas import elementwise_tile_model

    J = int(y.shape[0])
    LOG_SQRT_2PI = float(0.5 * np.log(2.0 * np.pi))
    LOG_PI = float(np.log(np.pi))
    ys = [float(v) for v in np.asarray(y, np.float32)]
    ss = [float(v) for v in np.asarray(sig, np.float32)]
    log_ss = [float(np.log(s)) for s in ss]

    def logp_tiles(vals, xt, phi):
        mu, log_tau = xt[0], xt[1]
        tau = jnp.exp(log_tau)
        zmu = mu / 5.0
        lp = -0.5 * zmu * zmu - (np.log(5.0) + LOG_SQRT_2PI)
        zt = tau / 5.0
        lp = lp + (
            -LOG_PI - np.log(5.0) - jnp.log1p(zt * zt)
            + np.log(2.0) + log_tau
        )
        ll = lp * 0.0  # materialized zero (Mosaic layout)
        for j in range(J):
            tt = xt[2 + j]
            lp = lp - 0.5 * tt * tt - LOG_SQRT_2PI
            z = (ys[j] - mu - tau * tt) / ss[j]
            ll = ll - 0.5 * z * z - log_ss[j] - LOG_SQRT_2PI
        return lp + phi * ll

    return elementwise_tile_model(2 + J, (), logp_tiles)


def make_eightschools(y=None, sigma=None) -> Model:
    # numpy, not jnp: see models/arma.py — construction must work under jit.
    y = np.asarray(Y if y is None else y, dtype=float)
    sig = np.asarray(SIGMA if sigma is None else sigma, dtype=float)
    J = y.shape[0]

    def logprior(theta):
        mu, log_tau = theta[0], theta[1]
        tt = theta[2:]
        tau = jnp.exp(log_tau)
        lp = normal_lpdf(mu, 0.0, 5.0)
        # Half-Cauchy on tau: the cauchy density + log(2) for the folding,
        # plus the exp-transform Jacobian.
        lp += cauchy_lpdf(tau, 0.0, 5.0) + jnp.log(2.0) + log_tau
        lp += jnp.sum(normal_lpdf(tt, 0.0, 1.0))
        return lp

    def loglik(theta):
        mu, log_tau = theta[0], theta[1]
        tt = theta[2:]
        tau = jnp.exp(log_tau)
        return jnp.sum(normal_lpdf(y, mu + tau * tt, sig))

    def constrain(theta):
        mu, log_tau = theta[0], theta[1]
        tau = jnp.exp(log_tau)
        effects = mu + tau * theta[2:]
        return jnp.concatenate([jnp.stack([mu, tau]), effects])

    return Model(
        tile_model=_tile_model(y, sig),
        name="eightschools",
        dim=2 + J,
        constrained_dim=2 + J,
        param_names=("mu", "tau") + tuple(f"theta.{j+1}" for j in range(J)),
        logprior=logprior,
        loglik=loglik,
        constrain=constrain,
    )
