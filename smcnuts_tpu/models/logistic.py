"""Bayesian logistic regression model family.

Not a reference asset (the reference ships only arma and PRMwCD, SURVEY.md §2
#14-15) — included to demonstrate that new model families plug into the full
stack, including the whole-tree Pallas NUTS backend, WITHOUT hand-derived
gradients: the likelihood is expressed once as an elementwise tile density
and differentiated by `jax.vjp` inside the kernel
(ops/nuts_pallas.elementwise_tile_model), and by `jax.grad` on the XLA path.

    beta ~ N(0, prior_scale^2 I)
    y_i ~ Bernoulli(sigmoid(x_i . beta)),  i = 1..n_obs

The default dataset is synthetic with a fixed seed so tests and benches are
reproducible; pass (X, y) for real data.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .base import LOG_SQRT_2PI, Model


def _synthetic(n_obs=64, dim=8, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.normal(size=(n_obs, dim)).astype(np.float32)
    beta_true = rng.normal(size=(dim,)).astype(np.float32)
    p = 1.0 / (1.0 + np.exp(-(X @ beta_true)))
    y = (rng.random(n_obs) < p).astype(np.float32)
    return X, y


def _tile_model(X, y, prior_scale):
    from ..ops.nuts_pallas import elementwise_tile_model

    n_obs, D = X.shape
    Xf = [[float(v) for v in row] for row in X]
    yf = [float(v) for v in y]
    ps2 = float(prior_scale) ** 2
    prior_const = float(-D * (np.log(prior_scale) + LOG_SQRT_2PI))

    def logp_tiles(vals, bt, phi):
        lp = bt[0] * 0.0  # materialized zero (Mosaic layout)
        for d in range(D):
            lp = lp - 0.5 * bt[d] * bt[d] / ps2
        lp = lp + prior_const
        ll = bt[0] * 0.0
        for i in range(n_obs):
            eta = bt[0] * Xf[i][0]
            for d in range(1, D):
                eta = eta + Xf[i][d] * bt[d]
            # y*eta - log(1 + e^eta), stable via log1p(exp(-|eta|)) form.
            ll = (
                ll + yf[i] * eta
                - (jnp.maximum(eta, 0.0) + jnp.log1p(jnp.exp(-jnp.abs(eta))))
            )
        return lp + phi * ll

    return elementwise_tile_model(D, (), logp_tiles)


def make_logistic(X=None, y=None, prior_scale=2.5) -> Model:
    if X is None or y is None:
        X, y = _synthetic()
    X = np.asarray(X, np.float32)
    y = np.asarray(y, np.float32)
    n_obs, D = X.shape
    # numpy, not jnp: see models/arma.py — construction must work under jit.
    Xj = np.asarray(X)
    yj = np.asarray(y)
    ps = float(prior_scale)

    def logprior(beta):
        return jnp.sum(
            -0.5 * (beta / ps) ** 2 - jnp.log(ps) - LOG_SQRT_2PI
        )

    def loglik(beta):
        eta = Xj @ beta
        # Bernoulli log-likelihood, numerically stable.
        return jnp.sum(yj * eta - jax.nn.softplus(eta))

    def constrain(beta):
        return beta

    return Model(
        tile_model=_tile_model(X, y, ps),
        name="logistic",
        dim=D,
        constrained_dim=D,
        param_names=tuple(f"beta.{d+1}" for d in range(D)),
        logprior=logprior,
        loglik=loglik,
        constrain=constrain,
    )
