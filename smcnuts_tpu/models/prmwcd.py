"""Poisson regression with kernel design matrix and bridge (EP) prior, TPU-native.

Re-expresses the reference's Stan model (reference stan_models/PRMwCD/PRMwCD.stan)
as jittable tempered log-density functions. Unconstrained parameters
theta = [Beta_1..Beta_M, log_Gamma] (M = 12); Gamma = exp(log_Gamma) with the
Jacobian folded into the prior.

Priors (PRMwCD.stan:21, :36-38): Gamma ~ InvGamma(2, 1.3); for i = 2..M (Stan
1-indexed, i.e. the 11 kernel coefficients, not the intercept):
log p += -log(Gamma) - |Beta_i / Gamma|^q. The intercept Beta_1 is flat.
Likelihood (PRMwCD.stan:24-33): y_i ~ Poisson(exp(eta_i)) with
eta = Beta_1 + X @ Beta_2..M, scaled by the tempering parameter phi.

TPU-first design note: the reference evaluates eta with a doubly nested scalar
loop per particle; here it is one (N_obs x Clength) matvec, and the vmapped
batch over particles becomes a single (particles x Clength) @ (Clength x N_obs)
MXU matmul.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from .base import Model, inv_gamma_lpdf, poisson_lpmf

_ASSET = os.path.join(os.path.dirname(__file__), "..", "assets", "prmwcd.npz")


def make_prmwcd(y=None, X=None, q=None) -> Model:
    """Build the PRMwCD model. Defaults to the imported reference data."""
    data = None
    if y is None or X is None or q is None:
        data = np.load(_ASSET)
    # numpy, not jnp: see models/arma.py — construction must work under jit.
    y = np.asarray(y if y is not None else data["y"], dtype=float)
    X = np.asarray(X if X is not None else data["X"])
    q = float(q if q is not None else data["q"])
    M = X.shape[1] + 1  # 12 betas: intercept + Clength kernel coefficients

    def logprior(theta):
        beta_coef = theta[1:M]  # the M-1 non-intercept betas
        log_gamma = theta[M]
        gamma = jnp.exp(log_gamma)
        lp = inv_gamma_lpdf(gamma, 2.0, 1.3) + log_gamma  # + exp Jacobian
        lp += jnp.sum(-log_gamma - jnp.abs(beta_coef / gamma) ** q)
        return lp

    def loglik(theta):
        eta = theta[0] + X @ theta[1:M]
        return jnp.sum(poisson_lpmf(y, eta))

    def constrain(theta):
        return jnp.concatenate([theta[:M], jnp.exp(theta[M:])])

    names = tuple(f"Beta.{i}" for i in range(1, M + 1)) + ("Gamma",)
    from ..ops.nuts_pallas import prmwcd_tile_model

    return Model(
        tile_model=prmwcd_tile_model(y, X, q),
        name="prmwcd",
        dim=M + 1,
        constrained_dim=M + 1,
        param_names=names,
        logprior=logprior,
        loglik=loglik,
        constrain=constrain,
    )


def ground_truth():
    """Posterior mean and VARIANCE from the reference's long Stan run. As for
    arma, the stored third column is the posterior standard deviation
    (see arma.ground_truth docstring); we return its square."""
    data = np.load(_ASSET)
    sd = np.asarray(data["gt_var"])
    return np.asarray(data["gt_mean"]), sd**2


def default_step_size() -> float:
    return float(np.load(_ASSET)["step_size"])
