"""ARMA(1,1) time-series model, TPU-native.

Re-expresses the reference's Stan model (reference stan_models/arma/arma.stan)
as jittable tempered log-density functions. Unconstrained parameters
theta = [mu, beta, theta_ma, log_sigma]; sigma = exp(log_sigma) with the +log_sigma
Jacobian folded into the prior (Stan's <lower=0> transform).

Priors (arma.stan:18-21): mu ~ N(0,10), beta ~ N(0,2), theta ~ N(0,2),
sigma ~ Cauchy(0, 2.5). Likelihood (arma.stan:23-30): one-step-ahead
prediction errors err_t with err_1 = y_1 - (mu + beta*mu) and
err_t = y_t - (mu + beta*y_{t-1} + theta*err_{t-1}); err_t ~ N(0, sigma),
scaled by the tempering parameter phi.

TPU-first design note: the error recurrence err_t = a*err_{t-1} + b_t with
constant a = -theta is a first-order linear recurrence, evaluated with
`lax.associative_scan` in O(log T) depth instead of the reference's O(T)
sequential loop — the whole likelihood is then a handful of fused VPU ops
over the (batched) T axis.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np
from jax import lax

from .base import Model, cauchy_lpdf, normal_lpdf

_ASSET = os.path.join(os.path.dirname(__file__), "..", "assets", "arma.npz")


def _linear_recurrence(a, b, init):
    """Solve e_t = a * e_{t-1} + b_t (t = 1..T-1) given e_0 = init.

    a: scalar; b: (T-1,); returns (T,) full error sequence.
    Uses an associative scan over affine maps (A, B) composed as
    (A2*A1, A2*B1 + B2), giving e_t = A_t * e_0 + B_t.
    """
    A = jnp.full(b.shape, a)

    def combine(c1, c2):
        A1, B1 = c1
        A2, B2 = c2
        return A2 * A1, A2 * B1 + B2

    A_cum, B_cum = lax.associative_scan(combine, (A, b))
    rest = A_cum * init + B_cum
    return jnp.concatenate([jnp.asarray(init)[None], rest])


def make_arma(y=None, fused: str | None = None) -> Model:
    """Build the ARMA(1,1) model. `y` defaults to the imported reference data.

    fused: None (default) leaves gradient computation to jax.value_and_grad —
    the fastest choice when the whole SMC run compiles to one XLA program and
    per-kernel launch overhead is high (e.g. remotely-attached chips).
    "pallas" installs the fused single-pass value+gradient Pallas kernel
    (ops/arma_fused.py) via custom_vmap — the high-throughput path on
    directly-attached TPUs at large N. "scan" installs the jnp forward-mode
    fused path (useful for testing the fused wiring on CPU).
    """
    if y is None:
        data = np.load(_ASSET)
        y = np.asarray(data["y"], dtype=np.float64)
    # Static data stays numpy: model construction may happen inside a jit
    # trace (jnp ops there yield tracers, breaking tile-model constant
    # baking); numpy closes over as a trace-time constant either way.
    y = np.asarray(y)
    y_prev = y[:-1]

    def logprior(theta):
        mu, beta, th, log_sigma = theta[0], theta[1], theta[2], theta[3]
        sigma = jnp.exp(log_sigma)
        lp = normal_lpdf(mu, 0.0, 10.0)
        lp += normal_lpdf(beta, 0.0, 2.0)
        lp += normal_lpdf(th, 0.0, 2.0)
        lp += cauchy_lpdf(sigma, 0.0, 2.5)
        lp += log_sigma  # Jacobian of sigma = exp(log_sigma)
        return lp

    def loglik(theta):
        mu, beta, th, log_sigma = theta[0], theta[1], theta[2], theta[3]
        sigma = jnp.exp(log_sigma)
        err0 = y[0] - (mu + beta * mu)
        b = y[1:] - mu - beta * y_prev
        err = _linear_recurrence(-th, b, err0)
        return jnp.sum(normal_lpdf(err, 0.0, sigma))

    def constrain(theta):
        return jnp.stack([theta[0], theta[1], theta[2], jnp.exp(theta[3])])

    loglik_vg = None
    if fused is not None:
        from ..ops.arma_fused import make_arma_loglik_vg

        loglik_vg = make_arma_loglik_vg(y, backend=fused)

    # Production tile model: the hand-fused tangent recurrences. At the
    # jitter-proof protocol (K=300 vs 1200, repeats=5 — see the verify
    # skill's noise note) the hand kernel measures 1.214 us/leaf vs 1.465
    # for the machine-generated arma_tile_model_fwd (1.21x) and 1.657 for
    # the Stan-frontend-compiled kernel (1.36x); earlier single-K=50
    # readings that suggested otherwise were inside the +-30% relay noise.
    from ..ops.nuts_pallas import arma_tile_model

    return Model(
        tile_model=arma_tile_model(y),
        name="arma",
        dim=4,
        constrained_dim=4,
        param_names=("mu", "beta", "theta", "sigma"),
        logprior=logprior,
        loglik=loglik,
        constrain=constrain,
        loglik_vg=loglik_vg,
    )


def ground_truth():
    """Posterior mean and VARIANCE from the reference's long Stan run.

    The reference's arma.params third column is labelled variance by its
    plotting code (reference experiments/plot_experiments.py:93-99) but is in
    fact the posterior STANDARD DEVIATION (Stan summary format): an
    independent long NUTS-MCMC run on this model gives posterior sds
    (0.0100, 0.0221, 0.0607, 0.0084) matching the stored column
    (0.0113, 0.0228, 0.0594, 0.0084); the actual posterior variances are two
    orders of magnitude smaller. We return the column squared as the
    variance ground truth.
    """
    data = np.load(_ASSET)
    sd = np.asarray(data["gt_var"])
    return np.asarray(data["gt_mean"]), sd**2


def default_step_size() -> float:
    return float(np.load(_ASSET)["step_size"])
