"""Step-size and mass-matrix adaptation.

This is the reference's stated future work ("adaptive schemes... updating the
proposal parameters", reference README.md:66-67), landed as a native feature
per the build plan (SURVEY.md §7 item 7):

- Step size: Nesterov dual averaging on the NUTS accept-statistic (Hoffman &
  Gelman 2014, Alg. 6), driven by the population-mean per-leaf MH ratio that
  the NUTS kernel accumulates.
- Mass matrix: diagonal inverse mass set to the weighted particle variance in
  unconstrained space — the population-of-particles setting estimates it in
  one pass from the current cloud (the reference exposes
  `return_estimate_unconstrained` for exactly this but never calls it,
  reference smcnuts/estimate/estimate.py:59-77).

Both are pure pytree-state update functions that run inside the scanned SMC
iteration.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DualAveragingState(NamedTuple):
    log_step: jnp.ndarray  # current log step size
    log_step_avg: jnp.ndarray  # averaged iterate (used after warmup)
    h_bar: jnp.ndarray  # running error statistic
    mu: jnp.ndarray  # shrinkage target log(10 * eps0)
    count: jnp.ndarray  # t


def da_init(step_size0, dtype=jnp.float32):
    eps0 = jnp.asarray(step_size0, dtype)
    return DualAveragingState(
        log_step=jnp.log(eps0),
        log_step_avg=jnp.log(eps0),
        h_bar=jnp.zeros((), dtype),
        mu=jnp.log(10.0 * eps0),
        count=jnp.zeros((), dtype),
    )


def da_update(state: DualAveragingState, accept_stat, target=0.8,
              gamma=0.05, t0=10.0, kappa=0.75) -> DualAveragingState:
    t = state.count + 1.0
    eta_h = 1.0 / (t + t0)
    h_bar = (1.0 - eta_h) * state.h_bar + eta_h * (target - accept_stat)
    log_step = state.mu - (jnp.sqrt(t) / gamma) * h_bar
    eta_x = t ** (-kappa)
    log_step_avg = eta_x * log_step + (1.0 - eta_x) * state.log_step_avg
    return DualAveragingState(
        log_step=log_step,
        log_step_avg=log_step_avg,
        h_bar=h_bar,
        mu=state.mu,
        count=t,
    )


def mass_matrix_from_particles(x, wn, inv_mass_old, floor=1e-6, damping=0.5):
    """Diagonal inverse mass from the weighted particle variance, smoothed
    geometrically against the previous estimate (raw importance-weighted
    variances from a mismatched initial proposal can be wildly off; damping
    keeps the feedback loop stable)."""
    mean = wn @ x
    var = jnp.maximum(wn @ jnp.square(x - mean), floor)
    return jnp.exp(
        damping * jnp.log(var) + (1.0 - damping) * jnp.log(inv_mass_old)
    )


def mass_momentum_rvs(key, n, inv_mass, dtype):
    """Draw momenta r ~ N(0, M) with M = diag(1/inv_mass), matching the
    kinetic energy 0.5 r^T (inv_mass) r used by the NUTS integrator."""
    d = inv_mass.shape[0]
    eps = jax.random.normal(key, (n, d), dtype=dtype)
    return eps / jnp.sqrt(inv_mass)[None, :]


def mass_momentum_logpdf(r, inv_mass):
    """Log density of N(0, diag(1/inv_mass)) at r (batched)."""
    d = inv_mass.shape[0]
    quad = jnp.sum(r * r * inv_mass[None, :], axis=1)
    logdet = jnp.sum(jnp.log(inv_mass))
    return -0.5 * quad + 0.5 * logdet - 0.5 * d * jnp.log(2.0 * jnp.pi)
