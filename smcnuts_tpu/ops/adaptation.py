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


def mass_matrix_from_particles(x, wn, floor=1e-6):
    """Diagonal inverse mass = weighted particle variance (regularized)."""
    mean = wn @ x
    var = wn @ jnp.square(x - mean)
    return jnp.maximum(var, floor)
