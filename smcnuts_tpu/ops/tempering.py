"""ESS-based adaptive tempering, device-side.

The reference finds the next temperature by bisecting ESS(phi) - alpha*N on
[phi_old, 1] with scipy, reloading a C++ Stan model at every trial phi
(reference smcnuts/tempering/adaptive_tempering.py:38-63 and the pathological
JSON-rewrite boundary, smcnuts/model/bridgestan.py:122-147). Here the tempered
log-density identity logp(x, phi) = logprior + phi*loglik makes the bisection
objective a pure function of one precomputed loglik vector:

    logw(phi) = (phi - phi_old) * loglik(x)

so the whole search is a fixed-iteration `lax.while_loop`-free bisection that
jits and shards (each ESS evaluation is a masked logsumexp -> psum under a
particle-sharded mesh). Semantics preserved from the reference: return exactly
1.0 when ESS(1.0) already meets the alpha*N target (adaptive_tempering.py:58-59).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .weights import ess as _ess
from .weights import normalise_weights

BISECT_ITERS = 50  # interval width 2^-50 ~ 1e-15, below scipy's default xtol


def ess_at_phi(loglik, phi, phi_old):
    """ESS of the incremental weights moving phi_old -> phi (the reference's
    `_ess` inner function, adaptive_tempering.py:41-56, with the tempered
    identity applied)."""
    logw = (phi - phi_old) * loglik
    wn, _ = normalise_weights(logw)
    return _ess(wn)


def next_temperature(loglik, phi_old, n_particles, alpha=0.5, iters=BISECT_ITERS):
    """Choose the next temperature by ESS-thresholded bisection.

    loglik: (N,) untempered log-likelihood at the current particle positions.
    Returns phi in (phi_old, 1].
    """
    target = n_particles * alpha

    def f(phi):
        return ess_at_phi(loglik, phi, phi_old) - target

    def body(_, ab):
        a, b = ab
        m = 0.5 * (a + b)
        fm = f(m)
        # Root of a decreasing-in-phi objective: keep the half with the sign
        # change. f(a) >= 0 > f(b) is the bisection invariant.
        a_new = jnp.where(fm >= 0, m, a)
        b_new = jnp.where(fm >= 0, b, m)
        return (a_new, b_new)

    one = jnp.asarray(1.0, dtype=loglik.dtype)
    a0 = jnp.asarray(phi_old, dtype=loglik.dtype)
    a, b = lax.fori_loop(0, iters, body, (a0, one))
    phi_bisect = 0.5 * (a + b)
    return jnp.where(f(one) >= 0, one, phi_bisect)
