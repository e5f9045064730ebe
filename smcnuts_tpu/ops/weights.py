"""Log-weight normalization and effective sample size.

Vectorized, collective-friendly replacements for the reference's weight math
(reference smcnuts/samples/samples.py:91-113). The reference masks out -inf
log-weights before logsumexp (samples.py:96-102); here the same semantics are
expressed with `where` masks so they work inside jit and shard unchanged over
a particle-sharded mesh (sum reductions become psums under GSPMD).
"""

from __future__ import annotations

import jax.numpy as jnp


def normalise_weights(logw):
    """Return (wn, log_likelihood).

    wn: normalized weights, exactly 0 where logw = -inf (or NaN).
    log_likelihood: logsumexp over the finite entries — the running
    normalizing-constant accumulator (reference samples.py:98-105).
    """
    finite = logw > -jnp.inf  # False for -inf and NaN
    neg_inf = jnp.asarray(-jnp.inf, dtype=logw.dtype)
    masked = jnp.where(finite, logw, neg_inf)
    m = jnp.max(masked)
    # If every weight is -inf, keep log_likelihood = -inf without NaNs.
    m_safe = jnp.where(jnp.isfinite(m), m, jnp.zeros_like(m))
    sumexp = jnp.sum(jnp.where(finite, jnp.exp(masked - m_safe), 0.0))
    log_likelihood = jnp.where(jnp.isfinite(m), m_safe + jnp.log(sumexp), m)
    wn = jnp.where(finite, jnp.exp(masked - log_likelihood), 0.0)
    return wn, log_likelihood


def ess(wn):
    """Effective sample size 1 / sum(wn^2) (reference samples.py:108-113).

    Returns +inf when all weights are zero, matching the reference's 1/0.
    """
    return 1.0 / jnp.sum(jnp.square(wn))
