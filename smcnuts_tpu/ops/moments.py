"""Importance-sampling moment estimators.

Vectorized equivalent of the reference's Estimate class (reference
smcnuts/estimate/estimate.py:38-95): weighted mean wn^T x and weighted raw
variance wn^T (x - mean)^2, formed in constrained space when the model has a
constraining transform. The per-particle `constrain` FFI loop of the reference
becomes a vmapped pure function.
"""

from __future__ import annotations

import jax.numpy as jnp


def weighted_moments(x, wn):
    """Weighted mean and (raw, uncorrected) variance (estimate.py:79-95)."""
    mean = wn @ x
    var = wn @ jnp.square(x - mean)
    return mean, var


def estimate(model, x, wn):
    """Constrained-space moments (estimate.py:30-57)."""
    return weighted_moments(model.constrain_batch(x), wn)


def estimate_unconstrained(x, wn):
    """Unconstrained-space moments (estimate.py:59-77) — used by mass-matrix
    adaptation, which estimates the sampling-space covariance from the
    weighted particle population."""
    return weighted_moments(x, wn)
