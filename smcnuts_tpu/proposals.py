"""Initial-sample and momentum proposal distributions.

The reference package defines no distribution objects; its driver passes frozen
scipy multivariate normals and relies on the .rvs/.logpdf duck-type (reference
experiments/run_experiments.py:110-111, smcnuts/samples/samples.py:77-85).
Here the same duck-type is a tiny JAX-native class; any object exposing
`rvs(key, n)` and `logpdf(x)` (batched) can be substituted.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .models.base import LOG_SQRT_2PI


@dataclasses.dataclass(frozen=True)
class DiagNormalProposal:
    """N(mean, diag(var)) proposal. Defaults to the reference driver's
    standard normal N(0, I)."""

    dim: int
    mean: tuple = None
    var: tuple = None

    def _params(self, dtype):
        mean = (
            jnp.zeros(self.dim, dtype)
            if self.mean is None
            else jnp.asarray(self.mean, dtype)
        )
        var = (
            jnp.ones(self.dim, dtype)
            if self.var is None
            else jnp.asarray(self.var, dtype)
        )
        return mean, var

    def rvs(self, key, n, dtype=jnp.float32):
        mean, var = self._params(dtype)
        eps = jax.random.normal(key, (n, self.dim), dtype=dtype)
        return mean[None, :] + eps * jnp.sqrt(var)[None, :]

    def logpdf(self, x):
        mean, var = self._params(x.dtype)
        z2 = (x - mean[None, :]) ** 2 / var[None, :]
        return jnp.sum(-0.5 * z2 - 0.5 * jnp.log(var)[None, :], axis=1) - (
            self.dim * LOG_SQRT_2PI
        )


@dataclasses.dataclass(frozen=True)
class FullNormalProposal:
    """N(mean, cov) with a dense covariance — the general frozen
    scipy.stats.multivariate_normal the reference driver accepts for sample
    and momentum proposals (reference experiments/run_experiments.py:110-111,
    smcnuts/samples/samples.py:77,85). Sampling is mean + L @ eps with the
    lower Cholesky factor L; logpdf solves L z = (x - mean) with one batched
    triangular solve (no explicit inverse)."""

    mean: tuple
    cov: tuple  # (D, D), symmetric positive definite

    @property
    def dim(self):
        return len(self.mean)

    def _params(self, dtype):
        mean = jnp.asarray(self.mean, dtype)
        chol = jnp.linalg.cholesky(jnp.asarray(self.cov, dtype))
        return mean, chol

    def rvs(self, key, n, dtype=jnp.float32):
        mean, chol = self._params(dtype)
        eps = jax.random.normal(key, (n, self.dim), dtype=dtype)
        return mean[None, :] + eps @ chol.T

    def logpdf(self, x):
        mean, chol = self._params(x.dtype)
        z = jax.scipy.linalg.solve_triangular(
            chol, (x - mean[None, :]).T, lower=True
        )
        log_det_half = jnp.sum(jnp.log(jnp.diagonal(chol)))
        return (
            -0.5 * jnp.sum(z * z, axis=0)
            - log_det_half
            - self.dim * LOG_SQRT_2PI
        )
