"""Model protocol: JAX-native replacement for the reference's BridgeStan bridge.

The reference delegates log-density/gradient evaluation to a C++ shared library
compiled from a .stan file (reference smcnuts/model/bridgestan.py:13-120), and
tempers the target by rewriting a `phi` field in a data JSON on disk and
reloading the model (bridgestan.py:122-147). Here a model is a pair of pure
jittable functions over *unconstrained* parameters:

    logp(theta, phi) = logprior(theta) + phi * loglik(theta)

so the tempered-target identity the reference's tempering module relies on
(reference smcnuts/tempering/adaptive_tempering.py:38-43) holds exactly by
construction, gradients come from jax.grad, and there is no file/FFI boundary.

All densities include Stan's normalizing constants and the log-Jacobian of the
constraining transform (BridgeStan's `adjust_transform=True` semantics,
bridgestan.py:28), so tempering schedules and normalizing-constant estimates
are comparable with the reference.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax
import math

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Model:
    """A target distribution over unconstrained parameters.

    Attributes:
        name: Model identifier.
        dim: Unconstrained dimension (BridgeStan `param_unc_num`).
        constrained_dim: Constrained dimension incl. transformed params /
            generated quantities (BridgeStan `param_num`).
        param_names: Names of constrained parameters.
        logprior: (D,) -> scalar log prior density, incl. transform Jacobian.
        loglik: (D,) -> scalar log likelihood.
        constrain: (D,) -> (CD,) map to constrained space (reference
            bridgestan.py:93-120).
    """

    name: str
    dim: int
    constrained_dim: int
    param_names: Sequence[str]
    logprior: Callable[[jax.Array], jax.Array]
    loglik: Callable[[jax.Array], jax.Array]
    constrain: Callable[[jax.Array], jax.Array]
    # Optional fused (value, grad) of loglik for a single particle, wrapped in
    # jax.custom_batching.custom_vmap so vmap dispatches the whole particle
    # block to one fused kernel (e.g. the Pallas arma kernel). When None, the
    # sampler differentiates loglik with jax.value_and_grad.
    loglik_vg: Callable[[jax.Array], tuple] | None = None
    # Optional in-kernel model plug-in (ops/nuts_pallas.TileModel) enabling
    # the whole-tree Pallas NUTS backend (SMCConfig.nuts_backend="pallas").
    tile_model: object | None = None

    def logp(self, theta: jax.Array, phi=1.0) -> jax.Array:
        """Tempered log density at a single unconstrained point."""
        return self.logprior(theta) + phi * self.loglik(theta)

    # ---- batched conveniences (axis 0 = particles) ----

    def logp_batch(self, x: jax.Array, phi=1.0) -> jax.Array:
        return jax.vmap(lambda t: self.logp(t, phi))(x)

    def loglik_batch(self, x: jax.Array) -> jax.Array:
        return jax.vmap(self.loglik)(x)

    def logprior_batch(self, x: jax.Array) -> jax.Array:
        return jax.vmap(self.logprior)(x)

    def constrain_batch(self, x: jax.Array) -> jax.Array:
        return jax.vmap(self.constrain)(x)

    def logp_and_grad(self, theta: jax.Array, phi=1.0):
        """Value and gradient of the tempered log density (one autodiff pass —
        the reference pays separate `log_density` + `log_density_gradient` FFI
        calls per particle, bridgestan.py:44-90)."""
        return jax.value_and_grad(lambda t: self.logp(t, phi))(theta)


def make_logp_vg(model: Model, phi) -> Callable[[jax.Array], tuple]:
    """Single-particle (value, grad) closure at fixed (traced) temperature."""

    def vg(theta):
        return jax.value_and_grad(lambda t: model.logp(t, phi))(theta)

    return vg


# Shared Stan-math density helpers (constants included, matching Stan).

# Python float, not a jnp scalar: this constant is folded into tile-model
# immediates at build time, which may happen inside a jit trace (jnp
# arithmetic there would yield a tracer and break float() baking).
LOG_SQRT_2PI = float(0.5 * math.log(2.0 * math.pi))


def normal_lpdf(x, mu, sigma):
    z = (x - mu) / sigma
    return -0.5 * z * z - jnp.log(sigma) - LOG_SQRT_2PI


def cauchy_lpdf(x, mu, gamma):
    z = (x - mu) / gamma
    return -jnp.log(jnp.pi * gamma) - jnp.log1p(z * z)


def inv_gamma_lpdf(x, alpha, beta):
    return (
        alpha * jnp.log(beta)
        - jax.lax.lgamma(alpha)
        - (alpha + 1.0) * jnp.log(x)
        - beta / x
    )


def poisson_lpmf(y, mu_log):
    """Poisson log-pmf parameterized by the *log* rate (numerically stable)."""
    return y * mu_log - jnp.exp(mu_log) - jax.lax.lgamma(y + 1.0)
