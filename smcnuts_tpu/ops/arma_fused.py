"""Fused arma log-likelihood + analytic gradient (the innermost hot op).

Every NUTS leapfrog evaluates the tempered log-density and its gradient for
the whole particle block (ops/nuts.py _leapfrog). For the arma model the
likelihood is a linear error recurrence; instead of autodiff through an
associative scan (forward pass + reverse-mode scan, ~2 log T sweeps of
(N, T) HBM traffic per leapfrog), this module computes value AND gradient in
ONE forward pass using the closed-form tangent recurrences, all sharing the
coefficient a = -theta:

    err_t   = y_t - mu - beta*y_{t-1} - theta*err_{t-1}
    d err_t/d mu    = -1       - theta * d err_{t-1}/d mu
    d err_t/d beta  = -y_{t-1} - theta * d err_{t-1}/d beta
    d err_t/d theta = -err_{t-1} - theta * d err_{t-1}/d theta

    loglik        = -T*(log sqrt(2 pi) + log_sigma) - S2/(2 sigma^2)
    d ll/d p      = -S_p / sigma^2           (p in {mu, beta, theta})
    d ll/d lsigma = -T + S2 / sigma^2

with S2 = sum err^2, S_p = sum err * (d err/d p). Two implementations:

- `arma_ll_vg_scan`: jnp lax.scan carrying the four recurrences — reference
  semantics, used on CPU and as the oracle.
- `arma_ll_vg_pallas`: Pallas TPU kernel — particles across lanes, the T-loop
  entirely in VMEM/registers, one HBM read of theta (N,4) and write of
  (N,)+(N,4) per call. Compute-bound instead of bandwidth-bound.

`make_arma_loglik_vg` wraps either in `jax.custom_batching.custom_vmap`, so
the per-particle NUTS kernel transparently dispatches the whole batch to the
fused kernel under vmap.

Cited reference behavior: stan_models/arma/arma.stan:23-30 (recurrence),
smcnuts/model/bridgestan.py:60-90 (the per-particle FFI gradient loop this
replaces).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl

LOG_SQRT_2PI = 0.5 * np.log(2.0 * np.pi)


# ---------------------------------------------------------------------------
# jnp scan implementation (CPU path + oracle)
# ---------------------------------------------------------------------------


def arma_ll_vg_scan(theta, y):
    """theta: (N, 4) [mu, beta, theta_ma, log_sigma]; y: (T,).

    Returns (loglik (N,), grad (N, 4))."""
    mu, beta, th, ls = theta[:, 0], theta[:, 1], theta[:, 2], theta[:, 3]
    T = y.shape[0]

    err0 = y[0] - mu - beta * mu
    emu0 = -1.0 - beta
    eb0 = -mu
    eth0 = jnp.zeros_like(mu)

    sums0 = (
        err0 * err0,
        err0 * emu0,
        err0 * eb0,
        err0 * eth0,
    )

    def body(carry, yy):
        err, emu, eb, eth, s2, smu, sb, sth = carry
        y_t, y_tm1 = yy
        err_new = y_t - mu - beta * y_tm1 - th * err
        emu_new = -1.0 - th * emu
        eb_new = -y_tm1 - th * eb
        eth_new = -err - th * eth
        return (
            err_new, emu_new, eb_new, eth_new,
            s2 + err_new * err_new,
            smu + err_new * emu_new,
            sb + err_new * eb_new,
            sth + err_new * eth_new,
        ), None

    init = (err0, emu0, eb0, eth0) + sums0
    (e, _, _, _, s2, smu, sb, sth), _ = lax.scan(
        body, init, (y[1:], y[:-1])
    )
    return _assemble(T, ls, s2, smu, sb, sth)


def _assemble(T, ls, s2, smu, sb, sth):
    inv_s2 = jnp.exp(-2.0 * ls)
    ll = -T * (LOG_SQRT_2PI + ls) - 0.5 * s2 * inv_s2
    g_mu = -smu * inv_s2
    g_beta = -sb * inv_s2
    g_th = -sth * inv_s2
    g_ls = -T + s2 * inv_s2
    return ll, jnp.stack([g_mu, g_beta, g_th, g_ls], axis=1)


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------

_LANES = 128
_SUBLANES = 8
_BLOCK = _LANES * _SUBLANES  # particles per grid step


def _arma_kernel(y_ref, theta_ref, ll_ref, g_ref, *, T):
    """One grid step: theta_ref (4, 8, 128) -> ll_ref (8, 128), g_ref (4, 8, 128).

    The T-step recurrence runs as a fori_loop with all four state vectors and
    four accumulators resident in VMEM (8, 128) tiles; y_t scalars come from
    SMEM. No HBM traffic inside the loop.
    """
    mu = theta_ref[0, 0]
    beta = theta_ref[1, 0]
    th = theta_ref[2, 0]
    ls = theta_ref[3, 0]

    err0 = y_ref[0] - mu - beta * mu
    emu0 = -1.0 - beta
    eb0 = -mu
    eth0 = jnp.zeros_like(mu)

    init = (
        err0, emu0, eb0, eth0,
        err0 * err0, err0 * emu0, err0 * eb0, err0 * eth0,
    )

    def body(t, carry):
        err, emu, eb, eth, s2, smu, sb, sth = carry
        y_t = y_ref[t]
        y_tm1 = y_ref[t - 1]
        err_new = y_t - mu - beta * y_tm1 - th * err
        emu_new = -1.0 - th * emu
        eb_new = -y_tm1 - th * eb
        eth_new = -err - th * eth
        return (
            err_new, emu_new, eb_new, eth_new,
            s2 + err_new * err_new,
            smu + err_new * emu_new,
            sb + err_new * eb_new,
            sth + err_new * eth_new,
        )

    _, _, _, _, s2, smu, sb, sth = lax.fori_loop(1, T, body, init)

    inv_s2 = jnp.exp(-2.0 * ls)
    ll_ref[0] = -T * (LOG_SQRT_2PI + ls) - 0.5 * s2 * inv_s2
    g_ref[0, 0] = -smu * inv_s2
    g_ref[1, 0] = -sb * inv_s2
    g_ref[2, 0] = -sth * inv_s2
    g_ref[3, 0] = -T + s2 * inv_s2


@partial(jax.jit, static_argnames=("interpret",))
def arma_ll_vg_pallas(theta, y, interpret=False):
    """theta: (N, 4); y: (T,). Returns (loglik (N,), grad (N, 4)).

    N is padded up to a multiple of 1024 (8 sublanes x 128 lanes) and tiled
    over a 1-D grid of particle blocks.
    """
    from jax.experimental.pallas import tpu as pltpu

    n = theta.shape[0]
    T = y.shape[0]
    n_pad = -(-n // _BLOCK) * _BLOCK
    theta_p = jnp.zeros((n_pad, 4), theta.dtype).at[:n].set(theta)
    # (4, blocks, 8, 128) layout: parameter-major so each block slice is a
    # native (8, 128) tile per parameter.
    theta_t = theta_p.T.reshape(4, n_pad // _BLOCK, _SUBLANES, _LANES)
    grid = (n_pad // _BLOCK,)

    ll, g = pl.pallas_call(
        partial(_arma_kernel, T=T),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # y, whole array
            pl.BlockSpec(
                (4, 1, _SUBLANES, _LANES),
                lambda i: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, _SUBLANES, _LANES), lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (4, 1, _SUBLANES, _LANES), lambda i: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad // _BLOCK, _SUBLANES, _LANES), theta.dtype),
            jax.ShapeDtypeStruct(
                (4, n_pad // _BLOCK, _SUBLANES, _LANES), theta.dtype
            ),
        ],
        interpret=interpret,
    )(y, theta_t)

    ll_flat = ll.reshape(n_pad)[:n]
    g_flat = g.reshape(4, n_pad)[:, :n].T
    return ll_flat, g_flat


# ---------------------------------------------------------------------------
# custom_vmap wrapper: single-particle API, batched fused dispatch
# ---------------------------------------------------------------------------


def make_arma_loglik_vg(y, backend="auto"):
    """Return a single-particle loglik value_and_grad whose vmap rule
    dispatches the whole particle batch to the fused kernel.

    backend: "pallas" | "scan" | "auto" (pallas on TPU, scan elsewhere).
    """
    y = jnp.asarray(y)
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "scan"
    batch_fn = arma_ll_vg_pallas if backend == "pallas" else arma_ll_vg_scan

    @jax.custom_batching.custom_vmap
    def loglik_vg(theta):
        ll, g = arma_ll_vg_scan(theta[None, :], y)
        return ll[0], g[0]

    @loglik_vg.def_vmap
    def _rule(axis_size, in_batched, theta):
        ll, g = batch_fn(theta, y)
        return (ll, g), (True, True)

    return loglik_vg
