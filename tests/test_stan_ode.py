"""Stan ODE interfaces lowered to jax.experimental.ode.odeint.

BridgeStan gives the reference Stan's ODE solvers (CVODES/rk45) with
sensitivity gradients; here all ode_* / integrate_ode_* variants share
dopri5 with the continuous-adjoint VJP, so ODE models sample end-to-end
with NUTS gradients (reference smcnuts/model/bridgestan.py:18).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from smcnuts_tpu.stan import StanCompileError, compile_stan_program

_DECAY = """
functions {
  vector decay(real t, vector y, real k) { return -k * y; }
}
data { int<lower=1> N; array[N] real ts; vector[N] yobs; real y0; }
parameters { real<lower=0> k; real<lower=0> sigma; }
model {
  array[N] vector[1] mu = ode_rk45(decay, to_vector({y0}), 0, ts, k);
  k ~ lognormal(0, 1);
  sigma ~ exponential(1);
  for (n in 1:N) { yobs[n] ~ normal(mu[n][1], sigma); }
}
"""


def _decay_model():
    ts = [0.25, 0.5, 1.0, 2.0]
    yobs = (2.0 * np.exp(-0.8 * np.asarray(ts))).tolist()
    return compile_stan_program(
        _DECAY, {"N": 4, "ts": ts, "yobs": yobs, "y0": 2.0}, name="ode"
    ), ts, yobs


def test_ode_rk45_matches_closed_form():
    m, ts, yobs = _decay_model()
    th = jnp.asarray([np.log(0.8), np.log(0.3)], jnp.float32)
    mu = 2.0 * np.exp(-0.8 * np.asarray(ts))
    want = (
        stats.lognorm(1, scale=1).logpdf(0.8)
        + stats.expon(scale=1).logpdf(0.3)
        + np.log(0.8) + np.log(0.3)  # exp-transform Jacobians
        + stats.norm(mu, 0.3).logpdf(yobs).sum()
    )
    np.testing.assert_allclose(float(m.logp(th, 1.0)), want, rtol=1e-4)
    g = jax.grad(lambda t: m.logp(t, 1.0))(th)
    assert np.all(np.isfinite(np.asarray(g)))
    # adjoint gradient vs finite differences on the k coordinate
    eps = 1e-3
    fd = (
        float(m.logp(th + jnp.asarray([eps, 0.0]), 1.0))
        - float(m.logp(th - jnp.asarray([eps, 0.0]), 1.0))
    ) / (2 * eps)
    np.testing.assert_allclose(float(g[0]), fd, rtol=5e-2, atol=1e-2)
    # vmap — the sampler's particle axis
    lps = jax.vmap(lambda t: m.logp(t, 1.0))(jnp.stack([th, th + 0.1]))
    assert np.all(np.isfinite(np.asarray(lps)))


def test_old_integrate_ode_interface():
    src = """
    functions {
      vector decay(real t, vector y, array[] real theta,
                   array[] real x_r, array[] int x_i) {
        return -theta[1] * y;
      }
    }
    data { int<lower=1> N; array[N] real ts; }
    parameters { real<lower=0> k; }
    model {
      array[N] vector[1] mu = integrate_ode_rk45(
        decay, to_vector({2.0}), 0, ts, {k}, {0.0}, {0});
      target += mu[N][1];
    }
    """
    m = compile_stan_program(src, {"N": 2, "ts": [0.5, 1.0]}, name="iode")
    got = float(m.logp(jnp.asarray([np.log(0.8)], jnp.float32), 1.0))
    want = 2.0 * np.exp(-0.8) + np.log(0.8)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_ode_tol_variant_and_bad_fn():
    src = """
    functions {
      vector decay(real t, vector y, real k) { return -k * y; }
    }
    data { int<lower=1> N; array[N] real ts; }
    parameters { real<lower=0> k; }
    model {
      array[N] vector[1] mu = ode_bdf_tol(decay, to_vector({2.0}), 0, ts,
                                          1e-8, 1e-8, 10000, k);
      target += mu[N][1];
    }
    """
    m = compile_stan_program(src, {"N": 1, "ts": [1.0]}, name="odet")
    got = float(m.logp(jnp.asarray([np.log(0.8)], jnp.float32), 1.0))
    np.testing.assert_allclose(got, 2.0 * np.exp(-0.8) + np.log(0.8),
                               rtol=1e-4)
    with pytest.raises(StanCompileError, match="right-hand-side"):
        compile_stan_program(
            "data { real y; } parameters { real m; } "
            "model { target += ode_rk45(nope, [m]', 0, {1.0})[1][1]; }",
            {"y": 0.1}, name="odebad",
        )


def test_lotka_volterra_logp_and_grad():
    """The canonical Stan ODE example: 2-state predator-prey dynamics with
    4 parameters, lognormal observation noise."""
    src = """
    functions {
      vector lv(real t, vector z, real alpha, real beta, real gamma,
                real delta) {
        vector[2] dz;
        dz[1] = (alpha - beta * z[2]) * z[1];
        dz[2] = (-gamma + delta * z[1]) * z[2];
        return dz;
      }
    }
    data { int<lower=1> N; array[N] real ts; array[N] vector[2] yobs; }
    parameters {
      real<lower=0> alpha; real<lower=0> beta;
      real<lower=0> gamma; real<lower=0> delta;
      vector<lower=0>[2] z0; real<lower=0> sigma;
    }
    model {
      array[N] vector[2] z = ode_rk45(lv, z0, 0, ts, alpha, beta, gamma,
                                      delta);
      alpha ~ normal(1, 0.5) T[0,];
      gamma ~ normal(1, 0.5) T[0,];
      beta ~ normal(0.05, 0.05) T[0,];
      delta ~ normal(0.05, 0.05) T[0,];
      z0 ~ lognormal(log(10), 1);
      sigma ~ lognormal(-1, 1);
      for (n in 1:N) {
        yobs[n] ~ lognormal(log(z[n]), sigma);
      }
    }
    """
    rng = np.random.default_rng(6)
    ts = np.linspace(0.5, 5.0, 6)
    yobs = np.abs(rng.normal(10.0, 2.0, size=(6, 2)))
    m = compile_stan_program(
        src, {"N": 6, "ts": ts.tolist(), "yobs": yobs.tolist()}, name="lv"
    )
    assert m.dim == 7
    th = jnp.asarray(
        [0.0, np.log(0.05), 0.0, np.log(0.05), np.log(10.0), np.log(10.0),
         -1.0],
        jnp.float32,
    )
    lp = float(m.logp(th, 1.0))
    assert np.isfinite(lp)
    g = jax.grad(lambda t: m.logp(t, 1.0))(th)
    assert np.all(np.isfinite(np.asarray(g)))


def test_ode_rk4_fixed_step_extension():
    """TPU-first extension: fixed-step RK4 lowers to lax.scan (no
    data-dependent while loops), so it jits fast inside the vmapped NUTS
    tree; value and gradient against the closed form."""
    src = """
    functions {
      vector decay(real t, vector y, real k) { return -k * y; }
    }
    data { int<lower=1> N; array[N] real ts; }
    parameters { real<lower=0> k; }
    model {
      array[N] vector[1] mu = ode_rk4(decay, to_vector({2.0}), 0, ts, 20, k);
      target += mu[N][1];
    }
    """
    m = compile_stan_program(src, {"N": 3, "ts": [0.5, 1.0, 2.0]},
                             name="rk4")
    th = jnp.asarray([np.log(0.8)], jnp.float32)
    np.testing.assert_allclose(
        float(m.logp(th, 1.0)), 2.0 * np.exp(-1.6) + np.log(0.8), rtol=1e-4
    )
    g = float(jax.grad(lambda t: m.logp(t, 1.0))(th)[0])
    # d/dtheta [2 exp(-2 e^theta) + theta] at theta = log 0.8
    want = 1.0 - 2.0 * 2.0 * np.exp(-1.6) * 0.8
    np.testing.assert_allclose(g, want, rtol=1e-3)
