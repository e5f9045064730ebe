"""Stan-frontend tests: the compiled `.stan` programs must agree with the
hand-written JAX models (which are themselves parity-tested against the
reference ground truths), and the language subset must cover the constructs
the reference assets use (reference stan_models/arma/arma.stan,
stan_models/PRMwCD/PRMwCD.stan)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smcnuts_tpu.models import make_arma, make_prmwcd
from smcnuts_tpu.stan import (
    StanCompileError,
    StanSyntaxError,
    compile_stan_file,
    compile_stan_program,
    load_stan_data,
)

_REF = "/root/reference/stan_models"
_HAS_REF = os.path.isdir(_REF)


def _compare_models(compiled, hand, dim, n_points=6, seed=0, grad_rtol=3e-4):
    rng = np.random.default_rng(seed)
    for _ in range(n_points):
        th = jnp.asarray(rng.normal(size=dim) * 0.5, dtype=jnp.float32)
        np.testing.assert_allclose(
            compiled.logprior(th), hand.logprior(th), rtol=1e-5, atol=1e-4
        )
        np.testing.assert_allclose(
            compiled.loglik(th), hand.loglik(th), rtol=1e-5, atol=1e-3
        )
        g1 = jax.grad(lambda t: compiled.logp(t, 0.7))(th)
        g2 = jax.grad(lambda t: hand.logp(t, 0.7))(th)
        scale = float(jnp.max(jnp.abs(g2))) + 1e-6
        np.testing.assert_allclose(
            np.asarray(g1) / scale, np.asarray(g2) / scale, atol=grad_rtol
        )
        np.testing.assert_allclose(
            compiled.constrain(th), hand.constrain(th), rtol=1e-6
        )


@pytest.mark.skipif(not _HAS_REF, reason="reference assets not mounted")
def test_arma_stan_matches_hand_model():
    m = compile_stan_file(
        f"{_REF}/arma/arma.stan", data=f"{_REF}/arma/arma.json"
    )
    assert m.dim == 4 and m.constrained_dim == 4
    assert m.param_names == ("mu", "beta", "theta", "sigma")
    _compare_models(m, make_arma(), 4)


@pytest.mark.skipif(not _HAS_REF, reason="reference assets not mounted")
def test_prmwcd_stan_matches_hand_model():
    # Also exercises load_stan_data's repair of the truncated PRMwCD.json
    # (SURVEY.md §2 #15: the file ends mid-`"phi": `).
    m = compile_stan_file(
        f"{_REF}/PRMwCD/PRMwCD.stan", data=f"{_REF}/PRMwCD/PRMwCD.json"
    )
    assert m.dim == 13
    assert m.param_names[0] == "Beta.1" and m.param_names[-1] == "Gamma"
    _compare_models(m, make_prmwcd(), 13)


def test_load_stan_data_repairs_truncation(tmp_path):
    p = tmp_path / "d.json"
    p.write_text('{"N": 3, "y": [1, 2, 3], "phi": ')
    d = load_stan_data(str(p))
    assert d["phi"] == 1.0 and d["N"] == 3


def test_load_stan_data_rejects_other_corruption(tmp_path):
    p = tmp_path / "d.json"
    p.write_text('{"N": 3, "y": [1, 2')
    with pytest.raises(json.JSONDecodeError):
        load_stan_data(str(p))


_CONSTRAINED = """
data { int<lower=1> N; array[N] real y; real<lower=0, upper=1> phi; }
parameters {
  real mu;
  real<lower=0> sigma;
  real<lower=-1, upper=1> rho;
  real<upper=2> cap;
}
model {
  mu ~ normal(0, 5);
  sigma ~ lognormal(0, 1);
  rho ~ uniform(-1, 1);
  cap ~ normal(0, 1);
  target += phi * normal_lpdf(y | mu + rho, sigma);
}
"""


def test_constraint_transforms_and_jacobians():
    """Gradient of logprior must equal the analytic transformed-density
    gradient: checked by comparing against a hand construction."""
    data = {"N": 4, "y": [0.1, -0.2, 0.5, 0.3]}
    m = compile_stan_program(_CONSTRAINED, data, name="c")
    assert m.dim == 4

    from smcnuts_tpu.models.base import normal_lpdf

    y = jnp.asarray(data["y"], dtype=jnp.float32)

    def hand_logprior(th):
        mu, u_sig, u_rho, u_cap = th[0], th[1], th[2], th[3]
        sigma = jnp.exp(u_sig)
        rho = -1.0 + 2.0 * jax.nn.sigmoid(u_rho)
        cap = 2.0 - jnp.exp(u_cap)
        lp = normal_lpdf(mu, 0.0, 5.0)
        lp += normal_lpdf(jnp.log(sigma), 0.0, 1.0) - jnp.log(sigma) + u_sig
        lp += -jnp.log(2.0) + (
            jnp.log(2.0) + jax.nn.log_sigmoid(u_rho) + jax.nn.log_sigmoid(-u_rho)
        )
        lp += normal_lpdf(cap, 0.0, 1.0) + u_cap
        return lp

    def hand_loglik(th):
        mu, u_sig, u_rho = th[0], th[1], th[2]
        sigma = jnp.exp(u_sig)
        rho = -1.0 + 2.0 * jax.nn.sigmoid(u_rho)
        return jnp.sum(normal_lpdf(y, mu + rho, sigma))

    rng = np.random.default_rng(3)
    for _ in range(4):
        th = jnp.asarray(rng.normal(size=4), dtype=jnp.float32)
        np.testing.assert_allclose(
            m.logprior(th), hand_logprior(th), rtol=2e-5, atol=2e-5
        )
        np.testing.assert_allclose(
            m.loglik(th), hand_loglik(th), rtol=2e-5, atol=2e-5
        )


_TP = """
data { real phi; }
parameters { vector[2] z; }
transformed parameters {
  real s = z[1] + z[2];
}
model {
  z ~ normal(0, 1);
  target += phi * normal_lpdf(s | 1, 2);
}
"""


def test_transformed_parameters_in_constrain_and_model():
    m = compile_stan_program(_TP, {}, name="tp")
    assert m.dim == 2 and m.constrained_dim == 3
    th = jnp.asarray([0.3, -0.7], dtype=jnp.float32)
    c = m.constrain(th)
    np.testing.assert_allclose(c[:2], th)
    np.testing.assert_allclose(c[2], -0.4, rtol=1e-5)
    # loglik picks up the phi-scaled term only
    from smcnuts_tpu.models.base import normal_lpdf as nl

    np.testing.assert_allclose(
        m.loglik(th), nl(jnp.float32(-0.4), 1.0, 2.0), rtol=1e-5
    )


_NO_PHI = """
parameters { real x; }
model { x ~ normal(3, 2); }
"""


def test_model_without_phi_runs_untempered():
    m = compile_stan_program(_NO_PHI, {}, name="nophi")
    th = jnp.asarray([1.0], dtype=jnp.float32)
    assert float(m.loglik(th)) == 0.0
    from smcnuts_tpu.models.base import normal_lpdf as nl

    np.testing.assert_allclose(m.logp(th, 1.0), nl(1.0, 3.0, 2.0), rtol=1e-5)


def test_sampling_statement_matches_target_plus():
    a = compile_stan_program(
        "parameters { real x; } model { x ~ student_t(4, 0, 2); }", {}
    )
    b = compile_stan_program(
        "parameters { real x; } model { target += student_t_lpdf(x | 4, 0, 2); }",
        {},
    )
    th = jnp.asarray([0.9], dtype=jnp.float32)
    np.testing.assert_allclose(a.logp(th, 1.0), b.logp(th, 1.0), rtol=1e-6)


def test_end_to_end_smc_on_compiled_program():
    """A compiled conjugate-Gaussian program sampled end-to-end: posterior
    moments must approach the closed form."""
    src = """
    data { int<lower=1> N; array[N] real y; real phi; }
    parameters { real mu; }
    model {
      mu ~ normal(0, 1);
      target += phi * normal_lpdf(y | mu, 1);
    }
    """
    rng = np.random.default_rng(0)
    y = rng.normal(loc=1.5, size=8)
    m = compile_stan_program(src, {"N": 8, "y": y.tolist()}, name="conj")
    post_var = 1.0 / (1.0 + len(y))
    post_mean = post_var * y.sum()

    from smcnuts_tpu import SMCConfig, run_smc

    cfg = SMCConfig(n_particles=256, n_iterations=8, step_size=0.4,
                    tempering=True)
    res = jax.jit(lambda k: run_smc(m, cfg, k))(jax.random.key(1))
    assert abs(float(res.mean_estimate[-1][0]) - post_mean) < 0.15
    assert abs(float(res.variance_estimate[-1][0]) - post_var) < 0.1


def test_unsupported_constructs_raise():
    with pytest.raises(StanCompileError):
        compile_stan_program(
            "parameters { real x; } model { x ~ wishart(3, I); }", {}
        )
    with pytest.raises(StanCompileError):
        # parameter-dependent loop bound is not jittable
        compile_stan_program(
            "parameters { real x; } model { for (i in 1:x) target += x; }",
            {},
        ).logp(jnp.ones(1), 1.0)


def test_for_loop_and_old_style_arrays():
    """PRMwCD-shaped constructs: old-style arrays, nested loops, flat-index
    arithmetic, fabs/pow."""
    src = """
    data { int<lower=1> N; int<lower=1> C; real x[N*C]; real phi; }
    parameters { real b; }
    model {
      real acc;
      acc = 0;
      for (i in 1:N) {
        for (j in 1:C) {
          acc += x[(i-1)*C + j] * b;
        }
      }
      target += phi * normal_lpdf(acc | 0, 1) - fabs(b)^1.5;
    }
    """
    x = np.arange(6, dtype=float)
    m = compile_stan_program(src, {"N": 2, "C": 3, "x": x.tolist()})
    th = jnp.asarray([0.5], dtype=jnp.float32)
    from smcnuts_tpu.models.base import normal_lpdf as nl

    expected_ll = nl(jnp.float32(x.sum() * 0.5), 0.0, 1.0)
    np.testing.assert_allclose(m.loglik(th), expected_ll, rtol=1e-5)
    np.testing.assert_allclose(
        m.logprior(th), -abs(0.5) ** 1.5, rtol=1e-5
    )


# --------------------------------------------------------- scan lowering


_RECURRENCE = """
data { int<lower=1> T; real y[T]; real phi; }
parameters { real a; real<lower=0> s; }
model {
  vector[T] e;
  real acc;
  acc = 0;
  e[1] = y[1];
  for (t in 2:T) {
    e[t] = y[t] - a * e[t-1];
    acc += e[t] * 0.001;
  }
  target += normal_lpdf(a | 0, 1);
  target += phi * (normal_lpdf(e | 0, s) + acc);
}
"""


def _recurrence_data(T=40, seed=3):
    y = np.random.default_rng(seed).normal(size=T)
    return {"T": T, "y": y.tolist()}


def test_scan_lowered_loop_matches_unrolled():
    """Forcing the scan path (threshold 4) must reproduce the fully-unrolled
    interpretation bit-for-bit-ish: values, gradients, and constrain."""
    data = _recurrence_data()
    m_scan = compile_stan_program(_RECURRENCE, data, scan_threshold=4)
    m_unroll = compile_stan_program(_RECURRENCE, data, scan_threshold=None)
    rng = np.random.default_rng(0)
    for _ in range(4):
        th = jnp.asarray(rng.normal(size=2) * 0.5, dtype=jnp.float32)
        np.testing.assert_allclose(
            m_scan.logp(th, 0.6), m_unroll.logp(th, 0.6), rtol=1e-5,
            atol=1e-4,
        )
        g1 = jax.grad(lambda t: m_scan.logp(t, 1.0))(th)
        g2 = jax.grad(lambda t: m_unroll.logp(t, 1.0))(th)
        np.testing.assert_allclose(
            np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-4
        )


@pytest.mark.skipif(not _HAS_REF, reason="reference assets not mounted")
def test_scan_lowering_shrinks_traced_program():
    """The point of the lowering: a T=200 recurrence (reference arma.stan)
    must trace to an O(1)-in-T program — this is what makes frontend models
    compile in seconds on the remote TPU compiler instead of minutes
    (VERDICT r1 weak #9)."""
    m_scan = compile_stan_file(
        f"{_REF}/arma/arma.stan", data=f"{_REF}/arma/arma.json",
        scan_threshold=64,
    )
    m_unroll = compile_stan_file(
        f"{_REF}/arma/arma.stan", data=f"{_REF}/arma/arma.json",
        scan_threshold=None,
    )
    eq_scan = len(jax.make_jaxpr(lambda t: m_scan.logp(t, 1.0))(
        jnp.zeros(m_scan.dim)).eqns)
    eq_unroll = len(jax.make_jaxpr(lambda t: m_unroll.logp(t, 1.0))(
        jnp.zeros(m_unroll.dim)).eqns)
    assert eq_scan < 500 < eq_unroll, (eq_scan, eq_unroll)


# -------------------------------------------------- generated quantities


_GQ = """
data { real phi; }
parameters { real m; real<lower=0> s; }
model {
  m ~ normal(0, 1);
  s ~ lognormal(0, 1);
}
generated quantities {
  real m2;
  real y_rep;
  m2 = m * m;
  y_rep = normal_rng(m, s);
}
"""


def test_generated_quantities_in_constrain():
    """constrain returns [params; tp; gq] with the reference's fixed-seed
    RNG semantics (bridgestan.py:106-120): gq values are deterministic
    across calls, and pure gq expressions are exact."""
    m = compile_stan_program(_GQ, {}, name="gq")
    assert m.dim == 2
    assert m.constrained_dim == 4
    assert m.param_names == ("m", "s", "gq.1", "gq.2")
    th = jnp.asarray([0.7, -0.2], dtype=jnp.float32)
    c1 = np.asarray(m.constrain(th))
    c2 = np.asarray(m.constrain(th))
    np.testing.assert_array_equal(c1, c2)  # fixed-seed determinism
    np.testing.assert_allclose(c1[0], 0.7, rtol=1e-6)
    np.testing.assert_allclose(c1[1], np.exp(-0.2), rtol=1e-6)
    np.testing.assert_allclose(c1[2], 0.49, rtol=1e-5)  # m2 = m^2 exactly
    assert np.isfinite(c1[3])  # y_rep drawn from the fixed stream
    # Different theta must give a different (mean-shifted) y_rep draw.
    c3 = np.asarray(m.constrain(jnp.asarray([-1.5, -0.2], jnp.float32)))
    assert c3[3] != c1[3]


def test_rng_outside_generated_quantities_raises():
    with pytest.raises(StanCompileError, match="_rng|generated"):
        compile_stan_program(
            "parameters { real m; } model { target += normal_rng(m, 1); }",
            {},
        )


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="TPU e2e: frontend-compiled model through the full sampler",
)
def test_frontend_arma_smc_on_tpu():
    """End-to-end on the real chip: the frontend-compiled arma (scan-lowered
    T=200 recurrence) must reproduce the hand model's posterior moments
    through run_smc. Also a compile-time canary: the scanned program should
    compile in the normal remote-compile envelope."""
    from smcnuts_tpu import SMCConfig, run_smc
    from smcnuts_tpu.models.arma import ground_truth

    m = compile_stan_file(
        f"{_REF}/arma/arma.stan", data=f"{_REF}/arma/arma.json"
    )
    cfg = SMCConfig(
        n_particles=256, n_iterations=15, step_size=0.01,
        save_history=False,
    )
    res = run_smc(m, cfg, jax.random.key(11))
    mean = np.asarray(res.mean_estimate[-1])
    gt_mean, gt_var = ground_truth()
    # 4-sd band on each coordinate, as in tests/test_parity.py.
    assert np.all(np.abs(mean - gt_mean) < 4 * np.sqrt(gt_var)), mean


# ------------------------------------------- in-kernel tile adapter


def test_tile_adapter_matches_logp_and_grad():
    """tile=True builds an in-kernel tile model for ANY compiled program
    (ops/nuts_pallas.tile_model_from_logp): the double-vmapped tile_fn must
    reproduce logp and jax.grad exactly on the (8,128) lane layout."""
    data = _recurrence_data(T=40)
    m = compile_stan_program(_RECURRENCE, data, name="rec", tile=True)
    assert m.tile_model is not None and m.tile_model.dim == 2
    rng = np.random.default_rng(5)
    x = rng.normal(0, 0.4, (1024, 2))
    tiles = [jnp.asarray(x[:, d].reshape(8, 128), jnp.float32)
             for d in range(2)]
    logp, grads = m.tile_model.tile_fn(
        (), tiles, jnp.full((8, 128), 0.7, jnp.float32)
    )
    xj = jnp.asarray(x, jnp.float32)
    lp_ref = m.logp_batch(xj, 0.7)
    np.testing.assert_allclose(
        np.asarray(logp).reshape(-1), np.asarray(lp_ref), rtol=1e-4,
        atol=1e-4,
    )
    g_ref = np.asarray(
        jax.vmap(lambda t: jax.grad(lambda q: m.logp(q, 0.7))(t))(xj)
    )
    g_tile = np.stack([np.asarray(g).reshape(-1) for g in grads], axis=1)
    scale = np.abs(g_ref).max() + 1e-6
    np.testing.assert_allclose(g_tile / scale, g_ref / scale, atol=1e-5)


def test_frontend_recurrence_through_pallas_kernel_interpret():
    """A frontend-compiled recurrence model (tile=True, forward-mode
    in-kernel gradients) runs through the whole-tree Pallas NUTS kernel
    (interpret mode) with in-kernel-correct log densities. T=40 keeps the
    unrolled-body trace cheap; the full-size arma equivalence is covered by
    the direct tile_fn checks and the TPU-gated e2e test."""
    from smcnuts_tpu.ops.nuts_pallas import nuts_batch_pallas

    m = compile_stan_program(_RECURRENCE, _recurrence_data(T=40), name="rec",
                             tile=True)
    rng = np.random.default_rng(0)
    n = 16
    x = jnp.asarray(rng.normal(0, 0.3, (n, 2)), jnp.float32)
    r = jnp.asarray(rng.normal(size=(n, 2)), jnp.float32)
    _, _, st = nuts_batch_pallas(
        m.tile_model, x, r, 3, 0.05, 0.8, max_depth=2, interpret=True
    )
    lp_ref = m.logp_batch(x, 0.8)
    np.testing.assert_allclose(
        np.asarray(st["logp0"]), np.asarray(lp_ref), rtol=1e-4, atol=1e-2
    )


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="Mosaic compilation of the generic tile adapter needs the chip",
)
def test_frontend_tile_smc_on_tpu():
    """Round-trip on the real chip: raw Stan source -> tile-compiled model
    -> the whole-tree Pallas NUTS backend -> posterior estimates.

    The model is an AR(1)-error recurrence at T=40 — the size class the
    generic adapter supports on-device (the unrolled VJP of the T=200 arma
    recurrence exceeds VMEM; see tile_model_from_logp's docstring — arma
    itself runs on its hand tile model)."""
    from smcnuts_tpu import SMCConfig, run_smc

    T, true_a = 40, 0.6
    rng = np.random.default_rng(3)
    e = rng.normal(0, 0.5, T)
    y = np.empty(T)
    y[0] = e[0]
    for t in range(1, T):
        y[t] = e[t] + true_a * e[t - 1]
    src = """
    data { int<lower=1> T; real y[T]; real phi; }
    parameters { real a; real<lower=0> s; }
    model {
      vector[T] e;
      e[1] = y[1];
      for (t in 2:T) { e[t] = y[t] - a * e[t-1]; }
      a ~ normal(0, 1);
      target += phi * normal_lpdf(e | 0, s);
    }
    """
    m = compile_stan_program(src, {"T": T, "y": y.tolist()}, name="ar_t40",
                             tile=True)
    cfg = SMCConfig(
        n_particles=256, n_iterations=12, step_size=0.05,
        save_history=False, nuts_backend="pallas", max_tree_depth=6,
    )
    res = run_smc(m, cfg, jax.random.key(4))
    mean = np.asarray(res.mean_estimate[-1])
    assert abs(mean[0] - true_a) < 0.3, mean
    assert abs(mean[1] - 0.5) < 0.3, mean
    assert np.all(np.isfinite(np.asarray(res.ess)))


# ------------------------------------------- streaming-scan edge cases


def _both(src, data, **kw):
    """Compile with the scan path forced (threshold 4) and fully unrolled;
    the pair must agree exactly."""
    return (
        compile_stan_program(src, data, scan_threshold=4, **kw),
        compile_stan_program(src, data, scan_threshold=None, **kw),
    )


def _assert_models_agree(a, b, dim, phi=0.7, seed=0, n=4):
    rng = np.random.default_rng(seed)
    for _ in range(n):
        th = jnp.asarray(rng.normal(size=dim) * 0.4, jnp.float32)
        np.testing.assert_allclose(
            a.logp(th, phi), b.logp(th, phi), rtol=1e-5, atol=1e-4
        )
        ga = jax.grad(lambda t: a.logp(t, phi))(th)
        gb = jax.grad(lambda t: b.logp(t, phi))(th)
        np.testing.assert_allclose(
            np.asarray(ga), np.asarray(gb), rtol=1e-4, atol=1e-4
        )


def test_stream_lag2_window():
    """AR(2)-style recurrence: the streamed form must carry a 2-deep
    window."""
    src = """
    data { int<lower=1> T; real y[T]; real phi; }
    parameters { real a; real b; }
    model {
      vector[T] e;
      e[1] = y[1];
      e[2] = y[2] - a * e[1];
      for (t in 3:T) { e[t] = y[t] - a * e[t-1] - b * e[t-2]; }
      a ~ normal(0, 1);
      b ~ normal(0, 1);
      target += phi * normal_lpdf(e | 0, 1);
    }
    """
    data = {"T": 24, "y": np.random.default_rng(1).normal(size=24).tolist()}
    _assert_models_agree(*_both(src, data), dim=2)


def test_stream_partial_range_prefix_suffix():
    """A loop covering only the middle of the container: the untouched
    prefix AND suffix elements must survive the streamed reconstruction
    (the final lpdf reads the whole container)."""
    src = """
    data { int<lower=1> T; real y[T]; real phi; }
    parameters { real a; }
    model {
      vector[T] e;
      e[1] = y[1];
      e[2] = y[2];
      e[T] = y[T];
      for (t in 3:T-1) { e[t] = y[t] - a * e[t-1]; }
      a ~ normal(0, 1);
      target += phi * normal_lpdf(e | 0, 1);
    }
    """
    data = {"T": 20, "y": np.random.default_rng(2).normal(size=20).tolist()}
    _assert_models_agree(*_both(src, data), dim=1)


def test_stream_data_offsets_and_loopvar_arithmetic():
    """Affine data reads at several offsets plus direct loop-variable
    arithmetic in the body."""
    src = """
    data { int<lower=1> T; real y[T]; real phi; }
    parameters { real a; }
    model {
      vector[T] e;
      real acc;
      acc = 0;
      e[1] = y[1];
      for (t in 2:T-1) {
        e[t] = y[t+1] - a * y[t-1] - 0.5 * e[t-1];
        acc += e[t] * 0.001 * t;
      }
      e[T] = y[T];
      a ~ normal(0, 1);
      target += phi * (normal_lpdf(e | 0, 1) + acc);
    }
    """
    data = {"T": 22, "y": np.random.default_rng(3).normal(size=22).tolist()}
    _assert_models_agree(*_both(src, data), dim=1)


def test_nonstreamable_body_falls_back_correctly():
    """A body outside the streaming idiom (dynamic data index that is not
    affine in the loop variable) must still produce correct values via the
    carried-array scan or unrolled fallback."""
    src = """
    data { int<lower=1> T; real y[T]; int idx[T]; real phi; }
    parameters { real a; }
    model {
      real acc;
      acc = 0;
      for (t in 1:T) { acc += y[idx[t]] * a; }
      a ~ normal(0, 1);
      target += phi * normal_lpdf(acc | 0, 10);
    }
    """
    rng = np.random.default_rng(4)
    t_len = 16
    data = {
        "T": t_len,
        "y": rng.normal(size=t_len).tolist(),
        "idx": (rng.permutation(t_len) + 1).tolist(),
    }
    _assert_models_agree(*_both(src, data), dim=1)


def test_stream_noncontiguous_lags_stay_scanned():
    """Reads at lags {1,3} only: the window must carry the intermediate
    lag-2 slot (regression: advancing lag 3 used to KeyError on the missing
    slot 2 and silently fall back to full unrolling). The jaxpr must contain
    a scan — proof the streamed path was taken, not the unrolled fallback."""
    src = """
    data { int<lower=1> T; real y[T]; real phi; }
    parameters { real a; real b; }
    model {
      vector[T] e;
      e[1] = y[1];
      e[2] = y[2];
      e[3] = y[3];
      for (t in 4:T) { e[t] = y[t] - a * e[t-1] - b * e[t-3]; }
      a ~ normal(0, 1);
      b ~ normal(0, 1);
      target += phi * normal_lpdf(e | 0, 1);
    }
    """
    data = {"T": 30, "y": np.random.default_rng(6).normal(size=30).tolist()}
    m_scan, m_unroll = _both(src, data)
    _assert_models_agree(m_scan, m_unroll, dim=2)
    jx = jax.make_jaxpr(lambda t: m_scan.logp(t, 1.0))(jnp.zeros(2))
    assert any(eq.primitive.name == "scan" for eq in jx.eqns), (
        "streamed lowering silently fell back to unrolling"
    )


# ------------------------------------ forward-mode tile adapter (long loops)


def test_tile_autodiff_auto_selection():
    """tile_autodiff='auto' picks forward mode for long CARRIED loops —
    recurrences, the reverse adapter's VMEM wall — and reverse mode for
    short loops and long NON-carried loops (one vjp pass beats D jvp
    passes when there is no recurrence)."""
    m_long = compile_stan_program(
        _RECURRENCE, _recurrence_data(T=200), name="rec200", tile=True
    )
    assert m_long.tile_model.autodiff == "forward"
    m_short = compile_stan_program(
        _RECURRENCE, _recurrence_data(T=40), name="rec40", tile=True
    )
    assert m_short.tile_model.autodiff == "reverse"
    m_forced = compile_stan_program(
        _RECURRENCE, _recurrence_data(T=40), name="rec40f", tile=True,
        tile_autodiff="forward",
    )
    assert m_forced.tile_model.autodiff == "forward"
    with pytest.raises(StanCompileError, match="tile_autodiff"):
        compile_stan_program(
            _RECURRENCE, _recurrence_data(T=10), tile=True,
            tile_autodiff="bogus",
        )


def test_tile_adapter_forward_mode_matches_grad_t200():
    """The forward-mode tile adapter (per-coordinate in-kernel jax.jvp —
    ops/nuts_pallas.tile_model_from_logp_fwd) at full arma scale (T=200,
    where the reverse adapter's VJP residuals exceed VMEM on-device): logp
    and gradients must match jax.grad of the compiled program exactly."""
    data = _recurrence_data(T=200)
    m = compile_stan_program(_RECURRENCE, data, name="rec200", tile=True)
    assert m.tile_model.autodiff == "forward"
    rng = np.random.default_rng(7)
    # |a| < 1 keeps the T=200 recurrence non-explosive: at |a| > 1 the f32
    # values overflow (~1.3^200) and the scan vs unrolled forms propagate
    # inf/NaN differently — a float artifact, not an adapter property.
    x = np.stack(
        [rng.uniform(-0.9, 0.9, 1024), rng.normal(0, 0.4, 1024)], axis=1
    )
    tiles = [jnp.asarray(x[:, d].reshape(8, 128), jnp.float32)
             for d in range(2)]
    logp, grads = jax.jit(
        lambda ts, p: m.tile_model.tile_fn((), ts, p)
    )(tiles, jnp.full((8, 128), 0.7, jnp.float32))
    xj = jnp.asarray(x, jnp.float32)
    lp_ref = m.logp_batch(xj, 0.7)
    np.testing.assert_allclose(
        np.asarray(logp).reshape(-1), np.asarray(lp_ref), rtol=1e-4,
        atol=1e-3,
    )
    g_ref = np.asarray(
        jax.vmap(lambda t: jax.grad(lambda q: m.logp(q, 0.7))(t))(xj)
    )
    g_tile = np.stack([np.asarray(g).reshape(-1) for g in grads], axis=1)
    scale = np.abs(g_ref).max() + 1e-6
    np.testing.assert_allclose(g_tile / scale, g_ref / scale, atol=1e-5)


def test_frontend_long_recurrence_pallas_kernel_interpret():
    """Forward-mode tile model through the whole-tree Pallas NUTS kernel
    (TPU-semantics interpreter): in-kernel log densities at a T=96
    recurrence (auto -> forward) must match the XLA evaluation."""
    from smcnuts_tpu.ops.nuts_pallas import nuts_batch_pallas

    m = compile_stan_program(
        _RECURRENCE, _recurrence_data(T=96), name="rec96", tile=True
    )
    assert m.tile_model.autodiff == "forward"
    rng = np.random.default_rng(1)
    n = 16
    x = jnp.asarray(rng.normal(0, 0.3, (n, 2)), jnp.float32)
    r = jnp.asarray(rng.normal(size=(n, 2)), jnp.float32)
    _, _, st = nuts_batch_pallas(
        m.tile_model, x, r, 5, 0.05, 0.8, max_depth=2, interpret=True
    )
    lp_ref = m.logp_batch(x, 0.8)
    np.testing.assert_allclose(
        np.asarray(st["logp0"]), np.asarray(lp_ref), rtol=1e-4, atol=1e-2
    )


# --------------------------- language breadth: functions, while, transforms


def test_user_functions_inline():
    """functions-block definitions (reference gets these via BridgeStan's
    full-language compiler) inline at call sites: values, gradients, and use
    inside loops must match the hand-written equivalent."""
    src = """
    functions {
      real sq(real x) { return x * x; }
      real horner(vector c, real x) {
        real acc;
        acc = 0;
        for (k in 1:num_elements(c)) { acc = acc * x + c[k]; }
        return acc;
      }
    }
    data { real phi; }
    parameters { real a; }
    model {
      vector[3] c;
      c[1] = 1; c[2] = -2; c[3] = 0.5;
      target += phi * (-sq(a - 1) - 0.1 * sq(horner(c, a)));
    }
    """
    m = compile_stan_program(src, {}, name="fns")
    ref = lambda a: -(a - 1) ** 2 - 0.1 * ((a * a - 2 * a + 0.5) ** 2)
    for a in (-0.7, 0.0, 1.3):
        th = jnp.asarray([a], jnp.float32)
        np.testing.assert_allclose(
            float(m.logp(th, 0.8)), 0.8 * ref(a), rtol=1e-5, atol=1e-5
        )
        g = jax.grad(lambda t: m.logp(t, 0.8))(th)
        g_ref = jax.grad(lambda t: 0.8 * ref(t[0]))(th)
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(g_ref), rtol=1e-4, atol=1e-4
        )


def test_user_function_target_increment():
    """_lp-style user functions: `target +=` inside a function body lands in
    the caller's target."""
    src = """
    functions {
      void add_prior_lp(real x) { target += normal_lpdf(x | 0, 2); }
    }
    parameters { real a; }
    model { add_prior_lp(a); }
    """
    m = compile_stan_program(src, {}, name="fnlp")
    th = jnp.asarray([0.7], jnp.float32)
    from scipy.stats import norm

    np.testing.assert_allclose(
        float(m.logp(th, 1.0)), norm(0, 2).logpdf(0.7), rtol=1e-5
    )


def test_user_function_recursion_rejected():
    src = """
    functions { real f(real x) { return f(x) + 1; } }
    parameters { real a; }
    model { target += f(a); }
    """
    with pytest.raises(StanCompileError, match="depth|recursion"):
        compile_stan_program(src, {}, name="rec")


def test_while_loop_matches_for():
    """`while` with data-derived conditions unrolls like the equivalent
    `for` (BridgeStan runs these natively; here they trace)."""
    srcw = """
    data { int<lower=1> T; real y[T]; real phi; }
    parameters { real a; }
    model {
      int t;
      real acc;
      t = 1;
      acc = 0;
      while (t <= T) { acc += (y[t] - a)^2; t += 1; }
      target += phi * (-0.5 * acc);
    }
    """
    srcf = """
    data { int<lower=1> T; real y[T]; real phi; }
    parameters { real a; }
    model {
      real acc;
      acc = 0;
      for (t in 1:T) { acc += (y[t] - a)^2; }
      target += phi * (-0.5 * acc);
    }
    """
    data = {"T": 9, "y": np.arange(9.0).tolist()}
    mw = compile_stan_program(srcw, data, name="w")
    mf = compile_stan_program(srcf, data, name="f")
    for a in (-0.4, 0.9):
        th = jnp.asarray([a], jnp.float32)
        np.testing.assert_allclose(
            float(mw.logp(th, 0.6)), float(mf.logp(th, 0.6)), rtol=1e-6
        )


def test_while_parameter_condition_rejected():
    src = """
    parameters { real a; }
    model { while (a > 0) { target += -1; } }
    """
    with pytest.raises(StanCompileError, match="while"):
        compile_stan_program(src, {}, name="wbad")


def _constrain_parts(m, dim, u):
    th = jnp.asarray(u, jnp.float32)
    return np.asarray(m.constrain(th))


@pytest.mark.parametrize("vtype,K", [
    ("ordered", 4), ("positive_ordered", 4), ("simplex", 5),
])
def test_constrained_vector_transforms(vtype, K):
    """ordered / positive_ordered / simplex transforms: shape invariants
    hold and the declared log-Jacobian equals log|det| of the transform
    computed numerically with jax.jacobian (for simplex, over the first K-1
    coordinates — the manifold chart)."""
    dim = K - 1 if vtype == "simplex" else K
    src = f"""
    parameters {{ {vtype}[{K}] v; }}
    model {{ target += 0; }}
    """
    m = compile_stan_program(src, {}, name=vtype)
    assert m.dim == dim
    rng = np.random.default_rng(0)
    for _ in range(4):
        u = rng.normal(0, 0.8, dim)
        c = _constrain_parts(m, dim, u)[:K]
        if vtype == "ordered":
            assert np.all(np.diff(c) > 0)
        elif vtype == "positive_ordered":
            assert np.all(c > 0) and np.all(np.diff(c) > 0)
        else:
            assert np.all(c > 0)
            np.testing.assert_allclose(c.sum(), 1.0, rtol=1e-5)
        # Jacobian: logprior of this flat-target model IS the log-Jacobian.
        lj = float(m.logprior(jnp.asarray(u, jnp.float32)))

        def chart(uu, m=m):
            out = m.constrain(uu)[:K]
            return out[:-1] if vtype == "simplex" else out

        J = jax.jacobian(chart)(jnp.asarray(u, jnp.float32))
        _, ld = np.linalg.slogdet(np.asarray(J, np.float64))
        np.testing.assert_allclose(lj, ld, rtol=1e-4, atol=1e-3)


def test_unit_vector_transform():
    src = "parameters { unit_vector[3] v; } model { target += 0; }"
    m = compile_stan_program(src, {}, name="uv")
    assert m.dim == 3
    u = np.array([0.6, -1.2, 0.4])
    c = np.asarray(m.constrain(jnp.asarray(u, jnp.float32)))[:3]
    np.testing.assert_allclose(np.linalg.norm(c), 1.0, rtol=1e-5)
    # Stan's density adjustment: -||u||^2 / 2.
    np.testing.assert_allclose(
        float(m.logprior(jnp.asarray(u, jnp.float32))),
        -0.5 * float(np.sum(u * u)), rtol=1e-5,
    )


def test_ordered_posterior_order_statistics():
    """e2e: ordered[3] c with c ~ normal(0,1) samples the order statistics
    of three iid standard normals — E[c] = (-0.846, 0, 0.846)."""
    from smcnuts_tpu import SMCConfig, run_smc

    src = """
    parameters { ordered[3] c; }
    model { for (k in 1:3) { c[k] ~ normal(0, 1); } }
    """
    m = compile_stan_program(src, {}, name="ord3")
    cfg = SMCConfig(n_particles=1024, n_iterations=12, step_size=0.4,
                    save_history=False, max_tree_depth=6)
    res = run_smc(m, cfg, jax.random.key(2))
    mean = np.asarray(res.mean_estimate[-1])[:3]
    expect = np.array([-0.8463, 0.0, 0.8463])
    np.testing.assert_allclose(mean, expect, atol=0.12)


def test_simplex_posterior_dirichlet_mean():
    """e2e: simplex[3] w with target += 2 log w1 + 1 log w2 is Dirichlet
    (3,2,1) — mean (1/2, 1/3, 1/6). Wrong stick-breaking Jacobians shift
    these means (asymmetric on purpose)."""
    from smcnuts_tpu import SMCConfig, run_smc

    src = """
    parameters { simplex[3] w; }
    model { target += 2 * log(w[1]) + log(w[2]); }
    """
    m = compile_stan_program(src, {}, name="dir321")
    cfg = SMCConfig(n_particles=1024, n_iterations=12, step_size=0.4,
                    save_history=False, max_tree_depth=6)
    res = run_smc(m, cfg, jax.random.key(3))
    mean = np.asarray(res.mean_estimate[-1])[:3]
    np.testing.assert_allclose(
        mean, [0.5, 1 / 3, 1 / 6], atol=0.05
    )


_EIGHT_NCP = """
data {
  int<lower=0> J;
  real y[J];
  real<lower=0> sigma[J];
  real phi;
}
parameters {
  real mu;
  real<lower=0> tau;
  vector[J] theta_t;
}
transformed parameters {
  vector[J] theta = mu + tau * theta_t;
}
model {
  mu ~ normal(0, 5);
  tau ~ cauchy(0, 5);
  theta_t ~ normal(0, 1);
  target += phi * normal_lpdf(y | theta, sigma);
}
"""


def test_eight_schools_ncp_port():
    """External-model port: the classic eight-schools NCP .stan (Stan docs /
    posteriordb) compiled by the frontend must match the hand model's density
    up to the half-Cauchy folding constant (the hand model normalizes
    HalfCauchy with +log 2; Stan's `tau ~ cauchy(0,5)` on a <lower=0>
    parameter does not) — gradients therefore must match exactly."""
    from smcnuts_tpu.models import make_eightschools
    from smcnuts_tpu.models.eightschools import SIGMA, Y

    data = {"J": 8, "y": Y.tolist(), "sigma": SIGMA.tolist()}
    m = compile_stan_program(_EIGHT_NCP, data, name="eight_ncp")
    hand = make_eightschools()
    assert m.dim == hand.dim == 10
    # constrain: [mu, tau, theta_t(8), theta(8)] — raw params + the TP block.
    assert m.constrained_dim == 18

    rng = np.random.default_rng(4)
    log2 = float(np.log(2.0))
    for _ in range(5):
        th = jnp.asarray(rng.normal(size=10) * 0.5, jnp.float32)
        np.testing.assert_allclose(
            float(m.logprior(th)) + log2, float(hand.logprior(th)),
            rtol=1e-5, atol=1e-4,
        )
        np.testing.assert_allclose(
            float(m.loglik(th)), float(hand.loglik(th)), rtol=1e-5, atol=1e-3
        )
        g1 = jax.grad(lambda t: m.logp(t, 0.7))(th)
        g2 = jax.grad(lambda t: hand.logp(t, 0.7))(th)
        scale = float(jnp.max(jnp.abs(g2))) + 1e-6
        np.testing.assert_allclose(
            np.asarray(g1) / scale, np.asarray(g2) / scale, atol=3e-4
        )
        # TP block: theta = mu + tau * theta_t, after [mu, tau, theta_t].
        c = np.asarray(m.constrain(th))
        np.testing.assert_allclose(
            c[10:], np.asarray(hand.constrain(th))[2:], rtol=1e-5, atol=1e-5
        )


def test_glm_with_functions_e2e():
    """External-model port: a logistic GLM whose linear predictor and prior
    live in user functions, sampled end-to-end — posterior mean must land
    near the (strongly identified) generating coefficients."""
    from smcnuts_tpu import SMCConfig, run_smc

    rng = np.random.default_rng(9)
    n, true_b = 200, np.array([1.0, -2.0])
    X = rng.normal(size=(n, 2))
    p = 1.0 / (1.0 + np.exp(-(X @ true_b)))
    yv = (rng.uniform(size=n) < p).astype(float)

    src = """
    functions {
      real lin(vector b, real x1, real x2) { return b[1]*x1 + b[2]*x2; }
      void coef_prior_lp(vector b) { target += normal_lpdf(b | 0, 3); }
    }
    data { int<lower=1> N; real x1[N]; real x2[N]; real y[N]; real phi; }
    parameters { vector[2] b; }
    model {
      real eta;
      coef_prior_lp(b);
      for (i in 1:N) {
        eta = lin(b, x1[i], x2[i]);
        target += phi * (y[i] * eta - log1p_exp(eta));
      }
    }
    """
    m = compile_stan_program(
        src,
        {"N": n, "x1": X[:, 0].tolist(), "x2": X[:, 1].tolist(),
         "y": yv.tolist()},
        name="glm_fns",
    )
    cfg = SMCConfig(n_particles=512, n_iterations=10, step_size=0.1,
                    tempering=True, save_history=False, max_tree_depth=7)
    res = run_smc(m, cfg, jax.random.key(5))
    mean = np.asarray(res.mean_estimate[-1])
    np.testing.assert_allclose(mean, true_b, atol=0.5)


_GARCH = """
data { int<lower=1> T; real y[T]; real sigma1; real phi; }
parameters {
  real mu;
  real<lower=0> alpha0;
  real<lower=0, upper=1> alpha1;
  real<lower=0, upper=1> beta1;
}
model {
  vector[T] h;
  h[1] = sigma1^2;
  for (t in 2:T) {
    h[t] = alpha0 + alpha1 * (y[t-1] - mu)^2 + beta1 * h[t-1];
  }
  mu ~ normal(0, 2);
  alpha0 ~ normal(0, 2);
  target += phi * normal_lpdf(y | mu, sqrt(h));
}
"""


def _garch_data(T=120, seed=8):
    rng = np.random.default_rng(seed)
    mu, a0, a1, b1 = 0.3, 0.1, 0.2, 0.5
    y = np.empty(T)
    h = 0.4
    y[0] = mu + np.sqrt(h) * rng.normal()
    for t in range(1, T):
        h = a0 + a1 * (y[t - 1] - mu) ** 2 + b1 * h
        y[t] = mu + np.sqrt(h) * rng.normal()
    return {"T": T, "y": y.tolist(), "sigma1": np.sqrt(0.4)}


def test_garch_forward_tile_matches_grad():
    """Second long-recurrence model family (GARCH(1,1), the Stan manual's
    time-series example): tile=True auto-selects forward mode and the
    in-kernel gradients match autodiff — the 'any recurrence .stan on the
    hot path' gate beyond arma."""
    data = _garch_data()
    m = compile_stan_program(_GARCH, data, name="garch", tile=True)
    assert m.tile_model.autodiff == "forward"
    assert m.dim == 4
    rng = np.random.default_rng(2)
    x = rng.normal(0, 0.4, (1024, 4))
    tiles = [jnp.asarray(x[:, d].reshape(8, 128), jnp.float32)
             for d in range(4)]
    logp, grads = jax.jit(
        lambda ts, p: m.tile_model.tile_fn((), ts, p)
    )(tiles, jnp.full((8, 128), 0.7, jnp.float32))
    xj = jnp.asarray(x, jnp.float32)
    lp_ref = m.logp_batch(xj, 0.7)
    np.testing.assert_allclose(
        np.asarray(logp).reshape(-1), np.asarray(lp_ref), rtol=1e-4,
        atol=1e-3,
    )
    g_ref = np.asarray(
        jax.vmap(lambda t: jax.grad(lambda q: m.logp(q, 0.7))(t))(xj)
    )
    g_tile = np.stack([np.asarray(g).reshape(-1) for g in grads], axis=1)
    scale = np.abs(g_ref).max() + 1e-6
    np.testing.assert_allclose(g_tile / scale, g_ref / scale, atol=2e-5)


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="Mosaic compilation of the forward-mode adapter needs the chip",
)
def test_garch_forward_tile_smc_on_tpu():
    """GARCH(1,1) end-to-end on the chip through the whole-tree Pallas
    backend (forward-mode generated tile kernel): posterior means must
    recover the generating parameters."""
    from smcnuts_tpu import SMCConfig, run_smc

    m = compile_stan_program(_GARCH, _garch_data(), name="garch", tile=True)
    cfg = SMCConfig(
        n_particles=512, n_iterations=12, step_size=0.05,
        save_history=False, nuts_backend="pallas", max_tree_depth=6,
    )
    res = run_smc(m, cfg, jax.random.key(6))
    mean = np.asarray(res.mean_estimate[-1])
    assert np.all(np.isfinite(mean)), mean
    assert abs(mean[0] - 0.3) < 0.3, mean  # mu
    assert np.all(np.asarray(res.ess) > 1.0)


def test_tile_autodiff_sees_function_and_while_loops():
    """The autodiff auto-heuristic must find long loops hidden inside user
    function bodies (and treat `while` as long) — otherwise exactly the
    recurrence-in-a-helper models it exists for would pick the VMEM-walled
    reverse adapter."""
    src_fn = """
    functions {
      real recur(real a, vector y) {
        real e;
        real acc;
        e = y[1];
        acc = 0;
        for (t in 2:200) { e = y[t] - a * e; acc += e * e; }
        return acc;
      }
    }
    data { int<lower=1> T; vector[T] y; real phi; }
    parameters { real a; }
    model { target += phi * (-0.5 * recur(a, y)); }
    """
    y = np.random.default_rng(0).normal(size=200)
    m = compile_stan_program(src_fn, {"T": 200, "y": y.tolist()},
                             name="fnrec", tile=True)
    assert m.tile_model.autodiff == "forward"


def test_tile_autodiff_long_sum_loop_stays_reverse():
    """A long loop WITHOUT carried state (the PRMwCD shape: fresh `temp`
    per iteration, target-only accumulation) must stay on the one-pass
    reverse adapter — loop length alone is not the forward trigger."""
    src = """
    data { int<lower=1> N; real x[N]; real phi; }
    parameters { real b; }
    model {
      real temp;
      for (i in 1:100) {
        temp = b * x[i];
        target += phi * (-0.5 * temp * temp);
      }
    }
    """
    m = compile_stan_program(
        src, {"N": 100, "x": np.random.default_rng(0).normal(size=100).tolist()},
        name="sumloop", tile=True,
    )
    assert m.tile_model.autodiff == "reverse"


def test_range_indexing():
    """Stan multiple indexing y[a:b]: data slices, local-container slices
    (kept per-element so the tile scalarize path stays stack-free), and the
    vectorized AR(1) idiom y[2:T] ~ normal(b*y[1:(T-1)], s) must equal the
    loop form."""
    src_vec = """
    data { int<lower=1> T; vector[T] y; real phi; }
    parameters { real b; real<lower=0> s; }
    model {
      b ~ normal(0, 1);
      target += phi * normal_lpdf(y[2:T] | b * y[1:(T-1)], s);
    }
    """
    src_loop = """
    data { int<lower=1> T; vector[T] y; real phi; }
    parameters { real b; real<lower=0> s; }
    model {
      b ~ normal(0, 1);
      for (t in 2:T) { target += phi * normal_lpdf(y[t] | b * y[t-1], s); }
    }
    """
    T = 30
    y = np.random.default_rng(2).normal(size=T)
    data = {"T": T, "y": y.tolist()}
    mv = compile_stan_program(src_vec, data, name="v")
    ml = compile_stan_program(src_loop, data, name="l")
    for b, ls in ((0.4, -0.5), (-0.2, 0.1)):
        th = jnp.asarray([b, ls], jnp.float32)
        np.testing.assert_allclose(
            float(mv.logp(th, 0.7)), float(ml.logp(th, 0.7)), rtol=1e-5
        )
        gv = jax.grad(lambda t: mv.logp(t, 0.7))(th)
        gl = jax.grad(lambda t: ml.logp(t, 0.7))(th)
        np.testing.assert_allclose(
            np.asarray(gv), np.asarray(gl), rtol=1e-4, atol=1e-5
        )

    # Local-container slice read stays a container: open-ended ranges too.
    src_local = """
    data { int<lower=1> T; vector[T] y; real phi; }
    parameters { real a; real<lower=0> s; }
    model {
      vector[T] e;
      e[1] = y[1];
      for (t in 2:T) { e[t] = y[t] - a * e[t-1]; }
      target += phi * normal_lpdf(e[2:] | 0, s);
    }
    """
    m = compile_stan_program(src_local, data, name="lc", tile=True)
    th = jnp.asarray([0.3, -0.2], jnp.float32)
    # manual check: slice skips e[1]; logprior is just the <lower=0>
    # exp-transform Jacobian of s (the model block has no prior statements).
    e = np.empty(T)
    e[0] = y[0]
    for t in range(1, T):
        e[t] = y[t] - 0.3 * e[t - 1]
    s = float(np.exp(-0.2))
    from scipy.stats import norm

    want = -0.2 + 0.7 * float(norm(0, s).logpdf(e[1:]).sum())
    np.testing.assert_allclose(float(m.logp(th, 0.7)), want, rtol=1e-5)
    # tile path (scalarized slice) agrees as well
    tiles = [jnp.full((8, 128), v, jnp.float32) for v in (0.3, -0.2)]
    lp, _ = m.tile_model.tile_fn(
        (), tiles, jnp.full((8, 128), 0.7, jnp.float32)
    )
    np.testing.assert_allclose(
        float(np.asarray(lp)[0, 0]), want, rtol=1e-4
    )

    # Range writes are rejected loudly.
    with pytest.raises((StanCompileError, StanSyntaxError)):
        compile_stan_program(
            "parameters { real a; } model { vector[3] v; v[1:2] = a; "
            "target += v[1]; }",
            {},
        )


def test_head_tail_segment():
    src = """
    data { int<lower=1> T; vector[T] y; }
    parameters { real m; }
    model {
      target += normal_lpdf(head(y, 3) | m, 1)
              + normal_lpdf(tail(y, 2) | m, 1)
              + normal_lpdf(segment(y, 2, 3) | m, 1);
    }
    """
    T = 8
    y = np.random.default_rng(1).normal(size=T)
    m = compile_stan_program(src, {"T": T, "y": y.tolist()}, name="hts")
    from scipy.stats import norm

    mv = 0.4
    want = (
        norm(mv, 1).logpdf(y[:3]).sum()
        + norm(mv, 1).logpdf(y[-2:]).sum()
        + norm(mv, 1).logpdf(y[1:4]).sum()
    )
    np.testing.assert_allclose(
        float(m.logp(jnp.asarray([mv], jnp.float32), 1.0)), want, rtol=1e-5
    )


def test_multi_normal_and_dirichlet():
    """Joint densities: multi_normal(+_cholesky) against scipy, dirichlet
    against scipy, both reachable from sampling statements; a correlated-MVN
    program's posterior mean must track the analytic posterior."""
    from scipy.stats import dirichlet as sp_dir, multivariate_normal

    src = """
    data { int<lower=1> D; vector[D] mu0; matrix[D, D] Sigma; vector[D] y; }
    parameters { vector[D] x; }
    model {
      x ~ multi_normal(mu0, Sigma);
      y ~ multi_normal(x, Sigma);
    }
    """
    Sigma = np.array([[1.0, 0.6], [0.6, 2.0]])
    mu0 = np.zeros(2)
    yv = np.array([1.0, -0.5])
    m = compile_stan_program(
        src,
        {"D": 2, "mu0": mu0.tolist(),
         "Sigma": [list(r) for r in Sigma], "y": yv.tolist()},
        name="mvn",
    )
    x = np.array([0.3, 0.8])
    want = (
        multivariate_normal(mu0, Sigma).logpdf(x)
        + multivariate_normal(x, Sigma).logpdf(yv)
    )
    np.testing.assert_allclose(
        float(m.logp(jnp.asarray(x, jnp.float32), 1.0)), want, rtol=1e-5
    )

    # dirichlet with a simplex parameter: logp matches scipy (incl. the
    # stick-breaking Jacobian via logprior separation).
    src_d = """
    data { vector[3] alpha; }
    parameters { simplex[3] w; }
    model { w ~ dirichlet(alpha); }
    """
    alpha = np.array([2.0, 3.0, 1.5])
    md = compile_stan_program(
        src_d, {"alpha": alpha.tolist()}, name="dir"
    )
    u = np.array([0.2, -0.4])
    w = np.asarray(md.constrain(jnp.asarray(u, jnp.float32)))[:3]
    # logp = dirichlet_lpdf(w | alpha) + jacobian(u); compare the density
    # part by subtracting the flat-target jacobian probe.
    flat = compile_stan_program(
        "parameters { simplex[3] w; } model { target += 0; }", {},
        name="flat",
    )
    dens = float(md.logp(jnp.asarray(u, jnp.float32), 1.0)) - float(
        flat.logp(jnp.asarray(u, jnp.float32), 1.0)
    )
    np.testing.assert_allclose(dens, sp_dir(alpha).logpdf(w), rtol=1e-4)


def test_cholesky_factor_corr_transform_and_lkj():
    """cholesky_factor_corr[K]: lower-triangular, unit-diagonal rows
    (L L^T is a correlation matrix), the declared log-Jacobian equals the
    numeric chart determinant, and K=2 LKJ(eta=2) sampling recovers the
    closed-form corr moments (rho = 2X-1, X ~ Beta(eta, eta):
    E rho = 0, Var rho = 1/(2 eta + 1) = 0.2)."""
    K = 4
    src = f"parameters {{ cholesky_factor_corr[{K}] L; }} model {{ target += 0; }}"
    m = compile_stan_program(src, {}, name="cfc")
    assert m.dim == K * (K - 1) // 2
    rng = np.random.default_rng(0)
    for _ in range(3):
        u = rng.normal(0, 0.7, m.dim)
        L = np.asarray(
            m.constrain(jnp.asarray(u, jnp.float32))
        )[: K * K].reshape(K, K)
        assert np.allclose(np.triu(L, 1), 0.0)
        np.testing.assert_allclose(
            np.diag(L @ L.T), np.ones(K), rtol=1e-5
        )
        assert np.all(np.diag(L) > 0)
        # Jacobian: chart u -> strictly-lower entries of L.
        lj = float(m.logprior(jnp.asarray(u, jnp.float32)))

        def chart(uu):
            Lm = m.constrain(uu)[: K * K].reshape(K, K)
            return jnp.concatenate(
                [Lm[i, :i] for i in range(1, K)]
            )

        J = jax.jacobian(chart)(jnp.asarray(u, jnp.float32))
        _, ld = np.linalg.slogdet(np.asarray(J, np.float64))
        np.testing.assert_allclose(lj, ld, rtol=1e-4, atol=1e-3)

    # e2e LKJ: K=2, eta=2.
    from smcnuts_tpu import SMCConfig, run_smc

    src2 = """
    parameters { cholesky_factor_corr[2] L; }
    model { L ~ lkj_corr_cholesky(2); }
    """
    m2 = compile_stan_program(src2, {}, name="lkj2")
    cfg = SMCConfig(n_particles=1024, n_iterations=10, step_size=0.5,
                    save_history=False, max_tree_depth=6)
    res = run_smc(m2, cfg, jax.random.key(7))
    # constrained layout: L.1.1, L.1.2, L.2.1, L.2.2 — rho = L.2.1.
    rho_mean = float(res.mean_estimate[-1][2])
    rho_var = float(res.variance_estimate[-1][2])
    assert abs(rho_mean) < 0.1, rho_mean
    np.testing.assert_allclose(rho_var, 0.2, atol=0.05)


def test_corr_matrix_transform_and_uniform_rho():
    """corr_matrix[K]: symmetric, unit diagonal, positive definite; the
    declared log-Jacobian equals the numeric chart determinant over the
    strictly-lower entries of Sigma; and a flat target on corr_matrix[2]
    (LKJ eta=1) gives rho ~ Uniform(-1,1): mean 0, var 1/3."""
    K = 4
    src = f"parameters {{ corr_matrix[{K}] S; }} model {{ target += 0; }}"
    m = compile_stan_program(src, {}, name="cm")
    assert m.dim == K * (K - 1) // 2
    rng = np.random.default_rng(1)
    for _ in range(3):
        u = rng.normal(0, 0.7, m.dim)
        S = np.asarray(
            m.constrain(jnp.asarray(u, jnp.float32))
        )[: K * K].reshape(K, K)
        np.testing.assert_allclose(S, S.T, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.diag(S), np.ones(K), rtol=1e-5)
        assert np.all(np.linalg.eigvalsh(S.astype(np.float64)) > 0)
        lj = float(m.logprior(jnp.asarray(u, jnp.float32)))

        def chart(uu):
            Sm = m.constrain(uu)[: K * K].reshape(K, K)
            return jnp.concatenate([Sm[i, :i] for i in range(1, K)])

        J = jax.jacobian(chart)(jnp.asarray(u, jnp.float32))
        _, ld = np.linalg.slogdet(np.asarray(J, np.float64))
        np.testing.assert_allclose(lj, ld, rtol=1e-4, atol=1e-3)

    from smcnuts_tpu import SMCConfig, run_smc

    src2 = "parameters { corr_matrix[2] S; } model { target += 0; }"
    m2 = compile_stan_program(src2, {}, name="cm2")
    cfg = SMCConfig(n_particles=1024, n_iterations=10, step_size=0.5,
                    save_history=False, max_tree_depth=6)
    res = run_smc(m2, cfg, jax.random.key(11))
    # constrained layout row-major: S.1.1, S.1.2, S.2.1, S.2.2.
    rho_mean = float(res.mean_estimate[-1][1])
    rho_var = float(res.variance_estimate[-1][1])
    assert abs(rho_mean) < 0.1, rho_mean
    np.testing.assert_allclose(rho_var, 1 / 3, atol=0.06)


def test_cov_matrix_transform():
    """cov_matrix[K]: symmetric positive definite; the declared
    log-Jacobian (K log 2 + sum (K-k+2) u_kk + ...) equals the numeric
    chart determinant over the lower triangle of Sigma incl. diagonal."""
    K = 3
    src = f"parameters {{ cov_matrix[{K}] S; }} model {{ target += 0; }}"
    m = compile_stan_program(src, {}, name="covm")
    assert m.dim == K * (K + 1) // 2
    rng = np.random.default_rng(2)
    for _ in range(3):
        u = rng.normal(0, 0.6, m.dim)
        S = np.asarray(
            m.constrain(jnp.asarray(u, jnp.float32))
        )[: K * K].reshape(K, K)
        np.testing.assert_allclose(S, S.T, rtol=1e-5, atol=1e-6)
        assert np.all(np.linalg.eigvalsh(S.astype(np.float64)) > 0)
        lj = float(m.logprior(jnp.asarray(u, jnp.float32)))

        def chart(uu):
            Sm = m.constrain(uu)[: K * K].reshape(K, K)
            return jnp.concatenate([Sm[i, : i + 1] for i in range(K)])

        J = jax.jacobian(chart)(jnp.asarray(u, jnp.float32))
        _, ld = np.linalg.slogdet(np.asarray(J, np.float64))
        np.testing.assert_allclose(lj, ld, rtol=1e-4, atol=1e-3)


def test_cholesky_factor_cov_transform():
    """cholesky_factor_cov[K]: lower triangular with positive diagonal;
    logJ = sum of the diagonal's unconstrained coordinates."""
    K = 3
    src = (
        f"parameters {{ cholesky_factor_cov[{K}] L; }} "
        "model { target += 0; }"
    )
    m = compile_stan_program(src, {}, name="cfcov")
    assert m.dim == K * (K + 1) // 2
    u = np.random.default_rng(3).normal(0, 0.8, m.dim)
    L = np.asarray(
        m.constrain(jnp.asarray(u, jnp.float32))
    )[: K * K].reshape(K, K)
    assert np.allclose(np.triu(L, 1), 0.0)
    assert np.all(np.diag(L) > 0)
    diag_idx = [i * (i + 1) // 2 + i for i in range(K)]
    np.testing.assert_allclose(
        float(m.logprior(jnp.asarray(u, jnp.float32))),
        float(u[diag_idx].sum()), rtol=1e-5,
    )


def test_matrix_densities_match_scipy():
    """wishart / inv_wishart (fully normalized) against scipy; lkj_corr's
    unnormalized form against (eta-1) logdet."""
    from scipy import stats

    from smcnuts_tpu.stan.math import DISTRIBUTIONS

    rng = np.random.default_rng(0)
    K = 3
    A = rng.normal(size=(K, K))
    S = A @ A.T + K * np.eye(K)
    B = rng.normal(size=(K, K))
    W = B @ B.T + K * np.eye(K)
    nu = 7.5
    np.testing.assert_allclose(
        float(DISTRIBUTIONS["wishart"](W, nu, S)),
        stats.wishart.logpdf(W, df=nu, scale=S), rtol=1e-4,
    )
    np.testing.assert_allclose(
        float(DISTRIBUTIONS["inv_wishart"](W, nu, S)),
        stats.invwishart.logpdf(W, df=nu, scale=S), rtol=1e-4,
    )
    C = np.corrcoef(rng.normal(size=(K, 50)))
    np.testing.assert_allclose(
        float(DISTRIBUTIONS["lkj_corr"](C, 2.5)),
        1.5 * np.linalg.slogdet(C)[1], rtol=1e-4,
    )


def test_cov_matrix_inv_wishart_posterior_mean():
    """e2e: cov_matrix[2] S ~ inv_wishart(8, I) has mean I/(nu-K-1) = I/5 —
    exercises the cov_matrix transform (incl. its Jacobian) through the full
    sampler."""
    from smcnuts_tpu import SMCConfig, run_smc

    src = """
    data { matrix[2,2] S0; real phi; }
    parameters { cov_matrix[2] S; }
    model { S ~ inv_wishart(8, S0); }
    """
    m = compile_stan_program(
        src, {"S0": np.eye(2).tolist()}, name="iwish"
    )
    assert m.dim == 3
    cfg = SMCConfig(n_particles=1024, n_iterations=12, step_size=0.3,
                    save_history=False, max_tree_depth=6)
    res = run_smc(m, cfg, jax.random.key(5))
    mean = np.asarray(res.mean_estimate[-1])[:4].reshape(2, 2)
    np.testing.assert_allclose(mean, np.eye(2) / 5.0, atol=0.05)


def test_matrix_algebra_builtins():
    """trace/inverse/determinant/log_determinant/quad_form/crossprod/
    tcrossprod/mdivide_left_tri_low/rows/cols/distance evaluate to the
    numpy ground truth (data-only expressions, flat parameter)."""
    A = np.array([[2.0, 0.3], [0.3, 1.5]])
    b = np.array([0.4, -0.7])
    L = np.linalg.cholesky(A)
    src = """
    data { matrix[2,2] A; vector[2] b; real phi; }
    parameters { real z; }
    model {
      target += trace(A) + determinant(A) + log_determinant(A);
      target += quad_form(A, b) + quad_form(inverse(A), b);
      target += trace(crossprod(A)) + trace(tcrossprod(A));
      target += sum(mdivide_left_tri_low(cholesky_decompose(A), b));
      target += rows(A) + cols(A) + num_elements(b);
      target += distance(col(A, 1), b) + squared_distance(row(A, 2), b);
      target += trace(quad_form_diag(A, b)) + sum(mdivide_left_spd(A, b));
    }
    """
    m = compile_stan_program(
        src, {"A": A.tolist(), "b": b.tolist()}, name="matalg"
    )
    expect = (
        A.trace() + np.linalg.det(A) + np.linalg.slogdet(A)[1]
        + b @ A @ b + b @ np.linalg.inv(A) @ b
        + (A.T @ A).trace() + (A @ A.T).trace()
        + np.linalg.solve(L, b).sum()
        + 2 + 2 + 2
        + np.linalg.norm(A[:, 0] - b) + ((A[1, :] - b) ** 2).sum()
        + (A * np.outer(b, b)).trace() + np.linalg.solve(A, b).sum()
    )
    got = float(m.logp(jnp.zeros((1,), jnp.float32), 1.0))
    # subtract the flat z's standard-normal-free prior: model has no prior
    # term for z, so logp is exactly the data expression total.
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_examples_compile_and_grad():
    """Every shipped examples/stan/*.stan compiles against its data file
    and yields a finite log-density and gradient at a random point — keeps
    the examples directory from drifting as the frontend evolves."""
    import glob
    import json
    import os

    here = os.path.join(os.path.dirname(__file__), "..", "examples", "stan")
    stans = sorted(glob.glob(os.path.join(here, "*.stan")))
    assert len(stans) >= 5
    rng = np.random.default_rng(0)
    for path in stans:
        with open(path) as f:
            src = f.read()
        with open(path.replace(".stan", ".json")) as f:
            data = json.load(f)
        name = os.path.splitext(os.path.basename(path))[0]
        m = compile_stan_program(src, data, name=name)
        u = jnp.asarray(rng.normal(0, 0.3, m.dim), jnp.float32)
        v = float(m.logp(u, 1.0))
        g = np.asarray(jax.grad(lambda t: m.logp(t, 1.0))(u))
        assert np.isfinite(v), name
        assert np.all(np.isfinite(g)), name
        c = np.asarray(m.constrain(u))
        assert np.all(np.isfinite(c)), name


def test_gq_rng_categorical_dirichlet_mvn():
    """generated-quantities RNGs for the container distributions:
    categorical_rng in range, dirichlet_rng on the simplex,
    multi_normal(_cholesky)_rng right shapes; fixed-seed determinism
    (bridgestan.py:106 semantics) holds."""
    src = """
    data { vector[3] a; vector[2] mu0; matrix[2,2] S0; real phi; }
    parameters { real z; }
    model { z ~ normal(0, 1); }
    generated quantities {
      int c = categorical_rng(a);
      vector[3] w = dirichlet_rng(a);
      vector[2] g = multi_normal_rng(mu0, S0);
      vector[2] h = multi_normal_cholesky_rng(mu0, cholesky_decompose(S0));
    }
    """
    m = compile_stan_program(
        src, {"a": [1.0, 2.0, 3.0], "mu0": [0.0, 1.0],
              "S0": [[1.0, 0.2], [0.2, 0.5]]}, name="gqrng"
    )
    u = jnp.zeros((1,), jnp.float32)
    out = np.asarray(m.constrain(u))
    assert out.shape == (9,)  # z, c, w[3], g[2], h[2]
    assert out[1] in (1.0, 2.0, 3.0)
    np.testing.assert_allclose(out[2:5].sum(), 1.0, rtol=1e-5)
    assert np.all(out[2:5] > 0)
    np.testing.assert_array_equal(out, np.asarray(m.constrain(u)))


def test_multi_student_t_matches_scipy():
    """multi_student_t: single-vector and vectorized (N, D) forms against
    scipy.stats.multivariate_t."""
    from scipy import stats

    from smcnuts_tpu.stan.math import DISTRIBUTIONS

    rng = np.random.default_rng(0)
    D = 3
    A = rng.normal(size=(D, D))
    S = A @ A.T + D * np.eye(D)
    mu = rng.normal(size=D)
    y1 = rng.normal(size=D)
    yN = rng.normal(size=(4, D))
    np.testing.assert_allclose(
        float(DISTRIBUTIONS["multi_student_t"](y1, 5.0, mu, S)),
        stats.multivariate_t.logpdf(y1, loc=mu, shape=S, df=5),
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        float(DISTRIBUTIONS["multi_student_t"](yN, 5.0, mu, S)),
        stats.multivariate_t.logpdf(yN, loc=mu, shape=S, df=5).sum(),
        rtol=1e-4,
    )


def test_discrete_densities_categorical_multinomial_ordered_logistic():
    """categorical(+_logit) / multinomial vs scipy; ordered_logistic vs the
    direct difference-of-sigmoids probabilities incl. the edge categories
    1 and K."""
    from scipy import stats
    from scipy.special import expit, log_softmax

    from smcnuts_tpu.stan.math import DISTRIBUTIONS

    theta = np.array([0.2, 0.5, 0.3])
    y = np.array([1, 3, 2, 2])
    np.testing.assert_allclose(
        float(DISTRIBUTIONS["categorical"](y, theta)),
        np.log(theta[y - 1]).sum(), rtol=1e-5,
    )
    beta = np.array([0.4, -1.1, 0.7])
    np.testing.assert_allclose(
        float(DISTRIBUTIONS["categorical_logit"](y, beta)),
        log_softmax(beta)[y - 1].sum(), rtol=1e-5,
    )
    counts = np.array([3, 1, 4])
    np.testing.assert_allclose(
        float(DISTRIBUTIONS["multinomial"](counts, theta)),
        stats.multinomial.logpmf(counts, n=counts.sum(), p=theta),
        rtol=1e-5,
    )
    c = np.array([-0.8, 0.3, 1.5])  # K = 4 categories
    eta = np.array([0.2, -1.0, 2.0, 0.5])
    yy = np.array([1, 2, 4, 3])
    cpad = np.concatenate([[-np.inf], c, [np.inf]])
    probs = expit(eta - cpad[yy - 1]) - expit(eta - cpad[yy])
    np.testing.assert_allclose(
        float(DISTRIBUTIONS["ordered_logistic"](yy, eta, c)),
        np.log(probs).sum(), rtol=1e-5,
    )


def test_ordered_logistic_model_gradients():
    """An ordered-logistic regression with `ordered` cutpoints compiles and
    has finite gradients — the canonical pairing of the cutpoint type with
    its likelihood."""
    src = """
    data { int N; int y[N]; vector[N] x; real phi; }
    parameters { real beta; ordered[3] c; }
    model {
      beta ~ normal(0, 2);
      c ~ normal(0, 5);
      for (n in 1:N) { y[n] ~ ordered_logistic(beta * x[n], c); }
    }
    """
    rng = np.random.default_rng(0)
    x = rng.normal(size=8)
    y = rng.integers(1, 5, size=8)
    m = compile_stan_program(
        src, {"N": 8, "y": y.tolist(), "x": x.tolist()}, name="ologit"
    )
    u = jnp.asarray(rng.normal(0, 0.5, m.dim), jnp.float32)
    v = float(m.logp(u, 1.0))
    g = np.asarray(jax.grad(lambda t: m.logp(t, 1.0))(u))
    assert np.isfinite(v)
    assert np.all(np.isfinite(g))


def test_hierarchical_correlated_effects_idiom():
    """The modern Stan hierarchical idiom compiles and traces end-to-end:
    z ~ std_normal, effects = diag_pre_multiply(tau, L) * z."""
    src = """
    data { int<lower=1> J; vector[2] y[J]; real phi; }
    parameters {
      cholesky_factor_corr[2] L;
      vector<lower=0>[2] tau;
      vector[2] z[J];
    }
    model {
      L ~ lkj_corr_cholesky(2);
      tau ~ exponential(1);
      for (j in 1:J) {
        z[j] ~ std_normal();
        target += phi * normal_lpdf(y[j] | diag_pre_multiply(tau, L) * z[j], 0.5);
      }
    }
    """
    J = 3
    y = np.random.default_rng(5).normal(size=(J, 2))
    m = compile_stan_program(
        src, {"J": J, "y": [list(r) for r in y]}, name="hier"
    )
    assert m.dim == 1 + 2 + 2 * J
    th_np = np.random.default_rng(6).normal(size=m.dim) * 0.3
    th = jnp.asarray(th_np, jnp.float32)
    v = float(m.logp(th, 0.7))
    g = jax.grad(lambda t: m.logp(t, 0.7))(th)
    assert np.all(np.isfinite(np.asarray(g)))

    # Hand value: Stan `*` must be MATRIX multiplication here, not a
    # broadcast (diag(tau) L z_j is a true matvec).
    from scipy.stats import norm

    u_L, u_tau, z = th_np[0], th_np[1:3], th_np[3:].reshape(J, 2)
    zt = np.tanh(u_L)
    L = np.array([[1.0, 0.0], [zt, np.sqrt(1 - zt * zt)]])
    tau = np.exp(u_tau)
    want = (
        # lkj eta=2, K=2: (2 - 2 + 2*2 - 2) log L22 = 2 log L22
        2.0 * np.log(L[1, 1])
        # jacobians: cholesky (log(1-z^2) + 0.5*log(1)) + tau exp transform
        + np.log1p(-zt * zt) + u_tau.sum()
        # tau ~ exponential(1)
        + (-tau).sum()
        + norm(0, 1).logpdf(z).sum()
        + 0.7 * sum(
            norm((np.diag(tau) @ L @ z[j]), 0.5).logpdf(y[j]).sum()
            for j in range(J)
        )
    )
    np.testing.assert_allclose(v, want, rtol=2e-4)


def test_offset_multiplier_constraint():
    """<offset=m, multiplier=s> affine non-centering: c = m + s*u with
    log|s| Jacobian per element — the eight-schools NCP written the modern
    way must equal the explicit theta_t formulation."""
    src_om = """
    data { real mu0; real<lower=0> s0; }
    parameters { real<offset=mu0, multiplier=s0> x; }
    model { x ~ normal(mu0, s0); }
    """
    m = compile_stan_program(src_om, {"mu0": 3.0, "s0": 2.0}, name="om")
    from scipy.stats import norm

    for u in (-0.7, 0.4):
        th = jnp.asarray([u], jnp.float32)
        c = float(m.constrain(th)[0])
        np.testing.assert_allclose(c, 3.0 + 2.0 * u, rtol=1e-6)
        # logp = normal(c | 3, 2) + log(2); with the affine match the
        # unconstrained density is standard normal + const.
        np.testing.assert_allclose(
            float(m.logp(th, 1.0)),
            norm(3, 2).logpdf(c) + np.log(2.0), rtol=1e-5,
        )
    with pytest.raises(StanCompileError, match="offset/multiplier"):
        compile_stan_program(
            "parameters { real<lower=0, multiplier=2> x; } "
            "model { target += x; }", {},
        )


def test_reject_statement_semantics():
    """A reject() that executes during tracing fails compilation loudly
    (it would reject every draw); one behind a false data-derived condition
    is unreachable and harmless. print() stays a no-op."""
    with pytest.raises(StanCompileError, match="reject"):
        compile_stan_program(
            "data { int n; } parameters { real x; } "
            "model { if (n < 0) { target += x; } else { reject(\"bad\"); } }",
            {"n": 3},
        )
    m = compile_stan_program(
        "data { int n; } parameters { real x; } "
        "model { if (n < 0) { reject(\"bad\"); } print(\"hi\", n); "
        "x ~ normal(0, 1); }",
        {"n": 3},
    )
    assert np.isfinite(float(m.logp(jnp.asarray([0.5], jnp.float32), 1.0)))


def test_tile_autodiff_wide_d_recurrence_picks_forward():
    """Round-5 policy flip (VERDICT r4 #6): a wide-D long-recurrence model
    now picks FORWARD under auto (up to D=128). The round-4 premise —
    forward is D full passes, so wide D must avoid it — no longer holds:
    the simplifier's cross-pass CSE folds the D re-traced primal chains to
    one and constrain_seq keeps per-coordinate tangent cones sparse, while
    reverse mode's O(T) VJP residuals cannot compile past ~40 recurrence
    steps on Mosaic at all (this model carries T=60). Each h_std[t] has a
    suffix cone here (dense-ish), so forward is quadratic in T — feasible
    at this size, where reverse is infeasible on the Pallas path."""
    T = 60
    src = f"""
    data {{ vector[{T}] y; real phi; }}
    parameters {{ vector[{T}] h_std; real m; }}
    transformed parameters {{
      vector[{T}] h;
      h[1] = m + h_std[1];
      for (t in 2:{T}) {{ h[t] = m + 0.9 * (h[t-1] - m) + 0.3 * h_std[t]; }}
    }}
    model {{
      h_std ~ std_normal();
      target += phi * normal_lpdf(y | 0, exp(h / 2));
    }}
    """
    y = np.random.default_rng(0).normal(size=T)
    m = compile_stan_program(src, {"y": y.tolist()}, name="sv", tile=True)
    assert m.dim == T + 1
    assert m.tile_model.autodiff == "forward"
    # The XLA path traces and grads fine regardless of the tile strategy.
    th = jnp.asarray(np.random.default_rng(1).normal(size=m.dim) * 0.2,
                     jnp.float32)
    g = jax.grad(lambda t: m.logp(t, 0.6))(th)
    assert np.all(np.isfinite(np.asarray(g)))
