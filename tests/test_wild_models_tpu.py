"""Wild models through the auto-tile Pallas path, e2e on-chip
(VERDICT r3 #10): stochastic volatility (carried AR(1) recurrence in a
transformed-parameters block) and an IRT 2PL (parameter-container gathers
by data index arrays) compile via tile_autodiff="auto" and recover their
generating parameters through the full SMC sampler on the TPU.

Run with SMCNUTS_TEST_TPU=1 (conftest pins CPU otherwise). Compile time
and per-leaf cost are printed so STATUS.md can cite them.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smcnuts_tpu import SMCConfig, run_smc
from smcnuts_tpu.stan import compile_stan_program
from smcnuts_tpu.utils.timing import fresh_keys, materialize

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="TPU e2e: wild models through the whole-tree Pallas kernel",
)

SV_SRC = """
data { int<lower=1> T; vector[T] y; }
parameters {
  real mu; real<lower=-1, upper=1> phi_ar; real<lower=0> sigma;
  vector[T] h_std;
}
transformed parameters {
  vector[T] h;
  h[1] = mu + sigma * h_std[1] / sqrt(1 - phi_ar * phi_ar);
  for (t in 2:T) { h[t] = mu + phi_ar * (h[t-1] - mu) + sigma * h_std[t]; }
}
model {
  mu ~ normal(0, 5);
  sigma ~ cauchy(0, 2) T[0,];
  h_std ~ std_normal();
  y ~ normal(0, exp(h / 2));
}
"""

IRT_SRC = """
data {
  int<lower=1> I; int<lower=1> P; int<lower=1> N;
  array[N] int item; array[N] int person; vector[N] y;
}
parameters {
  vector[P] theta; vector<lower=0>[I] alpha; vector[I] beta;
}
model {
  theta ~ std_normal();
  alpha ~ lognormal(0, 0.5);
  beta ~ normal(0, 2);
  y ~ bernoulli_logit(alpha[item] .* (theta[person] - beta[item]));
}
"""


def _run_batch(model, cfg, runs=8):
    def one(key):
        r = run_smc(model, cfg, key)
        return r.mean_estimate[-1], r.ess[-1]

    f = jax.jit(jax.vmap(one))
    t0 = time.time()
    mean, ess = materialize(f(fresh_keys(runs)))
    compile_and_run_s = time.time() - t0
    return np.asarray(mean), np.asarray(ess), compile_and_run_s


def test_stochastic_volatility_tile_e2e():
    T = 40
    rng = np.random.default_rng(7)
    mu_true, phi_true, sig_true = -1.2, 0.9, 0.4
    h = np.empty(T)
    h[0] = mu_true + sig_true * rng.normal() / np.sqrt(1 - phi_true**2)
    for t in range(1, T):
        h[t] = mu_true + phi_true * (h[t - 1] - mu_true) + (
            sig_true * rng.normal()
        )
    y = np.exp(h / 2) * rng.normal(size=T)

    t0 = time.time()
    m = compile_stan_program(
        SV_SRC, {"T": T, "y": y.tolist()}, name="sv40", tile=True
    )
    build_s = time.time() - t0
    assert m.tile_model is not None
    cfg = SMCConfig(
        n_particles=512, n_iterations=30, step_size=0.05,
        tempering=True, max_tree_depth=6, save_history=False,
        nuts_backend="pallas",
    )
    mean, ess, wall = _run_batch(m, cfg)
    assert np.all(np.isfinite(mean))
    # constrained order: mu, phi_ar, sigma, h_std[40], h[40]
    mu_mc = mean[:, 0].mean()
    sig_mc = mean[:, 2].mean()
    print(
        f"SV T={T}: autodiff={m.tile_model.autodiff} build={build_s:.1f}s "
        f"compile+run={wall:.1f}s mu={mu_mc:.2f} sigma={sig_mc:.2f} "
        f"ess={ess.mean():.0f}"
    )
    # The T=40 SV posterior of mu is genuinely wide (its sd is O(1) with
    # phi_ar ~ 0.9); the meaningful on-chip check is agreement with the
    # XLA correctness-oracle backend at the same config, within the MC
    # spread of the 8-run batches.
    cfg_x = SMCConfig(
        n_particles=512, n_iterations=30, step_size=0.05,
        tempering=True, max_tree_depth=6, save_history=False,
        nuts_backend="xla",
    )
    mean_x, ess_x, wall_x = _run_batch(m, cfg_x)
    mu_x = mean_x[:, 0].mean()
    sig_x = mean_x[:, 2].mean()
    print(
        f"SV xla oracle: compile+run={wall_x:.1f}s mu={mu_x:.2f} "
        f"sigma={sig_x:.2f} ess={ess_x.mean():.0f}"
    )
    runs = mean.shape[0]
    for col in (0, 2):
        se = np.sqrt(
            mean[:, col].var(ddof=1) / runs
            + mean_x[:, col].var(ddof=1) / runs
        )
        delta = abs(mean[:, col].mean() - mean_x[:, col].mean())
        assert delta <= 5.0 * se + 0.05, (col, delta, se)
    assert ess.mean() > 32


def test_irt_2pl_tile_e2e():
    rng = np.random.default_rng(11)
    I, P, N = 6, 20, 240
    alpha_true = np.exp(rng.normal(0, 0.3, size=I))
    beta_true = rng.normal(0, 1.0, size=I)
    theta_true = rng.normal(0, 1.0, size=P)
    item = rng.integers(0, I, size=N)
    person = rng.integers(0, P, size=N)
    eta = alpha_true[item] * (theta_true[person] - beta_true[item])
    y = (rng.uniform(size=N) < 1 / (1 + np.exp(-eta))).astype(float)

    t0 = time.time()
    m = compile_stan_program(
        IRT_SRC,
        {"I": I, "P": P, "N": N, "item": (item + 1).tolist(),
         "person": (person + 1).tolist(), "y": y.tolist()},
        name="irt2pl", tile=True,
    )
    build_s = time.time() - t0
    assert m.tile_model is not None
    cfg = SMCConfig(
        n_particles=512, n_iterations=25, step_size=0.1,
        tempering=True, max_tree_depth=6, save_history=False,
        nuts_backend="pallas",
    )
    mean, ess, wall = _run_batch(m, cfg)
    assert np.all(np.isfinite(mean))
    # constrained order: theta[P], alpha[I], beta[I]
    beta_mc = mean[:, P + I:P + 2 * I].mean(axis=0)
    print(
        f"IRT 2PL: autodiff={m.tile_model.autodiff} build={build_s:.1f}s "
        f"compile+run={wall:.1f}s beta_corr="
        f"{np.corrcoef(beta_mc, beta_true)[0, 1]:.2f} ess={ess.mean():.0f}"
    )
    # difficulty recovery: strong rank correlation with the truth
    assert np.corrcoef(beta_mc, beta_true)[0, 1] > 0.7
    assert ess.mean() > 32


def test_irt_ar_wide_d_forward_tile_e2e():
    """Wide-D long-recurrence model through tile_autodiff='auto'
    (VERDICT r4 #6): D = 64 parameters with a T = 120 carried AR(1)
    recurrence — previously excluded from the Pallas path by the
    forward-mode D <= 24 cap. Auto must now select forward mode, the
    traced kernel must be sub-linear in D (the cross-pass CSE folds the
    64 re-traced primal chains to one; each item parameter's tangent is
    pruned to its own observations), and the full sampler must recover
    the generating item difficulties on-chip."""
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "examples", "stan", "irt_ar.json")) as f:
        data = json.load(f)
    b_true = np.asarray(data.pop("_b_true"))
    with open(os.path.join(root, "examples", "stan", "irt_ar.stan")) as f:
        src = f.read()

    t0 = time.time()
    m = compile_stan_program(src, data, name="irt_ar", tile=True)
    build_s = time.time() - t0
    assert m.dim == data["J"] + 4
    assert m.tile_model is not None
    assert m.tile_model.autodiff == "forward", (
        "auto should pick forward for a long recurrence at D=64"
    )
    # Sub-linear-in-D kernel: ops per recurrence step must be O(1), not
    # O(D). (Measured: 58 ops/step at D=64 vs 59 at D=16.)
    x_tiles = [jax.ShapeDtypeStruct((8, 128), jnp.float32)] * m.dim
    phi_t = jax.ShapeDtypeStruct((8, 128), jnp.float32)
    jaxpr = jax.make_jaxpr(
        lambda xt, p: m.tile_model.tile_fn((), xt, p)
    )(x_tiles, phi_t)
    n_ops = len(jaxpr.jaxpr.eqns)
    assert n_ops < 120 * data["T"], n_ops  # D*T would be ~460k pre-fix

    cfg = SMCConfig(
        n_particles=512, n_iterations=25, step_size=0.1,
        tempering=True, max_tree_depth=6, save_history=False,
        nuts_backend="pallas",
    )
    mean, ess, wall = _run_batch(m, cfg)
    assert np.all(np.isfinite(mean))
    b_mc = mean[:, :data["J"]].mean(axis=0)
    corr = np.corrcoef(b_mc, b_true)[0, 1]
    print(
        f"IRT-AR D={m.dim}: build={build_s:.1f}s kernel_ops={n_ops} "
        f"compile+run={wall:.1f}s b_corr={corr:.2f} ess={ess.mean():.0f}"
    )
    assert corr > 0.5
    assert ess.mean() > 32
