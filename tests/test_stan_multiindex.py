"""Stan multi-indexing (int-array gathers) and container-assembly builtins.

These are the idioms hierarchical "wild" Stan models lean on (varying
intercepts a[county], IRT item/person lookups, mixture log_mix, design
matrices via append_col/rep_matrix) that BridgeStan supports natively
(reference smcnuts/model/bridgestan.py:18).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

from smcnuts_tpu.stan import StanCompileError, compile_stan_program


def test_gather_data_vector():
    src = """
    data { int<lower=1> N; int<lower=1> M; array[M] int idx; vector[N] y; }
    parameters { real mu; }
    model { y[idx] ~ normal(mu, 1); }
    """
    yv = [0.1, 0.2, 0.3, 0.4, 0.5, 0.6]
    m = compile_stan_program(
        src, {"N": 6, "M": 3, "idx": [1, 3, 5], "y": yv}, name="g1"
    )
    want = stats.norm(0.25, 1).logpdf([0.1, 0.3, 0.5]).sum()
    np.testing.assert_allclose(
        float(m.logp(jnp.asarray([0.25], jnp.float32), 1.0)), want,
        rtol=1e-5,
    )


def test_gather_parameter_vector_radon_idiom():
    """Vectorized varying-intercepts likelihood: y ~ normal(a[county], s)."""
    src = """
    data { int<lower=1> N; int<lower=1> J; array[N] int county;
           vector[N] y; }
    parameters { vector[J] a; }
    model { y ~ normal(a[county], 1); }
    """
    county = [1, 2, 1, 3]
    yv = [0.1, 0.2, 0.3, 0.4]
    m = compile_stan_program(
        src, {"N": 4, "J": 3, "county": county, "y": yv}, name="g2"
    )
    av = np.array([0.5, -0.5, 1.0])
    want = stats.norm(av[np.array(county) - 1], 1).logpdf(yv).sum()
    np.testing.assert_allclose(
        float(m.logp(jnp.asarray(av, jnp.float32), 1.0)), want, rtol=1e-5
    )
    g = jax.grad(lambda t: m.logp(t, 1.0))(jnp.asarray(av, jnp.float32))
    # d/da_1: two observations hit county 1
    np.testing.assert_allclose(
        float(g[0]), (0.1 - 0.5) + (0.3 - 0.5), rtol=1e-4
    )


def test_gather_then_scalar_index_on_matrix():
    """A gather keeps its axis; a following scalar index must hit the NEXT
    original axis (X[rows, 2])."""
    src = """
    data { matrix[4, 2] X; array[2] int rows; }
    parameters { real m; }
    model { target += m + sum(X[rows, 2]); }
    """
    X = [[1.0, 10.0], [2.0, 20.0], [3.0, 30.0], [4.0, 40.0]]
    m = compile_stan_program(src, {"X": X, "rows": [1, 4]}, name="g3")
    np.testing.assert_allclose(
        float(m.logp(jnp.asarray([0.5], jnp.float32), 1.0)), 0.5 + 50.0,
        rtol=1e-6,
    )


def test_gather_out_of_bounds_rejected():
    src = """
    data { int<lower=1> N; array[2] int idx; vector[N] y; }
    parameters { real mu; }
    model { y[idx] ~ normal(mu, 1); }
    """
    with pytest.raises(StanCompileError, match="out of bounds"):
        compile_stan_program(
            src, {"N": 3, "idx": [1, 4], "y": [0.0, 0.0, 0.0]}, name="g4"
        )


def test_log_mix_binary_and_vector():
    src = """
    data { int<lower=1> N; vector[N] y; }
    parameters { real<lower=0, upper=1> lambda; real mu1; real mu2; }
    model {
      for (n in 1:N)
        target += log_mix(lambda, normal_lpdf(y[n] | mu1, 1),
                          normal_lpdf(y[n] | mu2, 1));
    }
    """
    y = np.random.default_rng(1).normal(size=12)
    m = compile_stan_program(src, {"N": 12, "y": y.tolist()}, name="mix")
    th = jnp.asarray([0.0, -0.5, 0.5], jnp.float32)  # inv_logit(0) = 0.5
    want = np.log(
        0.5 * stats.norm(-0.5, 1).pdf(y) + 0.5 * stats.norm(0.5, 1).pdf(y)
    ).sum() + np.log(0.25)  # logit-transform Jacobian at 0
    np.testing.assert_allclose(float(m.logp(th, 1.0)), want, rtol=1e-4)

    srcv = """
    data { int<lower=1> K; vector[K] lp; }
    parameters { simplex[K] w; }
    model { target += log_mix(w, lp); }
    """
    lp = [-1.0, -2.0, -0.5]
    mv = compile_stan_program(srcv, {"K": 3, "lp": lp}, name="mixv")
    m0 = compile_stan_program(
        srcv, {"K": 3, "lp": [0.0, 0.0, 0.0]}, name="mixv0"
    )
    v = jnp.asarray([0.2, -0.3], jnp.float32)
    w = np.asarray(mv.constrain(v))[:3]
    want_v = np.log(np.sum(w * np.exp(lp)))
    # difference strips the (identical) simplex Jacobian term
    got_v = float(mv.logp(v, 1.0)) - float(m0.logp(v, 1.0))
    np.testing.assert_allclose(got_v, want_v, rtol=1e-4)


def test_assembly_builtins():
    """append_row/append_col/rep_matrix/to_matrix (column-major) /
    log_diff_exp / columns_dot_product."""
    src = """
    data { int<lower=1> K; vector[K] v; }
    parameters { real a; }
    transformed parameters { vector[K + 1] w = append_row(a, v); }
    model {
      target += sum(w) + rep_matrix(a, 2, 2)[1, 1]
              + to_matrix(v, 1, 3)[1, 2] + log_diff_exp(0, a - 1)
              + columns_dot_product(append_col(v, v), append_col(v, v))[1]
              + rows_dot_product(rep_matrix(a, 2, 2),
                                 rep_matrix(1, 2, 2))[1];
    }
    """
    m = compile_stan_program(src, {"K": 3, "v": [1.0, 2.0, 3.0]}, name="ab")
    a = 0.5
    want = (
        (a + 6.0)          # sum(append_row(a, v))
        + a                # rep_matrix corner
        + 2.0              # to_matrix(v, 1, 3) is the row [1, 2, 3]
        + np.log(1.0 - np.exp(a - 1.0))
        + 14.0             # |v|^2 via column 1 of the stacked (3, 2)
        + 2.0 * a          # row dot of [a, a] . [1, 1]
    )
    np.testing.assert_allclose(
        float(m.logp(jnp.asarray([a], jnp.float32), 1.0)), want, rtol=1e-5
    )


def test_hierarchical_models_end_to_end():
    """Radon-style varying intercepts and an IRT 2PL — the two classic
    hierarchical idiom bundles — compile with finite logp and gradients."""
    radon = """
    data {
      int<lower=1> N; int<lower=1> J;
      array[N] int<lower=1, upper=J> county;
      vector[N] x; vector[N] y;
    }
    parameters {
      vector[J] a; real b; real mu_a;
      real<lower=0> sigma_a; real<lower=0> sigma_y;
    }
    model {
      mu_a ~ normal(0, 1);
      sigma_a ~ cauchy(0, 2.5) T[0,];
      sigma_y ~ cauchy(0, 2.5) T[0,];
      a ~ normal(mu_a, sigma_a);
      y ~ normal(a[county] + b * x, sigma_y);
    }
    """
    rng = np.random.default_rng(0)
    N, J = 30, 4
    data = {
        "N": N, "J": J,
        "county": rng.integers(1, J + 1, size=N).tolist(),
        "x": rng.normal(size=N).tolist(),
        "y": rng.normal(size=N).tolist(),
    }
    m = compile_stan_program(radon, data, name="radon")
    th = jnp.zeros((m.dim,), jnp.float32)
    assert np.isfinite(float(m.logp(th, 1.0)))
    g = jax.grad(lambda t: m.logp(t, 1.0))(th)
    assert np.all(np.isfinite(np.asarray(g)))

    irt = """
    data {
      int<lower=1> I; int<lower=1> P; int<lower=1> N;
      array[N] int item; array[N] int person; vector[N] y;
    }
    parameters {
      vector[P] theta; vector<lower=0>[I] alpha; vector[I] beta;
    }
    model {
      theta ~ std_normal();
      alpha ~ lognormal(0.5, 1);
      beta ~ normal(0, 3);
      y ~ bernoulli_logit(alpha[item] .* (theta[person] - beta[item]));
    }
    """
    I, P, Nn = 5, 8, 40
    data2 = {
        "I": I, "P": P, "N": Nn,
        "item": rng.integers(1, I + 1, size=Nn).tolist(),
        "person": rng.integers(1, P + 1, size=Nn).tolist(),
        "y": rng.integers(0, 2, size=Nn).astype(float).tolist(),
    }
    m2 = compile_stan_program(irt, data2, name="irt")
    th2 = jnp.full((m2.dim,), 0.1, jnp.float32)
    assert np.isfinite(float(m2.logp(th2, 1.0)))
    g2 = jax.grad(lambda t: m2.logp(t, 1.0))(th2)
    assert np.all(np.isfinite(np.asarray(g2)))


def test_array_and_row_vector_literals():
    """{a, b, c} array literals and [a, b]' row-vector literals; an
    all-int brace literal stays a static data index array."""
    src = """
    data { real y; }
    parameters { real a; real b; }
    model {
      vector[2] v = [a, b]';
      array[3] int pick = {1, 3, 2};
      vector[3] w = to_vector({y, a, b});
      y ~ normal(dot_product(v, v) + w[pick[2]], 1);
    }
    """
    m = compile_stan_program(src, {"y": 0.5}, name="lits")
    a, b = 0.3, -0.2
    want = stats.norm(a * a + b * b + b, 1).logpdf(0.5)
    np.testing.assert_allclose(
        float(m.logp(jnp.asarray([a, b], jnp.float32), 1.0)), want,
        rtol=1e-5,
    )


def test_gp_cov_exp_quad():
    """cov_exp_quad/add_diag against hand math, 1- and 2-input forms, and
    the full GP-regression logp against scipy's MVN."""
    gp = """
    data { int<lower=1> N; array[N] real x; vector[N] y; }
    parameters { real<lower=0> rho; real<lower=0> alpha;
                 real<lower=0> sigma; }
    model {
      matrix[N, N] K = add_diag(cov_exp_quad(x, alpha, rho), square(sigma));
      rho ~ inv_gamma(5, 5);
      alpha ~ std_normal();
      sigma ~ std_normal();
      y ~ multi_normal_cholesky(rep_vector(0, N), cholesky_decompose(K));
    }
    """
    N = 10
    x = np.linspace(0, 1, N)
    yg = np.sin(x * 5)
    m = compile_stan_program(
        gp, {"N": N, "x": x.tolist(), "y": yg.tolist()}, name="gp"
    )
    th = jnp.asarray([0.1, -0.2, -0.5], jnp.float32)
    rho, alpha, sigma = np.exp([0.1, -0.2, -0.5])
    K = alpha**2 * np.exp(
        -0.5 * (x[:, None] - x[None, :]) ** 2 / rho**2
    ) + np.eye(N) * sigma**2
    want = (
        stats.invgamma(5, scale=5).logpdf(rho)
        + stats.norm().logpdf(alpha)
        + stats.norm().logpdf(sigma)
        + (0.1 - 0.2 - 0.5)  # exp-transform Jacobians
        + stats.multivariate_normal(np.zeros(N), K).logpdf(yg)
    )
    np.testing.assert_allclose(float(m.logp(th, 1.0)), want, rtol=1e-4)
    g = jax.grad(lambda t: m.logp(t, 1.0))(th)
    assert np.all(np.isfinite(np.asarray(g)))

    gp2 = (
        "data { int<lower=1> N; array[N] real x; } parameters { real a; } "
        "model { target += a + cov_exp_quad(x, x, 1.0, 0.5)[1, 2]; }"
    )
    m2 = compile_stan_program(gp2, {"N": 3, "x": [0.0, 0.3, 1.0]},
                              name="gp2")
    np.testing.assert_allclose(
        float(m2.logp(jnp.asarray([0.2], jnp.float32), 1.0)),
        0.2 + np.exp(-0.5 * 0.09 / 0.25), rtol=1e-5,
    )


def test_stochastic_volatility_compiles():
    """The classic SV model (non-centered AR(1) log-volatility recurrence,
    half-Cauchy T[0,] prior, exp link) — finite logp + gradient."""
    sv = """
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
    T = 60
    y = (np.random.default_rng(2).normal(size=T) * 0.5).tolist()
    m = compile_stan_program(sv, {"T": T, "y": y}, name="sv")
    th = jnp.zeros((m.dim,), jnp.float32)
    assert m.dim == T + 3
    assert np.isfinite(float(m.logp(th, 1.0)))
    g = jax.grad(lambda t: m.logp(t, 1.0))(th)
    assert np.all(np.isfinite(np.asarray(g)))


def test_reduce_sum_serial_contract():
    """reduce_sum applies the partial-sum function to the whole slice
    (start=1, end=N) — the value it contracts to for any grainsize; the
    grainsize scheduling hint is ignored (particle vmap is our
    parallelism)."""
    rs = """
    functions {
      real partial_sum(array[] real y_slice, int start, int end, real mu) {
        return normal_lpdf(y_slice | mu, 1) + 0.0 * (end - start);
      }
    }
    data { int<lower=1> N; array[N] real y; }
    parameters { real mu; }
    model { target += reduce_sum(partial_sum, y, 1, mu); }
    """
    m = compile_stan_program(rs, {"N": 4, "y": [0.1, 0.2, 0.3, 0.4]},
                             name="rs")
    want = stats.norm(0.2, 1).logpdf([0.1, 0.2, 0.3, 0.4]).sum()
    np.testing.assert_allclose(
        float(m.logp(jnp.asarray([0.2], jnp.float32), 1.0)), want,
        rtol=1e-5,
    )
    with pytest.raises(StanCompileError, match="partial-sum"):
        compile_stan_program(
            "data { real y; } parameters { real m; } "
            "model { target += reduce_sum(nope, y, 1, m); }",
            {"y": 0.1}, name="rsbad",
        )


def test_transformed_data_and_manual_matrix_fill():
    src = """
    data { int<lower=1> N; array[N] real x; vector[N] y; }
    transformed data { real my = mean(y); }
    parameters { real<lower=0> rho; }
    model {
      matrix[N, N] K;
      for (i in 1:N) {
        for (j in 1:N) { K[i, j] = exp(-square(x[i] - x[j]) / rho); }
      }
      target += K[1, 2] + my + (N % 2);
    }
    """
    m = compile_stan_program(
        src, {"N": 3, "x": [0.0, 0.5, 1.0], "y": [1.0, 2.0, 3.0]},
        name="tdm",
    )
    want = np.exp(-0.25 / 1.0) + 2.0 + 1.0
    np.testing.assert_allclose(
        float(m.logp(jnp.asarray([0.0], jnp.float32), 1.0)), want,
        rtol=1e-5,
    )


def test_small_builtin_batch():
    """multiply_log/lmultiply (0*log0 = 0), lchoose/choose, step/int_step,
    fdim, hypot, sorts and rank."""
    src = """
    data { vector[4] v; }
    parameters { real a; }
    model {
      target += multiply_log(0, 0) + lmultiply(2, a)
              + lchoose(5, 2) + choose(5, 2)
              + step(a - 10) + int_step(a) + fdim(a, 0.1) + hypot(3, 4)
              + sort_asc(v)[1] + sort_desc(v)[1]
              + sort_indices_asc(v)[1] + rank(v, 2);
    }
    """
    v = [3.0, 1.0, 4.0, 1.5]
    m = compile_stan_program(src, {"v": v}, name="small")
    a = 0.5
    want = (
        0.0 + 2 * np.log(a) + np.log(10.0) + 10.0
        + 0.0 + 1.0 + (a - 0.1) + 5.0
        + 1.0 + 4.0     # sorted min / max
        + 2.0           # argmin position (1-based): v[2]=1.0
        + 0.0           # rank of v[2]=1.0: no element smaller
    )
    np.testing.assert_allclose(
        float(m.logp(jnp.asarray([a], jnp.float32), 1.0)), want, rtol=1e-5
    )


def test_map_rect_serial_contract():
    """map_rect jobs run serially in the trace (particle vmap is the
    parallelism); outputs concatenate in job order; the `data` parameter
    qualifier parses."""
    src = """
    functions {
      vector shard_ll(vector phi, vector theta, data array[] real x_r,
                      data array[] int x_i) {
        return [normal_lpdf(to_vector(x_r) | phi[1] + theta[1], 1)]';
      }
    }
    data { int<lower=1> J; int<lower=1> M; array[J, M] real y_sh;
           array[J, 1] int dummy; }
    parameters { real mu; array[J] vector[1] offs; }
    model {
      vector[J] lls = map_rect(shard_ll, [mu]', offs, y_sh, dummy);
      target += sum(lls);
    }
    """
    rng = np.random.default_rng(0)
    y = rng.normal(size=(3, 4))
    m = compile_stan_program(
        src,
        {"J": 3, "M": 4, "y_sh": y.tolist(), "dummy": [[0], [0], [0]]},
        name="mr",
    )
    th = jnp.asarray([0.2, 0.1, -0.1, 0.3], jnp.float32)
    want = sum(
        stats.norm(0.2 + o, 1).logpdf(y[j]).sum()
        for j, o in enumerate([0.1, -0.1, 0.3])
    )
    np.testing.assert_allclose(float(m.logp(th, 1.0)), want, rtol=1e-4)
    g = jax.grad(lambda t: m.logp(t, 1.0))(th)
    assert np.all(np.isfinite(np.asarray(g)))


def test_hmm_marginal_matches_enumeration():
    """Forward-algorithm hmm_marginal vs brute-force path enumeration,
    reachable from a .stan program with simplex-constrained rows."""
    import itertools

    rng = np.random.default_rng(0)
    K, T = 3, 5
    lo = rng.normal(size=(K, T))
    G = rng.dirichlet(np.ones(K), size=K)
    rho = rng.dirichlet(np.ones(K))
    total = -np.inf
    for path in itertools.product(range(K), repeat=T):
        lp = np.log(rho[path[0]]) + lo[path[0], 0]
        for t in range(1, T):
            lp += np.log(G[path[t - 1], path[t]]) + lo[path[t], t]
        total = np.logaddexp(total, lp)

    src = """
    data { int<lower=1> K; int<lower=1> T; matrix[K, T] log_omegas;
           matrix[K, K] Gamma; vector[K] rho; }
    parameters { real m; }
    model { target += m + hmm_marginal(log_omegas, Gamma, rho); }
    """
    m = compile_stan_program(
        src,
        {"K": K, "T": T, "log_omegas": lo.tolist(), "Gamma": G.tolist(),
         "rho": rho.tolist()},
        name="hmm",
    )
    np.testing.assert_allclose(
        float(m.logp(jnp.asarray([0.25], jnp.float32), 1.0)),
        0.25 + total, rtol=1e-4,
    )
