"""Row/column orientation tracking in the Stan frontend (VERDICT r3 #4).

Stan's type system distinguishes vectors (columns) from row_vectors; the
frontend tracks orientation through a RowVector value tag. These programs
exercise the orientation-sensitive surface: `'`, row*column inner products,
column*row outer products, row*matrix, matrix-row indexing m[i],
append_row of transposed vectors, [..] row-vector literals and the [..]'
column idiom, declared row_vector data/locals, and user functions with
row_vector parameters. Each program's density is checked against numpy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smcnuts_tpu.stan import StanCompileError, compile_stan_program
from smcnuts_tpu.stan.math import RowVector

SQ2PI = np.log(2 * np.pi)


def lp_normal(y, mu, s=1.0):
    y, mu = np.broadcast_arrays(np.asarray(y, float), np.asarray(mu, float))
    return float(
        np.sum(-0.5 * ((y - mu) / s) ** 2 - np.log(s) - 0.5 * SQ2PI)
    )


def test_transpose_inner_outer():
    src = """
    data { int<lower=1> N; vector[N] v; vector[N] w; real y; real phi; }
    parameters { real a; }
    model {
      a ~ normal(0, 1);
      // row * column inner product
      y ~ normal(a * (v' * w), 1);
      // outer product consumed via trace: trace(v * w') = v' * w
      target += -0.5 * square(trace(v * w') - v' * w);
    }
    """
    rng = np.random.default_rng(0)
    v, w = rng.normal(size=4), rng.normal(size=4)
    m = compile_stan_program(
        src, {"N": 4, "v": v.tolist(), "w": w.tolist(), "y": 1.3},
        name="inner_outer",
    )
    a = 0.7
    want = (
        lp_normal(a, 0.0) + lp_normal(1.3, a * float(v @ w)) + 0.0
    )
    got = float(m.logp(jnp.asarray([a], jnp.float32), 1.0))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_matrix_row_indexing_and_row_times_vector():
    # m[i] is a row_vector; m[i] * beta is the per-row linear predictor.
    src = """
    data { int<lower=1> N; int<lower=1> P; matrix[N, P] X; vector[N] y;
           real phi; }
    parameters { vector[P] beta; }
    model {
      beta ~ normal(0, 1);
      for (n in 1:N) { y[n] ~ normal(X[n] * beta, 1); }
    }
    """
    rng = np.random.default_rng(1)
    X = rng.normal(size=(5, 3))
    y = rng.normal(size=5)
    m = compile_stan_program(
        src, {"N": 5, "P": 3, "X": X.tolist(), "y": y.tolist()},
        name="rowidx",
    )
    beta = np.array([0.2, -0.4, 0.5])
    want = lp_normal(beta, 0.0) + lp_normal(y, X @ beta)
    got = float(m.logp(jnp.asarray(beta, jnp.float32), 1.0))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_append_row_of_transposed_vectors():
    # The previously-documented limitation: building a matrix from row
    # vectors via append_row(r1', r2').
    src = """
    data { vector[3] a; vector[3] b; vector[2] y; real phi; }
    parameters { vector[3] beta; }
    model {
      matrix[2, 3] M = append_row(a', b');
      beta ~ normal(0, 1);
      y ~ normal(M * beta, 1);
    }
    """
    rng = np.random.default_rng(2)
    a, b = rng.normal(size=3), rng.normal(size=3)
    y = rng.normal(size=2)
    m = compile_stan_program(
        src, {"a": a.tolist(), "b": b.tolist(), "y": y.tolist()},
        name="approw",
    )
    beta = np.array([0.1, 0.3, -0.2])
    M = np.vstack([a, b])
    want = lp_normal(beta, 0.0) + lp_normal(y, M @ beta)
    got = float(m.logp(jnp.asarray(beta, jnp.float32), 1.0))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_row_vector_data_and_literals():
    src = """
    data { int<lower=1> P; row_vector[P] x; real y; real phi; }
    parameters { vector[P] beta; }
    model {
      beta ~ normal(0, 1);
      y ~ normal(x * beta, 1);
      // [..]' is the column-vector idiom; x' is a column
      target += -0.5 * squared_distance(x', [1.0, 2.0, 3.0]');
    }
    """
    x = np.array([0.5, -1.0, 2.0])
    m = compile_stan_program(
        src, {"P": 3, "x": x.tolist(), "y": 0.8}, name="rvdata"
    )
    beta = np.array([0.3, 0.1, -0.6])
    want = (
        lp_normal(beta, 0.0)
        + lp_normal(0.8, float(x @ beta))
        - 0.5 * float(np.sum((x - np.array([1.0, 2.0, 3.0])) ** 2))
    )
    got = float(m.logp(jnp.asarray(beta, jnp.float32), 1.0))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_row_vector_local_and_function_param():
    src = """
    functions {
      real rowdot(row_vector r, vector v) { return r * v; }
    }
    data { int<lower=1> P; matrix[2, P] X; real phi; }
    parameters { vector[P] beta; }
    model {
      row_vector[P] r;
      r = X[2];
      beta ~ normal(0, 1);
      target += -0.5 * square(rowdot(r, beta) - 1.0);
      // head/segment of a row keep row orientation
      target += head(r, 2) * segment(beta, 1, 2);
    }
    """
    rng = np.random.default_rng(3)
    X = rng.normal(size=(2, 3))
    m = compile_stan_program(
        src, {"P": 3, "X": X.tolist()}, name="rvlocal"
    )
    beta = np.array([0.4, -0.2, 0.9])
    want = (
        lp_normal(beta, 0.0)
        - 0.5 * (float(X[1] @ beta) - 1.0) ** 2
        + float(X[1, :2] @ beta[:2])
    )
    got = float(m.logp(jnp.asarray(beta, jnp.float32), 1.0))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_array_of_row_vectors():
    src = """
    data { int<lower=1> K; int<lower=1> P; array[K] row_vector[P] X;
           vector[K] y; real phi; }
    parameters { vector[P] beta; }
    model {
      beta ~ normal(0, 1);
      for (k in 1:K) { y[k] ~ normal(X[k] * beta, 1); }
    }
    """
    rng = np.random.default_rng(4)
    X = rng.normal(size=(4, 3))
    y = rng.normal(size=4)
    m = compile_stan_program(
        src, {"K": 4, "P": 3, "X": X.tolist(), "y": y.tolist()},
        name="arr_rv",
    )
    beta = np.array([0.1, 0.2, 0.3])
    want = lp_normal(beta, 0.0) + lp_normal(y, X @ beta)
    got = float(m.logp(jnp.asarray(beta, jnp.float32), 1.0))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_rowvec_literal_matrix_and_transpose_roundtrip():
    src = """
    data { real phi; }
    parameters { vector[2] beta; }
    model {
      matrix[2, 2] M = [[1.0, 2.0], [3.0, 4.0]];
      vector[2] v = [5.0, 6.0]';
      beta ~ normal(0, 1);
      target += -0.5 * squared_distance(M * beta, v);
      // (v')' round-trips to a column vector
      target += -0.5 * squared_distance((v')', v);
    }
    """
    m = compile_stan_program(src, {}, name="litmat")
    beta = np.array([0.5, -0.5])
    M = np.array([[1.0, 2.0], [3.0, 4.0]])
    v = np.array([5.0, 6.0])
    want = (
        lp_normal(beta, 0.0)
        - 0.5 * float(np.sum((M @ beta - v) ** 2))
        - 0.0
    )
    got = float(m.logp(jnp.asarray(beta, jnp.float32), 1.0))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_orientation_errors():
    # row * row is a Stan type error
    with pytest.raises(StanCompileError):
        compile_stan_program(
            """
            data { vector[2] a; vector[2] b; real phi; }
            parameters { real x; }
            model { x ~ normal(0, 1); target += a' * b'; }
            """,
            {"a": [1.0, 2.0], "b": [3.0, 4.0]},
        )
    # untagged vector * vector stays rejected
    with pytest.raises(StanCompileError):
        compile_stan_program(
            """
            data { vector[2] a; vector[2] b; real phi; }
            parameters { real x; }
            model { x ~ normal(0, 1); target += sum(a * b); }
            """,
            {"a": [1.0, 2.0], "b": [3.0, 4.0]},
        )
    # row_vector + vector mismatch is loud
    with pytest.raises(StanCompileError):
        compile_stan_program(
            """
            data { vector[2] a; vector[2] b; real phi; }
            parameters { real x; }
            model { x ~ normal(0, 1); target += sum(a' + b); }
            """,
            {"a": [1.0, 2.0], "b": [3.0, 4.0]},
        )


def test_rowvector_value_layer():
    # value-layer invariants used by the compiler
    rv = RowVector(jnp.asarray([1.0, 2.0, 3.0]))
    from smcnuts_tpu.stan.math import FUNCTIONS

    assert isinstance(FUNCTIONS["transpose"](jnp.ones(3)), RowVector)
    assert not isinstance(
        FUNCTIONS["transpose"](rv), RowVector
    )
    out = FUNCTIONS["append_row"](rv, rv)
    assert out.shape == (2, 3)
    out = FUNCTIONS["append_col"](rv, rv)
    assert isinstance(out, RowVector) and out.data.shape == (6,)
    assert isinstance(FUNCTIONS["row"](jnp.eye(3), 2), RowVector)
    assert isinstance(FUNCTIONS["head"](rv, 2), RowVector)


def test_gradients_flow_through_orientation():
    src = """
    data { int<lower=1> N; int<lower=1> P; matrix[N, P] X; vector[N] y;
           real phi; }
    parameters { vector[P] beta; }
    model {
      beta ~ normal(0, 1);
      for (n in 1:N) { y[n] ~ normal(X[n] * beta, 1); }
    }
    """
    rng = np.random.default_rng(5)
    X = rng.normal(size=(6, 3))
    y = rng.normal(size=6)
    m = compile_stan_program(
        src, {"N": 6, "P": 3, "X": X.tolist(), "y": y.tolist()},
        name="gradrow",
    )
    beta = jnp.asarray([0.3, -0.1, 0.8], jnp.float32)
    g = jax.grad(lambda t: m.logp(t, 1.0))(beta)
    bnp = np.asarray(beta, np.float64)
    want = -bnp + X.T @ (y - X @ bnp)
    np.testing.assert_allclose(np.asarray(g), want, rtol=1e-4, atol=1e-4)


def test_break_continue():
    # break/continue with data-derived conditions (unrolled loops)
    src = """
    data { int<lower=1> N; vector[N] y; real phi; }
    parameters { real mu; }
    model {
      mu ~ normal(0, 1);
      for (n in 1:N) {
        if (n > 3) { break; }
        if (n == 2) { continue; }
        y[n] ~ normal(mu, 1);
      }
      // while with break
      int k = 1;
      while (1) {
        if (k > 2) { break; }
        target += -0.1 * k;
        k += 1;
      }
    }
    """
    y = np.array([0.5, -0.2, 1.0, 2.0, 3.0])
    m = compile_stan_program(
        src, {"N": 5, "y": y.tolist()}, name="brkcont"
    )
    mu = 0.4
    want = (
        lp_normal(mu, 0.0)
        + lp_normal(y[0], mu)
        + lp_normal(y[2], mu)  # n=2 skipped by continue, n>3 broken
        - 0.1 * (1 + 2)
    )
    got = float(m.logp(jnp.asarray([mu], jnp.float32), 1.0))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_break_in_long_loop_falls_back_to_unroll():
    # a >=64-iteration loop with break cannot scan-lower; the unrolled
    # fallback must produce the correct density
    src = """
    data { int<lower=1> N; vector[N] y; real phi; }
    parameters { real mu; }
    model {
      mu ~ normal(0, 1);
      for (n in 1:N) {
        if (n > 10) { break; }
        y[n] ~ normal(mu, 1);
      }
    }
    """
    rng = np.random.default_rng(6)
    y = rng.normal(size=100)
    m = compile_stan_program(
        src, {"N": 100, "y": y.tolist()}, name="brklong"
    )
    mu = -0.3
    want = lp_normal(mu, 0.0) + lp_normal(y[:10], mu)
    got = float(m.logp(jnp.asarray([mu], jnp.float32), 1.0))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_integrate_1d():
    src = """
    functions {
      real integrand(real x, real xc, array[] real theta,
                     array[] real x_r, array[] int x_i) {
        return exp(-theta[1] * x);
      }
    }
    data { real b; real phi; }
    parameters { real<lower=0> lam; }
    model {
      real I = integrate_1d(integrand, 0.0, b, {lam}, {0.0}, {0});
      // exact: (1 - exp(-lam*b)) / lam
      target += -0.5 * square(I * lam - (1 - exp(-lam * b)));
      lam ~ normal(1, 1);
    }
    """
    m = compile_stan_program(src, {"b": 2.0}, name="int1d")
    # unconstrained u -> lam = exp(u); at the solution the penalty is 0,
    # so logp = normal_lpdf(lam|1,1) + jacobian(u)
    u = 0.3
    lam = np.exp(u)
    want = lp_normal(lam, 1.0) + u  # penalty term is exactly 0
    got = float(m.logp(jnp.asarray([u], jnp.float32), 1.0))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    g = jax.grad(lambda t: m.logp(t, 1.0))(jnp.asarray([u], jnp.float32))
    assert np.all(np.isfinite(np.asarray(g)))


def test_integrate_1d_infinite_bounds():
    """VERDICT r4 #8: semi-infinite and doubly-infinite integrate_1d bounds
    via the Stan-math variable changes (integrate_1d.hpp), on the fixed
    Gauss-Legendre rule. Exact values: int_0^inf exp(-lam x) = 1/lam;
    int_-inf^0 exp(x) = 1; int_-inf^inf N(x|0,1) = 1."""
    src = """
    functions {
      real decay(real x, real xc, array[] real theta,
                 array[] real x_r, array[] int x_i) {
        return exp(-theta[1] * x);
      }
      real rising(real x, real xc, array[] real theta,
                  array[] real x_r, array[] int x_i) {
        return exp(x);
      }
      real gauss(real x, real xc, array[] real theta,
                 array[] real x_r, array[] int x_i) {
        return exp(-0.5 * square(x - theta[1])) / sqrt(2 * pi());
      }
    }
    data { real phi; }
    parameters { real<lower=0> lam; }
    model {
      real I1 = integrate_1d(decay, 0.0, positive_infinity(),
                             {lam}, {0.0}, {0});
      real I2 = integrate_1d(rising, negative_infinity(), 0.0,
                             {lam}, {0.0}, {0});
      real I3 = integrate_1d(gauss, negative_infinity(),
                             positive_infinity(), {lam}, {0.0}, {0});
      target += -0.5 * square(I1 * lam - 1) - 0.5 * square(I2 - 1)
                - 0.5 * square(I3 - 1);
      lam ~ normal(1, 1);
    }
    """
    m = compile_stan_program(src, {}, name="int1d_inf")
    u = 0.3
    lam = np.exp(u)
    # all three penalty terms vanish at the exact integrals
    want = lp_normal(lam, 1.0) + u
    got = float(m.logp(jnp.asarray([u], jnp.float32), 1.0))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    g = jax.grad(lambda t: m.logp(t, 1.0))(jnp.asarray([u], jnp.float32))
    assert np.all(np.isfinite(np.asarray(g)))


def test_algebra_solver_newton():
    src = """
    functions {
      vector sq_system(vector y, array[] real theta,
                       array[] real x_r, array[] int x_i) {
        vector[1] z;
        z[1] = y[1] * y[1] - theta[1];
        return z;
      }
    }
    data { real phi; }
    parameters { real<lower=0> a; }
    model {
      vector[1] guess = [1.0]';
      vector[1] root = algebra_solver(sq_system, guess, {a}, {0.0}, {0});
      // root = sqrt(a); tie the density to it
      target += -0.5 * square(root[1] - 2.0);
      a ~ normal(4, 2);
    }
    """
    m = compile_stan_program(src, {}, name="algsolve")
    u = float(np.log(4.0))  # a = 4 -> root = 2 -> penalty 0
    want = lp_normal(4.0, 4.0, 2.0) + u
    got = float(m.logp(jnp.asarray([u], jnp.float32), 1.0))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    # gradient: d/du [-0.5 (sqrt(e^u) - 2)^2 + prior + u] finite & correct
    g = float(jax.grad(lambda t: m.logp(t, 1.0))(
        jnp.asarray([u], jnp.float32)
    )[0])
    # analytic: penalty'(u) = -(sqrt(a)-2) * 0.5*sqrt(a) = 0 at a=4;
    # prior'(u) = -(a-4)/4 * a = 0; jacobian' = 1
    np.testing.assert_allclose(g, 1.0, rtol=1e-3, atol=1e-3)


def test_rowvec_regression_example_e2e():
    """The committed row-vector regression example (the posteriordb
    linear-regression idiom: array[N] row_vector[K] covariates with
    x[n] * beta predictors) compiles and recovers its generating
    parameters through the full sampler on the CPU sim."""
    import os

    import jax

    from smcnuts_tpu import SMCConfig, run_smc
    from smcnuts_tpu.stan import compile_stan_file

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    m = compile_stan_file(
        os.path.join(root, "examples", "stan", "rowvec_regression.stan"),
        data=os.path.join(
            root, "examples", "stan", "rowvec_regression.json"
        ),
    )
    cfg = SMCConfig(
        n_particles=256, n_iterations=12, step_size=0.1,
        tempering=True, max_tree_depth=6, save_history=False,
    )
    res = jax.jit(lambda k: run_smc(m, cfg, k))(jax.random.key(3))
    mean = np.asarray(res.mean_estimate[-1])
    # constrained order: alpha, beta[3], sigma, gq y_pred
    assert abs(mean[0] - 0.8) < 0.3, mean
    np.testing.assert_allclose(
        mean[1:4], [1.2, -0.7, 0.4], atol=0.3
    )
    assert 0.3 < mean[4] < 0.8, mean


def test_tuples():
    """Stan 2.33 tuples: tuple(..) local declarations, (a, b) tuple
    expressions, t.1 member access (incl. through user functions and
    row-vector members)."""
    src = """
    data { real y; real phi; }
    parameters { real a; real b; }
    model {
      tuple(real, vector[2]) t = (a * 2, [a, b]');
      y ~ normal(t.1 + t.2[2], 1);
      tuple(real, real) s;
      s = (a + 1, b - 1);
      target += -0.5 * square(s.1 * s.2);
    }
    """
    m = compile_stan_program(src, {"y": 0.4}, name="tup")
    a, b = 0.3, -0.2
    want = (
        lp_normal(0.4, 2 * a + b)
        - 0.5 * ((a + 1) * (b - 1)) ** 2
    )
    got = float(m.logp(jnp.asarray([a, b], jnp.float32), 1.0))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    # rejection: tuple-typed parameters/data fail loudly
    with pytest.raises(StanCompileError):
        compile_stan_program(
            "parameters { tuple(real, real) t; } model { target += t.1; }",
            {},
        )
