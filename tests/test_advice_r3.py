"""Regression tests for the round-3 advisor findings (ADVICE.md):

1. to_vector / to_row_vector flatten matrices COLUMN-major (Stan's
   convention) and round-trip with to_matrix.
2. Multi-index gathers accept concrete jax integer arrays (e.g. the output
   of sort_indices_asc computed in transformed data).
3. choose / lchoose are 0 / -inf outside 0 <= k <= n instead of lgamma
   inf/nan.
4. Discrete lcdf/lccdf (poisson, binomial, neg_binomial_2, bernoulli)
   return -inf / 0 for y < 0 instead of nan.
5. Truncated sampling statements have a scalarized per-element lowering in
   tile mode that matches the broadcast XLA form.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from smcnuts_tpu.stan import compile_stan_program
from smcnuts_tpu.stan.math import (
    ELEMENTWISE_LCCDFS,
    ELEMENTWISE_LCDFS,
    FUNCTIONS,
)


def test_to_vector_column_major_roundtrip():
    m = np.arange(1.0, 7.0).reshape(2, 3)
    want = m.T.ravel()  # column-major
    np.testing.assert_allclose(np.asarray(FUNCTIONS["to_vector"](m)), want)
    # to_row_vector carries the row-orientation tag
    np.testing.assert_allclose(
        np.asarray(FUNCTIONS["to_row_vector"](m).data), want
    )
    # round-trips with to_matrix's column-major fill
    back = FUNCTIONS["to_matrix"](FUNCTIONS["to_vector"](m), 2, 3)
    np.testing.assert_allclose(np.asarray(back), m)
    # 1-D input unchanged
    v = np.array([3.0, 1.0, 2.0])
    np.testing.assert_allclose(np.asarray(FUNCTIONS["to_vector"](v)), v)


def test_to_vector_in_program_matches_positional_data():
    # to_vector(matrix) paired with positionally aligned data: the density
    # must consume elements in Stan's column-major order.
    src = """
    data { matrix[2, 3] M; vector[6] y; real phi; }
    parameters { real a; }
    model {
      a ~ normal(0, 1);
      y ~ normal(a * to_vector(M), 1);
    }
    """
    M = np.arange(1.0, 7.0).reshape(2, 3)
    y = np.array([0.5, -1.0, 2.0, 0.0, 1.0, -0.5])
    m = compile_stan_program(
        src, {"M": M.tolist(), "y": y.tolist()}, name="tovec"
    )
    a = 0.3
    want = -0.5 * a * a - float(
        0.5 * np.sum((y - a * M.T.ravel()) ** 2)
        + 6 * 0.5 * np.log(2 * np.pi)
    ) - 0.5 * np.log(2 * np.pi)
    got = float(m.logp(jnp.asarray([a], jnp.float32), 1.0))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_concrete_jax_int_array_multi_index():
    # sort_indices_asc returns a jax array; using it as a gather index in
    # transformed data must compile (previously raised via _require_int).
    src = """
    data { int<lower=1> N; vector[N] x; vector[N] y; real phi; }
    transformed data {
      array[N] int ord = sort_indices_asc(x);
      vector[N] ys = y[ord];
    }
    parameters { real mu; }
    model {
      mu ~ normal(0, 1);
      ys ~ normal(mu, 1);
    }
    """
    rng = np.random.default_rng(0)
    x = rng.normal(size=5)
    y = rng.normal(size=5)
    m = compile_stan_program(
        src, {"N": 5, "x": x.tolist(), "y": y.tolist()}, name="jaxidx"
    )
    mu = 0.2
    ys = y[np.argsort(x)]
    want = (
        -0.5 * mu * mu - 0.5 * np.log(2 * np.pi)
        - 0.5 * np.sum((ys - mu) ** 2) - 5 * 0.5 * np.log(2 * np.pi)
    )
    got = float(m.logp(jnp.asarray([mu], jnp.float32), 1.0))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_choose_lchoose_out_of_support():
    assert float(FUNCTIONS["choose"](5, 2)) == 10.0
    assert float(FUNCTIONS["choose"](3, 5)) == 0.0
    assert float(FUNCTIONS["choose"](5, -1)) == 0.0
    assert np.isneginf(float(FUNCTIONS["lchoose"](3, 5)))
    assert np.isneginf(float(FUNCTIONS["lchoose"](5, -1)))
    np.testing.assert_allclose(
        float(FUNCTIONS["lchoose"](10, 4)), np.log(210.0), rtol=1e-6
    )
    # no nan anywhere in a mixed vector
    vals = FUNCTIONS["choose"](
        np.array([5.0, 3.0, 5.0]), np.array([2.0, 5.0, -1.0])
    )
    assert not np.any(np.isnan(np.asarray(vals)))


@pytest.mark.parametrize(
    "fam,args",
    [
        ("poisson", (3.0,)),
        ("binomial", (10.0, 0.3)),
        ("neg_binomial_2", (3.0, 2.0)),
        ("bernoulli", (0.4,)),
    ],
)
def test_discrete_cdf_negative_support(fam, args):
    lcdf = float(ELEMENTWISE_LCDFS[fam](-1.0, *args))
    lccdf = float(ELEMENTWISE_LCCDFS[fam](-1.0, *args))
    assert np.isneginf(lcdf), f"{fam} lcdf(-1) = {lcdf}"
    assert lccdf == 0.0, f"{fam} lccdf(-1) = {lccdf}"
    # in-support values still match scipy
    import scipy.stats as st

    if fam == "poisson":
        want = np.log(st.poisson.cdf(2, 3.0))
        got = float(ELEMENTWISE_LCDFS[fam](2.0, *args))
    elif fam == "binomial":
        want = np.log(st.binom.cdf(3, 10, 0.3))
        got = float(ELEMENTWISE_LCDFS[fam](3.0, *args))
    elif fam == "neg_binomial_2":
        # NB2(mu=3, phi=2) == nbinom(n=phi, p=phi/(phi+mu))
        want = np.log(st.nbinom.cdf(2, 2.0, 2.0 / 5.0))
        got = float(ELEMENTWISE_LCDFS[fam](2.0, *args))
    else:
        want = np.log(st.bernoulli.cdf(0, 0.4))
        got = float(ELEMENTWISE_LCDFS[fam](0.0, *args))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_truncated_sampling_scalarized_matches_xla():
    src = """
    data { int<lower=1> N; vector[N] y; vector[N] lo; real phi; }
    parameters { real mu; real<lower=0> s; }
    model {
      mu ~ normal(0, 5);
      for (n in 1:N) { y[n] ~ normal(mu, s) T[lo[n], 4.5]; }
    }
    """
    rng = np.random.default_rng(3)
    lo = rng.uniform(-2.0, -1.0, size=6)
    y = rng.uniform(-0.5, 2.0, size=6)
    data = {"N": 6, "y": y.tolist(), "lo": lo.tolist()}
    m_plain = compile_stan_program(src, data, name="trunc_plain")
    m_tile = compile_stan_program(src, data, name="trunc_tile", tile=True)
    th = jnp.asarray([0.4, -0.3], jnp.float32)
    want = float(m_plain.logp(th, 0.8))
    tiles = [jnp.full((8, 128), v, jnp.float32) for v in (0.4, -0.3)]
    lp, grads = m_tile.tile_model.tile_fn(
        (), tiles, jnp.full((8, 128), 0.8, jnp.float32)
    )
    np.testing.assert_allclose(float(np.asarray(lp)[0, 0]), want, rtol=1e-4)
    # gradients agree with the plain path too
    import jax

    g = jax.grad(lambda t: m_plain.logp(t, 0.8))(th)
    for d in range(2):
        np.testing.assert_allclose(
            float(np.asarray(grads[d])[0, 0]), float(g[d]), rtol=1e-3,
            atol=1e-5,
        )
