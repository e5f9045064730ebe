"""Particle resampling schemes.

The reference resamples multinomially when ESS < N/2 (reference
smcnuts/samples/samples.py:116-146) and resets log-weights to
log_likelihood - log(N) so the normalizing-constant accumulator is preserved
(samples.py:143). Multinomial is kept for parity; systematic resampling is the
lower-variance default-quality addition called for by the build plan.

Both schemes are expressed as "draw N ancestor indices from wn", which under a
particle-sharded mesh becomes a cross-shard gather (XLA inserts the collective
ancestor exchange automatically under jit/GSPMD).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Below this particle count the CDF inversion uses a dense (N, N) compare +
# row-sum instead of binary search: jnp.searchsorted's default 'scan' method
# lowers to a sequential loop of gathers on TPU (~50 us/iteration at N=512,
# measured), while the dense compare fuses into a couple of VPU passes (~6x
# faster end-to-end at the reference config). Above the cutoff the
# 'sort'-based searchsorted (bitonic sort of the concatenated arrays — the
# TPU-friendly formulation) wins: 0.8/4.9/19.6 ms per inversion at
# N=32768/262144/1048576 vs 4/36/158 ms for the default method.
_DENSE_INVERT_MAX_N = 4096


def _invert_cdf(cdf, u):
    """Indices idx[i] = #{j : cdf[j] <= u[i]} == searchsorted(cdf, u,
    'right') for u drawn in [0, cdf[-1]) — exact f32 ties (measure ~2^-24)
    resolve identically on both paths."""
    if cdf.shape[0] <= _DENSE_INVERT_MAX_N:
        le = cdf[None, :] <= u[:, None]
        return jnp.sum(le.astype(jnp.int32), axis=1)
    return jnp.searchsorted(cdf, u, side="right", method="sort").astype(
        jnp.int32
    )


def multinomial_ancestors(key, wn):
    """IID multinomial ancestor draws (reference rng.choice, samples.py:138-139)
    via inverse-CDF: N iid uniforms inverted through the weight CDF.
    Distributionally identical to categorical sampling but O(N log N) instead
    of the (N, N) Gumbel matrix `jax.random.categorical` materializes."""
    n = wn.shape[0]
    cdf = jnp.cumsum(wn)
    u = jax.random.uniform(key, (n,), dtype=wn.dtype) * cdf[-1]
    return _invert_cdf(cdf, u)


def _ancestor_onehot(cdf, u):
    """Row-i one-hot at ancestor index #{j : cdf[j] <= u[i]} — exactly the
    dense _invert_cdf choice — as a bf16 (N, N) matrix, built from the
    telescoped compare differences (one-hot entries are 0/1, exact in
    bf16)."""
    le = (cdf[None, :] <= u[:, None]).astype(jnp.bfloat16)
    ones = jnp.ones((le.shape[0], 1), jnp.bfloat16)
    return jnp.concatenate([ones, le[:, :-1]], axis=1) - le


def _onehot_take_rows(oh, x):
    """x[ancestors] via one-hot matmul with the bf16x3 split — bitwise
    equal to jnp.take (three bf16 components carry 24 mantissa bits, and a
    one-hot row sums exactly one term) but ~20x faster on TPU at the
    reference scale, where XLA lowers a dynamic row gather to a serial
    element loop (measured 90 us vs 4 us per (25, 512, 4) resample)."""
    v = x if x.ndim == 2 else x[:, None]
    hi = v.astype(jnp.bfloat16)
    mid = (v - hi.astype(v.dtype)).astype(jnp.bfloat16)
    lo = (v - hi.astype(v.dtype) - mid.astype(v.dtype)).astype(
        jnp.bfloat16
    )
    out = (
        (oh @ hi).astype(v.dtype)
        + (oh @ mid).astype(v.dtype)
        + (oh @ lo).astype(v.dtype)
    )
    return out if x.ndim == 2 else out[:, 0]


def _take_rows_via_cdf(cdf, u, arrays):
    """Gather rows by the inverse-CDF ancestors of queries `u`: the exact
    one-hot MXU matmul below the dense cutoff (f32 only — bf16x3 carries
    exactly the f32 mantissa width; float64 keeps the gather), ancestors +
    jnp.take above it (the (N, N) one-hot would not fit, and large
    gathers amortize)."""
    n = cdf.shape[0]
    if n <= _DENSE_INVERT_MAX_N and all(
        a.dtype == jnp.float32 for a in arrays
    ):
        oh = _ancestor_onehot(cdf, u)
        return [_onehot_take_rows(oh, a) for a in arrays]
    ancestors = _invert_cdf(cdf, u)
    return [jnp.take(a, ancestors, axis=0) for a in arrays]


def multinomial_take_rows(key, wn, arrays):
    """Resample each array in `arrays` (shape (N,) or (N, D)) by one shared
    multinomial ancestor draw (same key -> same choices as
    multinomial_ancestors)."""
    n = wn.shape[0]
    cdf = jnp.cumsum(wn)
    u = jax.random.uniform(key, (n,), dtype=wn.dtype) * cdf[-1]
    return _take_rows_via_cdf(cdf, u, arrays)


def systematic_take_rows(key, wn, arrays):
    """Resample by one shared systematic ancestor draw (same key -> same
    choices as systematic_ancestors)."""
    n = wn.shape[0]
    u = jax.random.uniform(key, ())
    positions = ((jnp.arange(n) + u) / n).astype(wn.dtype)
    cdf = jnp.cumsum(wn)
    cdf = cdf / cdf[-1]
    return _take_rows_via_cdf(cdf, positions, arrays)


_SCHEME_TAKE_ROWS = {
    "multinomial": multinomial_take_rows,
    "systematic": systematic_take_rows,
}


def systematic_ancestors(key, wn):
    """Systematic (stratified with common uniform) ancestor draws.

    Positions (i + u)/N for one shared u ~ U[0,1) are inverted through the
    weight CDF; lower variance than multinomial at the same O(N) cost.
    """
    n = wn.shape[0]
    u = jax.random.uniform(key, ())
    positions = ((jnp.arange(n) + u) / n).astype(wn.dtype)
    cdf = jnp.cumsum(wn)
    cdf = cdf / cdf[-1]
    return _invert_cdf(cdf, positions)


_SCHEMES = {
    "multinomial": multinomial_ancestors,
    "systematic": systematic_ancestors,
}


def resample_if_required(key, x, logw, wn, log_likelihood, ess_val,
                         threshold_frac=0.5, scheme="multinomial",
                         conditional=False):
    """Conditionally resample (reference samples.py:116-146).

    Default: computes the resampled state unconditionally and selects with
    `where` (branchless — the right form under vmapped Monte-Carlo batches,
    where a lax.cond lowers to a both-branches select anyway).

    `conditional=True` wraps the resample in a real `lax.cond` so
    non-triggering iterations skip it entirely — the right form for LARGE
    sharded single runs, where the resample's cross-shard ancestor
    exchange (all-gather, ~24 bytes/particle — experiments/comm_roofline.py)
    is the dominant collective and ESS crosses the threshold only every few
    iterations. The trigger scalar is replicated across shards, so every
    shard takes the same branch. Identical results either way (same key,
    same draws when triggered).
    """
    n = x.shape[0]

    def _resampled(key, x, logw):
        (x_res,) = _SCHEME_TAKE_ROWS[scheme](key, wn, [x])
        logw_res = jnp.full(
            (n,), log_likelihood - jnp.log(n), dtype=logw.dtype
        )
        return x_res, logw_res

    do = ess_val < n * threshold_frac
    if conditional:
        x_out, logw_out = jax.lax.cond(
            do, _resampled, lambda k, xx, lw: (xx, lw), key, x, logw
        )
        return x_out, logw_out, do
    x_res, logw_res = _resampled(key, x, logw)
    x_out = jnp.where(do, x_res, x)
    logw_out = jnp.where(do, logw_res, logw)
    return x_out, logw_out, do
