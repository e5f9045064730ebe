"""NUTS kernel tests.

The hairy part of the iterative re-derivation is the checkpoint-based
sub-subtree U-turn detection. `TestCheckpointUTurn` drives both the iterative
slot logic (mirrored in numpy) and a literal recursive tree-walk oracle over
the SAME pre-generated leaf trajectories and asserts they stop at the same
leaf — exhaustively for depths 1..6 over many random trajectories.

Dynamics-level tests cover leapfrog reversibility/energy error and the
distributional property that matters for SMC correctness: a NUTS step leaves
the target invariant (chi^2/KS checks on a Gaussian).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as sps

from smcnuts_tpu.models import make_gaussian
from smcnuts_tpu.ops.nuts import hmc_accept_reject, nuts_batch, nuts_single


# ---------------------------------------------------------------------------
# Checkpoint U-turn logic vs recursive oracle
# ---------------------------------------------------------------------------


def turning(dx, r_a, r_b):
    return (np.dot(dx, r_a) < 0) or (np.dot(dx, r_b) < 0)


def recursive_first_stop(xs, rs, depth):
    """Walk the reference's build_tree recursion (reference nuts.py:114-150)
    over a pre-recorded leaf trajectory of 2^depth leaves (direction +1),
    returning the 1-based count of leaves consumed before the build stops due
    to an internal U-turn, or None if no stop. Divergence is not modelled
    (tested separately); only subtree U-turn structure is at stake here."""

    stop_at = [None]
    counter = [0]

    def build(depth):
        # Returns (first_leaf_idx, last_leaf_idx, stopped)
        if depth == 0:
            idx = counter[0]
            counter[0] += 1
            return idx, idx, False
        f1, l1, s1 = build(depth - 1)
        if s1:
            return f1, l1, True
        f2, l2, s2 = build(depth - 1)
        stopped = s2
        if not stopped:
            dx = xs[l2] - xs[f1]
            if turning(dx, rs[f1], rs[l2]):
                stopped = True
                if stop_at[0] is None:
                    stop_at[0] = l2
        else:
            if stop_at[0] is None:
                stop_at[0] = l2
        return f1, l2, stopped

    _, _, stopped = build(depth)
    if not stopped:
        return None
    return stop_at[0]


def iterative_first_stop(xs, rs, depth, max_depth=10):
    """Mirror of the kernel's checkpoint slot logic (ops/nuts.py
    _build_subtree) in plain numpy."""
    D = xs.shape[1]
    ckpt_x = np.zeros((max_depth + 1, D))
    ckpt_r = np.zeros((max_depth + 1, D))
    for leaf in range(2**depth):
        x1, r1 = xs[leaf], rs[leaf]
        if leaf % 2 == 0:
            idx_max = bin(leaf >> 1).count("1")
            ckpt_x[idx_max] = x1
            ckpt_r[idx_max] = r1
        else:
            idx_max = bin(leaf >> 1).count("1")
            trailing_ones = bin(leaf ^ (leaf + 1)).count("1") - 1
            idx_min = idx_max - trailing_ones + 1
            for i in range(idx_min, idx_max + 1):
                dx = x1 - ckpt_x[i]
                if turning(dx, ckpt_r[i], r1):
                    return leaf
    return None


class TestCheckpointUTurn:
    @pytest.mark.parametrize("depth", [1, 2, 3, 4, 5, 6])
    def test_matches_recursive_oracle(self, depth):
        rng = np.random.default_rng(depth)
        for trial in range(200):
            n = 2**depth
            # Random-walk trajectories give a healthy mix of U-turns.
            xs = np.cumsum(rng.normal(size=(n, 2)), axis=0)
            rs = rng.normal(size=(n, 2))
            rec = recursive_first_stop(xs, rs, depth)
            it = iterative_first_stop(xs, rs, depth)
            assert rec == it, (depth, trial, rec, it)


# ---------------------------------------------------------------------------
# Kernel-level checks: slot logic inside the jitted kernel agrees with numpy
# ---------------------------------------------------------------------------


def test_popcount_slot_math():
    from jax import lax

    for leaf in range(0, 128):
        idx_max_np = bin(leaf >> 1).count("1")
        got = int(lax.population_count(jnp.uint32(leaf >> 1)))
        assert got == idx_max_np
        t_np = bin(leaf ^ (leaf + 1)).count("1") - 1
        got_t = int(lax.population_count(jnp.uint32(leaf ^ (leaf + 1)))) - 1
        assert got_t == t_np


# ---------------------------------------------------------------------------
# Dynamics
# ---------------------------------------------------------------------------


def _std_normal_vg(theta):
    lp = -0.5 * jnp.sum(theta**2) - 0.5 * theta.shape[0] * jnp.log(2 * jnp.pi)
    return lp, -theta


class TestLeapfrog:
    def test_reversibility(self):
        from smcnuts_tpu.ops.nuts import _leapfrog

        x = jnp.asarray([0.3, -0.8])
        r = jnp.asarray([1.0, 0.5])
        _, g0 = _std_normal_vg(x)
        inv_mass = jnp.ones(2)
        eps = jnp.asarray(0.1)
        xf, rf, gf, _ = _leapfrog(_std_normal_vg, x, r, g0, 1.0, eps, inv_mass)
        xb, rb, _, _ = _leapfrog(_std_normal_vg, xf, rf, gf, -1.0, eps, inv_mass)
        np.testing.assert_allclose(np.asarray(xb), np.asarray(x), atol=1e-6)
        np.testing.assert_allclose(np.asarray(rb), np.asarray(r), atol=1e-6)

    def test_energy_error_scaling(self):
        from smcnuts_tpu.ops.nuts import _leapfrog

        inv_mass = jnp.ones(2)

        def energy_err(eps, steps):
            x = jnp.asarray([1.0, 0.0])
            r = jnp.asarray([0.0, 1.0])
            lp, g = _std_normal_vg(x)
            h0 = lp - 0.5 * jnp.sum(r * r)
            for _ in range(steps):
                x, r, g, lp = _leapfrog(
                    _std_normal_vg, x, r, g, 1.0, jnp.asarray(eps), inv_mass
                )
            h1 = lp - 0.5 * jnp.sum(r * r)
            return abs(float(h1 - h0))

        # Second-order integrator: halving eps (same horizon) ~ quarters error.
        e1 = energy_err(0.2, 50)
        e2 = energy_err(0.1, 100)
        assert e2 < e1 / 2.5


class TestNUTSInvariance:
    def test_gaussian_invariance(self):
        """x0 ~ N(0,1)^2, one NUTS step => x1 ~ N(0,1)^2 (Alg. 3 is a valid
        MCMC kernel for the target)."""
        n, d = 4096, 2
        key = jax.random.key(0)
        kx, kr, kn = jax.random.split(key, 3)
        x0 = jax.random.normal(kx, (n, d))
        r0 = jax.random.normal(kr, (n, d))
        keys = jax.random.split(kn, n)
        x1, r1, stats = jax.jit(
            lambda x, r, k: nuts_batch(_std_normal_vg, x, r, k, 0.3)
        )(x0, r0, keys)
        x1 = np.asarray(x1)
        assert np.all(np.isfinite(x1))
        # Moment checks (tolerances ~ 5 sigma for N=4096).
        assert abs(x1.mean()) < 5 / np.sqrt(n * d)
        assert abs(x1.var() - 1.0) < 5 * np.sqrt(2 / (n * d))
        # KS on the first coordinate.
        p = sps.kstest(x1[:, 0], "norm").pvalue
        assert p > 1e-3, p

    def test_moves_particles(self):
        n, d = 256, 2
        key = jax.random.key(1)
        kx, kr, kn = jax.random.split(key, 3)
        x0 = jax.random.normal(kx, (n, d))
        r0 = jax.random.normal(kr, (n, d))
        keys = jax.random.split(kn, n)
        x1, _, stats = nuts_batch(_std_normal_vg, x0, r0, keys, 0.3)
        moved = np.mean(np.all(np.asarray(x1) != np.asarray(x0), axis=1))
        assert moved > 0.9
        assert int(np.asarray(stats["depth"]).max()) >= 2

    def test_divergence_freezes_particle(self):
        """A divergent trajectory (huge step size on a narrow target) should
        leave the particle at (or revert to) its start, not explode."""

        def narrow_vg(theta):
            lp = -0.5 * jnp.sum(theta**2) * 1e6
            return lp, -theta * 1e6

        n, d = 16, 2
        x0 = 0.001 * jax.random.normal(jax.random.key(2), (n, d))
        r0 = jax.random.normal(jax.random.key(3), (n, d))
        keys = jax.random.split(jax.random.key(4), n)
        x1, _, stats = nuts_batch(narrow_vg, x0, r0, keys, 10.0)
        assert np.all(np.isfinite(np.asarray(x1)))

    def test_block_chunking_bit_identical(self):
        """`block_size` only bounds the lockstep domain (ops/nuts.nuts_batch):
        trajectories must be bit-identical to the unchunked path for any
        block size, including one that does not divide N (padding). Float
        summary stats (accept_stat, logp_prop) may differ at the ulp level
        because XLA fuses their reductions differently under lax.map."""
        n, d = 100, 3
        kx, kr, kn = jax.random.split(jax.random.key(13), 3)
        x0 = jax.random.normal(kx, (n, d))
        r0 = jax.random.normal(kr, (n, d))
        keys = jax.random.split(kn, n)
        ref = nuts_batch(_std_normal_vg, x0, r0, keys, 0.3, max_depth=5)
        for block in (32, 64, 100, 4096):
            got = nuts_batch(
                _std_normal_vg, x0, r0, keys, 0.3, max_depth=5,
                block_size=block,
            )
            np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
            np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(ref[1]))
            for name in ref[2]:
                want = np.asarray(ref[2][name])
                have = np.asarray(got[2][name])
                if np.issubdtype(want.dtype, np.floating):
                    np.testing.assert_allclose(
                        have, want, rtol=3e-6, atol=3e-6,
                        err_msg=f"stats[{name}] differs at block={block}",
                    )
                else:
                    np.testing.assert_array_equal(
                        have, want,
                        err_msg=f"stats[{name}] differs at block={block}",
                    )

    def test_max_depth_respected(self):
        n, d = 8, 2
        x0 = jax.random.normal(jax.random.key(5), (n, d))
        r0 = jax.random.normal(jax.random.key(6), (n, d))
        keys = jax.random.split(jax.random.key(7), n)
        _, _, stats = nuts_batch(_std_normal_vg, x0, r0, keys, 1e-4, max_depth=3)
        # depth counter stops at max_depth + 1 (post-increment, reference
        # nuts.py:107-110).
        assert int(np.asarray(stats["depth"]).max()) <= 4
        assert int(np.asarray(stats["leapfrogs"]).max()) <= 2**4


class TestAcceptReject:
    def test_vectorized_semantics(self):
        model = make_gaussian(np.zeros(2), np.ones(2))
        logp_b = lambda xx: model.logp_batch(xx, 1.0)
        n = 1024
        x = jax.random.normal(jax.random.key(8), (n, 2))
        r = jax.random.normal(jax.random.key(9), (n, 2))
        # Proposal = same point: H1 == H0, always accept.
        x_out, r_out, acc = hmc_accept_reject(logp_b, x, x, r, r, jax.random.key(10))
        assert np.all(np.asarray(acc))
        # Proposal with inf: always reject.
        x_inf = x.at[:, 0].set(jnp.inf)
        x_out, r_out, acc = hmc_accept_reject(
            logp_b, x, x_inf, r, r, jax.random.key(11)
        )
        assert not np.any(np.asarray(acc))
        np.testing.assert_array_equal(np.asarray(x_out), np.asarray(x))

    def test_detailed_balance_statistics(self):
        """Accept prob for a worse point must match min(1, exp(dH))."""
        model = make_gaussian(np.zeros(1), np.ones(1))
        logp_b = lambda xx: model.logp_batch(xx, 1.0)
        n = 20000
        x = jnp.zeros((n, 1))
        x_prime = jnp.ones((n, 1))  # dH = logp(1) - logp(0) = -0.5
        r = jnp.zeros((n, 1))
        _, _, acc = hmc_accept_reject(logp_b, x, x_prime, r, r, jax.random.key(12))
        rate = float(np.asarray(acc).mean())
        assert abs(rate - np.exp(-0.5)) < 0.01
