"""Numerical-robustness tests (the reference's nearest analog is errstate
suppression and -inf exception mapping, SURVEY.md §5 "Race detection /
sanitizers"): the happy path must be NaN-free under jax_debug_nans, and
pathological particles (-inf weights, divergent positions) must degrade
gracefully at particle level rather than poisoning the ensemble."""

import jax
import jax.numpy as jnp
import numpy as np

from smcnuts_tpu import SMCConfig, run_smc
from smcnuts_tpu.models import make_gaussian
from smcnuts_tpu.models.base import LOG_SQRT_2PI
from smcnuts_tpu.ops import normalise_weights
from smcnuts_tpu.sampler import _recover_loglik


def test_debug_nans_clean_run():
    """A healthy run must not trip the NaN checker."""
    model = make_gaussian(np.array([0.5, -0.5]), np.array([1.0, 2.0]))
    cfg = SMCConfig(n_particles=64, n_iterations=4, step_size=0.5,
                    save_history=False, max_tree_depth=5)
    with jax.debug_nans(True):
        res = run_smc(model, cfg, jax.random.key(0))
        jax.block_until_ready(res.mean_estimate)
    assert np.all(np.isfinite(np.asarray(res.mean_estimate)))


def test_neginf_particles_degrade_gracefully():
    """Particles with -inf weight are dropped by the masked normalization
    (reference samples.py:96-102 semantics) without NaN-ing the estimates."""
    logw = jnp.asarray([0.0, -jnp.inf, 0.5, -jnp.inf, 1.0])
    wn, ll = normalise_weights(logw)
    assert np.isfinite(float(ll))
    assert np.all(np.isfinite(np.asarray(wn)))
    np.testing.assert_allclose(float(jnp.sum(wn)), 1.0, rtol=1e-6)


class TestSmallPhiLoglikGuard:
    """The tree-cache recovery loglik = (logp(x, phi) - logprior(x)) / phi
    amplifies the f32 rounding of the cached log-density by 1/phi
    (sampler._recover_loglik). A peaked likelihood drives the first bisected
    temperature to ~1e-4..1e-6 where that error would enter the phi=1
    reweights unscaled; below cfg.cached_loglik_min_phi the sampler must
    re-evaluate loglik directly instead."""

    # Cancellation regime: at a bisected small phi, phi*loglik is O(1) or
    # below while |logprior| stays O(D), so logp(x, phi) - logprior(x)
    # cancels to ~eps*|logprior| absolute error, amplified by 1/phi. Direct
    # evaluation only carries eps*|loglik|.
    mean = np.array([1.5, -0.5])
    var = np.array([4e-2, 4e-2])

    def _true_loglik_f64(self, x):
        x = np.asarray(x, dtype=np.float64)
        t = np.sum(
            -0.5 * (x - self.mean) ** 2 / self.var - 0.5 * np.log(self.var),
            axis=1,
        ) - x.shape[1] * LOG_SQRT_2PI
        p = np.sum(-0.5 * x**2, axis=1) - x.shape[1] * LOG_SQRT_2PI
        return t - p

    def test_guarded_recovery_beats_cached_division(self):
        model = make_gaussian(self.mean, self.var, prior_var=np.ones(2))
        x = jax.random.normal(jax.random.key(3), (64, 2))
        phi = jnp.float32(1e-5)
        # What the tree caches: the tempered log-density computed in f32.
        logp_at_phi = model.logp_batch(x, phi)
        true_ll = self._true_loglik_f64(x)

        cached = np.asarray(
            (logp_at_phi - model.logprior_batch(x)) / phi, dtype=np.float64
        )
        guarded = np.asarray(
            _recover_loglik(model, phi, logp_at_phi, x, min_phi=1e-2),
            dtype=np.float64,
        )
        err_cached = np.max(np.abs(cached - true_ll))
        err_guarded = np.max(np.abs(guarded - true_ll))
        # The division path is dominated by eps*|logp|/phi (~O(1) or worse
        # here); the direct path only carries f32 rounding of loglik itself.
        assert err_guarded < err_cached / 100.0, (err_guarded, err_cached)
        assert err_guarded < 1e-5 * np.max(np.abs(true_ll))
        # Above the threshold the cached division must be returned untouched.
        same = _recover_loglik(
            model, jnp.float32(0.5), logp_at_phi, x, min_phi=1e-2
        )
        np.testing.assert_array_equal(
            np.asarray(same),
            np.asarray((logp_at_phi - model.logprior_batch(x)) / 0.5),
        )

    def test_tempered_run_with_peaked_likelihood(self):
        """End-to-end: phi_0 lands deep inside the guarded regime and the
        reweights stay sane (finite diagnostics, mean pulled to the peak)."""
        mean = np.array([1.5, -0.5])
        var = np.array([1e-4, 1e-4])  # sd 0.01 -> phi_0 ~ 1e-4
        model = make_gaussian(mean, var, prior_var=np.ones(2))
        cfg = SMCConfig(
            n_particles=256, n_iterations=14, step_size=0.01,
            tempering=True, save_history=False, max_tree_depth=8,
        )
        res = run_smc(model, cfg, jax.random.key(11))
        phi = np.asarray(res.phi)
        assert phi[0] < 1e-2, phi[:4]  # guard regime actually exercised
        assert np.all(np.isfinite(np.asarray(res.mean_estimate)))
        assert np.all(np.isfinite(np.asarray(res.log_likelihood)))
        final_mean = np.asarray(res.mean_estimate[-1])
        np.testing.assert_allclose(final_mean, mean, atol=0.2)


def test_huge_stepsize_run_stays_finite():
    """Divergence-heavy regime: a grossly mis-tuned step size must leave all
    diagnostics finite (divergent trajectories freeze their particle)."""
    model = make_gaussian(np.zeros(2), np.full(2, 1e-4))  # narrow target
    cfg = SMCConfig(n_particles=64, n_iterations=4, step_size=5.0,
                    save_history=False, max_tree_depth=5)
    res = run_smc(model, cfg, jax.random.key(1))
    assert np.all(np.isfinite(np.asarray(res.mean_estimate)))
    assert np.all(np.isfinite(np.asarray(res.ess)))
