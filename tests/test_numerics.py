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
from smcnuts_tpu.ops import normalise_weights


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


def test_huge_stepsize_run_stays_finite():
    """Divergence-heavy regime: a grossly mis-tuned step size must leave all
    diagnostics finite (divergent trajectories freeze their particle)."""
    model = make_gaussian(np.zeros(2), np.full(2, 1e-4))  # narrow target
    cfg = SMCConfig(n_particles=64, n_iterations=4, step_size=5.0,
                    save_history=False, max_tree_depth=5)
    res = run_smc(model, cfg, jax.random.key(1))
    assert np.all(np.isfinite(np.asarray(res.mean_estimate)))
    assert np.all(np.isfinite(np.asarray(res.ess)))
