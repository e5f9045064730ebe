"""End-to-end sampler tests on the analytic Gaussian target: golden posterior
moments for all three L-kernel strategies, diagnostic series shapes/semantics
(reference smc_sampler.py:66-97 quirks), determinism, and adaptation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smcnuts_tpu import SMCConfig, SMCSampler, run_smc
from smcnuts_tpu.models import make_gaussian

MEAN = np.array([1.0, -2.0, 0.5])
VAR = np.array([0.5, 2.0, 1.0])


def _run(lkernel, tempering, n=512, k=15, seed=0, **cfg_kw):
    model = make_gaussian(MEAN, VAR, prior_var=np.full(3, 4.0))
    cfg = SMCConfig(
        n_particles=n, n_iterations=k, step_size=0.5,
        lkernel=lkernel, tempering=tempering, **cfg_kw,
    )
    return run_smc(model, cfg, jax.random.key(seed)), cfg


@pytest.mark.parametrize(
    "lkernel,tempering",
    [
        ("forwardsLKernel", False),
        ("GaussianApproxLKernel", False),
        ("asymptoticLKernel", True),
    ],
)
def test_gaussian_posterior_moments(lkernel, tempering):
    res, _ = _run(lkernel, tempering)
    mean = np.asarray(res.mean_estimate[-1])
    var = np.asarray(res.variance_estimate[-1])
    np.testing.assert_allclose(mean, MEAN, atol=0.25)
    np.testing.assert_allclose(var, VAR, rtol=0.35)


def test_diagnostics_shapes_and_quirks():
    res, cfg = _run("forwardsLKernel", False, n=128, k=7)
    k1 = cfg.n_iterations + 1
    assert res.mean_estimate.shape == (k1, 3)
    assert res.variance_estimate.shape == (k1, 3)
    assert res.ess.shape == (k1,)
    assert res.phi.shape == (k1,)
    # Reference quirk: acceptance at index K is 0 (x compared with itself
    # after the final state update, smc_sampler.py:97).
    assert float(res.acceptance_rate[-1]) == 0.0
    # Non-tempered: phi identically 1.
    np.testing.assert_array_equal(np.asarray(res.phi), np.ones(k1))
    assert res.x_saved.shape == (k1, 128, 3)
    assert res.logw_saved.shape == (k1, 128)


def test_tempering_schedule_monotone():
    res, _ = _run("asymptoticLKernel", True, n=256, k=10)
    phi = np.asarray(res.phi)
    assert phi[0] > 0.0
    assert np.all(np.diff(phi) >= -1e-6)
    assert phi[-1] == 1.0


def test_log_evidence_gaussian():
    """Tempered path: the log_likelihood accumulator estimates log N + log Z
    with Z = 1 for this prior/likelihood factorization. The reference's
    algorithm evaluates the tempered weight increment at the PRE-move
    positions (reference samples.py:177-180), which biases log Z low by a few
    tenths of a nat at aggressive (ESS-halving) temperature jumps — verified
    against the independent NumPy oracle in test_oracle_crossval. We assert
    the estimate lands in that band rather than at 0."""
    model = make_gaussian(MEAN, VAR, prior_var=np.ones(3))
    cfg = SMCConfig(
        n_particles=1024, n_iterations=10, step_size=0.5,
        lkernel="asymptoticLKernel", tempering=True,
    )
    res = run_smc(model, cfg, jax.random.key(3))
    lz = float(res.log_likelihood[-1]) - np.log(1024)
    assert -1.0 < lz < 0.3, lz


def test_determinism():
    r1, _ = _run("forwardsLKernel", False, n=64, k=5, seed=7)
    r2, _ = _run("forwardsLKernel", False, n=64, k=5, seed=7)
    np.testing.assert_array_equal(
        np.asarray(r1.mean_estimate), np.asarray(r2.mean_estimate)
    )
    r3, _ = _run("forwardsLKernel", False, n=64, k=5, seed=8)
    assert not np.array_equal(
        np.asarray(r1.mean_estimate), np.asarray(r3.mean_estimate)
    )


def test_resampling_triggers():
    res, _ = _run("asymptoticLKernel", True, n=128, k=8, seed=1)
    # Tempered init from broad prior draws: early iterations resample.
    assert bool(np.asarray(res.resampled).any())


def test_systematic_resampling_runs():
    res, _ = _run("forwardsLKernel", False, n=128, k=6, resampling="systematic")
    assert np.all(np.isfinite(np.asarray(res.mean_estimate)))


def test_save_history_off():
    res, _ = _run("forwardsLKernel", False, n=64, k=4, save_history=False)
    assert res.x_saved is None and res.logw_saved is None


def test_asymptotic_streaming_equals_postpass():
    """With save_history=False the asymptotic strategy streams the
    tempered-recycling estimator inside the scan (O(N*D) memory); estimates
    must match the saved-history post-pass key-for-key (both derive the per-k
    resample key as fold_in(k_post, k))."""
    res_post, _ = _run("asymptoticLKernel", True, n=128, k=8, seed=3)
    res_stream, _ = _run(
        "asymptoticLKernel", True, n=128, k=8, seed=3, save_history=False
    )
    assert res_stream.x_saved is None and res_stream.logw_saved is None
    # Same inputs + same keys; only the vmapped-vs-sequential compilation
    # differs, so allow ulp-level reduction reordering.
    np.testing.assert_allclose(
        np.asarray(res_stream.mean_estimate),
        np.asarray(res_post.mean_estimate), rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(res_stream.variance_estimate),
        np.asarray(res_post.variance_estimate), rtol=1e-5, atol=1e-5,
    )
    # Everything outside the estimator is untouched by the mode switch.
    np.testing.assert_array_equal(
        np.asarray(res_stream.phi), np.asarray(res_post.phi)
    )
    np.testing.assert_array_equal(
        np.asarray(res_stream.x_final), np.asarray(res_post.x_final)
    )


def test_unknown_strategy_raises():
    with pytest.raises(ValueError):
        SMCConfig(n_particles=8, n_iterations=2, step_size=0.5, lkernel="nope")


def test_adaptation_improves_acceptance():
    """Dual averaging should pull a mis-tuned step size toward the target
    acceptance statistic."""
    model = make_gaussian(MEAN, VAR)
    cfg = SMCConfig(
        n_particles=256, n_iterations=12, step_size=2.5,  # far too large
        lkernel="forwardsLKernel", adapt_step_size=True,
    )
    res = run_smc(model, cfg, jax.random.key(2))
    steps = np.asarray(res.step_size)
    assert steps[-1] < 2.5  # adapted downwards
    assert np.all(np.isfinite(np.asarray(res.mean_estimate)))


def test_mass_matrix_adaptation_runs():
    model = make_gaussian(MEAN, VAR)
    cfg = SMCConfig(
        n_particles=256, n_iterations=8, step_size=0.5,
        lkernel="forwardsLKernel", adapt_mass_matrix=True,
    )
    res = run_smc(model, cfg, jax.random.key(4))
    np.testing.assert_allclose(
        np.asarray(res.mean_estimate[-1]), MEAN, atol=0.4
    )


def test_class_api_reference_shape():
    model = make_gaussian(MEAN, VAR)
    smc = SMCSampler(
        K=5, N=64, target=model, step_size=0.5,
        lkernel="forwardsLKernel", tempering=False, seed=0,
    )
    smc.sample()
    assert smc.mean_estimate.shape == (6, 3)
    assert smc.run_time is not None
    assert smc.ess.shape == (6,)
    assert smc.phi.shape == (6,)
    assert smc.acceptance_rate.shape == (6,)
    assert smc.x_saved.shape == (6, 64, 3)


def test_show_progress_matches_silent_run(capsys):
    """show_progress (reference smc_sampler.py:109 tqdm) runs via jitted
    chunks; the results must match the monolithic program for the same
    seed, and progress output must actually be emitted."""
    model = make_gaussian(MEAN, VAR)
    kw = dict(K=7, N=64, target=model, step_size=0.5, seed=3)
    silent = SMCSampler(**kw)
    silent.sample()
    noisy = SMCSampler(**kw)
    noisy.sample(show_progress=True)
    np.testing.assert_allclose(
        noisy.mean_estimate, silent.mean_estimate, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(noisy.ess, silent.ess, rtol=1e-5, atol=1e-6)
    err = capsys.readouterr().err
    assert ("SMC" in err) or ("it" in err), err  # tqdm bar or fallback print


def test_full_normal_proposal():
    """FullNormalProposal (proposals.py) honors the reference's frozen
    scipy-multivariate-normal duck-type (reference samples.py:77,85): logpdf
    matches scipy, rvs reproduces mean/cov, and the sampler accepts it for
    BOTH the sample and momentum proposals."""
    from scipy.stats import multivariate_normal

    from smcnuts_tpu import FullNormalProposal

    mean = np.array([0.5, -1.0, 2.0])
    cov = np.array([
        [1.0, 0.4, 0.1],
        [0.4, 2.0, -0.3],
        [0.1, -0.3, 0.5],
    ])
    prop = FullNormalProposal(mean=tuple(mean), cov=tuple(map(tuple, cov)))

    x = np.random.default_rng(0).normal(size=(64, 3)).astype(np.float32)
    got = np.asarray(prop.logpdf(jnp.asarray(x)))
    want = multivariate_normal(mean, cov).logpdf(x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    draws = np.asarray(prop.rvs(jax.random.key(1), 200_000))
    np.testing.assert_allclose(draws.mean(axis=0), mean, atol=0.02)
    np.testing.assert_allclose(np.cov(draws.T), cov, atol=0.03)

    model = make_gaussian(MEAN, VAR, prior_var=np.full(3, 4.0))
    cfg = SMCConfig(n_particles=256, n_iterations=10, step_size=0.5)
    res = run_smc(
        model, cfg, jax.random.key(2),
        sample_proposal=FullNormalProposal(
            mean=(0.0, 0.0, 0.0),
            cov=((4.0, 0.5, 0.0), (0.5, 4.0, 0.0), (0.0, 0.0, 4.0)),
        ),
        momentum_proposal=FullNormalProposal(
            mean=(0.0, 0.0, 0.0),
            cov=((1.0, 0.2, 0.0), (0.2, 1.0, 0.0), (0.0, 0.0, 1.0)),
        ),
    )
    np.testing.assert_allclose(
        np.asarray(res.mean_estimate[-1]), MEAN, atol=0.3
    )
