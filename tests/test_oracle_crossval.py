"""Cross-validation of the TPU sampler against the independent serial NumPy
oracle (smcnuts_tpu/baselines/numpy_smc.py): same model, same algorithm, fully
independent code paths and RNG streams. Agreement is statistical — both
samplers' posterior-moment estimates must land within Monte-Carlo error of
each other and of the analytic truth (the reference's own validation style,
SURVEY.md §4)."""

import jax
import numpy as np
import pytest

from smcnuts_tpu import SMCConfig, run_smc
from smcnuts_tpu.baselines.numpy_smc import NumpyModelAdapter, run_numpy_smc
from smcnuts_tpu.models import make_gaussian

MEAN = np.array([1.0, -2.0])
VAR = np.array([0.5, 2.0])


@pytest.mark.parametrize(
    "lkernel,tempering",
    [
        ("forwardsLKernel", False),
        ("asymptoticLKernel", True),
    ],
)
def test_oracle_crossval(lkernel, tempering):
    model = make_gaussian(MEAN, VAR, prior_var=np.ones(2))
    n, k = 192, 8

    jax_means = []
    for seed in range(3):
        cfg = SMCConfig(
            n_particles=n, n_iterations=k, step_size=0.5,
            lkernel=lkernel, tempering=tempering,
        )
        res = run_smc(model, cfg, jax.random.key(seed))
        jax_means.append(np.asarray(res.mean_estimate[-1]))

    adapter = NumpyModelAdapter(model)
    np_means = []
    for seed in range(3):
        out = run_numpy_smc(
            adapter, n, k, 0.5, lkernel=lkernel, tempering=tempering, seed=seed
        )
        np_means.append(out["mean_estimate"][-1])

    jm, nm = np.mean(jax_means, axis=0), np.mean(np_means, axis=0)
    # Both estimators near truth...
    np.testing.assert_allclose(jm, MEAN, atol=0.3)
    np.testing.assert_allclose(nm, MEAN, atol=0.3)
    # ...and near each other.
    np.testing.assert_allclose(jm, nm, atol=0.4)
