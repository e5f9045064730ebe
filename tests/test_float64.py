"""float64 validation path (VERDICT r3 #9): run the same SMC config in f32
and f64 on CPU and bound the f32 numerical error empirically against the
Monte-Carlo error — retiring guesswork around the cached-loglik recovery
(`cached_loglik_min_phi`) by showing the f32 moments sit well inside the
f64 run's MC spread.

x64 is enabled in a SUBPROCESS (jax_enable_x64 is global process state;
flipping it in-process would poison every other test's compiled cache).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

_SCRIPT = r"""
import json, sys
import jax, jax.numpy as jnp, numpy as np
from smcnuts_tpu import SMCConfig, run_smc
from smcnuts_tpu.models import get_model

model_name, dtype, tempering, runs = sys.argv[1:5]
runs = int(runs)
m = get_model(model_name)
cfg = SMCConfig(
    n_particles=256, n_iterations=20, step_size=0.01, dtype=dtype,
    tempering=tempering == "1", nuts_backend="xla", save_history=False,
)

def one(key):
    r = run_smc(m, cfg, key)
    return r.mean_estimate[-1], r.variance_estimate[-1]

f = jax.jit(jax.vmap(one))
keys = jnp.stack([jax.random.key(7 * (i + 1)) for i in range(runs)])
mean, var = f(keys)
print(json.dumps({
    "mean": np.asarray(mean, np.float64).tolist(),
    "var": np.asarray(var, np.float64).tolist(),
}))
"""


def _run(model, dtype, tempering, runs=5):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)
    ))
    env.pop("PALLAS_AXON_POOL_IPS", None)
    if dtype == "float64":
        env["JAX_ENABLE_X64"] = "1"
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT, model, dtype,
         "1" if tempering else "0", str(runs)],
        capture_output=True, text=True, env=env, timeout=1200,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


@pytest.mark.slow
@pytest.mark.parametrize("model,tempering", [
    ("arma", False),
    # eightschools with tempering exercises the small-phi cached-loglik
    # recovery (peaked-likelihood analog with an exactly-known model)
    ("eightschools", True),
])
def test_f32_matches_f64_within_mc_error(model, tempering):
    r32 = _run(model, "float32", tempering)
    r64 = _run(model, "float64", tempering)
    m32 = np.asarray(r32["mean"])  # (runs, CD)
    m64 = np.asarray(r64["mean"])
    runs = m32.shape[0]
    # the f32-vs-f64 shift of the MC average must be consistent with zero
    # at the COMBINED MC standard error (each precision contributes its
    # own independent RNG realizations of the same posterior)
    se = np.sqrt(
        m32.var(axis=0, ddof=1) / runs + m64.var(axis=0, ddof=1) / runs
    )
    delta = np.abs(m32.mean(0) - m64.mean(0))
    assert np.all(delta <= 4.0 * se + 1e-3), (delta, se)
    v32, v64 = np.asarray(r32["var"]), np.asarray(r64["var"])
    vse = np.sqrt(
        v32.var(axis=0, ddof=1) / runs + v64.var(axis=0, ddof=1) / runs
    )
    vdelta = np.abs(v32.mean(0) - v64.mean(0))
    assert np.all(vdelta <= 4.0 * vse + 0.05 * np.abs(v64.mean(0)) + 1e-3)
