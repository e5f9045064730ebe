"""Experiment IO and CLI surfaces: reference-compatible CSV naming, round
trips, and the module CLI on a tiny config."""

import json
import os
import subprocess
import sys

import jax
import numpy as np

from smcnuts_tpu import SMCConfig, run_smc
from smcnuts_tpu.models import make_gaussian
from smcnuts_tpu.utils.io import load_run_csvs, save_run_csvs


def test_csv_round_trip(tmp_path):
    model = make_gaussian(np.array([0.0, 1.0]), np.array([1.0, 2.0]))
    cfg = SMCConfig(n_particles=32, n_iterations=3, step_size=0.5,
                    save_history=False)
    res = run_smc(model, cfg, jax.random.key(0))
    out = save_run_csvs(res, "forward_lkernel", 0, str(tmp_path))
    # Reference naming (run_experiments.py:206-215).
    for name in ("mean_estimate", "var_estimate", "ess", "phi",
                 "acceptance_rate"):
        assert os.path.exists(os.path.join(out, f"{name}_0.csv")), name
    means = load_run_csvs(out, 1, "mean_estimate")
    np.testing.assert_allclose(
        means[0], np.asarray(res.mean_estimate), rtol=1e-5
    )


def test_checkpoint_round_trip(tmp_path):
    import jax.numpy as jnp

    from smcnuts_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    carry = (jnp.arange(4.0), jax.random.key(7), jnp.asarray(2, jnp.int32))
    path = os.path.join(tmp_path, "ck.npz")
    save_checkpoint(path, carry, 5, {"ess": np.array([1.0, 2.0])})
    restored, k_done, diags = load_checkpoint(path, carry)
    assert k_done == 5
    np.testing.assert_array_equal(np.asarray(restored[0]), np.arange(4.0))
    assert jax.random.key_data(restored[1]).tolist() == jax.random.key_data(
        carry[1]
    ).tolist()
    np.testing.assert_array_equal(diags["ess"], [1.0, 2.0])


def test_cli_smoke(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))) + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    out_npz = os.path.join(tmp_path, "diag.npz")
    proc = subprocess.run(
        [sys.executable, "-m", "smcnuts_tpu", "--model", "arma",
         "-N", "16", "-K", "2", "--max-tree-depth", "2",
         "--output", out_npz],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    payload, _ = json.JSONDecoder().raw_decode(
        proc.stdout[proc.stdout.index("{"):]
    )
    assert payload["N"] == 16 and len(payload["mean"]) == 4
    assert os.path.exists(out_npz)
    data = np.load(out_npz)
    assert data["ess"].shape == (3,)
