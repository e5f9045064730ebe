"""Experiment output CSVs, compatible with the reference's evaluation layer.

Writes the same five per-run time series with the same file naming as the
reference's save_output (reference experiments/run_experiments.py:195-215):
mean_estimate_{i}.csv, var_estimate_{i}.csv, ess_{i}.csv, phi_{i}.csv,
acceptance_rate_{i}.csv under output_dir/<strategy>/ — so existing
plot_experiments-style tooling keeps working against this framework.
"""

from __future__ import annotations

import os

import numpy as np


def save_run_csvs(result, strategy: str, run_idx: int, output_dir: str):
    path = os.path.join(output_dir, strategy)
    os.makedirs(path, exist_ok=True)
    get = (
        result.__getitem__ if isinstance(result, dict)
        else lambda k: getattr(result, k)
    )
    series = {
        "mean_estimate": np.asarray(get("mean_estimate")),
        "var_estimate": np.asarray(get("variance_estimate")),
        "ess": np.asarray(get("ess")),
        "phi": np.asarray(get("phi")),
        "acceptance_rate": np.asarray(get("acceptance_rate")),
    }
    for name, arr in series.items():
        np.savetxt(
            os.path.join(path, f"{name}_{run_idx}.csv"), arr, delimiter=","
        )
    return path


def load_run_csvs(strategy_dir: str, n_runs: int, name: str = "mean_estimate"):
    """Load a series across MC runs -> (n_runs, K+1, ...) array."""
    runs = []
    for i in range(n_runs):
        runs.append(
            np.loadtxt(
                os.path.join(strategy_dir, f"{name}_{i}.csv"), delimiter=","
            )
        )
    return np.asarray(runs)
