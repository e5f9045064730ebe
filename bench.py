"""Headline benchmark: particle-iterations/s/chip on the arma model.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": R}

The workload is the BASELINE.json reference config: arma Stan model, N=512
particles, K=100 SMC iterations, forwards-proposal L-kernel, step size 0.01,
max tree depth 10. `vs_baseline` is the speedup over the measured serial CPU
baseline (the reference publishes no numbers — SURVEY.md §6 — so the baseline
is our reference-faithful serial NumPy implementation, measured at a reduced
particle count and normalized per particle-iteration; its per-particle cost
is constant in N since the reference's hot loop is a serial Python for).
"""

import json
import sys
import time

import jax
import numpy as np

N = 512
K = 100
STEP = 0.01
BASELINE_N = 8
BASELINE_K = 2


# Independent SMC runs per dispatch (see measure_tpu docstring). 25 is the
# reference's own Monte-Carlo count (run_experiments.py:38).
N_RUNS = 25


def measure_tpu():
    """Throughput over N_RUNS independent full SMC runs executed in ONE
    device dispatch (lax.map over seeds). A single dispatch over the axon
    relay carries ~25 ms of host<->chip round-trip latency — 2x the actual
    device time of the whole reference-config run — so per-run wall time
    measures the link, not the chip. Amortizing over a batch of runs inside
    one program reports what the chip sustains (the production shape: many
    Monte-Carlo runs, as in the reference's 25-run experiment driver). The
    batch is jax.vmap'd: the NUTS kernel's custom_vmap rule collapses all
    runs into one multi-run kernel launch per iteration, and the SMC
    epilogue ops vectorize across runs."""
    from smcnuts_tpu import SMCConfig, run_smc
    from smcnuts_tpu.models import make_arma

    model = make_arma()
    cfg = SMCConfig(
        n_particles=N, n_iterations=K, step_size=STEP,
        lkernel="forwardsLKernel", save_history=False,
    )

    def one(key):
        r = run_smc(model, cfg, key)
        return r.mean_estimate[-1], r.ess[-1]

    f = jax.jit(jax.vmap(one))
    # Compile + warm up.
    jax.block_until_ready(f(jax.random.split(jax.random.key(0), N_RUNS)))
    times = []
    for i in range(3):
        # Fresh keys per repetition: the transport layer on some setups
        # (axon relay) memoizes dispatches with identical arguments, which
        # would make repeat timings fiction.
        keys = jax.random.split(jax.random.key(i + 1), N_RUNS)
        t0 = time.perf_counter()
        jax.block_until_ready(f(keys))
        times.append(time.perf_counter() - t0)
    best = min(times)
    return N_RUNS * N * K / best, best


def measure_baseline():
    """Serial reference-style baseline: recursive NUTS, per-particle Python
    loop, pure NumPy/SciPy model (C-speed lfilter recurrences — a fair
    stand-in for BridgeStan's C++ log-density; BridgeStan's per-call FFI
    would be a few-fold faster per evaluation, so the reported speedup is
    conservative-to-moderate, not a dispatch artifact)."""
    from smcnuts_tpu.baselines.numpy_smc import NumpyArmaModel, run_numpy_smc

    model = NumpyArmaModel()
    t0 = time.perf_counter()
    run_numpy_smc(
        model, BASELINE_N, BASELINE_K, STEP,
        lkernel="forwardsLKernel", tempering=False, seed=0,
    )
    elapsed = time.perf_counter() - t0
    return BASELINE_N * BASELINE_K / elapsed


def main():
    value, best = measure_tpu()
    print(f"# tpu: N={N} K={K} best={best:.3f}s", file=sys.stderr)
    try:
        baseline_rate = measure_baseline()
        print(f"# baseline: {baseline_rate:.2f} particle-iters/s", file=sys.stderr)
        vs = value / baseline_rate
    except Exception as e:  # baseline failure must not kill the bench
        print(f"# baseline failed: {e}", file=sys.stderr)
        vs = None
    print(
        json.dumps(
            {
                "metric": "particle_iterations_per_s_chip_arma",
                "value": round(value, 1),
                "unit": "particle-iterations/s",
                "vs_baseline": round(vs, 2) if vs else None,
            }
        )
    )


if __name__ == "__main__":
    main()
