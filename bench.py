"""Headline benchmark: particle-iterations/s/chip on the arma model.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": R, "secondary": {...}}

The workload is the BASELINE.json reference config: arma Stan model, N=512
particles, K=100 SMC iterations, forwards-proposal L-kernel, step size 0.01,
max tree depth 10 — plus the same config on PRMwCD as a secondary metric (the
reference treats the two models symmetrically,
/root/reference/experiments/run_experiments.py:44-47). `vs_baseline` is the
speedup over the measured serial CPU baseline (the reference publishes no
numbers — SURVEY.md §6 — so the baseline is our reference-faithful serial
NumPy implementation, normalized per particle-iteration; its per-particle
cost is constant in N since the reference's hot loop is a serial Python for).

Measurement integrity (the round-1 number was ~1000x inflated — VERDICT.md
"What's weak" #1): on this machine `jax.block_until_ready` does NOT
synchronize on the axon relay transport, and the relay memoizes dispatches
with previously-seen (program, args) even across processes. All timing
therefore (a) uses PRNG keys derived from os.urandom per process, and
(b) times to HOST MATERIALIZATION of the outputs (np.asarray), the only
reliable sync point. A credibility guard rejects any "measurement" faster
than a few relay round trips.
"""

import json
import sys

import jax

from smcnuts_tpu.utils.timing import (
    RELAY_RTT_S,
    fresh_keys,
    time_materialized,
)

N = 512
K = 100
# Baseline workload: big enough to leave the cold-start regime (per
# particle-iteration cost RISES as the cloud warms and NUTS trees deepen —
# N=64/K=5 measures ~425 p-i/s vs ~700 at N=8/K=2), small enough that the
# serial NumPy implementation finishes in ~1.5 s per repeat. Still an
# UNDERestimate of the reference's per-p-i cost at the full K=100 config
# (trees deepen further), so the reported speedup stays conservative.
BASELINE_N = 64
BASELINE_K = 5
BASELINE_REPEATS = 3

# Independent SMC runs per dispatch (see measure_tpu docstring). 25 is the
# reference's own Monte-Carlo count (run_experiments.py:38).
N_RUNS = 25

# Any timed batch faster than this is a transport artifact (cache hit or
# missing synchronization), not a chip measurement: 25 runs cannot finish
# in fewer than a handful of relay round trips of device time.
MIN_CREDIBLE_S = 3 * RELAY_RTT_S


def measure_tpu(model_name, step_size, adapt_target=None):
    """Chip throughput over N_RUNS independent vmapped SMC runs at the
    baseline config, measured as the K-vs-4K MARGINAL: the same program is
    timed at K and 4K iterations (3 repeats each, fresh os.urandom keys,
    host materialization) and the per-iteration device time is
    (t_4K - t_K) / 3K — the fixed ~30-60 ms relay dispatch/transport floor
    cancels in the difference. Through round 4 this benchmark reported
    total wall time of the K=100 dispatch, which at ~75 ms of device work
    UNDER-reported the chip by the floor (r4: 12.24M wall-rate = ~17.1M
    marginal rate, same program); the marginal is the repo-wide timing
    doctrine (CLAUDE.md, utils/timing.py) and is what `value` now reports.
    `wall_s` (the old protocol's best K-dispatch time) is returned
    alongside and published in the JSON for cross-round comparability.
    The batch is jax.vmap'd: the NUTS kernel's custom_vmap rule collapses
    all runs into one multi-run kernel launch per iteration."""
    from smcnuts_tpu import SMCConfig, run_smc
    from smcnuts_tpu.models import get_model

    model = get_model(model_name)

    def batch(n_iters):
        cfg = SMCConfig(
            n_particles=N, n_iterations=n_iters, step_size=step_size,
            lkernel="forwardsLKernel", save_history=False,
            adapt_step_size=adapt_target is not None,
            adapt_mass_matrix=adapt_target is not None,
            target_accept=adapt_target if adapt_target is not None else 0.8,
        )

        def one(key):
            r = run_smc(model, cfg, key)
            return r.mean_estimate[-1], r.ess[-1]

        return jax.jit(jax.vmap(one))

    f_k = batch(K)
    best_k, _ = time_materialized(f_k, lambda: (fresh_keys(N_RUNS),),
                                  repeats=3)
    f_4k = batch(4 * K)
    best_4k, _ = time_materialized(f_4k, lambda: (fresh_keys(N_RUNS),),
                                   repeats=3)
    marginal_per_iter = max(best_4k - best_k, 1e-9) / (3 * K)
    if best_4k < MIN_CREDIBLE_S:
        raise RuntimeError(
            f"{model_name}: 4K-dispatch best={best_4k * 1e3:.1f}ms is below "
            f"the credibility floor ({MIN_CREDIBLE_S * 1e3:.0f}ms) — "
            "transport artifact, not a chip measurement"
        )
    return N_RUNS * N / marginal_per_iter, best_k


def measure_baseline():
    """Serial reference-style baseline: recursive NUTS, per-particle Python
    loop, pure NumPy/SciPy model (C-speed lfilter recurrences — a fair
    stand-in for BridgeStan's C++ log-density; BridgeStan's per-call FFI
    would be a few-fold faster per evaluation, so the reported speedup is
    conservative-to-moderate, not a dispatch artifact)."""
    import time

    from smcnuts_tpu.baselines.numpy_smc import NumpyArmaModel, run_numpy_smc

    model = NumpyArmaModel()
    best = float("inf")
    for rep in range(BASELINE_REPEATS):
        t0 = time.perf_counter()
        run_numpy_smc(
            model, BASELINE_N, BASELINE_K, 0.01,
            lkernel="forwardsLKernel", tempering=False, seed=rep,
        )
        best = min(best, time.perf_counter() - t0)
    return BASELINE_N * BASELINE_K / best


def main():
    value, best = measure_tpu("arma", step_size=0.01)
    print(f"# tpu arma: N={N} K={K} runs={N_RUNS} marginal-rate={value:.0f} "
          f"wall_K={best:.3f}s", file=sys.stderr)
    try:
        prm_value, prm_best = measure_tpu("prmwcd", step_size=0.01)
        print(f"# tpu prmwcd: N={N} K={K} runs={N_RUNS} best={prm_best:.3f}s",
              file=sys.stderr)
    except Exception as e:  # secondary metric failure must not kill the bench
        print(f"# prmwcd failed: {e}", file=sys.stderr)
        prm_value = None
    try:
        baseline_rate = measure_baseline()
        print(f"# baseline: {baseline_rate:.2f} particle-iters/s",
              file=sys.stderr)
        vs = value / baseline_rate
    except Exception as e:  # baseline failure must not kill the bench
        print(f"# baseline failed: {e}", file=sys.stderr)
        vs = None
    line = {
        "metric": "particle_iterations_per_s_chip_arma",
        "value": round(value, 1),
        "unit": "particle-iterations/s",
        "vs_baseline": round(vs, 2) if vs else None,
        "protocol": (
            "K-vs-4K marginal (dispatch floor cancels; repo timing "
            "doctrine). r4 and earlier reported K-dispatch wall time "
            "incl. the ~30-60ms relay floor: r4's 12.24M wall-rate "
            "corresponds to ~17.1M marginal on the same (uncompacted) "
            "program."
        ),
        "wall_rate_old_protocol": round(N_RUNS * N * K / best, 1),
    }
    if prm_value is not None:
        line["secondary"] = {
            "metric": "particle_iterations_per_s_chip_prmwcd",
            "value": round(prm_value, 1),
            "unit": "particle-iterations/s",
        }
        try:
            # Native adaptation headline (VERDICT r3 #2): dual-averaging
            # step size + diagonal mass matrix at acceptance target 0.5 —
            # the parity bands still pass at this setting
            # (experiments/output/adaptation.json) while trees shrink ~5x.
            prm_adapt, _ = measure_tpu(
                "prmwcd", step_size=0.01, adapt_target=0.5
            )
            line["secondary"]["adapted_value"] = round(prm_adapt, 1)
            line["secondary"]["adapted_note"] = (
                "with native step-size+mass adaptation (target_accept="
                "0.5), parity bands passing"
            )
        except Exception as e:
            print(f"# prmwcd adapted failed: {e}", file=sys.stderr)
    print(json.dumps(line))


if __name__ == "__main__":
    main()
