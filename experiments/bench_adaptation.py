"""Adaptation as a measured headline (BASELINE.md native-feature target;
reference future work, /root/reference/README.md:66-67).

For each model, runs R Monte-Carlo replicas at the BASELINE shape under
(a) the reference's fixed step size and (b) native dual-averaging step-size
+ diagonal mass-matrix adaptation, and reports per mode:

- mean leapfrogs per particle-iteration and total leapfrog (= model
  gradient) evaluations — the cost currency of NUTS;
- wall time and particle-iterations/s (honest protocol: vmapped batch,
  os.urandom keys, host-materialization sync — utils/timing.py);
- whether the final MC-mean estimates sit inside the PARITY.md band
  criterion (3 MC-se + 0.1 posterior-sd for means, 3 MC-se + 40% for
  variances — experiments/parity_summary.py), so the speedup is only
  claimed at equal estimator quality.

Writes experiments/output/adaptation.json.

Usage: python experiments/bench_adaptation.py [--models arma prmwcd]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from smcnuts_tpu import SMCConfig, run_smc
from smcnuts_tpu.models import get_model
from smcnuts_tpu.utils.timing import fresh_keys, materialize, time_materialized

from parity_summary import ground_truth, mean_band, var_band


def measure(model_name, mode, runs, n, k, step, seed0=10,
            target_accept=0.8):
    """`mode`: 'fixed' | 'adapt' (step + mass) | 'adapt_step' |
    'mass_only'. `step` is the initial (or fixed) step size;
    `target_accept` feeds dual averaging."""
    model = get_model(model_name)
    cfg = SMCConfig(
        n_particles=n, n_iterations=k, step_size=step,
        save_history=False,
        adapt_step_size=mode in ("adapt", "adapt_step"),
        adapt_mass_matrix=mode in ("adapt", "mass_only"),
        target_accept=target_accept,
    )

    def one(key):
        r = run_smc(model, cfg, key)
        return {
            "mean": r.mean_estimate[-1],
            "var": r.variance_estimate[-1],
            "leapfrogs": r.tree_leapfrogs,
            "step_size": r.step_size[-1],
            "ess": r.ess[-1],
        }

    batched = jax.jit(jax.vmap(one))
    keys = jax.numpy.stack(
        [jax.random.key(seed0 * (i + 1)) for i in range(runs)]
    )
    out = materialize(batched(keys))
    dt, _ = time_materialized(
        batched, lambda: (fresh_keys(runs),), repeats=2, warmup=False
    )

    gt_mean, gt_var = ground_truth(model_name)
    fm, fv = np.asarray(out["mean"]), np.asarray(out["var"])
    mc_mean, mc_sd = fm.mean(0), fm.std(0, ddof=1)
    mc_vmean, mc_vsd = fv.mean(0), fv.std(0, ddof=1)
    band = mean_band(mc_sd, runs, gt_var)
    vband = var_band(mc_vsd, runs, gt_var)
    # leapfrogs: (R, K+1) per-particle means; index K repeats K-1 (sampler
    # diagnostics quirk), so sum the first K entries only.
    lf = np.asarray(out["leapfrogs"])[:, :-1]
    mean_lf_per_iter = float(lf.mean())
    total_lf = float(lf.sum(axis=1).mean() * n)
    return {
        "model": model_name,
        "mode": mode,
        "target_accept": target_accept,
        "runs": runs,
        "N": n,
        "K": k,
        "initial_step_size": step,
        "final_step_size": float(np.asarray(out["step_size"]).mean()),
        "mean_leapfrogs_per_particle_iter": round(mean_lf_per_iter, 2),
        "total_gradient_evals_per_run": round(total_lf),
        "batch_run_s": round(dt, 3),
        "particle_iters_per_s": round(runs * n * k / dt),
        "mean_within_band": bool((np.abs(mc_mean - gt_mean) <= band).all()),
        "var_within_band": bool((np.abs(mc_vmean - gt_var) <= vband).all()),
        "mc_mean": [round(float(v), 4) for v in mc_mean],
        "final_ess_mean": round(float(np.asarray(out["ess"]).mean()), 1),
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--models", nargs="+", default=["arma", "prmwcd"])
    p.add_argument("--runs", type=int, default=5)
    p.add_argument("-N", "--particles", type=int, default=512)
    p.add_argument("-K", "--iterations", type=int, default=100)
    p.add_argument("--step-size", type=float, default=0.01)
    p.add_argument("--seed0", type=int, default=10,
                   help="run i uses seed0*(i+1); pick a FRESH value when "
                   "re-validating after a sampler change (the relay "
                   "memoizes previously-seen (program, args) dispatches)")
    p.add_argument("--output", default=None)
    args = p.parse_args(argv)

    # Acceptance-target sweep per model (VERDICT r3 #2): the default 0.8
    # target is right for arma (its optimum is step >> scale, trees of
    # depth 1-2), but PRMwCD's deep trees want a LOWER target — 0.5 lets
    # dual averaging raise the step ~6.4x and cuts leapfrogs/iteration
    # ~5x while the parity bands still pass (measured sweep, round 4).
    targets = {"arma": (0.8,), "prmwcd": (0.8, 0.6, 0.5)}
    rows = []
    for model in args.models:
        row = measure(model, "fixed", args.runs, args.particles,
                      args.iterations, args.step_size, seed0=args.seed0)
        rows.append(row)
        print(json.dumps(row))
        for ta in targets.get(model, (0.8,)):
            row = measure(model, "adapt", args.runs, args.particles,
                          args.iterations, args.step_size,
                          seed0=args.seed0, target_accept=ta)
            rows.append(row)
            print(json.dumps(row))
    for model in args.models:
        fixed = next(r for r in rows
                     if r["model"] == model and r["mode"] == "fixed")
        # best adapted row by throughput among band-passing targets
        ad = max(
            (r for r in rows
             if r["model"] == model and r["mode"] == "adapt"
             and r["mean_within_band"] and r["var_within_band"]),
            key=lambda r: r["particle_iters_per_s"],
            default=next(r for r in rows if r["model"] == model
                         and r["mode"] == "adapt"),
        )
        if ad["total_gradient_evals_per_run"]:
            print(
                f"{model}: adaptation uses "
                f"{fixed['total_gradient_evals_per_run'] / ad['total_gradient_evals_per_run']:.1f}x"
                f" fewer gradient evals, "
                f"{ad['particle_iters_per_s'] / fixed['particle_iters_per_s']:.1f}x"
                f" throughput (bands: fixed "
                f"{fixed['mean_within_band']}/{fixed['var_within_band']}, "
                f"adapt {ad['mean_within_band']}/{ad['var_within_band']})"
            )

    out_path = args.output or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "output",
        "adaptation.json",
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
