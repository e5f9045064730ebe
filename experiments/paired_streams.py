"""Common-random-numbers evidence for cross-strategy comparison
(VERDICT r3 #8).

The reference resets its RandomState so all three L-kernel strategies see
IDENTICAL random streams within a Monte-Carlo run
(/root/reference/experiments/run_experiments.py:106-107,142,155,168) — a
variance-reduction device for paired strategy comparison. This framework's
equivalent is structural: `run_experiments.py` hands every strategy the
SAME per-run key, and inside `run_smc` the per-iteration key chain
(split -> k_res, k_mom, k_nuts, k_acc) is data-independent, so paired runs
share the initial cloud, every momentum draw, every NUTS seed, and every
resampling draw until the dynamics themselves diverge.

This script QUANTIFIES the effect: for R runs it estimates the
across-strategy estimator difference (forwardsLKernel - GaussianApproxLKernel
final mean estimate) twice — once PAIRED (same key per run, the default) and
once UNPAIRED (independent keys) — and reports the variance of the
difference. CRN pairing helps exactly when Var_paired < Var_unpaired.

Usage: python experiments/paired_streams.py [-N 256] [-K 20] [--runs 12]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from smcnuts_tpu import SMCConfig, run_smc
from smcnuts_tpu.models import get_model
from smcnuts_tpu.utils.timing import materialize


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="arma")
    p.add_argument("-N", "--particles", type=int, default=256)
    p.add_argument("-K", "--iterations", type=int, default=20)
    p.add_argument("--runs", type=int, default=12)
    p.add_argument("--step-size", type=float, default=0.01)
    p.add_argument("--strategies", nargs=2,
                   default=["forwardsLKernel", "GaussianApproxLKernel"])
    p.add_argument("--output", default=None)
    args = p.parse_args(argv)

    model = get_model(args.model)

    def runner(lkernel):
        cfg = SMCConfig(
            n_particles=args.particles, n_iterations=args.iterations,
            step_size=args.step_size, lkernel=lkernel, save_history=False,
        )

        def one(key):
            return run_smc(model, cfg, key).mean_estimate[-1]

        return jax.jit(jax.vmap(one))

    f_a = runner(args.strategies[0])
    f_b = runner(args.strategies[1])

    keys = jnp.stack(
        [jax.random.key(11 * (i + 1)) for i in range(args.runs)]
    )
    keys_b_indep = jnp.stack(
        [jax.random.key(7919 * (i + 1) + 3) for i in range(args.runs)]
    )

    est_a = np.asarray(materialize(f_a(keys)))
    est_b_paired = np.asarray(materialize(f_b(keys)))
    est_b_indep = np.asarray(materialize(f_b(keys_b_indep)))

    d_paired = est_a - est_b_paired
    d_indep = est_a - est_b_indep
    var_paired = d_paired.var(axis=0, ddof=1)
    var_indep = d_indep.var(axis=0, ddof=1)

    out = {
        "model": args.model,
        "N": args.particles,
        "K": args.iterations,
        "runs": args.runs,
        "strategies": args.strategies,
        "var_paired_diff": [float(v) for v in var_paired],
        "var_indep_diff": [float(v) for v in var_indep],
        "variance_reduction_factor": [
            float(vi / max(vp, 1e-30))
            for vp, vi in zip(var_paired, var_indep)
        ],
        "mean_diff_paired": [float(v) for v in d_paired.mean(0)],
        "se_diff_paired": [
            float(v) for v in d_paired.std(0, ddof=1) / np.sqrt(args.runs)
        ],
        "se_diff_indep": [
            float(v) for v in d_indep.std(0, ddof=1) / np.sqrt(args.runs)
        ],
    }
    print(json.dumps(out, indent=1))
    if args.output:
        os.makedirs(os.path.dirname(os.path.abspath(args.output)),
                    exist_ok=True)
        with open(args.output, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
