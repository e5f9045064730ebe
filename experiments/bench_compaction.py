"""End-to-end measurement of Pallas NUTS lane compaction (VERDICT r4 #1).

For each candidate split set, run the BENCH workload shape (25 vmapped
Monte-Carlo SMC runs at N=512, forwards L-kernel, step 0.01) as one jitted
program and measure the marginal device time per SMC iteration with the
K-vs-4K protocol (utils/timing.py: fresh os.urandom keys, host
materialization, the ~60 ms relay dispatch floor cancels in the
difference). repeats >= 5 at marginal >= 45 ms per the round-4 jitter rule
(CLAUDE.md) — per-config marginals here are hundreds of ms.

Writes experiments/output/compaction.json.

Usage:
  python experiments/bench_compaction.py --model arma \
      --splits "" --splits 4 --splits 3,4 -K 300
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from smcnuts_tpu import SMCConfig, run_smc
from smcnuts_tpu.models import get_model
from smcnuts_tpu.utils.timing import fresh_keys, materialize

N = 512
N_RUNS = 25


def measure(model_name, splits, iters, repeats, step=0.01):
    model = get_model(model_name)

    def batch(n_iters):
        cfg = SMCConfig(
            n_particles=N, n_iterations=n_iters, step_size=step,
            lkernel="forwardsLKernel", save_history=False,
            pallas_compaction=splits if splits is not None else (),
        )

        def one(key):
            r = run_smc(model, cfg, key)
            return r.mean_estimate[-1], r.ess[-1]

        return jax.jit(jax.vmap(one))

    def timed(n_iters):
        f = batch(n_iters)
        materialize(f(fresh_keys(N_RUNS)))  # compile
        best = float("inf")
        for _ in range(repeats):
            keys = fresh_keys(N_RUNS)
            t0 = time.perf_counter()
            materialize(f(keys))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(iters)
    t4 = timed(4 * iters)
    marginal = max(t4 - t1, 1e-9) / (3 * iters)
    return {
        "splits": list(splits) if splits else [],
        "t_K_s": round(t1, 4),
        "t_4K_s": round(t4, 4),
        "marginal_us_per_iter": round(marginal * 1e6, 2),
        "particle_iters_per_s": round(N_RUNS * N / marginal, 1),
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="arma")
    p.add_argument("--splits", action="append", default=None,
                   help="comma-separated depths; empty string = no "
                   "compaction; repeatable")
    p.add_argument("-K", "--iters", type=int, default=300)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--step-size", type=float, default=0.01)
    p.add_argument("--tag", default=None)
    args = p.parse_args(argv)
    split_sets = []
    for s in args.splits or ["", "4"]:
        split_sets.append(
            tuple(int(v) for v in s.split(",") if v.strip()) if s else ()
        )

    rows = []
    for sp in split_sets:
        row = measure(args.model, sp, args.iters, args.repeats,
                      args.step_size)
        rows.append(row)
        print(json.dumps({"model": args.model, **row}), flush=True)

    base = next((r for r in rows if not r["splits"]), None)
    out = {
        "model": args.model,
        "iters": args.iters,
        "repeats": args.repeats,
        "workload": f"{N_RUNS} vmapped runs x N={N}, forwards L-kernel, "
        f"step {args.step_size}",
        "rows": rows,
    }
    if base:
        for r in rows:
            r["speedup_vs_uncompacted"] = round(
                base["marginal_us_per_iter"] / r["marginal_us_per_iter"], 3
            )
    os.makedirs("experiments/output", exist_ok=True)
    tag = args.tag or args.model
    path = f"experiments/output/compaction_{tag}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"# wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
