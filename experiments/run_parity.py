"""One-command full-scale parity evidence run (VERDICT r1 next-round #2).

Reproduces the reference's entire validation workflow at the BASELINE
config — 25 Monte-Carlo runs x 3 L-kernel strategies x {arma, PRMwCD},
N=512, K=100 — on the TPU with the runs vmap-batched per strategy
(reference experiments/run_experiments.py:38-47 methodology, scaled from
its N=100/K=15 to the BASELINE north-star shape), then renders the MC
mean +/- sd trajectories and log-MSE plots and writes the machine-readable
parity verdict summary per model.

    python experiments/run_parity.py --output parity

Artifacts per model under <output>/<model>/: per-run CSVs (untracked,
regenerable), <model>_mean.png, <model>_mse.png, <model>_summary.json.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import parity_summary
import plot_experiments
import run_experiments


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--output", default="parity")
    p.add_argument("--runs", type=int, default=25)
    p.add_argument("-N", "--particles", type=int, default=512)
    p.add_argument("-K", "--iterations", type=int, default=100)
    p.add_argument("--models", nargs="+", default=["arma", "prmwcd"])
    p.add_argument("--seed0", type=int, default=10,
                   help="run i uses seed0*(i+1). CAUTION when re-running "
                   "after a sampler change: the relay transport memoizes "
                   "previously-seen (program, args) dispatches, so reusing "
                   "the old seeds can silently return the OLD code's "
                   "results — pick a fresh seed0 to force real execution")
    args = p.parse_args(argv)

    for model in args.models:
        out = os.path.join(args.output, model)
        os.makedirs(out, exist_ok=True)
        run_experiments.main([
            "--model", model, "--runs", str(args.runs),
            "-N", str(args.particles), "-K", str(args.iterations),
            "--vmap-runs", "--output", out, "--seed0", str(args.seed0),
        ])
        plot_experiments.main([
            "--model", model, "--runs", str(args.runs), "--output", out,
        ])
        parity_summary.main([
            "--model", model, "--runs", str(args.runs), "--output", out,
        ])


if __name__ == "__main__":
    main()
