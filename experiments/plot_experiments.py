"""Evaluation/plotting: MC-averaged estimator trajectories and MSE vs truth.

Counterpart of the reference's plot_experiments.py: loads per-run mean/var
CSVs for each strategy, forms Monte-Carlo mean +/- sd trajectories across
runs, and the per-iteration MSE against the Stan ground truth on a log scale,
emitting <model>_mean.png and <model>_mse.png.

Correction carried over from models/*.ground_truth: the reference's .params
third column is the posterior standard deviation, so the variance ground
truth is its square (the reference plots variance MSE against the raw
column — a mislabel).
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smcnuts_tpu.utils.io import load_run_csvs

STRATEGY_LABELS = {
    "forward_lkernel": "Forwards-proposal L-kernel",
    "gaussian_lkernel": "Gaussian-approx optimal L-kernel",
    "asymptotic_lkernel": "Asymptotic L-kernel (tempered)",
}


def ground_truth(model_name):
    if model_name == "arma":
        from smcnuts_tpu.models.arma import ground_truth as gt
    else:
        from smcnuts_tpu.models.prmwcd import ground_truth as gt
    return gt()


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="arma")
    p.add_argument("--runs", type=int, default=25)
    p.add_argument("--output", default=None)
    args = p.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    output_dir = args.output or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "output", args.model
    )
    gt_mean, gt_var = ground_truth(args.model)
    dim = len(gt_mean)

    strategies = [
        s for s in STRATEGY_LABELS if os.path.isdir(os.path.join(output_dir, s))
    ]
    if not strategies:
        raise SystemExit(f"No strategy outputs under {output_dir}")

    data = {}
    for s in strategies:
        sdir = os.path.join(output_dir, s)
        mean_runs = load_run_csvs(sdir, args.runs, "mean_estimate")
        var_runs = load_run_csvs(sdir, args.runs, "var_estimate")
        data[s] = (mean_runs, var_runs)

    k1 = next(iter(data.values()))[0].shape[1]
    iters = np.arange(k1)

    # --- MC mean +/- sd trajectories per parameter -------------------------
    ncols = min(dim, 4)
    nrows = (dim + ncols - 1) // ncols
    fig, axes = plt.subplots(
        nrows, ncols, figsize=(4 * ncols, 3 * nrows), squeeze=False
    )
    for d in range(dim):
        ax = axes[d // ncols][d % ncols]
        for s in strategies:
            mean_runs, _ = data[s]
            mc_mean = mean_runs[..., d].mean(axis=0)
            mc_sd = mean_runs[..., d].std(axis=0)
            ax.plot(iters, mc_mean, label=STRATEGY_LABELS[s])
            ax.fill_between(iters, mc_mean - mc_sd, mc_mean + mc_sd, alpha=0.2)
        ax.axhline(gt_mean[d], color="k", ls="--", lw=1)
        ax.set_title(f"param {d}")
        ax.set_xlabel("iteration")
    axes[0][0].legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(os.path.join(output_dir, f"{args.model}_mean.png"), dpi=120)

    # --- per-iteration MSE vs ground truth, log scale ----------------------
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 4))
    for s in strategies:
        mean_runs, var_runs = data[s]
        mse_mean = ((mean_runs - gt_mean) ** 2).mean(axis=(0, 2))
        mse_var = ((var_runs - gt_var) ** 2).mean(axis=(0, 2))
        ax1.semilogy(iters, mse_mean, label=STRATEGY_LABELS[s])
        ax2.semilogy(iters, mse_var, label=STRATEGY_LABELS[s])
    ax1.set_title("MSE of mean estimates")
    ax2.set_title("MSE of variance estimates")
    for ax in (ax1, ax2):
        ax.set_xlabel("iteration")
        ax.legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(os.path.join(output_dir, f"{args.model}_mse.png"), dpi=120)
    print(f"Wrote {args.model}_mean.png and {args.model}_mse.png to {output_dir}")


if __name__ == "__main__":
    main()
