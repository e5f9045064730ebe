"""Command-line entry: `python -m smcnuts_tpu ...`.

Replaces the reference's edit-the-module-constants workflow
(reference experiments/run_experiments.py:38-47) with a proper CLI over the
typed SMCConfig.
"""

import argparse
import json

import jax
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(
        prog="smcnuts_tpu", description="TPU-native SMC-NUTS sampler"
    )
    p.add_argument("--model", default="arma",
                   help="arma | prmwcd | eightschools | logistic")
    p.add_argument("--stan", default=None, metavar="FILE.stan",
                   help="compile a Stan program as the target (overrides "
                        "--model); pair with --data")
    p.add_argument("--data", default=None, metavar="DATA.json",
                   help="Stan data JSON for --stan ('phi' in the data block "
                        "is bound as the tempering parameter)")
    p.add_argument("--stan-tile", action="store_true",
                   help="with --stan: also build the in-kernel tile model "
                        "so the program runs on the whole-tree Pallas NUTS "
                        "backend (loops fully unrolled in-kernel)")
    p.add_argument("-N", "--particles", type=int, default=512)
    p.add_argument("-K", "--iterations", type=int, default=100)
    p.add_argument("--step-size", type=float, default=None)
    p.add_argument(
        "--lkernel", default="forwardsLKernel",
        choices=["asymptoticLKernel", "forwardsLKernel", "GaussianApproxLKernel"],
    )
    p.add_argument("--tempering", action="store_true")
    p.add_argument("--resampling", default="multinomial",
                   choices=["multinomial", "systematic"])
    p.add_argument("--max-tree-depth", type=int, default=10)
    p.add_argument("--adapt-step-size", action="store_true")
    p.add_argument("--adapt-mass-matrix", action="store_true")
    p.add_argument("--nuts-backend", default="auto",
                   choices=["auto", "xla", "pallas"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--mesh", action="store_true",
                   help="shard particles over all local devices")
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint path (enables chunked resume-able run)")
    p.add_argument("--chunk-size", type=int, default=10)
    p.add_argument("--output", default=None, help="save diagnostics .npz here")
    args = p.parse_args(argv)

    from .config import SMCConfig
    from .models import get_model
    from .sampler import run_smc

    if args.stan is not None:
        from .stan import compile_stan_file

        model = compile_stan_file(args.stan, data=args.data,
                                  tile=args.stan_tile)
        args.model = model.name
        if args.step_size is None:
            args.step_size = 0.5
    else:
        model = get_model(args.model)
    if args.step_size is None:
        # Per-model configured step size; 0.5 when unconfigured (the
        # reference's default, run_experiments.py:87-90).
        if args.model == "arma":
            from .models.arma import default_step_size as dss

            args.step_size = dss()
        elif args.model.lower() == "prmwcd":
            from .models.prmwcd import default_step_size as dss

            args.step_size = dss()
        else:
            args.step_size = 0.5

    tempering = args.tempering or args.lkernel == "asymptoticLKernel"
    cfg = SMCConfig(
        n_particles=args.particles, n_iterations=args.iterations,
        step_size=args.step_size, lkernel=args.lkernel, tempering=tempering,
        resampling=args.resampling, max_tree_depth=args.max_tree_depth,
        adapt_step_size=args.adapt_step_size,
        adapt_mass_matrix=args.adapt_mass_matrix,
        save_history=args.lkernel == "asymptoticLKernel",
        nuts_backend=args.nuts_backend,
    )
    mesh = None
    if args.mesh:
        from .parallel import particle_mesh

        mesh = particle_mesh()

    key = jax.random.key(args.seed)
    if args.checkpoint:
        from .runner import ChunkedRunner

        result = ChunkedRunner(
            model, cfg, checkpoint_path=args.checkpoint,
            chunk_size=args.chunk_size, mesh=mesh,
        ).run(key)
    else:
        result = jax.jit(lambda k: run_smc(model, cfg, k, mesh=mesh))(key)
        result = jax.tree.map(
            lambda a: a.block_until_ready()
            if hasattr(a, "block_until_ready") else a,
            result,
        )

    summary = {
        "model": args.model,
        "lkernel": args.lkernel,
        "N": args.particles,
        "K": args.iterations,
        "mean": np.asarray(result.mean_estimate[-1]).tolist(),
        "variance": np.asarray(result.variance_estimate[-1]).tolist(),
        "ess": float(result.ess[-1]),
        "log_likelihood": float(result.log_likelihood[-1]),
        "phi_schedule": np.asarray(result.phi).round(4).tolist(),
    }
    print(json.dumps(summary, indent=1))
    if args.output:
        np.savez(
            args.output,
            **{
                f: np.asarray(getattr(result, f))
                for f in result._fields
                if getattr(result, f) is not None
            },
        )
        print(f"saved diagnostics to {args.output}")


if __name__ == "__main__":
    main()
