"""Experiment driver: Monte-Carlo runs x three L-kernel strategies.

TPU-native counterpart of the reference driver (reference
experiments/run_experiments.py): for each MC run, execute the sampler under
(i) forwards-proposal L-kernel, (ii) Gaussian-approximation L-kernel, and
(iii) asymptotic L-kernel with adaptive tempering + accept-reject, then save
the five per-run CSV series the reference's evaluation layer expects
(mean/var estimates, ESS, phi, acceptance rate) under
output/<model>/<strategy>/.

Differences by design: a real CLI instead of module constants; per-strategy
jit-compiled programs reused across all MC runs (compile once, run 25x); the
"identical random streams across strategies" device is replaced by a shared
per-run PRNG seed (exact stream replication across strategies is neither
possible nor meaningful across RNG architectures — parity is statistical,
SURVEY.md §7).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from smcnuts_tpu import SMCConfig, run_smc
from smcnuts_tpu.models import get_model
from smcnuts_tpu.utils.io import save_run_csvs
from smcnuts_tpu.utils.timing import fresh_keys, materialize, time_materialized

STRATEGIES = {
    "forward_lkernel": dict(lkernel="forwardsLKernel", tempering=False),
    "gaussian_lkernel": dict(lkernel="GaussianApproxLKernel", tempering=False),
    "asymptotic_lkernel": dict(lkernel="asymptoticLKernel", tempering=True),
}


def default_step_size(model_name):
    if model_name == "arma":
        from smcnuts_tpu.models.arma import default_step_size as f
    else:
        from smcnuts_tpu.models.prmwcd import default_step_size as f
    return f()


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="arma", help="arma | prmwcd")
    p.add_argument("--runs", type=int, default=25, help="Monte-Carlo runs")
    p.add_argument("--particles", "-N", type=int, default=512)
    p.add_argument("--iterations", "-K", type=int, default=100)
    p.add_argument("--step-size", type=float, default=None)
    p.add_argument("--max-tree-depth", type=int, default=10)
    p.add_argument("--resampling", default="multinomial")
    p.add_argument(
        "--strategies", nargs="+", default=list(STRATEGIES),
        choices=list(STRATEGIES),
    )
    p.add_argument("--output", default=None)
    p.add_argument("--seed0", type=int, default=10, help="run i uses seed0*(i+1)")
    p.add_argument("--mesh", action="store_true",
                   help="shard the particle axis over all local devices")
    p.add_argument("--nuts-backend", default="auto",
                   choices=["auto", "xla", "pallas"])
    p.add_argument("--vmap-runs", action="store_true",
                   help="run ALL Monte-Carlo runs batched in one device "
                   "dispatch per strategy (jax.vmap over seeds; the NUTS "
                   "kernel collapses the batch into one multi-run launch). "
                   "Combine with --mesh + --mesh-runs for a 2-D "
                   "runs x particles mesh.")
    p.add_argument("--shard-runs", action="store_true",
                   help="with --vmap-runs: additionally shard the run batch "
                   "over all local devices ('runs' mesh; linear scale-out, "
                   "no cross-device communication)")
    p.add_argument("--mesh-runs", type=int, default=None,
                   help="with --vmap-runs --mesh: devices on the 'runs' axis "
                   "of a 2-D (runs, particles) mesh; the remaining factor "
                   "shards each run's particle axis")
    args = p.parse_args(argv)
    if args.shard_runs and not args.vmap_runs:
        p.error("--shard-runs requires --vmap-runs")
    if args.shard_runs and args.mesh:
        p.error("--shard-runs and --mesh are mutually exclusive "
                "(use --mesh --mesh-runs for the 2-D mesh)")
    if args.vmap_runs and args.mesh and not args.mesh_runs:
        p.error("--vmap-runs with --mesh needs --mesh-runs (2-D mesh shape)")
    if args.mesh_runs and not (args.vmap_runs and args.mesh):
        p.error("--mesh-runs requires --vmap-runs and --mesh")

    model = get_model(args.model)
    step_size = args.step_size or default_step_size(args.model)
    output_dir = args.output or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "output", args.model
    )
    os.makedirs(output_dir, exist_ok=True)

    print(f"Model: {args.model}  N={args.particles}  K={args.iterations}  "
          f"step_size={step_size}  runs={args.runs}")
    print(f"Devices: {jax.devices()}")

    mesh = None
    if args.mesh and args.mesh_runs:
        from smcnuts_tpu.parallel import runs_particles_mesh

        mesh = runs_particles_mesh(args.mesh_runs)
    elif args.mesh:
        from smcnuts_tpu.parallel import particle_mesh

        mesh = particle_mesh()

    fns = {}
    for name in args.strategies:
        cfg = SMCConfig(
            n_particles=args.particles, n_iterations=args.iterations,
            step_size=step_size, resampling=args.resampling,
            max_tree_depth=args.max_tree_depth,
            nuts_backend=args.nuts_backend,
            # Only the asymptotic post-pass consumes the particle history;
            # for the other strategies XLA drops the (K+1, N, D) buffers.
            save_history=STRATEGIES[name]["lkernel"] == "asymptoticLKernel",
            **STRATEGIES[name],
        )

        def slim(r):
            # The evaluation layer needs only the five per-iteration series
            # (save_run_csvs); returning the full result would ship the
            # particle history to the host — ~26 MB per 25-run batch over
            # the relay, 12x the device time of the run itself (measured).
            return {
                "mean_estimate": r.mean_estimate,
                "variance_estimate": r.variance_estimate,
                "ess": r.ess,
                "phi": r.phi,
                "acceptance_rate": r.acceptance_rate,
            }

        fns[name] = jax.jit(
            lambda k, m=model, c=cfg: slim(run_smc(m, c, k, mesh=mesh))
        )

    timings = {name: [] for name in args.strategies}
    if args.vmap_runs:
        keys = jax.numpy.stack(
            [jax.random.key(args.seed0 * (i + 1)) for i in range(args.runs)]
        )
        if args.shard_runs:
            from smcnuts_tpu.parallel import map_runs, run_mesh

            rmesh = run_mesh()

            def make_batched(fn):
                return lambda ks: map_runs(fn, ks, rmesh)

        elif mesh is not None and args.mesh_runs:
            from smcnuts_tpu.parallel import map_runs_2d

            def make_batched(fn):
                # fn already constrains its particle axis against the 2-D
                # mesh (run_smc got mesh=); the run axis shards via the key
                # placement inside map_runs_2d.
                return lambda ks: map_runs_2d(fn, ks, mesh)

        else:
            def make_batched(fn):
                return jax.jit(jax.vmap(fn))

        for name in args.strategies:
            batched = make_batched(fns[name])
            # Results come from the canonical reproducible seeds; the TIMED
            # call uses fresh os.urandom keys and host materialization —
            # repeating the canonical keys would hit the relay memo-cache and
            # block_until_ready does not synchronize on this transport
            # (utils/timing.py). The results call doubles as the warmup.
            results = materialize(batched(keys))
            dt, _ = time_materialized(
                batched, lambda b=batched: (fresh_keys(args.runs),),
                repeats=2, warmup=False,
            )
            timings[name] = [dt / args.runs] * args.runs
            for i in range(args.runs):
                run_i = jax.tree.map(
                    lambda a: a[i] if hasattr(a, "shape") else a, results
                )
                save_run_csvs(run_i, name, i, output_dir)
            print(f"{name}: {args.runs} runs batched in {dt:.3f}s "
                  f"({dt / args.runs:.4f}s/run)")
        summary = {
            name: {
                "mean_run_s": t[0],
                "particle_iters_per_s": args.particles * args.iterations
                / t[0],
            }
            for name, t in timings.items()
        }
    else:
        for i in range(args.runs):
            seed = args.seed0 * (i + 1)
            for name in args.strategies:
                # Results come from the canonical reproducible seed; the
                # TIMED dispatch uses a fresh os.urandom key — the canonical
                # (program, key) pair may already sit in the relay
                # memo-cache from an earlier process, which would make its
                # wall time fiction (utils/timing.py). Per-run wall still
                # includes the relay round trip; use --vmap-runs for
                # chip-throughput numbers.
                result = materialize(fns[name](jax.random.key(seed)))
                dt, _ = time_materialized(
                    fns[name], lambda: (fresh_keys(1)[0],),
                    repeats=1, warmup=False,
                )
                timings[name].append(dt)
                save_run_csvs(result, name, i, output_dir)
                print(f"run {i + 1}/{args.runs} {name}: {dt:.3f}s  "
                      f"phi[0]={float(result['phi'][0]):.3f}  "
                      f"ess[-1]={float(result['ess'][-1]):.1f}")

        summary = {
            name: {
                "mean_run_s": sum(t[1:]) / max(len(t) - 1, 1),  # skip compile
                "particle_iters_per_s": args.particles * args.iterations
                / (sum(t[1:]) / max(len(t) - 1, 1)) if len(t) > 1 else None,
            }
            for name, t in timings.items()
        }
    with open(os.path.join(output_dir, "timings.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
