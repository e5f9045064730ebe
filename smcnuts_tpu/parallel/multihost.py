"""Multi-host initialisation for pod-slice runs.

The mesh-sharded program in this framework is host-count agnostic: once
jax.distributed.initialize() has run on every host, `particle_mesh()` spans
the global device set and `run_smc(..., mesh=mesh)` executes the same XLA
program per host with ICI/DCN collectives inserted by GSPMD. This module is
the thin launcher glue (the reference has no distributed story at all,
SURVEY.md §5).

Typical launch on each host of a slice:

    python -m smcnuts_tpu.parallel.multihost --model arma -N 1048576 -K 100

On Cloud TPU VMs jax.distributed.initialize() autodetects coordinator,
process count and process id from the TPU metadata; arguments are only
needed for manual clusters.
"""

from __future__ import annotations

import argparse

import jax


def initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Idempotent jax.distributed.initialize wrapper."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        if "already" not in str(e):
            raise
    return jax.process_index(), jax.process_count()


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="arma")
    p.add_argument("-N", "--particles", type=int, default=1 << 20)
    p.add_argument("-K", "--iterations", type=int, default=100)
    p.add_argument("--step-size", type=float, default=0.01)
    p.add_argument("--lkernel", default="forwardsLKernel")
    p.add_argument("--tempering", action="store_true")
    p.add_argument("--max-tree-depth", type=int, default=10)
    p.add_argument("--coordinator", default=None)
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    args = p.parse_args(argv)

    pid, pcount = initialize(args.coordinator, args.num_processes, args.process_id)
    if pid == 0:
        print(f"initialized {pcount} processes, {jax.device_count()} devices")

    from ..config import SMCConfig
    from ..models import get_model
    from ..sampler import run_smc
    from .sharding import particle_mesh

    model = get_model(args.model)
    cfg = SMCConfig(
        n_particles=args.particles, n_iterations=args.iterations,
        step_size=args.step_size, lkernel=args.lkernel,
        tempering=args.tempering, save_history=False,
        max_tree_depth=args.max_tree_depth,
    )
    mesh = particle_mesh()
    res = jax.jit(lambda k: run_smc(model, cfg, k, mesh=mesh))(jax.random.key(0))
    jax.block_until_ready(res.mean_estimate)
    if pid == 0:
        print("mean:", res.mean_estimate[-1])
        print("ess:", float(res.ess[-1]))


if __name__ == "__main__":
    main()
