"""Particle-count scaling study on one chip (and mesh scaling where devices
allow): throughput (particle-iterations/s) vs N for the arma benchmark
config. The north-star scaling axis is the particle count (SURVEY.md §5);
near-linear throughput growth in N demonstrates the vectorized kernel is not
dispatch-bound at scale.

Writes scaling.json into experiments/output/ and prints a table.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from smcnuts_tpu import SMCConfig, run_smc
from smcnuts_tpu.models import get_model
from smcnuts_tpu.utils.timing import fresh_key, time_materialized


def measure(model, n, k, backend, step_size=0.01, repeats=3):
    """Returns (device_rate, wall_rate, t_K): `device_rate` is the
    K-vs-4K MARGINAL throughput (the per-dispatch transport floor — a
    fixed ~60 ms on the axon relay, unrelated to the chip — cancels in
    the difference; same protocol as bench_kernel/bench_epilogue);
    `wall_rate` is the whole-dispatch number including that floor (the
    round-2/3 scaling.json convention, dominated by the relay at small
    N·K — it measures the dev-harness link, not the chip)."""

    def timed(k_iters):
        cfg = SMCConfig(
            n_particles=n, n_iterations=k_iters, step_size=step_size,
            lkernel="forwardsLKernel", save_history=False,
            nuts_backend=backend,
        )

        # Return only two small arrays: on the relay transport each fetched
        # output array costs a ~25 ms round trip, so materializing the full
        # SMCResult (~15 arrays) would bury small-N timings under ~0.4 s of
        # per-array fetch latency (measured via bench_epilogue.py).
        def slim(key):
            r = run_smc(model, cfg, key)
            return r.mean_estimate[-1], r.ess[-1]

        f = jax.jit(slim)
        # Fresh urandom keys per repetition + host-materialization sync:
        # the relay memoizes repeated args and ignores block_until_ready
        # (utils/timing.py).
        best, _ = time_materialized(
            f, lambda: (fresh_key(),), repeats=repeats
        )
        return best

    t1 = timed(k)
    t4 = timed(4 * k)
    device_rate = n * 3 * k / max(t4 - t1, 1e-9)
    return device_rate, n * k / t1, t1


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="arma")
    p.add_argument("--iterations", "-K", type=int, default=20)
    p.add_argument(
        "--sizes", nargs="+", type=int,
        default=[512, 2048, 8192, 32768, 131072],
    )
    p.add_argument("--backends", nargs="+", default=["pallas", "xla"])
    p.add_argument("--output", default=None)
    args = p.parse_args(argv)

    model = get_model(args.model)
    rows = []
    for backend in args.backends:
        if backend == "pallas" and (
            model.tile_model is None or jax.default_backend() != "tpu"
        ):
            continue
        for n in args.sizes:
            # The XLA backend's former --xla-max-n crash cap is gone: the
            # particle axis is now lax.map-chunked into cfg.xla_block_size
            # blocks (ops/nuts.nuts_batch), bounding both the deepest-tree
            # stall domain and the live tree state.
            try:
                rate, wall_rate, best = measure(
                    model, n, args.iterations, backend
                )
            except Exception as e:  # one bad point must not kill the sweep
                print(f"{backend:7s} N={n:7d}: FAILED ({e})", flush=True)
                rows.append(
                    {"backend": backend, "N": n, "K": args.iterations,
                     "error": str(e)[:200]}
                )
                continue
            rows.append(
                {"backend": backend, "N": n, "K": args.iterations,
                 "particle_iters_per_s": round(rate, 1),
                 "wall_particle_iters_per_s": round(wall_rate, 1),
                 "seconds": round(best, 4)}
            )
            print(
                f"{backend:7s} N={n:7d}: {rate:12.0f} p-i/s device "
                f"({wall_rate:.0f} incl. dispatch floor, {best:.4f}s)",
                flush=True,
            )

    out = args.output or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "output", "scaling.json"
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump({"device": str(jax.devices()[0]), "rows": rows}, f, indent=1)
    print("wrote", out)


if __name__ == "__main__":
    main()
