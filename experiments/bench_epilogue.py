"""Decompose the SMC iteration cost: NUTS kernel vs everything else.

Measures the MARGINAL per-iteration device time of the FULL run_smc scan
body (normalise + estimate + resample + NUTS + reweight + diagnostics) via
K-vs-4K differencing (the per-dispatch relay floor cancels — same protocol
as bench_kernel.py), for both NUTS backends. Comparing against
bench_kernel.py's kernel-only marginal isolates the epilogue + packing
cost per iteration (VERDICT r1 next-round #7 asks for this breakdown).

Usage: python experiments/bench_epilogue.py --model arma -N 512 -K 100
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


def marginal(model, n, k, backend, step_size, repeats=3):
    def timed(k_iters):
        cfg = SMCConfig(
            n_particles=n, n_iterations=k_iters, step_size=step_size,
            lkernel="forwardsLKernel", save_history=False,
            nuts_backend=backend,
        )
        f = jax.jit(lambda key: run_smc(model, cfg, key))
        best, _ = time_materialized(
            f, lambda: (fresh_key(),), repeats=repeats
        )
        return best

    t1 = timed(k)
    t4 = timed(4 * k)
    return {
        "backend": backend,
        "t_K_s": round(t1, 4),
        "t_4K_s": round(t4, 4),
        "marginal_us_per_iter": round((t4 - t1) / (3 * k) * 1e6, 2),
        "dispatch_floor_s": round(max(t1 - (t4 - t1) / 3.0, 0.0), 4),
    }


def packing_marginal(n, d, k, repeats=3):
    """Marginal per-iteration cost of the Pallas call's (N, D) <-> tile
    layout round trip alone (VERDICT r2 #6 names it the suspected epilogue
    cost): a K-step scan whose body is to_tiles -> from_tiles plus a
    nominal add (so XLA cannot elide the reshapes), K-vs-4K differenced."""
    import jax.numpy as jnp

    from smcnuts_tpu.utils.timing import fresh_key, time_materialized

    _LANES, _SUB = 128, 8
    block = _LANES * _SUB
    n_pad = -(-n // block) * block
    nblk = n_pad // block

    def round_trip(x):
        ap = jnp.zeros((n_pad, d), jnp.float32).at[:n].set(x)
        t = ap.T.reshape(d, nblk, _SUB, _LANES).transpose(1, 0, 2, 3)
        t = t + 1.0  # keep the layout round trip alive
        back = t.transpose(1, 0, 2, 3).reshape(d, n_pad).T[:n]
        return back

    def chain(key, k_iters):
        x0 = jax.random.normal(key, (n, d), jnp.float32)

        def body(x, _):
            return round_trip(round_trip(x)), None  # x and r equivalents

        x, _ = jax.lax.scan(body, x0, None, length=k_iters)
        return x

    def timed(k_iters):
        f = jax.jit(lambda key: chain(key, k_iters))
        best, _ = time_materialized(
            f, lambda: (fresh_key(),), repeats=repeats
        )
        return best

    t1, t4 = timed(k), timed(4 * k)
    return {
        "what": "tile packing round trip x2 (x and r)",
        "marginal_us_per_iter": round((t4 - t1) / (3 * k) * 1e6, 2),
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="arma")
    p.add_argument("-N", "--particles", type=int, default=512)
    p.add_argument("-K", "--iterations", type=int, default=100)
    p.add_argument("--step-size", type=float, default=0.01)
    p.add_argument("--backends", nargs="+", default=["pallas", "xla"])
    p.add_argument("--packing", action="store_true",
                   help="also measure the tile-layout round trip alone")
    p.add_argument("--output", default=None,
                   help="also write the decomposition JSON here")
    args = p.parse_args(argv)
    model = get_model(args.model)
    out = {"model": args.model, "N": args.particles, "K": args.iterations,
           "rows": []}
    for b in args.backends:
        if b == "pallas" and (
            model.tile_model is None or jax.default_backend() != "tpu"
        ):
            continue
        out["rows"].append(
            marginal(model, args.particles, args.iterations, b,
                     args.step_size)
        )
        print(json.dumps(out["rows"][-1]), flush=True)
    if args.packing:
        out["rows"].append(
            packing_marginal(args.particles, model.dim, args.iterations)
        )
        print(json.dumps(out["rows"][-1]), flush=True)
    print(json.dumps(out))
    if args.output:
        os.makedirs(os.path.dirname(os.path.abspath(args.output)),
                    exist_ok=True)
        with open(args.output, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
