"""Whole-tree Pallas NUTS kernel microbenchmark: MARGINAL device time per
1024-lane leaf step, the roofline currency used in ops/nuts_pallas.py's
tile-model docstrings.

Protocol (relay-transport-proof, see utils/timing.py): K kernel invocations
are chained in ONE lax.scan dispatch with per-step fold_in keys; repetitions
use fresh os.urandom top keys; timing is to host materialization. A single
dispatch carries a large fixed transport floor (~60 ms on the axon relay —
2-3 round trips), so the kernel cost is taken as the DIFFERENCE between a
K-iteration and a 4K-iteration chain: the floor cancels, leaving the true
marginal per-iteration and per-leaf device time. Executed leaf steps per
block are estimated as the per-iteration MAX leapfrog count over particles
(all lanes of a block step in lockstep under masks; the doubling loop exits
when every lane has stopped, so the slowest lane's count ~= the block's
executed steps).

Usage: python experiments/bench_kernel.py --model prmwcd -N 512 -K 50
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from smcnuts_tpu.models import get_model
from smcnuts_tpu.ops.nuts_pallas import nuts_batch_pallas
from smcnuts_tpu.utils.timing import fresh_key, materialize


def measure(model_name, n=512, iters=50, max_depth=10, step=0.01,
            repeats=3, warm_iters=10, model=None):
    if model is None:
        model = get_model(model_name)
    tm = model.tile_model
    assert tm is not None, f"{model_name} has no tile model"
    d = model.dim

    def chain(key, x0, n_iters):
        """n_iters NUTS kernel calls chained through one scan; returns the
        final cloud and the summed per-iteration max leapfrog count."""

        def body(carry, k):
            x, total = carry
            kr, ks = jax.random.split(k)
            r = jax.random.normal(kr, x.shape, x.dtype)
            seed = jax.random.randint(
                ks, (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
            )
            x2, _, stats = nuts_batch_pallas(
                tm, x, r, seed, step, 1.0, max_depth=max_depth
            )
            max_lf = jnp.max(stats["leapfrogs"]).astype(jnp.int32)
            return (x2, total + max_lf), None

        keys = jax.random.split(key, n_iters)
        (x_f, total), _ = jax.lax.scan(body, (x0, jnp.int32(0)), keys)
        return x_f, total

    # Warm the cloud into the posterior so tree shapes are production-like
    # (prior-cloud trees are shallow/divergent and under-report the kernel).
    x0 = 0.1 * jax.random.normal(fresh_key(), (n, d), jnp.float32)
    warm = jax.jit(lambda k, x: chain(k, x, warm_iters))
    x0, _ = materialize(warm(fresh_key(), x0))
    x0 = jnp.asarray(x0)

    def timed(n_iters):
        f = jax.jit(lambda k, x: chain(k, x, n_iters))
        materialize(f(fresh_key(), x0))  # compile
        best_t, best_steps = float("inf"), 0
        for _ in range(repeats):
            key = fresh_key()
            t0 = time.perf_counter()
            _, steps = materialize(f(key, x0))
            dt = time.perf_counter() - t0
            if dt < best_t:
                best_t, best_steps = dt, int(steps)
        return best_t, best_steps

    t1, steps1 = timed(iters)
    t4, steps4 = timed(4 * iters)
    nblk = -(-n // 1024)
    marginal_s = max(t4 - t1, 1e-9)
    per_iter_us = marginal_s / (3 * iters) * 1e6
    dleaf = max(steps4 - steps1, 1)
    us_per_leaf_block = marginal_s / dleaf / nblk * 1e6
    floor_s = max(t1 - marginal_s / 3.0, 0.0)
    return {
        "model": model_name,
        "n_particles": n,
        "iters": iters,
        "t_K_s": round(t1, 4),
        "t_4K_s": round(t4, 4),
        "leaf_steps_K": steps1,
        "leaf_steps_4K": steps4,
        "blocks": nblk,
        "dispatch_floor_s": round(floor_s, 4),
        "marginal_us_per_iter": round(per_iter_us, 2),
        "marginal_us_per_1024lane_leaf": round(us_per_leaf_block, 3),
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="prmwcd")
    p.add_argument("--stan", default=None,
                   help="bench a frontend-compiled .stan instead (tile=True "
                   "kernel, e.g. the forward-mode generated arma); pair "
                   "with --data")
    p.add_argument("--data", default=None)
    p.add_argument("-N", "--particles", type=int, default=512)
    p.add_argument("-K", "--iters", type=int, default=50)
    p.add_argument("--max-tree-depth", type=int, default=10)
    p.add_argument("--step-size", type=float, default=0.01)
    args = p.parse_args(argv)
    model = None
    name = args.model
    if args.stan:
        from smcnuts_tpu.stan import compile_stan_file

        model = compile_stan_file(args.stan, data=args.data, tile=True)
        name = f"stan:{model.name}:{model.tile_model.autodiff}"
    out = measure(name, args.particles, args.iters,
                  args.max_tree_depth, args.step_size, model=model)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
