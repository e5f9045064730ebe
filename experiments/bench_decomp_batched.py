"""Itemize the BATCHED-shape SMC iteration (the bench headline workload).

bench_epilogue_decomp.py profiles the single-run N=512 shape (1 kernel
block); after round 5's lane compaction the batched 25-run iteration is
~603 us with only ~320 us of kernel, so the non-kernel slice is now ~half
the headline iteration. This ladder rebuilds the same rungs at the bench
shape (25 vmapped runs x N=512, compacted kernels) with the K-vs-4K
marginal at K>=300 / repeats>=5.

Usage: python experiments/bench_decomp_batched.py -K 300
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from smcnuts_tpu import SMCConfig, run_smc
from smcnuts_tpu.models import get_model
from smcnuts_tpu.ops.moments import estimate as constrained_estimate
from smcnuts_tpu.ops.nuts_pallas import nuts_batch_pallas_fused
from smcnuts_tpu.ops.resampling import resample_if_required
from smcnuts_tpu.ops.weights import ess as compute_ess
from smcnuts_tpu.ops.weights import normalise_weights
from smcnuts_tpu.utils.timing import fresh_key, fresh_keys, materialize

N = 512
B = 25
SPLITS = (4,)


def _timed_marginal(make_chain, iters, repeats):
    def timed(n_iters):
        f = jax.jit(lambda keys: make_chain(keys, n_iters))
        materialize(f(fresh_keys(B)))  # compile
        best = float("inf")
        for _ in range(repeats):
            keys = fresh_keys(B)
            t0 = time.perf_counter()
            materialize(f(keys))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(iters)
    t4 = timed(4 * iters)
    return (t4 - t1) / (3 * iters) * 1e6


def measure(iters, repeats, step=0.01, max_depth=10):
    model = get_model("arma")
    tm = model.tile_model
    d = model.dim

    def kernel(x, seed):
        return nuts_batch_pallas_fused(
            tm, x, seed, step, 1.0, max_depth=max_depth, compaction=SPLITS
        )

    def body_maker(with_weights=False, with_estimate=False,
                   with_resample=False):
        def one_run(key, n_iters):
            k_init, k_chain = jax.random.split(key)
            x0 = 0.1 * jax.random.normal(k_init, (N, d), jnp.float32)

            def body(c, k):
                x, logw = c
                k_res, k_nuts = jax.random.split(k)
                out = ()
                if with_weights:
                    wn, ll = normalise_weights(logw)
                    e = compute_ess(wn)
                    out = (ll, e)
                if with_estimate:
                    mean_k, var_k = constrained_estimate(model, x, wn)
                    out = out + (mean_k, var_k)
                if with_resample:
                    x, logw, _ = resample_if_required(
                        k_res, x, logw, wn, ll, e, 0.5, "multinomial"
                    )
                seed = jax.lax.bitcast_convert_type(
                    jax.random.key_data(k_nuts).ravel()[0], jnp.int32
                )
                x2, _, stats = kernel(x, seed)
                return (x2, logw + stats["delta_h"]), out

            keys = jax.random.split(k_chain, n_iters)
            (xf, lw), outs = jax.lax.scan(
                body, (x0, jnp.zeros((N,))), keys
            )
            return xf[0], lw[0]

        return one_run

    rungs = {
        "kernel+reweight": body_maker(),
        "+normalise_ess": body_maker(True),
        "+estimate": body_maker(True, True),
        "+resample": body_maker(True, True, True),
    }
    rows = []
    prev = None
    for name, one_run in rungs.items():
        us = _timed_marginal(
            lambda keys, n_iters, f=one_run: jax.vmap(
                lambda k: f(k, n_iters)
            )(keys),
            iters, repeats,
        )
        rows.append({
            "rung": name,
            "marginal_us_per_iter": round(us, 2),
            "delta_us": round(us - prev, 2) if prev is not None else None,
        })
        prev = us
        print(json.dumps(rows[-1]), flush=True)

    def full(keys, n_iters):
        cfg = SMCConfig(
            n_particles=N, n_iterations=n_iters, step_size=step,
            lkernel="forwardsLKernel", save_history=False,
        )

        def one(key):
            r = run_smc(model, cfg, key)
            return r.mean_estimate[-1], r.ess[-1]

        return jax.vmap(one)(keys)

    us = _timed_marginal(full, iters, repeats)
    rows.append({
        "rung": "full_run_smc",
        "marginal_us_per_iter": round(us, 2),
        "delta_us": round(us - prev, 2),
    })
    print(json.dumps(rows[-1]), flush=True)
    return rows


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-K", "--iterations", type=int, default=300)
    p.add_argument("--repeats", type=int, default=5)
    args = p.parse_args(argv)
    rows = measure(args.iterations, args.repeats)
    out = {"B": B, "N": N, "K": args.iterations, "splits": list(SPLITS),
           "rows": rows}
    path = "experiments/output/decomp_batched_arma.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"# wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
