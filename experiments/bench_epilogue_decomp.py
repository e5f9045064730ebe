"""Itemize the non-kernel per-iteration cost of the SMC scan body.

Builds a ladder of scan bodies, each adding one SMC phase on top of the
fused Pallas NUTS kernel, and reports the K-vs-4K marginal per-iteration
time of each rung (same relay-proof protocol as bench_kernel.py). The
difference between consecutive rungs is that phase's marginal cost:

  kernel        fused kernel only (in-kernel momenta, dh out)
  +reweight     logw carry + dh add
  +normalise    masked logsumexp + wn + ESS
  +estimate     constrain + weighted mean/var
  +resample     threshold multinomial resample (branchless)
  full          run_smc body (adds key splits, acceptance metric,
                diagnostics stacking, scan outputs)

Round-5 protocol fix (VERDICT r4 #7): default K=300 / repeats=6 — the
round-4 K=100/repeats=3 rung deltas sign-flipped because the K-vs-4K
marginal inherits the ~+-5 ms relay round-trip jitter (per-iter noise
~+-17 us at K=100 vs rung deltas of 10-30 us; at K=300 the noise floor is
~+-5.5 us per iteration). run_smc runs with compaction DISABLED here so
the ladder base matches the kernel rung (at this single-run shape the
dispatch prunes compaction anyway: N=512 is one 1024-lane block).

Usage: python experiments/bench_epilogue_decomp.py --model arma -N 512 -K 100
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
from smcnuts_tpu.utils.timing import fresh_key, materialize


def _timed_marginal(make_chain, x0, iters, repeats=6):
    def timed(n_iters):
        f = jax.jit(lambda k, x: make_chain(k, x, n_iters))
        materialize(f(fresh_key(), x0))  # compile
        best = float("inf")
        for _ in range(repeats):
            key = fresh_key()
            t0 = time.perf_counter()
            materialize(f(key, x0))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(iters)
    t4 = timed(4 * iters)
    return (t4 - t1) / (3 * iters) * 1e6


def measure(model_name, n=512, iters=300, max_depth=10, step=0.01,
            repeats=6):
    model = get_model(model_name)
    tm = model.tile_model
    assert tm is not None
    d = model.dim

    def kernel(x, seed):
        return nuts_batch_pallas_fused(
            tm, x, seed, step, 1.0, max_depth=max_depth
        )

    # Warm cloud (equilibrium tree shapes).
    def warm_chain(key, x, n_iters):
        def body(xc, k):
            seed = jax.random.randint(
                k, (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
            )
            x2, _, _ = kernel(xc, seed)
            return x2, None

        keys = jax.random.split(key, n_iters)
        xf, _ = jax.lax.scan(body, x, keys)
        return xf

    x0 = 0.1 * jax.random.normal(fresh_key(), (n, d), jnp.float32)
    x0 = jnp.asarray(materialize(jax.jit(
        lambda k, x: warm_chain(k, x, 10))(fresh_key(), x0)))

    rungs = {}

    def chain_kernel(key, x, n_iters):
        def body(xc, k):
            seed = jax.random.randint(
                k, (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
            )
            x2, _, _ = kernel(xc, seed)
            return x2, None

        keys = jax.random.split(key, n_iters)
        xf, _ = jax.lax.scan(body, x, keys)
        return xf

    rungs["kernel"] = chain_kernel

    def chain_reweight(key, x, n_iters):
        def body(c, k):
            xc, logw = c
            seed = jax.random.randint(
                k, (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
            )
            x2, _, stats = kernel(xc, seed)
            return (x2, logw + stats["delta_h"]), None

        keys = jax.random.split(key, n_iters)
        (xf, lw), _ = jax.lax.scan(body, (x, jnp.zeros((n,))), keys)
        return xf, lw

    rungs["+reweight"] = chain_reweight

    def chain_normalise(key, x, n_iters):
        def body(c, k):
            xc, logw = c
            wn, ll = normalise_weights(logw)
            e = compute_ess(wn)
            seed = jax.random.randint(
                k, (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
            )
            x2, _, stats = kernel(xc, seed)
            return (x2, logw + stats["delta_h"]), (ll, e)

        keys = jax.random.split(key, n_iters)
        (xf, lw), outs = jax.lax.scan(body, (x, jnp.zeros((n,))), keys)
        return xf, lw, outs

    rungs["+normalise"] = chain_normalise

    def chain_estimate(key, x, n_iters):
        def body(c, k):
            xc, logw = c
            wn, ll = normalise_weights(logw)
            e = compute_ess(wn)
            mean_k, var_k = constrained_estimate(model, xc, wn)
            seed = jax.random.randint(
                k, (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
            )
            x2, _, stats = kernel(xc, seed)
            return (x2, logw + stats["delta_h"]), (ll, e, mean_k, var_k)

        keys = jax.random.split(key, n_iters)
        (xf, lw), outs = jax.lax.scan(body, (x, jnp.zeros((n,))), keys)
        return xf, lw, outs

    rungs["+estimate"] = chain_estimate

    def chain_resample(key, x, n_iters):
        def body(c, k):
            xc, logw = c
            k_res, k_nuts = jax.random.split(k)
            wn, ll = normalise_weights(logw)
            e = compute_ess(wn)
            mean_k, var_k = constrained_estimate(model, xc, wn)
            x_r, logw_r, did = resample_if_required(
                k_res, xc, logw, wn, ll, e, 0.5, "multinomial"
            )
            seed = jax.random.randint(
                k_nuts, (), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
            )
            x2, _, stats = kernel(x_r, seed)
            return (x2, logw_r + stats["delta_h"]), (ll, e, mean_k, var_k)

        keys = jax.random.split(key, n_iters)
        (xf, lw), outs = jax.lax.scan(body, (x, jnp.zeros((n,))), keys)
        return xf, lw, outs

    rungs["+resample"] = chain_resample

    rows = []
    prev = None
    for name, mk in rungs.items():
        us = _timed_marginal(mk, x0, iters, repeats)
        rows.append({
            "rung": name,
            "marginal_us_per_iter": round(us, 2),
            "delta_us": round(us - prev, 2) if prev is not None else None,
        })
        prev = us
        print(json.dumps(rows[-1]), flush=True)

    # Full run_smc for reference.
    def full(key, _x, n_iters):
        cfg = SMCConfig(
            n_particles=n, n_iterations=n_iters, step_size=step,
            lkernel="forwardsLKernel", save_history=False,
            pallas_compaction=(),
        )
        return run_smc(model, cfg, key)

    us = _timed_marginal(full, x0, iters, repeats)
    rows.append({
        "rung": "full_run_smc",
        "marginal_us_per_iter": round(us, 2),
        "delta_us": round(us - prev, 2),
    })
    print(json.dumps(rows[-1]), flush=True)
    return rows


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="arma")
    p.add_argument("-N", "--particles", type=int, default=512)
    p.add_argument("-K", "--iterations", type=int, default=300)
    p.add_argument("--repeats", type=int, default=6)
    p.add_argument("--max-tree-depth", type=int, default=10)
    p.add_argument("--step-size", type=float, default=0.01)
    p.add_argument("--output", default=None)
    args = p.parse_args(argv)
    rows = measure(args.model, args.particles, args.iterations,
                   args.max_tree_depth, args.step_size, args.repeats)
    out = {"model": args.model, "N": args.particles, "K": args.iterations,
           "rows": rows}
    print(json.dumps(out))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
