"""Microbench the data-movement primitives lane compaction needs.

The compacted two-phase NUTS kernel (VERDICT r4 #1) must, per SMC iteration:
pack the continuation state of unfinished lanes densely (a row
gather/scatter over the flat particle axis) and route phase-2 outputs back
to original lane positions (a row gather). This measures, at the bench
shapes (13312 x C f32), the marginal device time of:

  cumsum    - destination indices via the prefix-sum compaction formula
  take      - y = x[idx]  (row gather, XLA lowering)
  scatter   - y = zeros.at[dest].set(x)  (row scatter, unique indices)
  argsort   - full permutation via sort (the alternative to cumsum+scatter)
  transpose - (C, n) -> (n, C) layout flip between tile columns and rows

Protocol: K-vs-4K marginal inside one lax.scan dispatch (utils/timing.py;
the ~60 ms relay floor cancels), fresh os.urandom keys per dispatch.

RELIABILITY CAVEAT (measured, round 5): chaining an index operation with a
CONSTANT index vector lets XLA compose gather-of-gather at compile time —
a later re-run of take_cols/scatter_cols reported 0.0 us because the scan
body folded to an add. Readings of ~0 from this harness mean the op was
optimized away, not that it is free; end-to-end A/B
(experiments/bench_compaction.py) is the arbiter for glue decisions, and
it contradicted this harness once already (the sortless scatter glue
microbenched fine and measured 3x worse at N=1M end-to-end).

Usage: python experiments/bench_gather.py -n 13312 -C 56 -K 200
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from smcnuts_tpu.utils.timing import fresh_key, materialize


def marginal(op_body, init_maker, iters, repeats):
    """Marginal seconds per op via the K-vs-4K scan protocol."""

    def chain(key, n_iters):
        init = init_maker(key)

        def body(carry, k):
            return op_body(carry, k), None

        keys = jax.random.split(key, n_iters)
        out, _ = jax.lax.scan(body, init, keys)
        return out

    def timed(n_iters):
        f = jax.jit(lambda k: chain(k, n_iters))
        materialize(f(fresh_key()))  # compile
        best = float("inf")
        for _ in range(repeats):
            k = fresh_key()
            t0 = time.perf_counter()
            materialize(f(k))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(iters)
    t4 = timed(4 * iters)
    return max(t4 - t1, 1e-9) / (3 * iters)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-n", "--rows", type=int, default=13312)
    p.add_argument("-C", "--cols", type=int, default=56)
    p.add_argument("-K", "--iters", type=int, default=200)
    p.add_argument("--repeats", type=int, default=3)
    args = p.parse_args(argv)
    n, C = args.rows, args.cols

    perm = jnp.asarray(np.random.RandomState(0).permutation(n), jnp.int32)

    def mk_mat(key):
        return jax.random.normal(key, (n, C), jnp.float32)

    results = {}

    # take: y = x[perm]; chain by feeding y back (gata-dependent).
    results["take_rows"] = marginal(
        lambda x, k: jnp.take(x, perm, axis=0) + 1e-7, mk_mat,
        args.iters, args.repeats,
    )

    # scatter rows: y[perm[i]] = x[i].
    results["scatter_rows"] = marginal(
        lambda x, k: jnp.zeros_like(x).at[perm].set(x) + 1e-7, mk_mat,
        args.iters, args.repeats,
    )

    # cumsum over mask + the compaction destination formula.
    def dest_body(v, k):
        mask = v > 0
        s = jnp.cumsum(mask.astype(jnp.int32))
        total = s[-1]
        i = jnp.arange(n, dtype=jnp.int32)
        dest = jnp.where(mask, s - 1, total + i - s)
        return v + 1e-7 * dest.astype(jnp.float32)

    results["cumsum_dest"] = marginal(
        dest_body, lambda key: jax.random.normal(key, (n,), jnp.float32),
        args.iters, args.repeats,
    )

    # argsort of a mask (the sort-based alternative).
    def argsort_body(v, k):
        p_ = jnp.argsort(v)
        return v + 1e-7 * p_.astype(jnp.float32)

    results["argsort"] = marginal(
        argsort_body, lambda key: jax.random.normal(key, (n,), jnp.float32),
        args.iters, args.repeats,
    )

    # axis-1 gather in the kernel-native (C, n) layout: y = x[:, perm] —
    # if this is cheap the compaction glue needs NO transposes at all.
    results["take_cols"] = marginal(
        lambda x, k: x[:, perm] + 1e-7,
        lambda key: jax.random.normal(key, (C, n), jnp.float32),
        args.iters, args.repeats,
    )

    # axis-1 scatter in the same layout: y[:, perm] = x — the sortless
    # compaction glue (cumsum destination formula) scatters forward and
    # gathers back with the SAME index vector, no argsort/inverse needed.
    results["scatter_cols"] = marginal(
        lambda x, k: jnp.zeros_like(x).at[:, perm].set(x) + 1e-7,
        lambda key: jax.random.normal(key, (C, n), jnp.float32),
        args.iters, args.repeats,
    )

    # argsort of a 0/1 finished flag (massive ties — the actual compaction
    # key), plus its inverse permutation.
    def flagsort_body(v, k):
        flag = (v > 0).astype(jnp.float32)
        p_ = jnp.argsort(flag, stable=True)
        inv = jnp.argsort(p_)
        return v + 1e-7 * (p_ + inv).astype(jnp.float32)

    results["flag_argsort_plus_inverse"] = marginal(
        flagsort_body, lambda key: jax.random.normal(key, (n,), jnp.float32),
        args.iters, args.repeats,
    )

    # transpose (n, C) -> (C, n) -> back (2 transposes per step; halved).
    results["transpose"] = marginal(
        lambda x, k: (x.T + 1e-7).T + 1e-7,
        lambda key: jax.random.normal(key, (n, C), jnp.float32),
        args.iters, args.repeats,
    ) / 2.0

    out = {
        "rows": n, "cols": C, "iters": args.iters,
        "marginal_us": {k: round(v * 1e6, 2) for k, v in results.items()},
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
