"""Empirical VPU peak for the leaf-kernel roofline (VERDICT r4 #2).

The NUTS leaf kernels are straight-line f32 elementwise code on (8, 128)
tiles — no MXU, no HBM traffic in the loop (data baked as immediates). The
correct "speed of light" denominator for their MFU is therefore the
sustained VPU fma rate on the SAME shapes, measured, not a clock-sheet
guess. This kernel runs NCHAINS independent fused multiply-add chains per
(8, 128) tile (enough instruction-level parallelism to saturate the issue
ports) for STEPS unrolled steps, on the same 13-block grid as the bench
workload, and reports achieved FLOP/s via the K-vs-4K marginal protocol.

Also measures a 4-chain variant: the arma tile model carries exactly 4
dependent recurrence chains, so peak(4 chains)/peak(many chains) separates
"dependency-bound" from "issue-bound" in the MFU table.

Usage: python experiments/bench_vpu_peak.py
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smcnuts_tpu.utils.timing import fresh_key, materialize

NBLK = 13
STEPS = 2000


def make_kernel(nchains, steps):
    def kernel(x_ref, out_ref):
        x = x_ref[0]
        chains = [x + float(c) * 0.125 for c in range(nchains)]
        a = [1.0 + 1e-6 * (c + 1) for c in range(nchains)]
        b = [1e-7 * (c + 1) for c in range(nchains)]
        for _ in range(steps):
            chains = [a[c] * chains[c] + b[c] for c in range(nchains)]
        acc = chains[0]
        for c in range(1, nchains):
            acc = acc + chains[c]
        out_ref[0] = acc

    spec = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)

    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(NBLK,),
            in_specs=[spec],
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((NBLK, 8, 128), jnp.float32),
        )(x)

    return run


def measure(nchains, iters=30, repeats=5):
    run = make_kernel(nchains, STEPS)

    def chain(key, n_iters):
        x0 = jax.random.normal(key, (NBLK, 8, 128), jnp.float32)

        def body(x, _):
            return run(x) * 1e-38 + x0, None

        out, _ = jax.lax.scan(body, x0, None, length=n_iters)
        return out

    def timed(n_iters):
        f = jax.jit(lambda k: chain(k, n_iters))
        materialize(f(fresh_key()))
        best = float("inf")
        for _ in range(repeats):
            k = fresh_key()
            t0 = time.perf_counter()
            materialize(f(k))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(iters)
    t4 = timed(4 * iters)
    marginal = max(t4 - t1, 1e-9) / (3 * iters)
    flops = NBLK * 8 * 128 * nchains * STEPS * 2  # fma = 2 flops
    return {
        "nchains": nchains,
        "marginal_us_per_call": round(marginal * 1e6, 2),
        "tflops": round(flops / marginal / 1e12, 3),
    }


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--repeats", type=int, default=5)
    args = p.parse_args()
    rows = [measure(c, args.iters, args.repeats) for c in (4, 8, 16, 32)]
    out = {"grid_blocks": NBLK, "steps": STEPS, "rows": rows,
           "peak_tflops_f32": max(r["tflops"] for r in rows)}
    print(json.dumps(out))
    os.makedirs("experiments/output", exist_ok=True)
    with open("experiments/output/vpu_peak.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
