"""Compute roofline / MFU for the Pallas NUTS leaf kernels (VERDICT r4 #2).

FLOPs are counted mechanically from the traced jaxpr of each tile model's
`tile_fn` (one model value+gradient evaluation — the dominant cost of a
leaf): every elementwise arith primitive (add/sub/mul/div/neg) is 1 flop
per lane, integer_pow(2) is 1 mul, and transcendentals (exp/log/log1p/
tanh/...) are tallied separately (multi-cycle on the VPU, so flop-MFU is a
LOWER bound on true port utilization). The leaf additionally pays the
leapfrog + tree bookkeeping (~(5D + ~45 + (stop_depth+1) * 4D) vector ops
for kicks/drift/KE/slice/checkpoint-U-turn compares), which the measured
per-leaf time includes — tallied here analytically so the denominator and
numerator match the same unit of work.

The peak used for MFU is the MEASURED sustained VPU fma rate at the same
shapes (experiments/bench_vpu_peak.py -> vpu_peak.json), not a clock-sheet
number: the leaf kernels are f32 elementwise code with data baked as
immediates — no MXU, no HBM traffic in the loop — so the VPU issue rate is
their speed of light. HBM roofline for completeness: one SMC iteration
moves only the particle state (~2 * n_pad * (11D+13) * 4 B with the
compaction bundles, ~3 MB at the bench shape = ~4 us at 819 GB/s v5e),
i.e. the kernel is compute-bound by >100x.

Usage: python experiments/roofline.py   (no TPU needed for the counts;
reads measured leaf times/peaks from experiments/output/*.json if present)
"""

import json
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

ARITH = {"add", "add_any", "sub", "mul", "div", "neg", "max", "min",
         "select_n", "abs", "sign", "and", "or", "xor", "gt", "lt", "ge",
         "le", "eq", "ne"}
TRANSCENDENTAL = {"exp", "log", "log1p", "tanh", "logistic", "sqrt",
                  "rsqrt", "pow", "cos", "sin", "cbrt", "expm1"}
LANES = 1024  # (8, 128) tile


def count_tile_fn(tm):
    x_tiles = [jax.ShapeDtypeStruct((8, 128), jnp.float32)] * tm.dim
    phi = jax.ShapeDtypeStruct((8, 128), jnp.float32)
    jaxpr = jax.make_jaxpr(lambda xt, p: tm.tile_fn((), xt, p))(x_tiles, phi)
    c = Counter()
    for e in jaxpr.jaxpr.eqns:
        name = e.primitive.name
        if name == "integer_pow":
            c["arith"] += abs(int(e.params.get("y", 2))) - 1
        elif name in ARITH:
            c["arith"] += 1
        elif name in TRANSCENDENTAL:
            c["transcendental"] += 1
        elif name in ("reduce_sum", "reduce_max"):
            # axes=() forms are no-ops; real data-axis reductions inside a
            # tile body keep the lane axes and cost ~input size
            if e.params.get("axes"):
                c["arith"] += 1
        else:
            c["other"] += 1
    return dict(c)


def leaf_overhead_ops(D, mean_stop_depth):
    """Vector ops per leaf outside the model eval: 2 half-kicks (2*2D) +
    drift (3D) + KE (3D) + joint/divergence/slice/progressive (~25) +
    checkpoint U-turn slot loop (~(stop+1) * (4D + 3) masked compares) +
    store masks (~6D)."""
    return 4 * D + 3 * D + 3 * D + 25 + int(
        (mean_stop_depth + 1) * (4 * D + 3)
    ) + 6 * D


def main():
    from smcnuts_tpu.models import get_model

    outdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "output")

    def load(name):
        p = os.path.join(outdir, name)
        return json.load(open(p)) if os.path.exists(p) else None

    peak = load("vpu_peak.json")
    peak_tf = peak["peak_tflops_f32"] if peak else None

    rows = []
    for model_name, leaf_us, stop in (("arma", 1.214, 4), ("prmwcd", 1.401, 9)):
        tm = get_model(model_name).tile_model
        c = count_tile_fn(tm)
        ov = leaf_overhead_ops(tm.dim, stop)
        flops_lane = c.get("arith", 0) + ov
        trans_lane = c.get("transcendental", 0)
        flops_leaf = flops_lane * LANES
        achieved_tf = flops_leaf / (leaf_us * 1e-6) / 1e12
        row = {
            "model": model_name,
            "D": tm.dim,
            "model_arith_ops_per_lane": c.get("arith", 0),
            "transcendentals_per_lane": trans_lane,
            "leaf_overhead_ops_per_lane": ov,
            "flops_per_1024lane_leaf": flops_leaf,
            "measured_us_per_leaf": leaf_us,
            "achieved_tflops_f32": round(achieved_tf, 3),
        }
        if peak_tf:
            row["vpu_peak_tflops_f32_measured"] = peak_tf
            row["mfu_pct_vs_measured_vpu_peak"] = round(
                100 * achieved_tf / peak_tf, 1
            )
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = {
        "note": (
            "flop-MFU is a lower bound: transcendentals (counted "
            "separately) are multi-cycle, and the masked checkpoint "
            "compares are estimated analytically"
        ),
        "hbm_roofline": (
            "per-iteration HBM traffic ~3 MB at the bench shape "
            "(~4 us at 819 GB/s) vs ~600 us compute: compute-bound >100x"
        ),
        "rows": rows,
    }
    with open(os.path.join(outdir, "roofline.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(f"# wrote {os.path.join(outdir, 'roofline.json')}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
