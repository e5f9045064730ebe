"""Measure the NUTS lockstep waste structure and SIMULATE lane compaction.

VERDICT r4 #1/#3 groundwork: before building per-doubling compaction into the
Pallas kernel, measure — from the kernel's own per-particle diagnostics —
exactly how much block-leaf work compaction can remove, for arma AND PRMwCD
at the bench/parity config.

Method: run the fused whole-tree kernel chain at the flat bench scale
(B*N = 25*512 = 12800 particles -> 13 blocks of 1024 lanes), warm to
equilibrium, then record per-particle (depth_done, leapfrogs) for K
iterations. From those two numbers the lane's EXACT per-doubling active-trip
profile is recoverable: a lane that entered dd doublings ran the full 2^d
trips for d < dd-1 and `leapfrogs - (2^(dd-1) - 1)` trips in its last
doubling. A block's executed leaf-trips per doubling is the max over its
lanes (the leaf loop runs while any lane is active), so any candidate
re-packing of lanes into blocks can be costed exactly:

  predicted block cost = sum_d max_{lane in block} trips_d(lane)

We cost: (a) the current packing (calibrates the model against the measured
marginal), (b) single compaction after doubling S for S in 1..6 (survivors
re-packed densely, in order, into fresh 1024-lane blocks), (c) two-stage
compaction (S1, S2). The report is block-leaves per iteration — multiply by
the measured us/leaf to get device time.

Usage: python experiments/compaction_sim.py --model arma -K 30
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from smcnuts_tpu.models import get_model
from smcnuts_tpu.ops.nuts_pallas import nuts_batch_pallas_fused
from smcnuts_tpu.utils.timing import fresh_key, materialize

BLOCK = 1024


def record(model_name, total=12800, iters=30, warm_iters=20, step=0.01,
           max_depth=10):
    model = get_model(model_name)
    tm = model.tile_model
    d = model.dim

    def chain(key, x0, n_iters, with_stats):
        def body(x, k):
            seed = jax.lax.bitcast_convert_type(
                jax.random.key_data(k).ravel()[0], jnp.int32
            )
            x2, _, stats = nuts_batch_pallas_fused(
                tm, x, seed, step, 1.0, max_depth=max_depth
            )
            ys = (stats["depth"], stats["leapfrogs"]) if with_stats else None
            return x2, ys

        keys = jax.random.split(key, n_iters)
        return jax.lax.scan(body, x0, keys)

    x0 = 0.1 * jax.random.normal(fresh_key(), (total, d), jnp.float32)
    warm = jax.jit(lambda k, x: chain(k, x, warm_iters, False)[0])
    x0 = jnp.asarray(materialize(warm(fresh_key(), x0)))
    rec = jax.jit(lambda k, x: chain(k, x, iters, True)[1])
    depth, leaps = materialize(rec(fresh_key(), x0))
    return np.asarray(depth), np.asarray(leaps)  # (iters, total)


def trip_profile(depth, leaps, max_depth):
    """Per-lane per-doubling executed-trip counts, exact.

    depth = number of doublings entered (>=1); leaps = total active trips.
    trips[d] = 2^d for d < depth-1; leaps - (2^(depth-1)-1) for d = depth-1.
    """
    iters, total = depth.shape
    dd = depth.astype(np.int64)
    lf = leaps.astype(np.int64)
    trips = np.zeros((iters, total, max_depth + 1), np.int64)
    for d in range(max_depth + 1):
        full = dd > d + 1
        last = dd == d + 1
        trips[:, :, d] = np.where(
            full, 1 << d, np.where(last, lf - ((1 << d) - 1), 0)
        )
    return trips


def block_cost(trips):
    """trips (iters, total, D+1) -> summed max-per-block cost per iteration;
    lanes are packed consecutively into 1024-lane blocks in given order."""
    iters, total, nd = trips.shape
    nblk = -(-total // BLOCK)
    pad = nblk * BLOCK - total
    if pad:
        trips = np.concatenate(
            [trips, np.zeros((iters, pad, nd), np.int64)], axis=1
        )
    t = trips.reshape(iters, nblk, BLOCK, nd)
    return t.max(axis=2).sum(axis=(1, 2))  # (iters,)


def compact_cost(trips, splits):
    """Cost of the staged scheme: lockstep doublings grouped by `splits`
    boundaries; survivors re-packed densely (original order) at each
    boundary. splits=[] is the current scheme."""
    iters, total, nd = trips.shape
    bounds = list(splits) + [nd]
    costs = np.zeros(iters, np.int64)
    n_active_at = {}
    for it in range(iters):
        order = np.arange(total)
        lo = 0
        for b_i, hi in enumerate(bounds):
            seg = trips[it][order][:, lo:hi]  # (n_active, hi-lo)
            costs[it] += block_cost(seg[None])[0]
            # survivors: any trips beyond hi
            if hi < nd:
                alive = trips[it][order][:, hi:].sum(axis=1) > 0
                order = order[alive]
                n_active_at.setdefault(hi, []).append(len(order))
            lo = hi
    return costs, {k: float(np.mean(v)) for k, v in n_active_at.items()}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", default="arma")
    p.add_argument("--total", type=int, default=12800)
    p.add_argument("-K", "--iters", type=int, default=30)
    p.add_argument("--warm", type=int, default=20)
    p.add_argument("--step-size", type=float, default=0.01)
    p.add_argument("--max-tree-depth", type=int, default=10)
    p.add_argument("--tag", default=None,
                   help="output filename suffix (default: the model name); "
                   "pass e.g. prmwcd_adapted when sweeping a non-default "
                   "step so the parity-config capture is not overwritten")
    args = p.parse_args(argv)

    depth, leaps = record(
        args.model, args.total, args.iters, args.warm, args.step_size,
        args.max_tree_depth,
    )
    trips = trip_profile(depth, leaps, args.max_tree_depth)
    assert (trips.sum(axis=2) == leaps).all(), "trip profile mismatch"

    base = block_cost(trips)
    nblk = -(-args.total // BLOCK)
    out = {
        "model": args.model,
        "total_particles": args.total,
        "blocks": nblk,
        "iters": args.iters,
        "mean_leapfrogs_per_particle": round(float(leaps.mean()), 2),
        "mean_depth": round(float(depth.mean()), 2),
        "depth_hist": {
            str(v): int(c)
            for v, c in zip(*np.unique(depth.astype(int), return_counts=True))
        },
        "current_block_leaves_per_iter": round(float(base.mean()), 1),
        "waste_factor_current": round(
            float(base.mean() / (leaps.mean() * args.total / BLOCK)), 2
        ),
        "ideal_block_leaves_per_iter": round(
            float(leaps.mean() * args.total / BLOCK), 1
        ),
        "schemes": {},
    }
    tag = args.tag or args.model
    np.savez_compressed(
        f"experiments/output/compaction_raw_{tag}.npz",
        depth=depth.astype(np.int16), leaps=leaps.astype(np.int32),
    )
    best = None
    cand = [[s] for s in range(1, 10)]
    cand += [
        [s1, s2] for s1 in range(2, 9) for s2 in range(s1 + 1, 10)
    ]
    cand += [list(range(1, 10))]  # compact at EVERY boundary (scheme limit)
    for splits in cand:
        costs, n_active = compact_cost(trips, splits)
        entry = {
            "block_leaves_per_iter": round(float(costs.mean()), 1),
            "speedup_vs_current": round(float(base.mean() / costs.mean()), 3),
            "mean_survivors_at_split": n_active,
        }
        out["schemes"]["S" + "_".join(map(str, splits))] = entry
        if best is None or costs.mean() < best[1]:
            best = (splits, costs.mean())
    out["best_scheme"] = "S" + "_".join(map(str, best[0]))
    print(json.dumps(out, indent=1))
    os.makedirs("experiments/output", exist_ok=True)
    path = f"experiments/output/compaction_sim_{tag}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"# wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
