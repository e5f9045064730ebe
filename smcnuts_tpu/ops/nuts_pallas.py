"""The complete NUTS proposal as ONE Pallas TPU kernel.

The XLA formulation (ops/nuts.py) advances the whole particle block one
leapfrog per `lax.while_loop` trip; every trip dispatches ~70 small device ops
(leapfrog + model value/grad + tree bookkeeping), so at typical tree sizes a
single SMC iteration costs hundreds of op launches. This module instead runs
the entire tree construction — doubling loop, leaf loop, leapfrogs, model
evaluation, progressive sampling, checkpointed U-turn detection — inside one
`pl.pallas_call`: one kernel launch per SMC iteration, all state resident in
VMEM/vregs, the model evaluated by an inlined tile function.

This is the BASELINE.json north-star kernel: "the NUTS tree-build/leapfrog
proposal runs as a vmapped, fixed-depth, mask-based Pallas kernel over all N
particles simultaneously".

Layout: particles live across (sublane, lane) positions of (8, 128) f32
tiles; a position is a list of D such tiles; a grid step processes 1024
particles. Per-particle control divergence is handled with explicit lane
masks (the vmap-of-while semantics of ops/nuts.py, hand-lowered): all lanes
in a block walk the deepest active tree; frozen lanes keep their state.

Algorithmic semantics are identical to ops/nuts.py (same progressive
sampling, same checkpoint U-turn scheme, same divergence guard); the RNG
stream is the TPU PRNG rather than threefry, so cross-checks are statistical.

Model plug-in: a `TileModel` provides extra data arrays and a
`tile_fn(extra_refs, x_tiles, phi) -> (logp_tile, grad_tiles)` written in
Pallas-compatible ops. `arma_tile_model()` implements the ARMA(1,1) target
(reference stan_models/arma/arma.stan) with the fused value+tangent
recurrences of ops/arma_fused.py inlined per leaf.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .nuts import DIVERGENCE_THRESHOLD, MAX_TREE_DEPTH

_LANES = 128
_SUBLANES = 8
_BLOCK = _LANES * _SUBLANES

_INV_2_24 = float(2.0**-24)


@dataclasses.dataclass(frozen=True, eq=False)
class TileModel:
    """Model plug-in for in-kernel evaluation.

    eq=False keeps identity hashing (the fields hold unhashable arrays),
    which the per-instance kernel cache below relies on."""

    dim: int
    extra: Sequence[jnp.ndarray]  # data arrays, passed through SMEM
    tile_fn: Callable  # (extra_refs, x_tiles list[D], phi) -> (logp, grads)
    # Gradient provenance: "hand" (fused tangent recurrences written by
    # hand), "reverse" (in-kernel jax.vjp), or "forward" (per-coordinate
    # in-kernel jax.jvp). Informational — lets callers/tests see which
    # strategy the Stan frontend's auto selection picked.
    autodiff: str = "hand"
    # Default lane-compaction split depths for this model (used when
    # SMCConfig.pallas_compaction == "auto"): tree-depth boundaries after
    # which unfinished lanes are packed densely across blocks. Chosen from
    # the measured equilibrium depth distribution (experiments/
    # compaction_sim.py); () = no compaction (safe for any model — the
    # single-kernel dispatch).
    compaction_hint: tuple = ()
    # Split depths when step-size adaptation is ON (trees shrink to the
    # acceptance target, so the paying boundaries move earlier); None
    # falls back to compaction_hint.
    compaction_hint_adapted: tuple | None = None


def _popcount_scalar(v, bits=13):
    """Scalar popcount via shift-and-mask (Mosaic's population_count is
    vector-only). Leaf indices are < 2^(max_depth+1) <= 2^11."""
    c = jnp.zeros((), jnp.int32)
    for i in range(bits):
        c = c + (jax.lax.shift_right_logical(v, jnp.int32(i)) & jnp.int32(1))
    return c


def _uniform(shape):
    bits = pltpu.prng_random_bits(shape)
    # 24 high bits -> (0, 1]: never exactly 0 so -log(u) is finite. The
    # shifted value fits in 24 bits, so the int32 view is non-negative
    # (Mosaic has no uint32->f32 cast).
    u24 = jax.lax.shift_right_logical(
        pltpu.bitcast(bits, jnp.uint32), jnp.uint32(8)
    )
    return (pltpu.bitcast(u24, jnp.int32).astype(jnp.float32) + 1.0) * _INV_2_24


_TWO_PI = float(2.0 * np.pi)


def _normal(shape):
    """Standard normal via Box–Muller (cosine branch; Mosaic lowers sin/cos
    natively). u1 in (0, 1] keeps log finite; u1 == 1 gives exactly 0."""
    u1 = _uniform(shape)
    u2 = _uniform(shape)
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(_TWO_PI * u2)


def _cont_layout(D):
    """Column index map of the continuation bundle a compaction stage
    transfers between kernels (VERDICT r4 #1): every per-lane carrier of the
    doubling loop plus the start-state values the final epilogue needs, one
    (8, 128) f32 tile row per column — 11*D + 13 columns. Keeping the
    bundle ONE array in the kernel-native (C, nblk, 8, 128) layout lets the
    XLA glue compact lanes with a single axis-1 gather (reshape to
    (C, n_pad), take along the flat particle axis) and feed the next stage
    without any transposes (measured: the (n_pad, 56) transpose costs
    ~44 us on v5e — 3x the gather itself — while reshape is free)."""
    idx = {}
    c = 0
    for nm in ("xm", "rm", "gm", "xp", "rp", "gp", "xs", "rs", "x0", "r0",
               "im"):
        idx[nm] = c
        c += D
    for nm in ("lps", "n", "logu", "H0", "logp0", "ke0", "alpha_sum",
               "alpha_cnt", "lf_cnt", "depth_done", "stopf", "phi", "eps"):
        idx[nm] = c
        c += 1
    return idx, c


def _epi_layout(D):
    """Column index map of the bundled epilogue output on the compacted
    path: one (C2, nblk, 8, 128) array so a single axis-1 gather
    un-permutes every output back to original lane order at once."""
    idx = {}
    c = 0
    for nm in ("x", "r"):
        idx[nm] = c
        c += D
    for nm in ("logp0", "lp", "astat", "depth", "leaf", "dh", "ke0",
               "moved"):
        idx[nm] = c
        c += 1
    return idx, c


def _nuts_kernel(
    *refs,
    tile_fn, D, max_depth, n_extra, n_per_run, n_runs,
    draw_momentum=False, acc_rej=False,
    start_depth=0, stop_depth=None, cont_in=False, cont_out=False,
):
    """One NUTS tree-construction stage.

    The classic single-kernel form (cont_in=cont_out=False) builds whole
    trees: prologue (momentum draw, model eval, slice draw), doubling loop
    over depths 0..max_depth, SMC epilogue. With lane COMPACTION (VERDICT
    r4 #1) the tree is split at doubling boundaries: a stage runs doublings
    start_depth..stop_depth and the XLA glue between stages packs the
    unfinished lanes densely into the leading blocks (the finished majority
    would otherwise idle while their block walks its deepest lane's tree —
    measured 4.3x lockstep waste on arma, experiments/output/
    compaction_sim_arma.json). All survivors sit at the same tree depth at
    a boundary (the lockstep walk is depth-synchronous), so the
    continuation is uniform: stage j+1 starts every lane at depth
    stop_depth+1 with the carriers read from the continuation bundle.

    Ref layout: stage 0 takes (seed, nvalid, phi, eps, im, x[, r], *extra,
    *outs, ck_x, ck_r); continuation stages take (seed, cont, *extra,
    *outs, ck_x, ck_r) with per-lane parameters riding the bundle.
    Outputs: cont_out -> the (C, 1, 8, 128) bundle; otherwise the epilogue
    (separate refs on the classic path, one bundled array on the compacted
    path)."""
    if stop_depth is None:
        stop_depth = max_depth
    if cont_in:
        seed_ref, cont_ref = refs[0], refs[1]
        rest = refs[2:]
        r_ref = None
    else:
        (seed_ref, nvalid_ref, phi_ref, eps_ref, im_ref, x_ref) = refs[:6]
        rest = refs[6:]
        if draw_momentum:
            r_ref = None
        else:
            r_ref = rest[0]
            rest = rest[1:]
    extra_refs = rest[:n_extra]
    outs = rest[n_extra:-2]
    ck_x, ck_r = rest[-2:]

    # Grid is (nblk,) over a FLAT particle axis: batched SMC runs (jax.vmap
    # Monte-Carlo replicas) are concatenated along it, so blocks pack full —
    # a run whose N is below the 1024-lane block shares its block with the
    # next run instead of wasting idle lanes (25 runs x 512 particles = 13
    # full blocks rather than 25 half-empty ones). Run-level parameters
    # (phi, step size, inverse mass) therefore arrive as PER-LANE tiles;
    # every use below is elementwise, so mixed-run blocks are exact.
    blk = pl.program_id(0)
    shape = (_SUBLANES, _LANES)
    if cont_in:
        # Continuation stage: compaction has moved lanes across runs and
        # blocks, so the per-run seed mix is meaningless here. The XLA glue
        # folds ALL run seeds into one scalar (every run's seed still
        # perturbs every stream) and the stage start depth salts it so
        # stages draw distinct streams.
        pltpu.prng_seed(
            seed_ref[0] + jnp.int32(start_depth * 7919),
            blk * jnp.int32(1000003),
        )
        CIDX, _ = _cont_layout(D)

        def cread(nm, k=0):
            return cont_ref[CIDX[nm] + k, 0]

        phi = cread("phi")
        eps = cread("eps")
        im = [cread("im", d) for d in range(D)]

        def model(x_tiles):
            return tile_fn(extra_refs, x_tiles, phi)

        x0 = [cread("x0", d) for d in range(D)]
        r0 = [cread("r0", d) for d in range(D)]
        f0 = x0[0] * 0.0

        def ke(r_tiles):
            acc = f0
            for d in range(D):
                acc = acc + im[d] * r_tiles[d] * r_tiles[d]
            return 0.5 * acc

        logp0 = cread("logp0")
        ke0 = cread("ke0")
        H0 = cread("H0")
        logu = cread("logu")
        xm = [cread("xm", d) for d in range(D)]
        rm = [cread("rm", d) for d in range(D)]
        gm = [cread("gm", d) for d in range(D)]
        xp = [cread("xp", d) for d in range(D)]
        rp = [cread("rp", d) for d in range(D)]
        gp = [cread("gp", d) for d in range(D)]
        xs = [cread("xs", d) for d in range(D)]
        rs = [cread("rs", d) for d in range(D)]
        lps = cread("lps")
        n = cread("n")
        stopf = cread("stopf")
        alpha_sum = cread("alpha_sum")
        alpha_cnt = cread("alpha_cnt")
        lf_cnt = cread("lf_cnt")
        depth_done = cread("depth_done")
    else:
        # Stream decorrelation: one PRNG stream per block, seeded from EVERY
        # run whose particles can land in this block (a block spanning two
        # runs must respond to either run's seed — seeding from run0 alone
        # would silently ignore the second run's seed; ADVICE r1). The count
        # of runs per block is a static bound, so the mix is straight-line
        # scalar code. For a single-block-aligned run (B=1, or N a multiple
        # of the 1024-lane block) this reduces to the historical
        # seed + blk * 1000003 stream.
        run0 = (blk * jnp.int32(_BLOCK)) // jnp.int32(n_per_run)
        if n_per_run % _BLOCK == 0:
            max_runs_in_block = 1
        else:
            max_runs_in_block = min(n_runs, (_BLOCK - 1) // n_per_run + 2)
        if max_runs_in_block == 1:
            pltpu.prng_seed(seed_ref[run0] + blk * jnp.int32(1000003))
        else:
            # Mosaic's tpu.prng_set_seed_32 accepts AT MOST TWO scalar
            # values, so the seeds of every covered run are folded into one
            # 32-bit polynomial hash (wrapping int32 arithmetic) — each
            # run's seed still perturbs the block's stream — and the block
            # id is the second value.
            last = jnp.int32(n_runs - 1)
            mixed = jnp.int32(0)
            for j in range(max_runs_in_block):
                mixed = mixed * jnp.int32(65599) + seed_ref[
                    jnp.minimum(run0 + jnp.int32(j), last)
                ]
            pltpu.prng_seed(mixed, blk * jnp.int32(1000003))
        phi = phi_ref[0]
        eps = eps_ref[0]
        # Diagonal inverse mass matrix (identity in the reference,
        # nuts.py:67): kinetic energy 0.5 r^T M^{-1} r, drift
        # x += eps * M^{-1} r, U-turn criterion on velocities M^{-1} r —
        # same math as ops/nuts.py.
        im = [im_ref[0, d] for d in range(D)]

        def model(x_tiles):
            return tile_fn(extra_refs, x_tiles, phi)

        x0 = [x_ref[0, d] for d in range(D)]
        if draw_momentum:
            # Fused-epilogue mode: momenta r0 ~ N(0, M) with M = diag(1/im)
            # drawn by the in-kernel TPU PRNG (std = rsqrt(im)) — the
            # host-side threefry draw, its HBM round trip, and the
            # momentum-density XLA ops all disappear (VERDICT r3 #1).
            r0 = [_normal(shape) * jax.lax.rsqrt(im[d]) for d in range(D)]
        else:
            r0 = [r_ref[0, d] for d in range(D)]
        # Materialized zero tile: splat-constant zeros get a replicated
        # vector layout in Mosaic, which cannot be carried through while
        # loops whose bodies produce materialized layouts ("Invalid
        # relayout" otherwise).
        f0 = x0[0] * 0.0

        def ke(r_tiles):
            acc = f0
            for d in range(D):
                acc = acc + im[d] * r_tiles[d] * r_tiles[d]
            return 0.5 * acc

        logp0, g0 = model(x0)
        ke0 = ke(r0)
        H0 = logp0 - ke0
        logu = H0 - (-jnp.log(_uniform(shape)))

        xm, rm, gm = list(x0), list(r0), list(g0)
        xp, rp, gp = list(x0), list(r0), list(g0)
        xs, rs = list(x0), list(r0)
        lps = logp0
        n = f0 + 1.0
        # Padding lanes (particle index >= N) start stopped so they never
        # force extra leaf-loop trips for their block.
        row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
        col = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
        pidx = blk * jnp.int32(_BLOCK) + row * jnp.int32(_LANES) + col
        # Stop state carried as f32 (1.0 = stopped): Mosaic cannot carry i1
        # vectors through scf.while.
        stopf = jnp.where(pidx >= nvalid_ref[0], f0 + 1.0, f0)
        alpha_sum = f0
        alpha_cnt = f0
        lf_cnt = f0
        depth_done = f0

    # Doubling loop with early exit: once every lane of the block has
    # stopped (U-turn/divergence), remaining depths are skipped instead of
    # walking all max_depth+1 doublings with all-false masks (typical trees
    # stop at depth 3-6 of 10 — the idle doublings otherwise cost more than
    # the useful ones at warm equilibrium).
    def tree_cond(c):
        depth, stopf = c[0], c[1]
        return (depth <= stop_depth) & jnp.any(stopf < 0.5)

    def tree_body(c):
        (depth, stopf, xm, rm, gm, xp, rp, gp, xs, rs, lps, n,
         alpha_sum, alpha_cnt, lf_cnt, depth_done) = c
        active = stopf < 0.5
        direction = jnp.where(_uniform(shape) < 0.5, 1.0, -1.0)
        back = direction < 0

        x = [jnp.where(back, xm[d], xp[d]) for d in range(D)]
        r = [jnp.where(back, rm[d], rp[d]) for d in range(D)]
        g = [jnp.where(back, gm[d], gp[d]) for d in range(D)]

        num_leaves = jax.lax.shift_left(jnp.int32(1), depth)

        def leaf_body(carry, active=active, direction=direction):
            # sstop is carried as f32 (1.0 = stopped): Mosaic cannot carry
            # i1 vectors through scf.while.
            (leaf, x, r, g, xpr, rpr, lppr, nsub, sstop,
             alpha_sum, alpha_cnt, lf_cnt) = carry
            act = (sstop < 0.5) & active

            deps = direction * eps
            r_half = [r[d] + 0.5 * deps * g[d] for d in range(D)]
            x1 = [x[d] + deps * im[d] * r_half[d] for d in range(D)]
            lp1, g1 = model(x1)
            r1 = [r_half[d] + 0.5 * deps * g1[d] for d in range(D)]

            joint = lp1 - ke(r1)
            ok = (joint == joint) & (jnp.abs(joint) < jnp.inf)
            valid = ok & (logu < joint) & act
            div = act & (
                jnp.logical_not(ok)
                | ((logu - DIVERGENCE_THRESHOLD) >= joint)
            )

            nsub = nsub + valid.astype(jnp.float32)
            take = valid & (_uniform(shape) * nsub < 1.0)
            xpr = [jnp.where(take, x1[d], xpr[d]) for d in range(D)]
            rpr = [jnp.where(take, r1[d], rpr[d]) for d in range(D)]
            lppr = jnp.where(take, lp1, lppr)

            alpha = jnp.where(
                act & ok, jnp.minimum(1.0, jnp.exp(joint - H0)), 0.0
            )
            alpha_sum = alpha_sum + alpha
            alpha_cnt = alpha_cnt + act.astype(jnp.float32)
            lf_cnt = lf_cnt + act.astype(jnp.float32)

            leaf32 = leaf.astype(jnp.int32)
            idx_max = _popcount_scalar(
                jax.lax.shift_right_logical(leaf32, jnp.int32(1))
            )
            t_ones = _popcount_scalar(leaf32 ^ (leaf32 + 1)) - 1
            idx_min = idx_max - t_ones + 1
            is_even = (leaf32 % 2) == 0

            @pl.when(is_even)
            def _store():
                for d in range(D):
                    ck_x[idx_max, d] = jnp.where(
                        act, x1[d], ck_x[idx_max, d]
                    )
                    ck_r[idx_max, d] = jnp.where(
                        act, r1[d], ck_r[idx_max, d]
                    )

            turned = f0 > 1.0
            # Checkpoint slots used within a doubling at depth d are <= d,
            # and this stage walks depths <= stop_depth — shallower stages
            # skip the dead upper slots' masked compares entirely.
            for slot in range(stop_depth + 1):
                in_range = (
                    jnp.logical_not(is_even)
                    & (slot >= idx_min)
                    & (slot <= idx_max)
                )
                v_ck = f0
                v_lf = f0
                for d in range(D):
                    dx = direction * (x1[d] - ck_x[slot, d])
                    v_ck = v_ck + dx * im[d] * ck_r[slot, d]
                    v_lf = v_lf + dx * im[d] * r1[d]
                turned = turned | (in_range & ((v_ck < 0) | (v_lf < 0)))

            sstop = jnp.maximum(
                sstop, jnp.where(div | (turned & act), f0 + 1.0, f0)
            )
            x = [jnp.where(act, x1[d], x[d]) for d in range(D)]
            r = [jnp.where(act, r1[d], r[d]) for d in range(D)]
            g = [jnp.where(act, g1[d], g[d]) for d in range(D)]
            return (leaf + 1, x, r, g, xpr, rpr, lppr, nsub, sstop,
                    alpha_sum, alpha_cnt, lf_cnt)

        def leaf_cond(carry, active=active):
            leaf = carry[0]
            sstop = carry[8]
            return (leaf < num_leaves) & jnp.any((sstop < 0.5) & active)

        carry0 = (
            jnp.zeros((), jnp.int32), x, r, g,
            [x[d] for d in range(D)], [r[d] for d in range(D)], lps,
            f0, stopf, alpha_sum, alpha_cnt, lf_cnt,
        )
        (_, x, r, g, xpr, rpr, lppr, nsub, sstop,
         alpha_sum, alpha_cnt, lf_cnt) = lax.while_loop(
            leaf_cond, leaf_body, carry0
        )

        fwd = active & jnp.logical_not(back)
        bwd = active & back
        for d in range(D):
            xm[d] = jnp.where(bwd, x[d], xm[d])
            rm[d] = jnp.where(bwd, r[d], rm[d])
            gm[d] = jnp.where(bwd, g[d], gm[d])
            xp[d] = jnp.where(fwd, x[d], xp[d])
            rp[d] = jnp.where(fwd, r[d], rp[d])
            gp[d] = jnp.where(fwd, g[d], gp[d])

        sub_ok = active & (sstop < 0.5)
        accept = sub_ok & (_uniform(shape) * n < nsub)
        for d in range(D):
            xs[d] = jnp.where(accept, xpr[d], xs[d])
            rs[d] = jnp.where(accept, rpr[d], rs[d])
        lps = jnp.where(accept, lppr, lps)
        n = n + jnp.where(active, nsub, 0.0)

        v_m = f0
        v_p = f0
        for d in range(D):
            dx = xp[d] - xm[d]
            v_m = v_m + dx * im[d] * rm[d]
            v_p = v_p + dx * im[d] * rp[d]
        turned_g = (v_m < 0) | (v_p < 0)
        stopf = jnp.maximum(
            stopf,
            jnp.where(active & ((sstop > 0.5) | turned_g), f0 + 1.0, f0),
        )
        depth_done = depth_done + jnp.where(active, f0 + 1.0, f0)
        return (depth + 1, stopf, xm, rm, gm, xp, rp, gp, xs, rs, lps, n,
                alpha_sum, alpha_cnt, lf_cnt, depth_done)

    # Carried stop state only matters while lanes may still run: a
    # non-final stage's surviving lanes continue in the next stage, so the
    # while-loop's stopf is what gets exported (padding/finished lanes ride
    # with stopf = 1.0 and sort to the back at the compaction boundary).
    (_, stopf, xm, rm, gm, xp, rp, gp, xs, rs, lps, n,
     alpha_sum, alpha_cnt, lf_cnt, depth_done) = lax.while_loop(
        tree_cond, tree_body,
        (jnp.int32(start_depth), stopf, xm, rm, gm, xp, rp, gp, xs, rs,
         lps, n, alpha_sum, alpha_cnt, lf_cnt, depth_done),
    )

    if cont_out:
        # Non-final stage: export the continuation bundle; the epilogue
        # (incl. the accept-reject draw) runs EXACTLY ONCE, in the final
        # stage, so no output here may consume randomness on behalf of a
        # finished lane.
        CIDX_O, _ = _cont_layout(D)
        co = outs[0]
        groups = {"xm": xm, "rm": rm, "gm": gm, "xp": xp, "rp": rp,
                  "gp": gp, "xs": xs, "rs": rs, "x0": x0, "r0": r0,
                  "im": im}
        for nm, vals in groups.items():
            for d in range(D):
                co[CIDX_O[nm] + d, 0] = vals[d]
        scalars = {"lps": lps, "n": n, "logu": logu, "H0": H0,
                   "logp0": logp0, "ke0": ke0, "alpha_sum": alpha_sum,
                   "alpha_cnt": alpha_cnt, "lf_cnt": lf_cnt,
                   "depth_done": depth_done, "stopf": stopf,
                   "phi": phi, "eps": eps}
        for nm, val in scalars.items():
            co[CIDX_O[nm], 0] = val
        return

    # SMC-iteration epilogue, fused in-kernel: Hamiltonian difference of the
    # selected leaf vs the start state. For the forwards-L-kernel weight
    # update the momentum-density constants cancel, so
    # dlogw = logp1' - logp1 + L(-r'|x') - q(r) reduces to exactly dh on the
    # non-tempered path (reference samples.py:183-196 collapses to H' - H0).
    dh = (lps - ke(rs)) - H0
    if acc_rej:
        # Asymptotic strategy: vectorized MH accept-reject at temperature
        # phi (reference nuts_acc_rej.py:42-49, utils.py:22-34) — rejected
        # lanes revert position AND momentum; NaN dh rejects (comparison is
        # false). u <= min(1, exp(dh)) computed as u <= exp(min(dh, 0)).
        u = _uniform(shape)
        acc = u <= jnp.exp(jnp.minimum(dh, 0.0))
        for d in range(D):
            xs[d] = jnp.where(acc, xs[d], x0[d])
            rs[d] = jnp.where(acc, rs[d], r0[d])
        lps = jnp.where(acc, lps, logp0)
    # Acceptance metric numerator, computed in-kernel: 1.0 iff the particle
    # moved in EVERY dimension (reference smc_sampler.py:97 quirk) — saves
    # the host-side (N, D) compare + all-reduce per iteration.
    moved = f0 + 1.0
    for d in range(D):
        moved = moved * jnp.where(xs[d] != x0[d], 1.0, 0.0)
    astat = alpha_sum / jnp.maximum(alpha_cnt, 1.0)
    leaf_total = lf_cnt + 1.0
    if cont_in:
        # Compacted path: ONE bundled output so the glue un-permutes all
        # outputs with a single axis-1 gather.
        EIDX, _ = _epi_layout(D)
        eo = outs[0]
        for d in range(D):
            eo[EIDX["x"] + d, 0] = xs[d]
            eo[EIDX["r"] + d, 0] = rs[d]
        for nm, val in (("logp0", logp0), ("lp", lps), ("astat", astat),
                        ("depth", depth_done), ("leaf", leaf_total),
                        ("dh", dh), ("ke0", ke0), ("moved", moved)):
            eo[EIDX[nm], 0] = val
        return
    (x_out, r_out, logp0_out, lp_out, astat_out, depth_out, leaf_out,
     dh_out, ke0_out, moved_out) = outs
    for d in range(D):
        x_out[0, d] = xs[d]
        r_out[0, d] = rs[d]
    logp0_out[0] = logp0
    lp_out[0] = lps
    astat_out[0] = astat
    depth_out[0] = depth_done
    leaf_out[0] = leaf_total
    dh_out[0] = dh
    ke0_out[0] = ke0
    moved_out[0] = moved


def _nuts_pallas_batched(tile_model: TileModel, x, r, seed, step_size, phi,
                         inv_mass, max_depth, interpret,
                         draw_momentum=False, acc_rej=False,
                         compaction=()):
    """Batched core: x, r are (B, N, D); seed (B,) int32; step_size, phi
    (B,) f32; inv_mass (B, D) f32. With `draw_momentum` the momenta are
    drawn in-kernel (pass r=None); with `acc_rej` the asymptotic MH
    accept-reject runs in the kernel epilogue and x/r/logp outputs are the
    post-accept state.

    The B runs are FLATTENED into one (B*N)-particle axis so kernel blocks
    pack full: with N below the 1024-lane block size, separate per-run grids
    would leave every block part-idle (e.g. the 25-run reference-config batch
    = 25 half-empty blocks), whereas the flat layout runs ceil(B*N/1024)
    full blocks (13). Run-level parameters become per-lane tiles; every use
    in the kernel is elementwise, so blocks holding particles of two runs
    compute each lane under its own run's (phi, step size, inverse mass).

    `compaction` (VERDICT r4 #1): doubling depths after which the tree
    build pauses and the UNFINISHED lanes are packed densely into the
    leading blocks before a continuation kernel resumes them. Most
    particles finish shallow (arma: mean depth 3.7, but each 1024-lane
    block walks its deepest lane's tree — measured 4.3x lockstep waste);
    after doubling 4 only ~16% of lanes survive, so the deep doublings run
    on 2 blocks instead of 13 (compaction_sim_arma.json: 2.23x fewer
    block-leaves at splits=(4,)). The glue per boundary is one stable
    argsort of the finished flag (~3 us at the bench shape), one axis-1
    gather of the (11D+13)-column continuation bundle (~15 us), and one
    composed inverse gather of the bundled epilogue at the end — all
    measured in experiments/bench_gather.py. Lane permutations never leak:
    outputs return in original lane order, so batched multi-run packing is
    unaffected. The continuation stages draw fresh PRNG streams (compacted
    lanes change blocks), so — like every other RNG realization change on
    this kernel — cross-checks against the unstaged kernel are statistical;
    under the interpreter's stubbed PRNG both paths are deterministic and
    bitwise equal (tested).
    """
    D = tile_model.dim
    B, n = x.shape[0], x.shape[1]
    total = B * n
    n_pad = -(-total // _BLOCK) * _BLOCK
    nblk = n_pad // _BLOCK

    def to_tiles(a, fill=0.0):
        # Particle p -> (block p//1024, sublane (p%1024)//128, lane p%128).
        ap = jnp.full((n_pad, D), fill, jnp.float32).at[:total].set(a)
        return ap.T.reshape(D, nblk, _SUBLANES, _LANES).transpose(1, 0, 2, 3)

    def to_flat_tiles(a, fill=0.0):
        ap = jnp.full((n_pad,), fill, jnp.float32).at[:total].set(a)
        return ap.reshape(nblk, _SUBLANES, _LANES)

    def per_particle(v):
        # (B,) or (B, D) run-level values -> per-particle along the flat axis.
        return jnp.repeat(v, n, axis=0, total_repeat_length=total)

    x_t = to_tiles(x.reshape(total, D))
    r_t = None if draw_momentum else to_tiles(r.reshape(total, D))
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(B)
    # Padding lanes (flat index >= total) are permanently masked inside the
    # kernel (they start stopped), but their per-lane PARAMETERS are padded
    # with benign values (1.0) rather than zeros: phi/eps/inv_mass of 0 can
    # manufacture NaNs (0 * inf) in the dead lanes, and while every consumer
    # is currently lane-masked, NaN-free dead lanes are one less invariant a
    # future edit can silently break (ADVICE r1).
    phi_t = to_flat_tiles(
        per_particle(jnp.asarray(phi, jnp.float32).reshape(B)), fill=1.0
    )
    eps_t = to_flat_tiles(
        per_particle(jnp.asarray(step_size, jnp.float32).reshape(B)), fill=1.0
    )
    im_t = to_tiles(
        per_particle(jnp.asarray(inv_mass, jnp.float32).reshape(B, D)),
        fill=1.0,
    )
    nvalid_arr = jnp.asarray(total, jnp.int32).reshape(1)

    tile_spec = pl.BlockSpec(
        (1, D, _SUBLANES, _LANES), lambda i: (i, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    flat_spec = pl.BlockSpec(
        (1, _SUBLANES, _LANES), lambda i: (i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    flat_shape = jax.ShapeDtypeStruct(
        (nblk, _SUBLANES, _LANES), jnp.float32
    )
    tile_shape = jax.ShapeDtypeStruct(
        (nblk, D, _SUBLANES, _LANES), jnp.float32
    )

    common = dict(
        tile_fn=tile_model.tile_fn,
        D=D,
        max_depth=max_depth,
        n_extra=len(tile_model.extra),
        n_per_run=n,
        n_runs=B,
        draw_momentum=draw_momentum,
        acc_rej=acc_rej,
    )
    kernel = partial(_nuts_kernel, **common)

    inputs = [seed_arr, nvalid_arr, phi_t, eps_t, im_t, x_t]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (B,)
        pl.BlockSpec(memory_space=pltpu.SMEM),  # n valid
        flat_spec,  # phi per lane
        flat_spec,  # eps per lane
        tile_spec,  # inv mass diag per lane
        tile_spec,  # x
    ]
    if not draw_momentum:
        inputs.append(r_t)
        in_specs.append(tile_spec)  # r
    inputs.extend(tile_model.extra)
    in_specs.extend(
        pl.BlockSpec(memory_space=pltpu.SMEM) for _ in tile_model.extra
    )

    # Raise the scoped-vmem ceiling from the 16 MB default toward the
    # chip's 128 MB: hand tile models need little, but the generic
    # adapter (tile_model_from_logp) holds a model body's unrolled VJP
    # residuals on the kernel stack (measured 38 MB for a T=40
    # recurrence).
    cparams = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    # TPU-semantics interpreter (supports the TPU PRNG primitives).
    imode = pltpu.InterpretParams() if interpret else False

    def ck_scratch(n_slots):
        return [
            pltpu.VMEM((n_slots, D, _SUBLANES, _LANES), jnp.float32),
            pltpu.VMEM((n_slots, D, _SUBLANES, _LANES), jnp.float32),
        ]

    splits = tuple(
        sorted({int(s) for s in (compaction or ()) if 0 < int(s) < max_depth})
    )
    max_blocks = int(os.environ.get("SMCNUTS_COMPACTION_MAX_BLOCKS", "128"))
    if nblk == 1 or nblk > max_blocks:
        # nblk == 1: compaction packs lanes ACROSS blocks; within a single
        # block the permutation changes nothing about the lockstep walk —
        # pure glue overhead. nblk > 128 (N > 131,072): the glue's argsort
        # + gathers scale with N while the recoverable waste per particle
        # is constant, and the measured crossover is between 128 and 256
        # blocks (scaling.json round 5: compaction +17-22% at N=32k-131k,
        # -20% at N=262k). Fall through to the single-kernel dispatch;
        # large-N runs keep the uncompacted plateau.
        splits = ()

    def from_tiles(a):
        flat = a.transpose(1, 0, 2, 3).reshape(D, n_pad).T[:total]
        return flat.reshape(B, n, D)

    def from_flat(a):
        return a.reshape(n_pad)[:total].reshape(B, n)

    if not splits:
        outs = pl.pallas_call(
            kernel,
            grid=(nblk,),
            in_specs=in_specs,
            out_specs=[
                tile_spec, tile_spec, flat_spec, flat_spec, flat_spec,
                flat_spec, flat_spec, flat_spec, flat_spec, flat_spec,
            ],
            out_shape=[
                tile_shape, tile_shape, flat_shape, flat_shape, flat_shape,
                flat_shape, flat_shape, flat_shape, flat_shape, flat_shape,
            ],
            scratch_shapes=ck_scratch(max_depth + 1),
            compiler_params=cparams,
            interpret=imode,
        )(*inputs)

        (x_new_t, r_new_t, lp0, lp, astat, depth, leaps, dh, ke0,
         moved) = outs

        stats = {
            "logp0": from_flat(lp0),
            "logp_prop": from_flat(lp),
            "accept_stat": from_flat(astat),
            "depth": from_flat(depth),
            "leapfrogs": from_flat(leaps),
            # Fused-epilogue outputs: dh = H(selected) - H(start) BEFORE any
            # accept-reject (the weight increment of the forwards-L-kernel
            # non-tempered path); ke0 = kinetic energy of the start momentum
            # (recovers q(r0) up to the mass-matrix constant); moved = 1.0
            # iff the particle changed in every dimension (acceptance-rate
            # numerator, post accept-reject when acc_rej).
            "delta_h": from_flat(dh),
            "ke0": from_flat(ke0),
            "moved": from_flat(moved),
        }
        return from_tiles(x_new_t), from_tiles(r_new_t), stats

    # ---- compacted multi-stage dispatch ----
    CIDX, C = _cont_layout(D)
    EIDX, C2 = _epi_layout(D)
    cont_spec = pl.BlockSpec(
        (C, 1, _SUBLANES, _LANES), lambda i: (0, i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    cont_shape = jax.ShapeDtypeStruct(
        (C, nblk, _SUBLANES, _LANES), jnp.float32
    )
    epi_spec = pl.BlockSpec(
        (C2, 1, _SUBLANES, _LANES), lambda i: (0, i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    epi_shape = jax.ShapeDtypeStruct(
        (C2, nblk, _SUBLANES, _LANES), jnp.float32
    )

    # Stage 0: prologue + doublings 0..splits[0], continuation bundle out.
    cont = pl.pallas_call(
        partial(_nuts_kernel, **common, stop_depth=splits[0],
                cont_out=True),
        grid=(nblk,),
        in_specs=in_specs,
        out_specs=[cont_spec],
        out_shape=[cont_shape],
        scratch_shapes=ck_scratch(splits[0] + 1),
        compiler_params=cparams,
        interpret=imode,
    )(*inputs)[0]

    # One scalar seed for the continuation stages: compaction moves lanes
    # across runs/blocks, so the per-run block mix no longer applies — fold
    # every run's seed into one wrapping polynomial hash (each still
    # perturbs every stream) and let the stage start-depth salt in-kernel.
    w = np.empty(B, np.uint32)
    acc_w = 1
    for j in range(B - 1, -1, -1):
        w[j] = acc_w
        acc_w = (acc_w * 65599) % (1 << 32)
    mixed = (seed_arr.astype(jnp.uint32) * jnp.asarray(w)).sum(
        dtype=jnp.uint32
    )
    seed2 = jax.lax.bitcast_convert_type(mixed, jnp.int32).reshape(1)

    extra_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM) for _ in tile_model.extra
    ]
    cont_in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # folded seed (1,)
        cont_spec,
    ] + extra_specs

    glue = os.environ.get("SMCNUTS_COMPACTION_GLUE", "sort")
    lane_idx = jnp.arange(n_pad, dtype=jnp.int32)
    dest_total = None
    ebundle = None
    for j, s in enumerate(splits):
        start = s + 1
        is_final = j + 1 == len(splits)
        stop = max_depth if is_final else splits[j + 1]
        flat = cont.reshape(C, n_pad)
        # Pack survivors (stopf 0.0) to the front in original order,
        # finished + padding lanes to the back in original order. Two
        # glues realize the SAME permutation (bitwise-equal outputs, both
        # covered by tests/test_compaction.py):
        # - "sort" (default): stable argsort + axis-1 gather forward; the
        #   composed dest map (inverse perm) un-permutes the epilogue.
        # - "scatter": destination via the prefix-sum formula (one O(n)
        #   cumsum) + one axis-1 scatter forward — built on the hypothesis
        #   that XLA's bitonic argsort was the large-N wall. MEASURED
        #   NEGATIVE (round 5): at the bench shape it is jitter-equal
        #   (613 vs 603 us/iter) and at N=1M the axis-1 scatter itself is
        #   catastrophic (4.3M vs 13.3M p-i/s gated) — the scaling wall is
        #   the lane-shuffle data movement, not the sort. Kept behind
        #   SMCNUTS_COMPACTION_GLUE for re-measurement on future
        #   toolchains; the nblk cap above is the real mitigation.
        if glue == "sort":
            perm = jnp.argsort(flat[CIDX["stopf"]], stable=True).astype(
                jnp.int32
            )
            # dest of lane i is the position of i in perm == inverse perm;
            # compose in dest form so both glues share the final gather.
            dest = jnp.argsort(perm).astype(jnp.int32)
            cont_c = jnp.take(flat, perm, axis=1).reshape(
                C, nblk, _SUBLANES, _LANES
            )
        else:
            active = flat[CIDX["stopf"]] < 0.5
            s_cum = jnp.cumsum(active.astype(jnp.int32))
            n_act = s_cum[-1]
            dest = jnp.where(
                active, s_cum - 1, n_act + lane_idx - s_cum
            ).astype(jnp.int32)
            cont_c = (
                jnp.zeros_like(flat)
                .at[:, dest]
                .set(flat, unique_indices=True, mode="promise_in_bounds")
                .reshape(C, nblk, _SUBLANES, _LANES)
            )
        dest_total = (
            dest if dest_total is None else jnp.take(dest, dest_total)
        )
        stage = pl.pallas_call(
            partial(_nuts_kernel, **common, start_depth=start,
                    stop_depth=stop, cont_in=True, cont_out=not is_final),
            grid=(nblk,),
            in_specs=cont_in_specs,
            out_specs=[epi_spec if is_final else cont_spec],
            out_shape=[epi_shape if is_final else cont_shape],
            scratch_shapes=ck_scratch(stop + 1),
            compiler_params=cparams,
            interpret=imode,
        )
        out = stage(seed2, cont_c, *tile_model.extra)[0]
        if is_final:
            ebundle = out
        else:
            cont = out

    # Un-permute everything back to original lane order with ONE composed
    # gather of the bundled epilogue: lane i's result sits at dest_total[i].
    eflat = jnp.take(ebundle.reshape(C2, n_pad), dest_total, axis=1)

    def erow(nm):
        return eflat[EIDX[nm]][:total].reshape(B, n)

    def etiles(nm):
        return eflat[EIDX[nm]:EIDX[nm] + D].T[:total].reshape(B, n, D)

    stats = {
        "logp0": erow("logp0"),
        "logp_prop": erow("lp"),
        "accept_stat": erow("astat"),
        "depth": erow("depth"),
        "leapfrogs": erow("leaf"),
        "delta_h": erow("dh"),
        "ke0": erow("ke0"),
        "moved": erow("moved"),
    }
    return etiles("x"), etiles("r"), stats


def _make_vmappable(tile_model: TileModel, max_depth: int, interpret: bool,
                    draw_momentum: bool = False, acc_rej: bool = False,
                    compaction=()):
    """custom_vmap wrapper: jax.vmap over (x, [r,] seed, step_size, phi,
    inv_mass) lowers to ONE batched kernel launch over the flattened
    (B*N)-particle axis — B independent SMC runs (e.g. Monte-Carlo replicas)
    pack the 1024-lane blocks full instead of serializing (pallas_call has
    no generic batching rule; runs would otherwise lax.map sequentially) or
    wasting idle lanes (a per-run grid would round every run up to a whole
    block). With `draw_momentum` the r argument disappears (drawn
    in-kernel)."""

    def bcast_to(axis_size):
        def bcast(v, batched):
            if batched:
                return v
            return jnp.broadcast_to(v, (axis_size,) + jnp.shape(v))

        return bcast

    if draw_momentum:

        @jax.custom_batching.custom_vmap
        def fn(x, seed, step_size, phi, inv_mass):
            x1, r1, stats = _nuts_pallas_batched(
                tile_model, x[None], None, seed.reshape(1),
                step_size.reshape(1), phi.reshape(1), inv_mass[None],
                max_depth, interpret, draw_momentum=True, acc_rej=acc_rej,
                compaction=compaction,
            )
            return x1[0], r1[0], {k: v[0] for k, v in stats.items()}

        @fn.def_vmap
        def _rule(axis_size, in_batched, x, seed, step_size, phi, inv_mass):
            xb, sb, eb, pb, mb = in_batched
            bcast = bcast_to(axis_size)
            x1, r1, stats = _nuts_pallas_batched(
                tile_model,
                bcast(x, xb), None, bcast(seed, sb),
                bcast(step_size, eb), bcast(phi, pb), bcast(inv_mass, mb),
                max_depth, interpret, draw_momentum=True, acc_rej=acc_rej,
                compaction=compaction,
            )
            out_batched = (True, True, {k: True for k in stats})
            return (x1, r1, stats), out_batched

        return fn

    @jax.custom_batching.custom_vmap
    def fn(x, r, seed, step_size, phi, inv_mass):
        x1, r1, stats = _nuts_pallas_batched(
            tile_model, x[None], r[None], seed.reshape(1),
            step_size.reshape(1), phi.reshape(1), inv_mass[None],
            max_depth, interpret, acc_rej=acc_rej, compaction=compaction,
        )
        return x1[0], r1[0], {k: v[0] for k, v in stats.items()}

    @fn.def_vmap
    def _rule(axis_size, in_batched, x, r, seed, step_size, phi, inv_mass):
        xb, rb, sb, eb, pb, mb = in_batched
        bcast = bcast_to(axis_size)
        x1, r1, stats = _nuts_pallas_batched(
            tile_model,
            bcast(x, xb), bcast(r, rb), bcast(seed, sb),
            bcast(step_size, eb), bcast(phi, pb), bcast(inv_mass, mb),
            max_depth, interpret, acc_rej=acc_rej, compaction=compaction,
        )
        out_batched = (True, True, {k: True for k in stats})
        return (x1, r1, stats), out_batched

    return fn


# Weak-keyed by TileModel instance: an id()-keyed dict would mis-resolve if
# a collected TileModel's id were reused by a new model (the cached closure
# captures tile_fn — the sampler would silently run the OLD model).
import weakref

_VMAPPABLE_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def nuts_batch_pallas(tile_model: TileModel, x, r, seed, step_size, phi=1.0,
                      inv_mass=None, max_depth=MAX_TREE_DEPTH,
                      interpret=False, compaction=()):
    """Run the fused NUTS kernel over (N, D) particles.

    Returns (x_new, r_new, stats) mirroring ops/nuts.nuts_batch — stats hold
    f32 per-particle depth/leapfrogs/accept_stat plus the cached endpoint
    log-densities (logp0, logp_prop). `inv_mass` is an optional (D,) diagonal
    inverse mass matrix (None = identity), with ops/nuts.py semantics.

    The call is vmappable (over x/r/seed/step_size/phi/inv_mass): batched
    calls collapse into a single multi-run kernel launch, so
    `jax.vmap(run_smc)` over seeds runs B Monte-Carlo replicas concurrently
    on one chip.

    Batched seed semantics: runs are flat-packed into 1024-lane blocks, and
    each block's PRNG stream is seeded from the block id plus the seeds of
    ALL runs intersecting the block — so every run's seed influences its
    randomness (changing any one run's seed changes its block's stream), but
    a batched run's bit-stream intentionally differs from the same seed run
    solo (lane positions differ). Cross-checks between batched and single
    runs are therefore statistical, like every other PRNG cross-check here.
    """
    D = tile_model.dim
    fn = _cached_vmappable(tile_model, max_depth, interpret,
                           compaction=compaction)
    if inv_mass is None:
        inv_mass = jnp.ones((D,), jnp.float32)
    return fn(
        x, r,
        jnp.asarray(seed, jnp.int32),
        jnp.asarray(step_size, jnp.float32),
        jnp.asarray(phi, jnp.float32),
        jnp.asarray(inv_mass, jnp.float32),
    )


def _cached_vmappable(tile_model, max_depth, interpret,
                      draw_momentum=False, acc_rej=False, compaction=()):
    per_model = _VMAPPABLE_CACHE.get(tile_model)
    if per_model is None:
        per_model = {}
        _VMAPPABLE_CACHE[tile_model] = per_model
    compaction = tuple(compaction or ())
    key = (max_depth, bool(interpret), bool(draw_momentum), bool(acc_rej),
           compaction)
    fn = per_model.get(key)
    if fn is None:
        fn = _make_vmappable(
            tile_model, max_depth, interpret,
            draw_momentum=draw_momentum, acc_rej=acc_rej,
            compaction=compaction,
        )
        per_model[key] = fn
    return fn


def nuts_batch_pallas_fused(tile_model: TileModel, x, seed, step_size,
                            phi=1.0, inv_mass=None,
                            max_depth=MAX_TREE_DEPTH, acc_rej=False,
                            interpret=False, compaction=()):
    """Fused-epilogue variant of `nuts_batch_pallas` (VERDICT r3 #1): the
    momentum draw happens IN-KERNEL (r0 ~ N(0, diag(1/inv_mass)) via the TPU
    PRNG, so there is no r argument), the selected-vs-start Hamiltonian
    difference comes back as stats["delta_h"], and with `acc_rej=True` the
    asymptotic MH accept-reject runs in the kernel epilogue (outputs are the
    post-accept state; reference nuts_acc_rej.py:42-49 semantics).

    Weight-update identities this enables (all host-side ops collapse to a
    couple of adds):
      forwards L-kernel, non-tempered:  dlogw = delta_h
      forwards L-kernel, tempered:      dlogw = logp1' - logp1
                                                + (delta_h - logp' + logp0)
      Gaussian L-kernel:                q(r0) = -ke0 + 0.5*sum(log inv_mass)
                                                - D/2 log(2 pi)
    The RNG stream differs from the host threefry draw, so cross-checks
    against the unfused path are statistical — like every PRNG cross-check
    on this kernel.
    """
    D = tile_model.dim
    fn = _cached_vmappable(
        tile_model, max_depth, interpret, draw_momentum=True,
        acc_rej=acc_rej, compaction=compaction,
    )
    if inv_mass is None:
        inv_mass = jnp.ones((D,), jnp.float32)
    return fn(
        x,
        jnp.asarray(seed, jnp.int32),
        jnp.asarray(step_size, jnp.float32),
        jnp.asarray(phi, jnp.float32),
        jnp.asarray(inv_mass, jnp.float32),
    )


def elementwise_tile_model(dim, extra, logp_tiles_fn,
                           preload=None) -> TileModel:
    """Build a TileModel from an elementwise tile log-density via in-kernel
    autodiff.

    `logp_tiles_fn(extra_vals, x_tiles, phi) -> logp_tile` must be written in
    ops that act elementwise on the (8, 128) particle tiles (scalars from the
    preloaded data arrays broadcast fine). Gradients come from `jax.vjp`
    traced inside the Pallas kernel: the VJP of an elementwise computation is
    itself elementwise, so Mosaic lowers it like hand-written code. Each lane
    is an independent particle, so a cotangent of ones yields per-lane
    gradients exactly.

    `preload(extra_refs) -> extra_vals` loads whatever the density needs from
    the SMEM data refs *outside* the differentiated function (default: pass
    the refs through untouched — fine when the density only multiplies by
    scalar loads, which are constants w.r.t. x).
    """
    if preload is None:
        preload = lambda refs: refs

    def tile_fn(extra_refs, x_tiles, phi):
        vals = preload(extra_refs)
        logp, vjp_fn = jax.vjp(
            lambda ts: logp_tiles_fn(vals, ts, phi), list(x_tiles)
        )
        grads = vjp_fn(jnp.ones_like(logp))[0]
        return logp, grads

    return TileModel(dim=dim, extra=tuple(extra), tile_fn=tile_fn)


def tile_model_from_logp(logp_fn, dim, extra=()) -> TileModel:
    """Generic in-kernel adapter: run ANY per-particle scalar
    `logp_fn(theta: (D,), phi) -> scalar` on the kernel's (8, 128) lane
    tiles by double-vmapping it across sublanes and lanes, with the gradient
    from `jax.vjp` traced INSIDE the Pallas kernel.

    This is what turns a Stan-frontend-compiled model into a whole-tree
    Pallas kernel with zero hand-written tile code: vmap of (mostly)
    elementwise scalar code is elementwise tile code, per-particle
    reductions over data axes batch into data-axis reductions that keep the
    lane axes, and `lax.scan`s in the model body become tile-carry loops.
    Compared to `elementwise_tile_model` this drops the requirement that the
    density be written directly in tile ops, at the cost of whatever
    intermediates the model (and its VJP residuals) materializes per lane —
    a T-step recurrence holds O(T) (8, 128) values in VMEM.

    Caveats: the model must avoid primitives Mosaic cannot lower (e.g.
    lgamma on traced values — fold data-dependent lgamma terms into
    constants at build time, as prmwcd_tile_model does); `phi` may arrive
    as a per-lane tile and is vmapped alongside theta. The unrolled leaf
    body plus its VJP residuals must fit VMEM (128 MB on v5e): a ~40-step
    recurrence fits; the T=200 arma recurrence was measured to spill 594 MB
    of register-allocator slots and fail to compile — long recurrences need
    a hand tile_fn with fused tangent recurrences (arma_tile_model) or the
    XLA backend.
    """

    def tile_fn(extra_refs, x_tiles, phi):
        del extra_refs  # data lives in logp_fn's closure as constants
        theta = jnp.stack(list(x_tiles))  # (D, 8, 128)
        phi_t = jnp.broadcast_to(
            jnp.asarray(phi, theta.dtype), theta.shape[1:]
        )
        # lanes: (D, 128), (128,) -> (128,); tiles adds the sublanes.
        lanes = jax.vmap(logp_fn, in_axes=(-1, -1), out_axes=-1)
        tiles = jax.vmap(lanes, in_axes=(1, 0), out_axes=0)
        # REVERSE-mode gradient. Two dead ends are documented here so they
        # are not retried: (a) forward mode (jax.jacfwd) has O(1) live
        # state in the recurrence length (the VJP stores every intermediate
        # as a residual), but its in-kernel Mosaic compile is pathological —
        # a T=40 recurrence that compiles in ~2 min with this VJP form ran
        # >60 min with jacfwd before being killed; (b) lowering the model's
        # long loops to lax.scan inside the kernel fails structurally:
        # Mosaic's in-kernel scan supports carry-only scans
        # (num_extensive unimplemented), scan xs/ys or any captured data
        # array trips "captures constants", and dynamic container indexing
        # batches into gather/scatter under vmap, which Mosaic cannot
        # lower either.
        def value_and_grad(th, pt):
            logp, vjp_fn = jax.vjp(lambda t: tiles(t, pt), th)
            return logp, vjp_fn(jnp.ones_like(logp))[0]

        # Simplifying re-trace (same pass as the forward adapter): CSE +
        # lazy-coefficient algebra over the mechanically-generated VJP,
        # then ASAP depth scheduling (_schedule_call) to interleave
        # independent chains for Mosaic's bounded scheduling window.
        logp, grads = _schedule_call(
            lambda th, pt: _simplify_call(value_and_grad, th, pt),
            theta, phi_t,
        )
        return logp, [grads[d] for d in range(dim)]

    return TileModel(
        dim=dim, extra=tuple(extra), tile_fn=tile_fn, autodiff="reverse"
    )


def _cse_jaxpr(jaxpr):
    """Local value numbering over a (flat, effect-free) jaxpr: equations
    with the same primitive, operands, and params collapse to one. The
    forward-mode adapter's D sequential jvp passes each re-trace the model's
    primal chain; Mosaic does not fold the duplicates (measured 2.37x the
    hand kernel's leaf time for arma), so they are folded HERE, before
    lowering — the kernel then carries one primal chain plus the D true
    tangent chains, the hand kernels' structure."""
    subst = {}

    def res(v):
        return v if isinstance(v, jax.extend.core.Literal) else subst.get(v, v)

    def key_of(v):
        if isinstance(v, jax.extend.core.Literal):
            val = v.val
            if np.ndim(val) == 0:
                return ("lit", str(np.asarray(val).dtype),
                        np.asarray(val).tobytes())
            return ("litobj", id(v))
        return ("var", id(v))

    def lit_scalar(v):
        if isinstance(v, jax.extend.core.Literal) and np.ndim(v.val) == 0:
            try:
                return float(v.val)
            except (TypeError, ValueError):
                return None
        return None

    def same_aval(v, outvar):
        aval = getattr(v, "aval", None)
        return (
            aval is not None
            and aval.shape == outvar.aval.shape
            and aval.dtype == outvar.aval.dtype
        )

    seen = {}
    new_eqns = []
    for eqn in jaxpr.eqns:
        invars = [res(v) for v in eqn.invars]
        if eqn.effects:
            new_eqns.append(eqn.replace(invars=invars))
            continue
        # Algebraic identities (x-0, x+0, 0+x, x*1, 1*x, x/1): the
        # scalarized normal_lpdf sufficient-statistic form emits
        # `elem - 0.0` per recurrence step (and its tangent twin).
        name = eqn.primitive.name
        if name in ("add", "sub", "mul", "div") and len(invars) == 2 and (
            len(eqn.outvars) == 1
        ):
            ident = 0.0 if name in ("add", "sub") else 1.0
            out = eqn.outvars[0]
            if lit_scalar(invars[1]) == ident and same_aval(invars[0], out):
                subst[out] = invars[0]
                continue
            if (
                name in ("add", "mul")
                and lit_scalar(invars[0]) == ident
                and same_aval(invars[1], out)
            ):
                subst[out] = invars[1]
                continue
        try:
            pkey = tuple(
                sorted((k, repr(v)) for k, v in eqn.params.items())
            )
            key = (eqn.primitive, tuple(key_of(v) for v in invars), pkey)
            hash(key)
        except Exception:
            new_eqns.append(eqn.replace(invars=invars))
            continue
        hit = seen.get(key)
        if hit is not None:
            for ov, rep in zip(eqn.outvars, hit):
                subst[ov] = rep
            continue
        new_eqns.append(eqn.replace(invars=invars))
        seen[key] = list(eqn.outvars)
    return jaxpr.replace(
        eqns=new_eqns, outvars=[res(v) for v in jaxpr.outvars]
    )


def _cse_call(fn, *args):
    """Trace `fn`, CSE its jaxpr, and re-emit the deduplicated ops into the
    surrounding trace (works inside a Pallas kernel body)."""
    from jax.tree_util import tree_flatten, tree_unflatten

    closed, out_shape = jax.make_jaxpr(fn, return_shape=True)(*args)
    jaxpr = _cse_jaxpr(closed.jaxpr)
    flat_args, _ = tree_flatten(args)
    out_flat = jax.core.eval_jaxpr(jaxpr, closed.consts, *flat_args)
    _, out_tree = tree_flatten(out_shape)
    return tree_unflatten(out_tree, out_flat)


class _Scaled:
    """Lazy scalar-coefficient wrapper: value = c * base (base a tracer,
    c a nonzero Python float, c != 1). Subsumes lazy negation (c = -1) and
    lifts literal factors out of products and — when both addends share the
    coefficient — out of unrolled accumulation chains, so the jvp's
    x*dx + dx*x pairs cost ONE mul per step and the resulting factor 2
    rides to the end of the whole sum as a single scalar multiply.
    Materialized (one scalar-operand mul, CSE'd) only when a consumer has
    no absorption rule — dead negs/muls never reach the Pallas trace,
    where Mosaic would schedule them (dead code inside a kernel body is
    not reliably eliminated)."""

    __slots__ = ("c", "base")

    def __init__(self, c, base):
        assert not isinstance(base, (float, _Scaled))
        self.c = c
        self.base = base


def _skey(v):
    """Structural identity key for simplifier values (floats by value,
    scaled values by (coeff, base key), tracers by object id)."""
    if isinstance(v, float):
        return ("c", v)
    if isinstance(v, _Scaled):
        return ("s", v.c, id(v.base))
    return ("v", id(v))


def _scaled(c, base):
    """Normalized constructor: flattens nested coefficients and folds
    float bases so _Scaled.base is always a plain tracer."""
    if isinstance(base, float):
        return c * base
    if isinstance(base, _Scaled):
        return _scaled(c * base.c, base.base)
    if c == 1.0:
        return base
    return _Scaled(c, base)


def _add_v(a, b, emit):
    fa, fb = isinstance(a, float), isinstance(b, float)
    if fa and fb:
        return a + b
    if fa and a == 0.0:
        return b
    if fb and b == 0.0:
        return a
    sa, sb = isinstance(a, _Scaled), isinstance(b, _Scaled)
    if sa and sb:
        if a.c == b.c:
            return _scaled(a.c, _add_v(a.base, b.base, emit))
        if a.c == -b.c:
            return _scaled(a.c, _sub_v(a.base, b.base, emit))
    if sb and b.c == -1.0:
        return _sub_v(a, b.base, emit)
    if sa and a.c == -1.0:
        return _sub_v(b, a.base, emit)
    if _skey(a) == _skey(b):
        # x + x -> 2x (rides outward through the same-coefficient rule
        # above, so an unrolled sum of doubled terms pays ONE final mul)
        return _mul_v(2.0, a, emit)
    return emit("add", jnp.add, a, b, commutative=True)


def _sub_v(a, b, emit):
    fa, fb = isinstance(a, float), isinstance(b, float)
    if fa and fb:
        return a - b
    if fb and b == 0.0:
        return a
    sa, sb = isinstance(a, _Scaled), isinstance(b, _Scaled)
    if sa and sb:
        if a.c == b.c:
            return _scaled(a.c, _sub_v(a.base, b.base, emit))
        if a.c == -b.c:
            return _scaled(a.c, _add_v(a.base, b.base, emit))
    if sb and b.c == -1.0:
        return _add_v(a, b.base, emit)
    if sa and a.c == -1.0:
        return _Scaled(-1.0, _add_v(a.base, b, emit))
    if fa and a == 0.0:
        return _mul_v(-1.0, b, emit)
    if _skey(a) == _skey(b):
        return 0.0
    return emit("sub", jnp.subtract, a, b)


def _mul_v(a, b, emit):
    fa, fb = isinstance(a, float), isinstance(b, float)
    if fa and fb:
        return a * b
    if fa:
        a, b = b, a
        fa, fb = fb, True
    if fb:  # b is the float factor
        if b == 0.0:
            return 0.0
        if b == 1.0:
            return a
        if isinstance(a, _Scaled):
            return _scaled(a.c * b, a.base)
        return _Scaled(b, a)
    sa, sb = isinstance(a, _Scaled), isinstance(b, _Scaled)
    if sa and sb:
        return _scaled(a.c * b.c, _mul_v(a.base, b.base, emit))
    if sa:
        return _scaled(a.c, _mul_v(a.base, b, emit))
    if sb:
        return _scaled(b.c, _mul_v(a, b.base, emit))
    return emit("mul", jnp.multiply, a, b, commutative=True)


def _div_v(a, b, emit):
    fa, fb = isinstance(a, float), isinstance(b, float)
    if fa and fb:
        return a / b if b != 0.0 else float(np.divide(a, b))
    if fb and b == 1.0:
        return a
    sa, sb = isinstance(a, _Scaled), isinstance(b, _Scaled)
    if sa and sb and a.c == b.c:
        return _div_v(a.base, b.base, emit)
    if sb and b.c == -1.0:
        return _mul_v(-1.0, _div_v(a, b.base, emit), emit)
    if sa and a.c == -1.0:
        return _mul_v(-1.0, _div_v(a.base, b, emit), emit)
    return emit("div", jnp.divide, a, b)


def _simplify_call(fn, *args):
    """Trace `fn` and re-emit it with algebraic simplification — the
    mechanical-jvp cleanup pass (VERDICT r3 #3). On top of _cse_jaxpr's
    value numbering this adds, while re-tracing into the surrounding
    (Pallas kernel) trace:

    - scalar-constant propagation THROUGH tiles: a broadcast of a literal
      (e.g. the jvp seed `ones`) stays a Python float, so `ones * y_t`
      (one wasted mul per recurrence step and pass) folds to the literal,
      and downstream elementwise ops broadcast it for free;
    - identities x*1, x*0, x+0, x-0, 0-x, x/1, x-x;
    - lazy scalar coefficients (_Scaled): negation and literal factors
      ride symbolically — add(x, -y) -> sub(x, y), the x*dx + dx*x
      tangent pairs fold to one mul with the 2 hoisted out of the whole
      unrolled accumulation chain, -a * -b cancels;
    - CSE with commutative operand canonicalization for add/mul, merging
      a*b with b*a across the D re-traced primal chains.

    Non-elementwise primitives pass through via eqn.bind with pending
    values materialized to their original aval shapes.
    """
    from jax.tree_util import tree_flatten, tree_unflatten

    closed, out_shape = jax.make_jaxpr(fn, return_shape=True)(*args)
    jaxpr = closed.jaxpr
    flat_args, _ = tree_flatten(args)

    env = {}

    def read(var):
        if isinstance(var, jax.extend.core.Literal):
            val = var.val
            if np.ndim(val) == 0 and np.issubdtype(
                np.asarray(val).dtype, np.floating
            ):
                # only FLOATING literals join the float-folding algebra;
                # int/bool scalars keep their dtype (integer/logical
                # primitives reject floats)
                return float(val)
            return val
        return env[id(var)]

    memo = {}
    mat_memo = {}

    def emit(name, f, a, b, commutative=False):
        ka, kb = _skey(a), _skey(b)
        k = (name,) + tuple(sorted((ka, kb)) if commutative else (ka, kb))
        hit = memo.get(k)
        if hit is not None:
            return hit
        out = f(mat(a), mat(b))
        memo[k] = out
        return out

    def mat(v):
        """Materialize a pending _Scaled as one (CSE'd) scalar mul."""
        if isinstance(v, _Scaled):
            k = _skey(v)
            hit = mat_memo.get(k)
            if hit is None:
                hit = jnp.multiply(v.c, v.base)
                mat_memo[k] = hit
            return hit
        return v

    def conc(v, aval=None):
        """Materialize for a pass-through primitive."""
        v = mat(v)
        if isinstance(v, float) and aval is not None and aval.shape:
            return jnp.full(aval.shape, v, aval.dtype)
        return v

    for cv, cval in zip(jaxpr.constvars, closed.consts):
        if np.ndim(cval) == 0 and np.issubdtype(
            np.asarray(cval).dtype, np.floating
        ):
            env[id(cv)] = float(cval)
        else:
            env[id(cv)] = jnp.asarray(cval)
    for iv, aval in zip(jaxpr.invars, flat_args):
        env[id(iv)] = aval

    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        ins = [read(v) for v in eqn.invars]
        out = None
        if name == "neg":
            out = _mul_v(-1.0, ins[0], emit)
        elif name == "broadcast_in_dim" and isinstance(ins[0], float):
            out = ins[0]
        elif name == "convert_element_type" and isinstance(
            ins[0], (float, _Scaled)
        ):
            out = ins[0]
        elif name in ("add", "add_any", "sub", "mul", "div") and (
            len(ins) == 2
        ):
            a, b = ins
            if name in ("add", "add_any"):
                out = _add_v(a, b, emit)
            elif name == "sub":
                out = _sub_v(a, b, emit)
            elif name == "mul":
                out = _mul_v(a, b, emit)
            else:
                out = _div_v(a, b, emit)
        elif name == "reduce_sum":
            # sums are linear: hoist a pending coefficient through
            (a,) = ins
            if isinstance(a, _Scaled):
                summed = eqn.primitive.bind(
                    conc(a.base, eqn.invars[0].aval), **eqn.params
                )
                out = _scaled(a.c, summed)
        elif name == "transpose":
            # A permutation that only moves SIZE-1 axes is a pure reshape
            # — Mosaic cannot legalize the tpu.transpose these batched
            # vjp chains emit for (8, 128, 1)-style shapes, but lowers
            # the equivalent reshape fine.
            in_shape = eqn.invars[0].aval.shape
            perm = eqn.params["permutation"]
            non1 = [i for i in perm if in_shape[i] != 1]
            if non1 == sorted(non1):
                out = jnp.reshape(
                    conc(ins[0], eqn.invars[0].aval),
                    eqn.outvars[0].aval.shape,
                )
        if out is not None:
            env[id(eqn.outvars[0])] = out
            continue
        # pass-through: materialize operands to their traced avals
        bind_ins = [
            conc(v, getattr(var, "aval", None))
            for v, var in zip(ins, eqn.invars)
        ]
        # Call-like primitives can't re-bind generically (their bind
        # signature threads callables, not params) — evaluate the inner
        # jaxpr instead. Differentiation already happened inside the
        # traced fn, so a remaining custom_jvp/vjp call is primal-only
        # and its call_jaxpr IS its semantics here.
        inner = None
        if eqn.primitive.name == "pjit":
            inner = eqn.params["jaxpr"]
        else:
            for k in ("call_jaxpr", "fun_jaxpr"):
                cj = eqn.params.get(k)
                if cj is not None and hasattr(cj, "jaxpr"):
                    inner = cj
                    break
        # Generic CSE over pure pass-through primitives (abs, max, select,
        # exp, log1p, and small call-like wrappers): without this, the
        # first non-algebraic op in a chain breaks the structural keys and
        # every op downstream of it duplicates across the forward adapter's
        # D re-traced passes (measured on a D=16 IRT recurrence: the whole
        # log-sigmoid chain emitted once per pass). Call-likes key on the
        # printed inner jaxpr — identical re-traces of the same helper
        # print identically; large inners skip the memo.
        ck = None
        if not eqn.effects:
            try:
                if inner is not None:
                    pdesc = (
                        str(inner.jaxpr)
                        if len(inner.jaxpr.eqns) <= 64 else None
                    )
                else:
                    pdesc = tuple(
                        sorted((k, repr(v)) for k, v in eqn.params.items())
                    )
                if pdesc is not None:
                    ck = (name, tuple(_skey(v) for v in ins), pdesc)
                    hash(ck)
            except Exception:
                ck = None
        if ck is not None:
            hit = memo.get(ck)
            if hit is not None:
                for ov, res in zip(eqn.outvars, hit):
                    env[id(ov)] = res
                continue
        if inner is not None:
            results = jax.core.eval_jaxpr(
                inner.jaxpr, inner.consts, *bind_ins
            )
        else:
            results = eqn.primitive.bind(*bind_ins, **eqn.params)
        if not eqn.primitive.multiple_results:
            results = [results]
        if ck is not None:
            memo[ck] = list(results)
        for ov, res in zip(eqn.outvars, results):
            env[id(ov)] = res

    out_flat = [
        conc(read(v), getattr(v, "aval", None)) for v in jaxpr.outvars
    ]
    _, out_tree = tree_flatten(out_shape)
    return tree_unflatten(out_tree, out_flat)


def _schedule_call(fn, *args):
    """Re-emit `fn` with its (effect-free) equations stably reordered by
    dataflow depth — ASAP list scheduling (VERDICT r4 #4).

    Why: the Stan frontend traces a model body in PROGRAM order — the whole
    T-step recurrence first, then the 200-element lpdf accumulation chain
    that consumes the stored errors, then each tangent pass's chains. The
    hand kernels interleave those chains step-by-step instead, and Mosaic's
    list scheduler works within a bounded lookahead window, so the
    trace-ordered form leaves the VPU idle on chain hazards that the
    interleaved form hides (measured: frontend-compiled arma 1.36x the hand
    kernel at IDENTICAL op counts, 3962 vs 4060). Sorting equations stably
    by depth = 1 + max(operand depths) is topologically valid (a consumer
    is always strictly deeper than its producer; equal-depth ops cannot
    depend on each other) and reconstructs exactly the interleaved
    emission: step t's error, its squared-residual accumulation, and its
    tangent updates all sit at adjacent depths. Skipped entirely if any
    equation carries effects."""
    from jax.tree_util import tree_flatten, tree_unflatten

    closed, out_shape = jax.make_jaxpr(fn, return_shape=True)(*args)
    jaxpr = closed.jaxpr
    if any(e.effects for e in jaxpr.eqns):
        flat_args, _ = tree_flatten(args)
        out_flat = jax.core.eval_jaxpr(jaxpr, closed.consts, *flat_args)
        _, out_tree = tree_flatten(out_shape)
        return tree_unflatten(out_tree, out_flat)
    depth = {}
    for v in list(jaxpr.invars) + list(jaxpr.constvars):
        depth[id(v)] = 0
    keyed = []
    for i, e in enumerate(jaxpr.eqns):
        d = 1 + max(
            [
                depth.get(id(v), 0)
                for v in e.invars
                if not isinstance(v, jax.extend.core.Literal)
            ]
            or [0]
        )
        for ov in e.outvars:
            depth[id(ov)] = d
        keyed.append((d, i, e))
    keyed.sort(key=lambda t: (t[0], t[1]))
    jaxpr = jaxpr.replace(eqns=[e for _, _, e in keyed])
    flat_args, _ = tree_flatten(args)
    out_flat = jax.core.eval_jaxpr(jaxpr, closed.consts, *flat_args)
    _, out_tree = tree_flatten(out_shape)
    return tree_unflatten(out_tree, out_flat)


def tile_model_from_logp_fwd(logp_seq_fn, dim, extra=()) -> TileModel:
    """Forward-mode generic in-kernel adapter: the long-recurrence
    counterpart of `tile_model_from_logp`.

    `logp_seq_fn(coords, phi) -> scalar` takes the unconstrained coordinates
    as a SEQUENCE of scalars, not a stacked (D,) vector. That contract is
    what makes forward mode viable: each of the D sequential `jax.jvp`
    passes differentiates with respect to ONE coordinate while the other
    D-1 ride the closure as constants, so their tangents stay SYMBOLIC
    zeros all the way through the model body and JAX prunes every tangent
    op outside that coordinate's dependency cone. (A stacked-vector contract
    silently densifies: `jnp.stack`'s JVP instantiates the symbolic-zero
    components into a dense (D, 8, 128) tangent, and the whole unrolled
    recurrence then carries D-wide tangents per pass — D^2 dense chains and
    a Mosaic compile blow-up, measured >55 min for the T=200 arma versus the
    hand kernel's ~30 s.)

    Each pass interleaves the primal recurrence with its tangent recurrence,
    so the live state is O(1) in the recurrence length — machine-generated
    exactly the primal-plus-D-tangent-chains structure the hand kernels
    write by hand (arma_tile_model's err/emu/eb/eth chains). This sidesteps
    both documented dead ends: reverse mode's O(T) VJP residuals (VMEM wall
    at ~40 steps, 594 MB spill at T=200) and jax.jacfwd's batched-tangent
    relayouts. The D duplicated primal chains are identical subgraphs that
    MLIR CSE folds; even un-CSE'd they bound the overhead at (D+1)x the
    primal, with no memory growth.
    """

    def scalar_fn(*args):
        return logp_seq_fn(args[:dim], args[dim])

    axes = (-1,) * (dim + 1)
    lanes = jax.vmap(scalar_fn, in_axes=axes, out_axes=-1)
    tiles = jax.vmap(lanes, in_axes=(0,) * (dim + 1), out_axes=0)

    def all_passes(x_tiles, phi_t):
        ones = jnp.ones(phi_t.shape, phi_t.dtype)
        logp = None
        grads = []
        for d in range(dim):
            def f_d(td, d=d):
                args = [
                    td if i == d else x_tiles[i] for i in range(dim)
                ]
                return tiles(*args, phi_t)

            logp, g_d = jax.jvp(f_d, (x_tiles[d],), (ones,))
            grads.append(g_d)
        return logp, grads

    def tile_fn(extra_refs, x_tiles, phi):
        del extra_refs  # data lives in logp_seq_fn's closure as constants
        x_tiles = list(x_tiles)
        phi_t = jnp.broadcast_to(
            jnp.asarray(phi, x_tiles[0].dtype), x_tiles[0].shape
        )
        # Simplifying re-trace across the D passes: CSE folds the D
        # re-traced primal chains back to one; the algebraic rules
        # (constant-tile propagation incl. the jvp `ones` seed, lazy-neg
        # absorption into sub/add, x*1/x+0) strip the mechanical-jvp
        # overhead the hand kernels never emit (see _simplify_call).
        # Then ASAP depth scheduling interleaves the recurrence with its
        # consumers and tangent chains (see _schedule_call).
        return _schedule_call(
            lambda xt, pt: _simplify_call(all_passes, xt, pt),
            x_tiles, phi_t,
        )

    return TileModel(
        dim=dim, extra=tuple(extra), tile_fn=tile_fn, autodiff="forward"
    )


# ---------------------------------------------------------------------------
# ARMA(1,1) tile model
# ---------------------------------------------------------------------------

LOG_SQRT_2PI = float(0.5 * np.log(2.0 * np.pi))
_LOG_PI = float(np.log(np.pi))


def prmwcd_tile_model(y, X, q) -> TileModel:
    """In-kernel PRMwCD tempered logp + gradient (reference
    stan_models/PRMwCD/PRMwCD.stan): Poisson regression with kernel design
    matrix, exponential-power (bridge) prior on the 11 kernel coefficients,
    inverse-gamma prior on Gamma (log-transformed, Jacobian included).

    Parameters theta = [Beta_1..Beta_12, log_Gamma] (D = 13). The N_obs x
    Clength design matrix and observations are STATIC data, so they are baked
    into the kernel as immediate constants and the observation loop is fully
    Python-unrolled: no SMEM loads, no loop-carried control flow — straight-
    line vector code Mosaic schedules across the VPU ports (measured 3.1x
    over the fori_loop + SMEM-scalar-load formulation on the arma kernel;
    relay-cache-proof protocol). The constant -sum(lgamma(y_i + 1)) term is
    folded in at build time (Mosaic has no lgamma).

    Roofline (measured via experiments/bench_kernel.py, K-vs-4K marginal so
    the ~60 ms dispatch floor cancels): 1.36 us per 1024-lane leaf on
    TPU v5e. The leaf body is ~27 vector ops per observation x 100 obs
    (~2700 (8,128)-wide instrs), so that is ~2.1 vector instrs/cycle
    sustained — the same issue rate the dependency-bound arma kernel
    reaches, i.e. the VPU's sustained throughput, not a scheduling gap.
    Why the VPU and not the MXU, although eta/grad are (obs x cov)
    matmuls: the contraction is Clength+1 = 12 wide and the obs axis is
    100, so MXU tiles pad 12->128 and 100->128 (9% utilization; ~128
    cycles per matmul, two matmuls per leaf), exp(eta) stays on the VPU
    (~100 instrs), and the per-leaf relayouts between the kernel's
    param-major (8,128) lane tiles and a (particles x params) matrix are
    cross-lane shuffles paid twice per leaf — bounding the ideal MXU win
    below ~2x before relayout costs. A y-moment precompute (folding
    sum_i y_i X_ij into constants) was evaluated and rejected: it saves
    ~12% of instrs but computes the score as a difference of two large
    f32 sums (catastrophic cancellation near the mode) instead of
    accumulating small residuals."""
    import scipy.special

    y = np.asarray(y, np.float64)
    X = np.asarray(X, np.float64)
    n_obs, n_cov = X.shape
    M = n_cov + 1  # betas incl. intercept
    q = float(q)
    lgamma_const = float(-scipy.special.gammaln(y + 1.0).sum())
    # inv_gamma_lpdf(Gamma | 2, 1.3) = 2*log(1.3) - lgamma(2) - 3*log(Gamma)
    # - 1.3/Gamma; lgamma(2) = 0.
    ig_const = float(2.0 * np.log(1.3))

    yf = [float(v) for v in np.asarray(y, np.float32)]
    Xf = [[float(v) for v in row] for row in np.asarray(X, np.float32)]

    def tile_fn(extra_refs, xt, phi):
        betas = xt[:M]
        g = xt[M]  # log Gamma

        zero = betas[0] * 0.0
        s_resid = zero  # sum_i (y_i - exp(eta_i))
        s_cov = [zero for _ in range(n_cov)]  # sum_i resid_i * X[i, j]
        ll = zero + lgamma_const

        for i in range(n_obs):
            eta = betas[0]
            for j in range(n_cov):
                eta = eta + Xf[i][j] * betas[j + 1]
            mu = jnp.exp(eta)
            y_i = yf[i]
            ll = ll + y_i * eta - mu
            resid = y_i - mu
            s_resid = s_resid + resid
            for j in range(n_cov):
                s_cov[j] = s_cov[j] + resid * Xf[i][j]

        # Prior: inverse-gamma on Gamma = exp(g) with Jacobian, EP (bridge)
        # prior on the non-intercept betas.
        gamma = jnp.exp(g)
        inv_gamma = jnp.exp(-g)
        ep_sum = zero  # sum_j |beta_j / Gamma|^q
        gp_beta = []
        for j in range(1, M):
            ab = jnp.abs(betas[j])
            pow_q = jnp.exp(q * (jnp.log(ab) - g))  # |b/Gamma|^q
            ep_sum = ep_sum + pow_q
            # d/d beta_j of -|b/Gamma|^q = -q |b/Gamma|^(q-1) sign(b) / Gamma
            gp_beta.append(
                -q * jnp.exp((q - 1.0) * (jnp.log(ab) - g))
                * jnp.sign(betas[j]) * inv_gamma
            )
        lprior = (
            ig_const - 3.0 * g - 1.3 * inv_gamma + g  # inv-gamma + Jacobian
            - (M - 1) * g - ep_sum  # EP prior: -log(Gamma) per coef
        )
        # d lprior / d g.
        gp_g = -3.0 + 1.3 * inv_gamma + 1.0 - (M - 1) + q * ep_sum

        logp = lprior + phi * ll
        grads = [phi * s_resid]  # intercept: flat prior
        for j in range(n_cov):
            grads.append(gp_beta[j] + phi * s_cov[j])
        grads.append(gp_g)
        return logp, grads

    # Compaction hint (7, 8, 9): at the parity config PRMwCD trees are deep
    # and near-uniform (mean depth 8.2, hist peaked 7-9 — compaction_sim_
    # prmwcd.json), so the paying boundaries are the late ones (measured
    # 655k -> 1.55M p-i/s). Under step-size adaptation trees shrink ~5x
    # (measured mean depth 5.65, waste 4.15x at the adapted step) and
    # those boundaries never fire — the adapted hint (5, 6) measured
    # 2.69M -> 5.73M p-i/s at target_accept=0.5 (2.51M with the deep
    # hints, 5.63M with (4,5,6), 4.60M with (6,) alone:
    # compaction_prmwcd_adapted.json).
    return TileModel(dim=M + 1, extra=(), tile_fn=tile_fn,
                     compaction_hint=(7, 8, 9),
                     compaction_hint_adapted=(5, 6))


def arma_tile_model_fwd(y) -> TileModel:
    """ARMA(1,1) tile model via the forward-mode generator + algebraic
    simplifier applied to a hand-written SCALAR tempered log-density
    (the same unrolled sufficient-statistic form the Stan frontend's
    scalarize mode produces).

    The generated-path benchmark: at the jitter-proof protocol (K=300 vs
    1200, repeats=5) this measures 1.465 us per 1024-lane leaf vs the
    hand kernel's 1.214 (1.21x) — i.e. a clean scalar source through the
    mechanical jvp + simplifier lands within ~20% of hand-fused tangent
    algebra, and the Stan-frontend-compiled kernel's residual distance
    (1.657, 1.36x) is down to its emission form, not the generator.
    Kept as the generated-path regression anchor; arma_tile_model is the
    production kernel."""
    yf = [float(v) for v in np.asarray(y, np.float32)]
    T = len(yf)

    def logp_seq(coords, phi):
        mu, beta, th, ls = coords
        err = yf[0] - mu - beta * mu
        s2 = err * err
        for t in range(1, T):
            err = yf[t] - mu - beta * yf[t - 1] - th * err
            s2 = s2 + err * err
        inv_s2 = jnp.exp(-2.0 * ls)
        ll = -T * (LOG_SQRT_2PI + ls) - 0.5 * s2 * inv_s2
        sigma = jnp.exp(ls)
        z = sigma / 2.5
        lprior = (
            -0.5 * (mu / 10.0) ** 2 - jnp.log(10.0) - LOG_SQRT_2PI
            - 0.5 * (beta / 2.0) ** 2 - jnp.log(2.0) - LOG_SQRT_2PI
            - 0.5 * (th / 2.0) ** 2 - jnp.log(2.0) - LOG_SQRT_2PI
            - _LOG_PI - jnp.log(2.5) - jnp.log1p(z * z)
            + ls
        )
        return lprior + phi * ll

    return tile_model_from_logp_fwd(logp_seq, 4)


def arma_tile_model(y) -> TileModel:
    """In-kernel ARMA(1,1) tempered logp + gradient (fused tangent
    recurrences — same math as ops/arma_fused.py; priors from reference
    stan_models/arma/arma.stan:18-21, exp-transform Jacobian included).

    The T observations are static data: baked in as immediate constants with
    the recurrence fully Python-unrolled. The resulting straight-line vector
    code has no SMEM loads and no loop-carried control flow, so Mosaic
    schedules the four independent recurrence chains + four accumulators
    across the VPU ports — measured 3.1x faster than the fori_loop +
    per-step SMEM scalar-load formulation in round 1 (an 8-way
    chunk-parallel reformulation measured only ~1.8x before paying its
    recombination math, so this form is kept).

    Roofline (round-2 honest protocol — experiments/bench_kernel.py,
    K-vs-4K marginal canceling the ~60 ms dispatch floor): 1.10 us per
    1024-lane leaf on TPU v5e = ~1040 cycles for the T=200-step serial
    recurrence, ~5.2 cycles per recurrence step across the 4 dependent
    chains (~13 vector instrs/step -> ~2.2 instrs/cycle sustained, the
    VPU issue rate; the earlier 0.7 us figure came from the round-1
    timing path that did not synchronize on this transport)."""
    yf = [float(v) for v in np.asarray(y, np.float32)]
    T = len(yf)

    def tile_fn(extra_refs, xt, phi):
        mu, beta, th, ls = xt[0], xt[1], xt[2], xt[3]

        err = yf[0] - mu - beta * mu
        emu = -1.0 - beta
        eb = -mu
        eth = mu * 0.0  # materialized zero (Mosaic layout, see _nuts_kernel)
        s2, smu, sb, sth = err * err, err * emu, err * eb, mu * 0.0

        for t in range(1, T):
            err_n = yf[t] - mu - beta * yf[t - 1] - th * err
            emu_n = -1.0 - th * emu
            eb_n = -yf[t - 1] - th * eb
            eth_n = -err - th * eth
            err, emu, eb, eth = err_n, emu_n, eb_n, eth_n
            s2 = s2 + err * err
            smu = smu + err * emu
            sb = sb + err * eb
            sth = sth + err * eth

        inv_s2 = jnp.exp(-2.0 * ls)
        ll = -T * (LOG_SQRT_2PI + ls) - 0.5 * s2 * inv_s2
        gl_mu = -smu * inv_s2
        gl_beta = -sb * inv_s2
        gl_th = -sth * inv_s2
        gl_ls = -T + s2 * inv_s2

        sigma = jnp.exp(ls)
        z = sigma / 2.5
        lprior = (
            -0.5 * (mu / 10.0) ** 2 - jnp.log(10.0) - LOG_SQRT_2PI
            - 0.5 * (beta / 2.0) ** 2 - jnp.log(2.0) - LOG_SQRT_2PI
            - 0.5 * (th / 2.0) ** 2 - jnp.log(2.0) - LOG_SQRT_2PI
            - _LOG_PI - jnp.log(2.5) - jnp.log1p(z * z)
            + ls
        )
        gp_mu = -mu / 100.0
        gp_beta = -beta / 4.0
        gp_th = -th / 4.0
        gp_ls = 1.0 - 2.0 * z * z / (1.0 + z * z)

        logp = lprior + phi * ll
        grads = [
            gp_mu + phi * gl_mu,
            gp_beta + phi * gl_beta,
            gp_th + phi * gl_th,
            gp_ls + phi * gl_ls,
        ]
        return logp, grads

    # Compaction hint (4,): arma equilibrium trees are shallow-skewed (mean
    # depth 3.7; only ~16% of lanes survive doubling 4 —
    # compaction_sim_arma.json), so one boundary after depth 4 removes
    # 2.2x of the 4.3x lockstep waste while paying a single ~90 us glue.
    return TileModel(dim=4, extra=(), tile_fn=tile_fn,
                     compaction_hint=(4,))
