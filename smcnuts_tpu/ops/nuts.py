"""No-U-Turn Sampler proposal as an iterative, fixed-bound, vmappable kernel.

The reference implements Hoffman & Gelman's Alg. 3 with recursive tree doubling
and a serial Python loop over particles (reference smcnuts/proposal/nuts.py:50,
:89-150). Recursion and data-dependent Python control flow do not compile to
XLA, so this module re-derives the same sampler as an *iterative* kernel:

- The outer doubling loop is a `lax.while_loop` over tree depths 0..max_depth
  (matching the reference's `depth > MAX_TREE_DEPTH` break, nuts.py:109).
- Each doubling builds its 2^depth-leaf subtree one leapfrog step at a time in
  a nested `lax.while_loop`. Progressive uniform sampling over valid leaves
  (accept leaf k with prob 1/n_valid_so_far) is distributionally identical to
  the reference's recursive n2/(n1+n2) subtree merges (nuts.py:142), both
  yielding a uniform sample over the leaves with logu < joint.
- Sub-subtree U-turn checks (nuts.py:148) use the standard O(max_depth)
  checkpoint trick for iterative NUTS: even-indexed leaves are stored in
  checkpoint slot popcount(k >> 1); at odd leaf k the completed subtrees are
  exactly those spanning the trailing-ones suffix of k, and each is checked
  against its stored left endpoint.
- The slice variable logu = H0 - Exp(1) (nuts.py:69), the divergence guard
  logu - 100 >= joint (nuts.py:125), the top-level progressive acceptance
  min(1, n'/n) (nuts.py:99), and the endpoint U-turn criterion (nuts.py:152-160)
  all carry over unchanged.

Under `jax.vmap` all N particles advance in lockstep: every trip of the inner
loop performs one *batched* leapfrog (a single fused value_and_grad over the
whole particle block), with per-particle masks freezing finished trees. The
RNG stream differs from the reference's NumPy stream by design; equivalence is
statistical (SURVEY.md §7 "hard parts" #2).

A diagonal mass matrix is supported (reference uses the identity implicitly,
nuts.py:67): kinetic energy 0.5 * r^T M^{-1} r, drift x += eps * M^{-1} r.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

MAX_TREE_DEPTH = 10  # reference nuts.py:4
DIVERGENCE_THRESHOLD = 100.0  # nats; reference nuts.py:125


class _SubtreeState(NamedTuple):
    x: jax.Array
    r: jax.Array
    grad: jax.Array
    leaf: jax.Array  # next leaf index within this subtree
    x_prop: jax.Array
    r_prop: jax.Array
    logp_prop: jax.Array  # target logp at the running proposal leaf
    n_valid: jax.Array
    stop: jax.Array  # divergence or internal U-turn seen
    ckpt_x: jax.Array  # (max_depth+1, D) left endpoints of open subtrees
    ckpt_r: jax.Array
    key: jax.Array
    alpha_sum: jax.Array  # sum of per-leaf MH ratios min(1, e^{joint-H0})
    alpha_count: jax.Array  # leaves contributing to alpha_sum


class _TreeState(NamedTuple):
    x_minus: jax.Array
    r_minus: jax.Array
    grad_minus: jax.Array
    x_plus: jax.Array
    r_plus: jax.Array
    grad_plus: jax.Array
    x_prop: jax.Array
    r_prop: jax.Array
    logp_prop: jax.Array
    n: jax.Array
    depth: jax.Array
    stop: jax.Array
    key: jax.Array
    leapfrogs: jax.Array  # diagnostic: gradient evals consumed
    alpha_sum: jax.Array  # dual-averaging accept statistic accumulator
    alpha_count: jax.Array


def _leapfrog(logp_vg, x, r, grad, direction, step_size, inv_mass):
    """One leapfrog step (reference nuts.py:162-175): half kick, drift on the
    momentum updated mid-step, half kick. Returns (x', r', grad', logp')."""
    eps = direction * step_size
    r_half = r + 0.5 * eps * grad
    x_new = x + eps * inv_mass * r_half
    logp_new, grad_new = logp_vg(x_new)
    r_new = r_half + 0.5 * eps * grad_new
    return x_new, r_new, grad_new, logp_new


def _kinetic(r, inv_mass):
    return 0.5 * jnp.sum(r * inv_mass * r)


def _turning(dx, r_a, r_b, inv_mass):
    """Endpoint U-turn test on velocities (reference nuts.py:152-160; with a
    diagonal mass matrix the criterion uses M^{-1} r)."""
    return (jnp.dot(dx, inv_mass * r_a) < 0) | (jnp.dot(dx, inv_mass * r_b) < 0)


def _popcount(v):
    return lax.population_count(v.astype(jnp.uint32)).astype(jnp.int32)


def _build_subtree(logp_vg, state0, direction, depth, logu, H0, step_size, inv_mass, max_depth):
    """Iteratively build a 2^depth-leaf subtree from one endpoint.

    Returns (endpoint x/r/grad, proposal x/r, n_valid, stop, key, leaves_done).
    """
    num_leaves = jnp.left_shift(jnp.asarray(1, jnp.int32), depth)

    def cond(s: _SubtreeState):
        return (s.leaf < num_leaves) & (~s.stop)

    def body(s: _SubtreeState):
        x1, r1, grad1, logp1 = _leapfrog(
            logp_vg, s.x, s.r, s.grad, direction, step_size, inv_mass
        )
        joint = logp1 - _kinetic(r1, inv_mass)
        # NaN-safe: treat non-finite joints as invalid and divergent.
        joint_ok = jnp.isfinite(joint)
        valid = joint_ok & (logu < joint)
        diverged = (~joint_ok) | ((logu - DIVERGENCE_THRESHOLD) >= joint)

        n_new = s.n_valid + valid.astype(jnp.int32)
        key, k_acc = jax.random.split(s.key)
        # Progressive uniform sampling over valid leaves: replace the running
        # proposal with prob 1/n_new when this leaf is valid.
        take = valid & (
            jax.random.uniform(k_acc) * n_new.astype(step_size.dtype) < 1.0
        )
        x_prop = jnp.where(take, x1, s.x_prop)
        r_prop = jnp.where(take, r1, s.r_prop)
        logp_prop = jnp.where(take, logp1, s.logp_prop)

        # --- checkpointed sub-subtree U-turn detection ---
        leaf = s.leaf
        is_even = (leaf % 2) == 0
        idx_max = _popcount(jnp.right_shift(leaf, 1))
        trailing_ones = _popcount(leaf ^ (leaf + 1)) - 1
        idx_min = idx_max - trailing_ones + 1

        ckpt_x = jnp.where(
            is_even & (jnp.arange(max_depth + 1)[:, None] == idx_max),
            x1[None, :],
            s.ckpt_x,
        )
        ckpt_r = jnp.where(
            is_even & (jnp.arange(max_depth + 1)[:, None] == idx_max),
            r1[None, :],
            s.ckpt_r,
        )

        slots = jnp.arange(max_depth + 1)
        check = (~is_even) & (slots >= idx_min) & (slots <= idx_max)
        # dx oriented along simulated time: sigma * (leaf - left endpoint).
        dxs = direction * (x1[None, :] - ckpt_x)
        v_ck = jnp.sum(dxs * (inv_mass[None, :] * ckpt_r), axis=1)
        v_leaf = jnp.sum(dxs * (inv_mass * r1)[None, :], axis=1)
        turned = jnp.any(check & ((v_ck < 0) | (v_leaf < 0)))

        stop = s.stop | diverged | turned
        # Accept-statistic for dual-averaging step-size adaptation (Hoffman &
        # Gelman Alg. 6): per-leaf MH ratio vs the trajectory's initial energy.
        alpha = jnp.where(joint_ok, jnp.minimum(1.0, jnp.exp(joint - H0)), 0.0)
        return _SubtreeState(
            x=x1, r=r1, grad=grad1, leaf=leaf + 1,
            x_prop=x_prop, r_prop=r_prop, logp_prop=logp_prop,
            n_valid=n_new, stop=stop,
            ckpt_x=ckpt_x, ckpt_r=ckpt_r, key=key,
            alpha_sum=s.alpha_sum + alpha,
            alpha_count=s.alpha_count + 1,
        )

    out = lax.while_loop(cond, body, state0)
    return out


def nuts_single(logp_vg, x0, r0, key, step_size, inv_mass=None, max_depth=MAX_TREE_DEPTH):
    """One NUTS trajectory for a single particle (vmap over particles).

    Args:
        logp_vg: theta -> (logp, grad) at the proposal temperature.
        x0, r0: (D,) initial position and momentum.
        key: PRNG key.
        step_size: leapfrog step size (scalar).
        inv_mass: (D,) diagonal inverse mass matrix (None = identity).
        max_depth: doublings run for depth 0..max_depth inclusive
            (reference nuts.py:89-110 executes depths 0..MAX_TREE_DEPTH).

    Returns:
        (x, r, stats) where stats carries tree diagnostics; r is the momentum
        of the *selected leaf*, consumed later by the L-kernels as r_new
        (reference nuts.py:118 note).
    """
    D = x0.shape[0]
    step_size = jnp.asarray(step_size, dtype=x0.dtype)
    if inv_mass is None:
        inv_mass = jnp.ones(D, dtype=x0.dtype)
    else:
        inv_mass = jnp.asarray(inv_mass, dtype=x0.dtype)

    logp0, grad0 = logp_vg(x0)
    H0 = logp0 - _kinetic(r0, inv_mass)
    key, k_exp = jax.random.split(key)
    logu = H0 - jax.random.exponential(k_exp, dtype=x0.dtype)

    init = _TreeState(
        x_minus=x0, r_minus=r0, grad_minus=grad0,
        x_plus=x0, r_plus=r0, grad_plus=grad0,
        x_prop=x0, r_prop=r0, logp_prop=logp0,
        n=jnp.asarray(1, jnp.int32),
        depth=jnp.asarray(0, jnp.int32),
        stop=jnp.asarray(False),
        key=key,
        leapfrogs=jnp.asarray(0, jnp.int32),
        alpha_sum=jnp.zeros((), x0.dtype),
        alpha_count=jnp.asarray(0, jnp.int32),
    )

    zeros_ck = jnp.zeros((max_depth + 1, D), dtype=x0.dtype)

    def cond(t: _TreeState):
        return (~t.stop) & (t.depth <= max_depth)

    def body(t: _TreeState):
        key, k_dir, k_top = jax.random.split(t.key, 3)
        # Reference direction draw: +1 when u < 0.5 (nuts.py:91).
        direction = jnp.where(
            jax.random.uniform(k_dir) < 0.5,
            jnp.asarray(1.0, x0.dtype),
            jnp.asarray(-1.0, x0.dtype),
        )
        backwards = direction < 0
        x_e = jnp.where(backwards, t.x_minus, t.x_plus)
        r_e = jnp.where(backwards, t.r_minus, t.r_plus)
        g_e = jnp.where(backwards, t.grad_minus, t.grad_plus)

        sub0 = _SubtreeState(
            x=x_e, r=r_e, grad=g_e,
            leaf=jnp.asarray(0, jnp.int32),
            x_prop=x_e, r_prop=r_e,  # placeholder; unused if n_valid stays 0
            logp_prop=t.logp_prop,
            n_valid=jnp.asarray(0, jnp.int32),
            stop=jnp.asarray(False),
            ckpt_x=zeros_ck, ckpt_r=zeros_ck, key=key,
            alpha_sum=t.alpha_sum, alpha_count=t.alpha_count,
        )
        sub = _build_subtree(
            logp_vg, sub0, direction, t.depth, logu, H0, step_size, inv_mass,
            max_depth,
        )

        x_minus = jnp.where(backwards, sub.x, t.x_minus)
        r_minus = jnp.where(backwards, sub.r, t.r_minus)
        g_minus = jnp.where(backwards, sub.grad, t.grad_minus)
        x_plus = jnp.where(backwards, t.x_plus, sub.x)
        r_plus = jnp.where(backwards, t.r_plus, sub.r)
        g_plus = jnp.where(backwards, t.grad_plus, sub.grad)

        # Top-level progressive sample (reference nuts.py:99-103).
        accept = (~sub.stop) & (
            jax.random.uniform(k_top) * t.n.astype(x0.dtype)
            < sub.n_valid.astype(x0.dtype)
        )
        x_prop = jnp.where(accept, sub.x_prop, t.x_prop)
        r_prop = jnp.where(accept, sub.r_prop, t.r_prop)
        logp_prop = jnp.where(accept, sub.logp_prop, t.logp_prop)

        n = t.n + sub.n_valid
        dx = x_plus - x_minus
        stop = sub.stop | _turning(dx, r_minus, r_plus, inv_mass)

        return _TreeState(
            x_minus=x_minus, r_minus=r_minus, grad_minus=g_minus,
            x_plus=x_plus, r_plus=r_plus, grad_plus=g_plus,
            x_prop=x_prop, r_prop=r_prop, logp_prop=logp_prop,
            n=n, depth=t.depth + 1, stop=stop, key=sub.key,
            leapfrogs=t.leapfrogs + sub.leaf,
            alpha_sum=sub.alpha_sum, alpha_count=sub.alpha_count,
        )

    final = lax.while_loop(cond, body, init)
    stats = {
        "depth": final.depth,
        "n_valid": final.n,
        "logp0": logp0,  # target logp at the start point (at this phi)
        "logp_prop": final.logp_prop,  # target logp at the returned sample
        "leapfrogs": final.leapfrogs + 1,  # +1 initial gradient eval
        "accept_stat": final.alpha_sum
        / jnp.maximum(final.alpha_count, 1).astype(x0.dtype),
    }
    return final.x_prop, final.r_prop, stats


def nuts_batch(logp_vg, x, r, keys, step_size, inv_mass=None,
               max_depth=MAX_TREE_DEPTH, block_size=None):
    """Vmapped NUTS over the particle axis (replaces reference nuts.py:50-53).

    x, r: (N, D); keys: (N,) PRNG keys. All particles in a block advance in
    lockstep; each inner-loop trip is one batched leapfrog for the block.

    `block_size` bounds the lockstep domain: with `None` the whole particle
    axis is one vmapped while-loop, so a SINGLE deep tree stalls every
    particle (measured pathological at large N: 338k p-i/s at N=8192
    degrading to 104k at N=131072, worker crash at N=1M from the
    N x (max_depth+1) x D checkpoint live set). With a block size, particles
    are processed in `lax.map`-sequenced blocks of that many: one deep tree
    stalls only its block, and live memory is O(block) — the same lockstep
    granularity the Pallas kernel gets from its 1024-lane blocks
    (ops/nuts_pallas.py). Trajectories (x', r') are bit-identical for any
    block size (each particle's path depends only on its own key); float
    summary stats can differ at the ulp level because XLA fuses their
    reductions differently under lax.map.
    """
    f = lambda xi, ri, ki: nuts_single(
        logp_vg, xi, ri, ki, step_size, inv_mass=inv_mass, max_depth=max_depth
    )
    n = x.shape[0]
    if block_size is None or n <= block_size:
        return jax.vmap(f)(x, r, keys)
    nblk = -(-n // block_size)
    pad = nblk * block_size - n

    def to_blocks(a):
        if pad:
            # pad < block_size < n here, so reusing a leading slice is always
            # enough (repeat/broadcast are unimplemented for typed PRNG-key
            # arrays). Padding lanes burn block-bounded throwaway work; their
            # outputs are sliced off below.
            a = jnp.concatenate([a, a[:pad]], axis=0)
        return a.reshape((nblk, block_size) + a.shape[1:])

    x1, r1, stats = lax.map(
        lambda t: jax.vmap(f)(*t),
        (to_blocks(x), to_blocks(r), to_blocks(keys)),
    )

    def unblock(a):
        return a.reshape((nblk * block_size,) + a.shape[2:])[:n]

    return unblock(x1), unblock(r1), {k: unblock(v) for k, v in stats.items()}


def hmc_accept_reject_cached(logp0, logp_prime, x, x_prime, r, r_prime, key,
                             inv_mass=None):
    """As hmc_accept_reject, but using the target log-densities the NUTS tree
    already evaluated (stats["logp0"], stats["logp_prop"]) — saves two full
    batched model evaluations per iteration. Identical math."""
    if inv_mass is None:
        ke = lambda rr: 0.5 * jnp.sum(rr * rr, axis=1)
    else:
        ke = lambda rr: 0.5 * jnp.sum(rr * inv_mass[None, :] * rr, axis=1)
    H1 = logp_prime - ke(r_prime)
    H0 = logp0 - ke(r)
    ratio = jnp.exp(H1 - H0)
    u = jax.random.uniform(key, (x.shape[0],), dtype=x.dtype)
    ok = jnp.all(jnp.isfinite(x_prime), axis=1)
    accepted = (u <= jnp.minimum(1.0, ratio)) & ok
    x_out = jnp.where(accepted[:, None], x_prime, x)
    r_out = jnp.where(accepted[:, None], r_prime, r)
    return x_out, r_out, accepted


def hmc_accept_reject(logp_batch_fn, x, x_prime, r, r_prime, key, inv_mass=None):
    """Vectorized MH accept-reject on the Hamiltonian difference (reference
    smcnuts/proposal/utils.py:22-34 and nuts_acc_rej.py:42-49).

    Rejected particles revert position AND momentum. Non-finite proposals are
    rejected (the reference rejects inf positions; NaN Hamiltonians also fail
    the u <= a test here, which we document as the sane tightening).
    Returns (x_out, r_out, accepted_mask).
    """
    if inv_mass is None:
        ke = lambda rr: 0.5 * jnp.sum(rr * rr, axis=1)
    else:
        ke = lambda rr: 0.5 * jnp.sum(rr * inv_mass[None, :] * rr, axis=1)
    H1 = logp_batch_fn(x_prime) - ke(r_prime)
    H0 = logp_batch_fn(x) - ke(r)
    ratio = jnp.exp(H1 - H0)
    u = jax.random.uniform(key, (x.shape[0],), dtype=x.dtype)
    ok = jnp.all(jnp.isfinite(x_prime), axis=1)
    accepted = (u <= jnp.minimum(1.0, ratio)) & ok
    x_out = jnp.where(accepted[:, None], x_prime, x)
    r_out = jnp.where(accepted[:, None], r_prime, r)
    return x_out, r_out, accepted
