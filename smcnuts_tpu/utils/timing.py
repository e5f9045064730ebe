"""Trustworthy timing on relay-attached accelerators.

Two transport facts (documented in CLAUDE.md / docs/STATUS.md) make naive
JAX timing fiction on this machine:

1. `jax.block_until_ready` does NOT synchronize on the axon relay transport —
   it returns before the device work (or even the transfer) has happened, so
   `t1 - t0` around it measures nothing. The only reliable synchronization is
   HOST MATERIALIZATION: `np.asarray(output)` cannot complete until the value
   exists on the host.
2. The relay MEMOIZES dispatches keyed on (program, args) — including across
   OS processes — so timing a call whose arguments were ever used before
   returns a cached result at RTT speed. Keys must be fresh per process, not
   just per call: derive them from `os.urandom`, never from small constants.

Every timing in this repo goes through these helpers.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# A dispatch over the axon relay costs a jittery ~20-25 ms round trip; any
# "measurement" at or below one RTT is measuring the link (or a cache hit),
# not the chip.
RELAY_RTT_S = 0.02


def fresh_seed() -> int:
    """A non-negative 31-bit seed from os.urandom — unique per call AND per
    process, defeating cross-process relay memoization."""
    return int.from_bytes(os.urandom(4), "little") & 0x7FFFFFFF


def fresh_key():
    """A PRNG key no process has ever used before."""
    return jax.random.key(fresh_seed())


def fresh_keys(n: int):
    """n independent never-before-used PRNG keys."""
    return jax.random.split(fresh_key(), n)


def materialize(tree):
    """Force host materialization of every array leaf and return the
    NumPy-ified tree. This is the synchronization point for timing: unlike
    `block_until_ready` (a no-op on the relay transport), the host bytes of
    an `np.asarray` cannot exist before the device computed them.

    Fetches are kicked off asynchronously for every leaf first: on the relay
    each synchronous fetch costs a ~25 ms round trip, so serially
    materializing a many-array result (e.g. a full SMCResult, ~15 arrays)
    would pay ~0.4 s in pure latency; the async pass overlaps them."""
    def is_key(a):
        return hasattr(a, "dtype") and jnp.issubdtype(
            a.dtype, jax.dtypes.prng_key
        )

    for a in jax.tree.leaves(tree):
        if hasattr(a, "copy_to_host_async") and not is_key(a):
            try:
                a.copy_to_host_async()
            except Exception:
                pass  # transport without async support: serial fetch below
    return jax.tree.map(
        # PRNG key arrays (extended dtype) have no numpy form; pass through.
        lambda a: np.asarray(a)
        if hasattr(a, "shape") and not is_key(a) else a,
        tree,
    )


def time_materialized(fn, make_args, repeats=3, warmup=True):
    """Best-of-`repeats` wall time of `materialize(fn(*make_args()))`.

    `make_args` is CALLED PER REPETITION and must return fresh arguments
    (fresh PRNG keys) each time — identical arguments would be served from
    the relay memo-cache. Returns (best_seconds, last_materialized_output).
    """
    if warmup:
        materialize(fn(*make_args()))  # compile + warm
    best = float("inf")
    out = None
    for _ in range(repeats):
        args = make_args()
        t0 = time.perf_counter()
        out = materialize(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, out
