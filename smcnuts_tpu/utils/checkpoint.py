"""Checkpoint / resume for SMC runs.

The reference keeps the full history in memory and loses everything on a
crash (SURVEY.md §5). The SMC state tuple here is tiny —
(x[N,D], logw[N], phi, step_size, inv_mass, dual-averaging state, PRNG key) —
so checkpointing is a single .npz per snapshot plus accumulated diagnostic
series. Used by runner.ChunkedRunner between jitted chunks of iterations.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

# Bump when the serialized layout changes (carry pytree structure, key
# encoding, diagnostic naming). Loading a checkpoint with a different
# version fails loudly instead of silently mis-unflattening the carry.
CHECKPOINT_VERSION = 1


def save_checkpoint(path: str, carry, k_done: int, diagnostics: dict):
    """Serialize an SMCCarry + completed-iteration count + diagnostics.

    Multi-process safe: leaves sharded across processes (the particle-major
    arrays of a jax.distributed run) are gathered with the collective
    process_allgather — so EVERY process must call this, at the same point —
    and only process 0 writes the file (shared-filesystem semantics; each
    host of a pod slice typically sees the same storage)."""
    flat, _ = jax.tree.flatten(carry)

    def leaf_np(leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jax.dtypes.prng_key):
            leaf = jax.random.key_data(leaf)
        if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(leaf, tiled=True))
        return np.asarray(leaf)

    payload = {f"carry_{i}": leaf_np(leaf) for i, leaf in enumerate(flat)}
    if jax.process_count() > 1 and jax.process_index() != 0:
        return
    payload["version"] = np.int64(CHECKPOINT_VERSION)
    payload["k_done"] = np.int64(k_done)
    for name, arr in diagnostics.items():
        payload[f"diag_{name}"] = np.asarray(arr)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)  # atomic: no truncated checkpoints (the reference's
    # in-place JSON rewrite left a corrupt PRMwCD.json in its own repo)


def load_checkpoint(path: str, carry_template):
    """Restore (carry, k_done, diagnostics) using a template for structure."""
    data = np.load(path, allow_pickle=False)
    version = int(data["version"]) if "version" in data.files else 0
    if version != CHECKPOINT_VERSION:
        raise ValueError(
            f"checkpoint {path!r} has version {version}, this build reads "
            f"version {CHECKPOINT_VERSION}; re-run from scratch (delete the "
            "checkpoint) or load it with a matching build"
        )
    flat_t, treedef = jax.tree.flatten(carry_template)
    flat = []
    for i, leaf in enumerate(flat_t):
        arr = jnp.asarray(data[f"carry_{i}"])
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jax.dtypes.prng_key):
            arr = jax.random.wrap_key_data(data[f"carry_{i}"])
        # No explicit resharding: in a multi-process run every process loads
        # the same full host value, which jit accepts as an implicitly
        # replicated input and GSPMD reshards to the program's layout
        # (device_put cannot target non-addressable shardings directly).
        flat.append(arr)
    carry = jax.tree.unflatten(treedef, flat)
    k_done = int(data["k_done"])
    diagnostics = {
        k[len("diag_"):]: data[k] for k in data.files if k.startswith("diag_")
    }
    return carry, k_done, diagnostics
