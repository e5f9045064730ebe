"""Run-axis scale-out: shard independent Monte-Carlo runs over the mesh.

The reference's experiment layer executes 25 Monte-Carlo runs serially in one
Python process (reference experiments/run_experiments.py:105-130). Here the
run axis is a second, embarrassingly-parallel scaling dimension alongside the
particle axis (parallel/sharding.py): R runs are vmapped into one program —
the batched NUTS kernel (ops/nuts_pallas.py custom_vmap rule) collapses them
into a single multi-run launch per iteration — and shard_map'd over a 'runs'
mesh so every device executes its local batch with NO cross-device
communication. Scaling is linear by construction; one all-gather materialises
the results at the end.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P

RUN_AXIS = "runs"

import weakref

# Weak-keyed by the run function: an id()-keyed dict could resolve a NEW
# function to a stale compiled program if a collected function's id were
# reused.
_JIT_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def run_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices, named 'runs'."""
    if devices is None:
        devices = jax.devices()
    return Mesh(devices, (RUN_AXIS,))


def map_runs(fn_one, keys, mesh: Mesh):
    """Execute one independent run of `fn_one(key)` per key, sharded over the
    'runs' mesh: R/n_devices runs per device, each device's batch vmapped
    through the multi-run kernel. Returns the stacked results (leading axis
    R, run-sharded). R must divide evenly over the mesh.

    The jitted program is cached per (fn_one, mesh) so repeated calls with
    the same run function reuse the compilation."""
    r = keys.shape[0]
    n_dev = mesh.devices.size
    if r % n_dev != 0:
        raise ValueError(
            f"run count {r} must be a multiple of the mesh size {n_dev}"
        )
    per_fn = _JIT_CACHE.get(fn_one)
    if per_fn is None:
        per_fn = {}
        _JIT_CACHE[fn_one] = per_fn
    cache_key = (tuple(mesh.devices.flat), mesh.axis_names)
    f = per_fn.get(cache_key)
    if f is None:
        f = jax.jit(
            jax.shard_map(
                jax.vmap(fn_one), mesh=mesh,
                in_specs=P(RUN_AXIS), out_specs=P(RUN_AXIS),
                check_vma=False,  # pallas out_shapes carry no vma info
            )
        )
        per_fn[cache_key] = f
    return f(keys)
