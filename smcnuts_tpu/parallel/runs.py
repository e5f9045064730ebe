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

Both axes combine on a 2-D ('runs', 'particles') mesh (`runs_particles_mesh`
+ `map_runs_2d`): the run batch spreads over mesh rows while each run's
particle axis spreads over the columns — pods scale both dimensions at once.
This path is pure GSPMD: the per-run function's internal
with_sharding_constraint(P('particles', ...)) annotations batch cleanly under
vmap, run-sharding propagates from the key placement, and XLA keeps the
particle collectives (psum for weight normalisation/ESS/tempering, all-gather
for resampling) within each mesh row.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .sharding import PARTICLE_AXIS

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


def runs_particles_mesh(n_run_devices: int, devices=None) -> Mesh:
    """2-D mesh: `n_run_devices` rows on the 'runs' axis, the rest of each
    row on 'particles'. Device count must divide evenly."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % n_run_devices != 0:
        raise ValueError(
            f"device count {n} is not a multiple of n_run_devices "
            f"{n_run_devices}"
        )
    grid = np.array(devices).reshape(n_run_devices, n // n_run_devices)
    return Mesh(grid, (RUN_AXIS, PARTICLE_AXIS))


def map_runs_2d(fn_one, keys, mesh: Mesh):
    """Execute one run of `fn_one(key)` per key over a 2-D
    ('runs', 'particles') mesh: the R-run batch is sharded over mesh rows and
    each run's particle axis over the columns. `fn_one` must constrain its
    particle-major arrays against THIS mesh (pass mesh= to run_smc); the run
    axis needs no annotation — it propagates from the key placement, and the
    vmap carries spmd_axis_name='runs' so even manual-collective regions
    (the Pallas NUTS kernel's shard_map) shard the run batch over mesh rows.
    R must be a multiple of the run-axis size."""
    r = keys.shape[0]
    n_rows = mesh.shape[RUN_AXIS]
    if r % n_rows != 0:
        raise ValueError(
            f"run count {r} must be a multiple of the mesh 'runs' axis "
            f"size {n_rows}"
        )
    per_fn = _JIT_CACHE.get(fn_one)
    if per_fn is None:
        per_fn = {}
        _JIT_CACHE[fn_one] = per_fn
    cache_key = ("2d", tuple(mesh.devices.flat), mesh.axis_names)
    f = per_fn.get(cache_key)
    if f is None:
        # spmd_axis_name binds the vmapped run axis to the mesh's 'runs'
        # axis, so manual-collective regions inside fn_one (the sampler's
        # shard_map'd Pallas kernel call) see the run batch as SHARDED over
        # mesh rows rather than replicated — without it each row would
        # redundantly compute every run's kernel work.
        f = jax.jit(jax.vmap(fn_one, spmd_axis_name=RUN_AXIS))
        per_fn[cache_key] = f
    keys = jax.device_put(keys, NamedSharding(mesh, P(RUN_AXIS)))
    return f(keys)


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
