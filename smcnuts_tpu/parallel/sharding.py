"""Particle-axis sharding over a TPU device mesh.

The reference is single-process with no parallelism of any kind (SURVEY.md §2
"Parallelism & communication"); the scaling axis of this problem domain is the
particle count N. The design here follows the standard JAX recipe: build a 1-D
mesh over the 'particles' axis, annotate the particle-major arrays with
NamedSharding, and let GSPMD insert the collectives —

- weight normalisation / ESS / tempering-bisection objective: masked
  logsumexp and sum reductions lower to psums over ICI;
- resampling ancestor exchange: the global gather x[ancestors] lowers to an
  all-gather + local selects;
- Gaussian L-kernel moments: X^T X contributions reduce with psum, the tiny
  (2D x 2D) covariance itself is replicated.

Multi-host extends the same mesh over DCN via jax.distributed.initialize();
nothing in the program changes.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PARTICLE_AXIS = "particles"


def particle_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices, named 'particles'."""
    if devices is None:
        devices = jax.devices()
    return Mesh(devices, (PARTICLE_AXIS,))


def particle_sharding(mesh: Mesh) -> NamedSharding:
    """(N, D) arrays: shard the particle axis, replicate the feature axis."""
    return NamedSharding(mesh, P(PARTICLE_AXIS, None))


def weight_sharding(mesh: Mesh) -> NamedSharding:
    """(N,) arrays: shard the particle axis."""
    return NamedSharding(mesh, P(PARTICLE_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_key(key, mesh: Mesh):
    """Replicate the PRNG key across the mesh."""
    return jax.device_put(key, replicated(mesh))


def constrain_particles(x, mesh: Mesh):
    """Pin an (N, ...) array to the particle sharding inside jit."""
    spec = P(PARTICLE_AXIS, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
