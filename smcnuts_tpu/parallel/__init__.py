"""Device-mesh parallelism for the particle axis."""

from .sharding import (
    PARTICLE_AXIS,
    constrain_particles,
    particle_mesh,
    particle_sharding,
    replicated,
    shard_key,
    weight_sharding,
)

__all__ = [
    "PARTICLE_AXIS",
    "constrain_particles",
    "particle_mesh",
    "particle_sharding",
    "replicated",
    "shard_key",
    "weight_sharding",
]
