"""Device-mesh parallelism: particle axis (collectives) and run axis
(embarrassingly parallel Monte-Carlo)."""

from .runs import RUN_AXIS, map_runs, run_mesh
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
    "RUN_AXIS",
    "constrain_particles",
    "map_runs",
    "particle_mesh",
    "particle_sharding",
    "replicated",
    "run_mesh",
    "shard_key",
    "weight_sharding",
]
