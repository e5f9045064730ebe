"""Device-mesh parallelism: particle axis (collectives) and run axis
(embarrassingly parallel Monte-Carlo)."""

from .elastic import Supervisor
from .runs import (RUN_AXIS, map_runs, map_runs_2d, run_mesh,
                   runs_particles_mesh)
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
    "Supervisor",
    "RUN_AXIS",
    "constrain_particles",
    "map_runs",
    "map_runs_2d",
    "particle_mesh",
    "particle_sharding",
    "replicated",
    "run_mesh",
    "runs_particles_mesh",
    "shard_key",
    "weight_sharding",
]
