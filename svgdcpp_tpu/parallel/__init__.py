from .mesh import make_particle_mesh, particle_sharding, replicated, PARTICLE_AXIS
from .sharded import (
    ShardedSVGD,
    ShardedSVGDConfig,
    sharded_pairwise_median,
    sharded_median_scale,
    sharded_hessian_scale,
)
