from .mesh import (
    make_particle_mesh,
    particle_sharding,
    replicated,
    initialize_distributed,
    PARTICLE_AXIS,
)
from .sharded import (
    ShardedSVGD,
    ShardedSVGDConfig,
    sharded_pairwise_median,
    sharded_median_scale,
    sharded_hessian_scale,
)
from .ring import (
    ring_phi_rbf,
    ring_count_le,
    ring_pairwise_median,
    ring_median_scale,
)
