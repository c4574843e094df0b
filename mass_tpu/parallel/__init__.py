from mass_tpu.parallel.mesh import make_mesh  # noqa: F401
from mass_tpu.parallel.sharding import (  # noqa: F401
    shard_voxelmap, sharded_update_fn)
from mass_tpu.parallel.episodes import BatchedMapper  # noqa: F401
