from tpupose.parallel.sharding import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicate_tree,
    replicated,
    shard_batch,
)
from tpupose.parallel.sharding import data_mesh_for_batch  # noqa: F401
