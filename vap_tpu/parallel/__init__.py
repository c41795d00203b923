from .mesh import MeshConfig, make_mesh
from .sharding import (
    batch_sharding,
    put_batch,
    transformer_param_specs,
    shard_params,
)
