from .mesh import MeshConfig, make_mesh
from .sharding import (
    batch_sharding,
    transformer_param_specs,
    shard_params,
)
