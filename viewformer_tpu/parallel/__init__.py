"""Distribution (mesh/sharding) utilities."""
from .mesh import (create_mesh, create_mesh_for_batch, data_sharding,  # noqa: F401
                   initialize_distributed, replicate, shard_batch)
