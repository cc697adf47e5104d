from .mesh import (batch_sharding, make_mesh, replicated,  # noqa: F401
                   shard_batch)
