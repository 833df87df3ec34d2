from .mesh import batch_sharding, create_mesh, replicated, shard_batch  # noqa: F401
