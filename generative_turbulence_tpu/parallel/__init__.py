from .mesh import create_mesh, shard_batch_arrays, replicate, grid_partition  # noqa: F401
