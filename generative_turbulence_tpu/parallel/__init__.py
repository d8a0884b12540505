from .distributed import initialize_distributed, is_main_process  # noqa: F401
from .mesh import create_mesh, shard_batch_arrays, replicate, grid_partition  # noqa: F401
