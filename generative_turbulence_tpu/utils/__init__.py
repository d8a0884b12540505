from .index import ravel_multi_index, unravel_index  # noqa: F401
