from .mesh import make_scan_mesh  # noqa: F401
from .shard import (  # noqa: F401
    sharded_scan_eval,
    sharded_permute_chunk,
)
