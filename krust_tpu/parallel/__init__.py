"""Multi-chip parallelism: device mesh + sharded counting with all-to-all merge."""

from .mesh import make_mesh
from .sharded import count_sharded, sharded_count_step

__all__ = ["make_mesh", "count_sharded", "sharded_count_step"]
