"""Multi-chip parallelism: device mesh + sharded counting with all-to-all merge."""

from .mesh import make_mesh
from .sharded import CapacityOverflow, ShardedTable, count_sharded

__all__ = ["make_mesh", "count_sharded", "ShardedTable", "CapacityOverflow"]
