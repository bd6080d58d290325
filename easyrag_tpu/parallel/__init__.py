"""ICI parallelism: device mesh, sharded index query, TP model sharding."""

from .mesh import make_mesh  # noqa: F401
from .sharded import ShardedDenseIndex, ShardedSparseScorer  # noqa: F401
