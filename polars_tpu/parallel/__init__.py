"""Multi-chip execution: SPMD over a jax.sharding.Mesh.

The TPU-native replacement for polars-stream's morsel-driven multicore pipeline
(SURVEY.md §2.13): tables are hash-partitioned across chips (rows sharded on
the "shards" mesh axis), joins/aggregates shuffle via all_to_all over ICI
(the distributor/partitioner analogue), and global aggregates ride psum.
"""

from polars_tpu.parallel.mesh import make_mesh, shard_table_arrays
from polars_tpu.parallel.ops import (
    dist_groupby_sum,
    dist_join_inner,
    dist_reduce_sum,
    shuffle_by_key,
)

__all__ = [
    "make_mesh", "shard_table_arrays", "dist_groupby_sum", "dist_join_inner",
    "dist_reduce_sum", "shuffle_by_key",
]
