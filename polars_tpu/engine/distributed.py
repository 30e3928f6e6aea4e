"""Distributed collect: SPMD execution of query plans over a device mesh.

Round 2 replaced the round-1 host-sliced sequential fallback with the real
SPMD engine (engine/spmd.py): row-sharded leaves, one shard_map-traced XLA
program containing the hash-partitioned all_to_all shuffles, distributed
group-by (pre-agg + shuffle partials + merge) and distributed joins
(broadcast or shuffle both sides). See spmd.py for the design notes and the
reference mapping (polars-stream equi_join.rs / group_by.rs combine_locals).
"""

from __future__ import annotations

from polars_tpu.core.frame import DataFrame
from polars_tpu.plan import logical as L


def collect_distributed(node: L.LNode, mesh=None) -> DataFrame:
    from polars_tpu.engine.spmd import collect_spmd

    return collect_spmd(node, mesh=mesh)
