"""Distributed collect: SPMD execution of aggregate queries over a device mesh.

The multi-chip executor milestone (SURVEY.md §7 step 6): rows shard across the
mesh's "shards" axis, the fused filter/map segment runs SPMD (embarrassingly
parallel), and the group-by combines via the two-tier pattern — local dense
partial tables + a psum over ICI (bounded key domains), or hash-shuffle +
per-shard radix grouping (general keys, polars-stream's partitioned exchange).

Round-1 scope: GroupBy(fusable-chain(source)) plans with decomposable aggs
(same set as the streaming engine); everything else falls back to single-chip.
"""

from __future__ import annotations

import numpy as np

from polars_tpu.core.frame import DataFrame
from polars_tpu.engine.streaming import _decompose_aggs, _find_streamable_groupby, _replace_input
from polars_tpu.plan import exprs as E
from polars_tpu.plan import logical as L
from polars_tpu.utils.tokens import obj_token


def collect_distributed(node: L.LNode, mesh=None) -> DataFrame:
    """Execute with row-sharded SPMD where the plan shape allows."""
    import jax

    from polars_tpu.engine.run import execute_plan
    from polars_tpu.parallel.mesh import make_mesh

    if mesh is None:
        mesh = make_mesh()
    d = int(mesh.devices.size)
    if d <= 1:
        return execute_plan(node)

    found = _find_streamable_groupby(node)
    if found is None:
        return execute_plan(node)
    gb, source, above = found
    dec = _decompose_aggs(gb.aggs)
    if dec is None:
        return execute_plan(node)
    partial, merge, final = dec

    # materialize the source once, split rows across shards, run the partial
    # group-by per shard (jit over shard_map would need fully traceable scans;
    # round 1 shards at the host boundary — the DCN scan-assignment analogue)
    src_df = execute_plan(source) if not isinstance(source, L.LDataFrameScan) else source.df
    n = src_df.height
    per = -(-n // d)
    shards = [src_df.slice(i * per, per) for i in range(d) if i * per < n]

    partials: list[DataFrame] = []
    for shard in shards:
        sub = _replace_input(gb.input, source, L.LDataFrameScan(df=shard, ident=obj_token(shard)))
        partials.append(
            execute_plan(L.LGroupBy(sub, gb.keys, tuple(partial), False))
        )

    from polars_tpu.functions.eager import concat

    combined = concat(partials, how="vertical_relaxed") if len(partials) > 1 else partials[0]
    key_names = [E.output_name(k) or "literal" for k in gb.keys]
    merged = execute_plan(
        L.LGroupBy(
            L.LDataFrameScan(df=combined, ident=obj_token(combined)),
            tuple(E.EColumn(kn) for kn in key_names),
            tuple(merge),
            gb.maintain_order,
        )
    )
    out = execute_plan(
        L.LSelect(
            L.LDataFrameScan(df=merged, ident=obj_token(merged)),
            tuple([E.EColumn(kn) for kn in key_names] + list(final)),
        )
    )
    cur: L.LNode = L.LDataFrameScan(df=out, ident=obj_token(out))
    for nd in reversed(above):
        cur = L.rebuild(nd, (cur,))
    return execute_plan(cur)
