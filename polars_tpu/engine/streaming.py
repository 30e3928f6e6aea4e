"""Streaming execution: larger-than-HBM scans via batch-wise partial
aggregation.

The polars-stream analogue (SURVEY.md §2.11): scans feed fixed-size batches
("morsels") through the fused map/filter segment; GroupBy becomes per-batch
partial aggregates (GroupedReduction update) combined at the end
(combine_locals barrier, nodes/group_by.rs:252). Decomposition:

    sum   -> sum of partial sums          count/len -> sum of partial counts
    min   -> min of partial mins          max       -> max of partial maxes
    mean  -> partial (sum, count) pair, finalized as sum/count

Aggregations outside this set fall back to in-memory collect (the reference's
InMemoryMap fallback pattern).
"""

from __future__ import annotations

import dataclasses
from typing import Any

from polars_tpu import datatypes as dt
from polars_tpu.config import config, verbose
from polars_tpu.core.frame import DataFrame
from polars_tpu.errors import InvalidOperationError
from polars_tpu.plan import exprs as E
from polars_tpu.plan import logical as L
from polars_tpu.utils.tokens import obj_token

_DECOMPOSABLE = {"sum", "count", "len", "min", "max", "mean"}


def _find_streamable_groupby(node: L.LNode):
    """Locate GroupBy(fusable-chain(Scan)) in the plan; returns
    (groupby_node, scan_node, path_from_groupby_down) or None."""
    from polars_tpu.engine.executors import _is_fusable

    # downstream nodes above the group-by are executed in-memory afterwards
    cur = node
    above: list[L.LNode] = []
    while not isinstance(cur, L.LGroupBy):
        inputs = cur.inputs()
        if len(inputs) != 1 or not _is_fusable(cur):
            return None
        above.append(cur)
        cur = inputs[0]
    gb = cur
    # below: fusable single-input chain ending at a scan
    cur = gb.input
    while not isinstance(cur, (L.LScan, L.LDataFrameScan)):
        inputs = cur.inputs()
        if len(inputs) != 1 or not _is_fusable(cur):
            return None
        cur = inputs[0]
    return gb, cur, above


def _decompose_aggs(aggs):
    """Rewrite agg exprs into (partial_aggs, merge_aggs, final_exprs)."""
    import polars_tpu as pl

    partial: list[E.ENode] = []
    merge: list[E.ENode] = []
    final: list[E.ENode] = []
    idx = 0
    for a in aggs:
        name = E.output_name(a) or "literal"
        base = a
        while isinstance(base, E.EAlias):
            base = base.input
        if not isinstance(base, E.EAgg) or base.kind not in _DECOMPOSABLE:
            return None
        k = base.kind
        if k == "mean":
            ps, pc = f"__p{idx}_s", f"__p{idx}_c"
            partial.append(E.EAlias(E.EAgg(base.input, "sum", ()), ps))
            partial.append(E.EAlias(E.EAgg(base.input, "len" if False else "count", base.options), pc))
            merge.append(E.EAlias(E.EAgg(E.EColumn(ps), "sum", ()), ps))
            merge.append(E.EAlias(E.EAgg(E.EColumn(pc), "sum", ()), pc))
            final.append((pl.col(ps) / pl.col(pc)).alias(name)._node)
        else:
            p = f"__p{idx}"
            partial.append(E.EAlias(E.EAgg(base.input, k, base.options), p))
            mk = "sum" if k in ("sum", "count", "len") else k
            merge.append(E.EAlias(E.EAgg(E.EColumn(p), mk, ()), p))
            out_e = pl.col(p).alias(name)
            if k in ("count", "len"):
                out_e = pl.col(p).cast(dt.UInt32()).alias(name)
            final.append(out_e._node)
        idx += 1
    return partial, merge, final


def collect_streaming(node: L.LNode, *, batch_rows: int | None = None) -> DataFrame:
    """Execute with batch-streamed scans where the plan shape allows;
    otherwise fall back to the in-memory engine."""
    from polars_tpu.engine.run import execute_plan
    from polars_tpu.io.scan_exec import iter_scan_batches

    found = _find_streamable_groupby(node)
    if found is None:
        return execute_plan(node)
    gb, scan, above = found
    dec = _decompose_aggs(gb.aggs)
    if dec is None or not isinstance(scan, L.LScan):
        return execute_plan(node)
    partial, merge, final = dec
    batch_rows = batch_rows or config().ideal_batch_size

    partials: list[DataFrame] = []
    import polars_tpu as pl

    for batch_df in iter_scan_batches(scan, batch_rows):
        sub = _replace_input(gb.input, scan, L.LDataFrameScan(df=batch_df, ident=obj_token(batch_df)))
        pgb = L.LGroupBy(sub, gb.keys, tuple(partial), False)
        partials.append(execute_plan(pgb))
        if verbose():
            print(f"[polars_tpu] streamed batch: {batch_df.height} rows -> {partials[-1].height} partial groups")

    if not partials:
        return execute_plan(node)
    from polars_tpu.functions.eager import concat

    combined = concat(partials, how="vertical_relaxed") if len(partials) > 1 else partials[0]
    key_names = [E.output_name(k) or "literal" for k in gb.keys]
    merged = execute_plan(
        L.LGroupBy(
            L.LDataFrameScan(df=combined, ident=obj_token(combined)),
            tuple(E.EColumn(n) for n in key_names),
            tuple(merge),
            gb.maintain_order,
        )
    )
    final_exprs = [E.EColumn(n) for n in key_names] + list(final)
    out = execute_plan(
        L.LSelect(L.LDataFrameScan(df=merged, ident=obj_token(merged)), tuple(final_exprs))
    )
    # run remaining plan above the group-by
    cur: L.LNode = L.LDataFrameScan(df=out, ident=obj_token(out))
    for n in reversed(above):
        cur = L.rebuild(n, (cur,))
    return execute_plan(cur)


def _replace_input(node: L.LNode, target: L.LNode, replacement: L.LNode) -> L.LNode:
    if node is target:
        return replacement
    inputs = node.inputs()
    new_inputs = tuple(_replace_input(i, target, replacement) for i in inputs)
    return L.rebuild(node, new_inputs) if inputs else node
