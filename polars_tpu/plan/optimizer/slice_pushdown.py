"""Slice pushdown (reference: plans/optimizer/slice_pushdown_lp.rs): push
limits into scans (n_rows) and fuse Slice-after-Sort into top-k."""

from __future__ import annotations

import dataclasses

from polars_tpu.plan import logical as L


def push_slices(node: L.LNode) -> L.LNode:
    if isinstance(node, L.LSlice) and node.offset == 0 and node.length is not None:
        inner = node.input
        if isinstance(inner, L.LScan) and inner.predicate is None:
            n = node.length if inner.n_rows is None else min(inner.n_rows, node.length)
            return push_slices(dataclasses.replace(inner, n_rows=n))
        if isinstance(inner, L.LSort) and inner.limit is None:
            return push_slices(dataclasses.replace(inner, limit=node.length))
        if isinstance(inner, (L.LSelect, L.LWithColumns, L.LRename, L.LDrop)):
            if not any(_length_changing(e) for e in inner.exprs()):
                pushed = L.LSlice(inner.input, 0, node.length)
                return push_slices(L.rebuild(inner, (pushed,)))
    new_inputs = tuple(push_slices(i) for i in node.inputs())
    return L.rebuild(node, new_inputs) if new_inputs else node


def _length_changing(e) -> bool:
    from polars_tpu.plan import exprs as E

    if e is None:
        return False
    return any(
        isinstance(s, (E.EAgg, E.ELen, E.ESlice, E.EFilter, E.ESort, E.ESortBy))
        for s in E.walk(e)
    )
