"""Projection pushdown (reference: plans/optimizer/projection_pushdown/):
propagate the set of needed columns down to scans so readers decode only what
the query touches."""

from __future__ import annotations

import dataclasses

from polars_tpu.plan import exprs as E
from polars_tpu.plan import logical as L
from polars_tpu.plan.schema_resolve import expand_exprs, node_schema


def push_projections(node: L.LNode) -> L.LNode:
    return _push(node, None)


def _exprs_roots(exprs, schema) -> set[str]:
    roots: set[str] = set()
    for e in exprs:
        if e is None:
            continue
        try:
            for ex in expand_exprs((e,), schema):
                roots.update(E.root_column_names(ex))
                if any(isinstance(s, (E.EColumns, E.ESelector, E.EDtypeColumns)) for s in E.walk(ex)):
                    return set(schema.names())
        except Exception:
            return set(schema.names())
    return roots


def _push(node: L.LNode, needed: set[str] | None) -> L.LNode:
    """``needed=None`` means all columns are required."""
    if isinstance(node, L.LScan):
        if needed is not None:
            from polars_tpu.io.scan_schema import scan_schema

            file_schema = scan_schema(node)
            pred_roots = set()
            if node.predicate is not None:
                pred_roots = set(E.root_column_names(node.predicate))
            ri = {node.row_index[0]} if node.row_index else set()
            cols = tuple(
                n for n in file_schema.names() if n in (needed | pred_roots) - ri
            )
            return dataclasses.replace(node, projection=cols)
        return node

    if isinstance(node, L.LDataFrameScan):
        if needed is not None:
            avail = [c.name for c in node.df._columns]
            proj = tuple(n for n in avail if n in needed)
            return dataclasses.replace(node, projection=proj)
        return node

    if isinstance(node, L.LSelect):
        in_schema = node_schema(node.input)
        exprs = node.expressions
        # freeze position/dtype-dependent selectors (nth/by_index/by_dtype)
        # against the PRE-pushdown schema: once the child is pruned their
        # positional meaning changes, so they must become concrete columns
        if any(
            isinstance(s, (E.ESelector, E.EDtypeColumns))
            for e in exprs
            for s in E.walk(e)
        ):
            try:
                exprs = tuple(
                    x for e in exprs for x in expand_exprs((e,), in_schema)
                )
            except Exception:  # noqa: BLE001
                pass
        if needed is not None:
            kept = []
            try:
                for e in exprs:
                    expanded = expand_exprs((e,), in_schema)
                    for ex in expanded:
                        name = E.output_name(ex) or "literal"
                        if name in needed:
                            kept.append(ex)
            except Exception:
                kept = list(exprs)
            if kept:
                exprs = tuple(kept)
        roots = _exprs_roots(exprs, in_schema)
        new_input = _push(node.input, roots)
        return dataclasses.replace(node, input=new_input, expressions=exprs)

    if isinstance(node, L.LWithColumns):
        in_schema = node_schema(node.input)
        if needed is not None:
            kept = []
            defined = set()
            try:
                for e in node.expressions:
                    for ex in expand_exprs((e,), in_schema):
                        name = E.output_name(ex) or "literal"
                        defined.add(name)
                        if name in needed:
                            kept.append(ex)
                exprs = tuple(kept)
            except Exception:
                exprs = node.expressions
                defined = set()
            roots = _exprs_roots(exprs, in_schema)
            # input columns required = (needed ∩ input schema) ∪ expr roots
            keep_input_cols = {n for n in needed if n in set(in_schema.names())}
            child_needed = keep_input_cols | roots
            new_input = _push(node.input, child_needed)
            if not exprs:
                # nothing defined is needed — drop the node entirely
                return new_input
            return dataclasses.replace(node, input=new_input, expressions=exprs)
        roots = _exprs_roots(node.expressions, in_schema)
        new_input = _push(node.input, None)
        return dataclasses.replace(node, input=new_input)

    if isinstance(node, L.LFilter):
        in_schema = node_schema(node.input)
        roots = _exprs_roots((node.predicate,), in_schema)
        child = None if needed is None else (needed | roots)
        new_input = _push(node.input, child)
        return dataclasses.replace(node, input=new_input)

    if isinstance(node, L.LSort):
        in_schema = node_schema(node.input)
        roots = _exprs_roots(node.by, in_schema)
        child = None if needed is None else (needed | roots)
        new_input = _push(node.input, child)
        return dataclasses.replace(node, input=new_input)

    if isinstance(node, L.LDistinct):
        subset = set(node.subset) if node.subset is not None else None
        if needed is None or subset is None:
            child = None
        else:
            child = needed | subset
        new_input = _push(node.input, child)
        return dataclasses.replace(node, input=new_input)

    if isinstance(node, L.LGroupBy):
        in_schema = node_schema(node.input)
        roots = _exprs_roots((*node.keys, *node.aggs), in_schema)
        new_input = _push(node.input, roots)
        return dataclasses.replace(node, input=new_input)

    if isinstance(node, L.LJoin):
        ls = node_schema(node.input_left)
        rs = node_schema(node.input_right)
        lroots = _exprs_roots(node.left_on, ls)
        rroots = _exprs_roots(node.right_on, rs)
        if needed is None:
            lneed = None
            rneed = None
        else:
            lneed = {n for n in needed if n in set(ls.names())} | lroots
            rneed = set()
            for n in needed:
                if n in set(rs.names()):
                    rneed.add(n)
                elif n.endswith(node.suffix) and n[: -len(node.suffix)] in set(rs.names()):
                    rneed.add(n[: -len(node.suffix)])
            rneed |= rroots
        new_left = _push(node.input_left, lneed)
        new_right = _push(node.input_right, rneed)
        return dataclasses.replace(node, input_left=new_left, input_right=new_right)

    if isinstance(node, L.LRename):
        inv = {new: old for old, new in node.mapping}
        child = None if needed is None else {inv.get(n, n) for n in needed}
        new_input = _push(node.input, child)
        # drop mapping entries whose source column was pruned away
        mapping = node.mapping if needed is None else tuple(
            (old, new) for old, new in node.mapping if new in needed
        )
        return dataclasses.replace(node, input=new_input, mapping=mapping)

    if isinstance(node, L.LDrop):
        child = None if needed is None else set(needed)
        new_input = _push(node.input, child)
        return dataclasses.replace(node, input=new_input)

    if isinstance(node, (L.LSlice, L.LWithRowIndex)):
        child = None if needed is None else {n for n in needed if not (isinstance(node, L.LWithRowIndex) and n == node.name)}
        if isinstance(node, L.LWithRowIndex) and needed is not None and not child:
            # still need at least the row count; keep all minimal columns
            child = set(list(node_schema(node.input).names())[:1])
        new_input = _push(node.input, child)
        return dataclasses.replace(node, input=new_input)

    if isinstance(node, L.LUnion):
        new_inputs = tuple(_push(i, set(needed) if needed is not None else None) for i in node.inputs_)
        return dataclasses.replace(node, inputs_=new_inputs)

    if isinstance(node, L.LHConcat):
        new_inputs = []
        for i in node.inputs_:
            s = set(node_schema(i).names())
            child = None if needed is None else (needed & s)
            new_inputs.append(_push(i, child))
        return dataclasses.replace(node, inputs_=tuple(new_inputs))

    # unknown/opaque: require everything below
    new_inputs = tuple(_push(i, None) for i in node.inputs())
    return L.rebuild(node, new_inputs) if new_inputs else node
