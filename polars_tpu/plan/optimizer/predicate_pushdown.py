"""Predicate pushdown (reference: plans/optimizer/predicate_pushdown/, incl.
the through-join ExprOrigin left/right classification, join/mod.rs:13)."""

from __future__ import annotations

import dataclasses

from polars_tpu.plan import exprs as E
from polars_tpu.plan import logical as L
from polars_tpu.plan.schema_resolve import node_schema


def _split_conjuncts(pred: E.ENode) -> list[E.ENode]:
    if isinstance(pred, E.EBinary) and pred.op == "&":
        return _split_conjuncts(pred.left) + _split_conjuncts(pred.right)
    return [pred]


def _join_conjuncts(preds: list[E.ENode]) -> E.ENode:
    node = preds[0]
    for p in preds[1:]:
        node = E.EBinary(node, "&", p)
    return node


def _is_pushable(pred: E.ENode) -> bool:
    """Only deterministic, elementwise predicates move past other nodes."""
    return E.is_elementwise(pred)


def push_predicates(node: L.LNode) -> L.LNode:
    return _push(node, [])


def _with_filters(node: L.LNode, preds: list[E.ENode]) -> L.LNode:
    if not preds:
        return node
    return L.LFilter(node, _join_conjuncts(preds))


def _push(node: L.LNode, preds: list[E.ENode]) -> L.LNode:
    if isinstance(node, L.LFilter):
        conj = _split_conjuncts(node.predicate)
        pushable = [p for p in conj if _is_pushable(p)]
        blocked = [p for p in conj if not _is_pushable(p)]
        out = _push(node.input, preds + pushable)
        return _with_filters(out, blocked)

    if isinstance(node, L.LScan):
        if preds:
            existing = [node.predicate] if node.predicate is not None else []
            new_pred = _join_conjuncts(existing + preds)
            return dataclasses.replace(node, predicate=new_pred)
        return node

    if isinstance(node, L.LDataFrameScan):
        return _with_filters(node, preds)

    if isinstance(node, (L.LSelect, L.LWithColumns)):
        if not all(E.is_elementwise(e) for e in node.expressions):
            # a window/aggregate in the projection is ROW-SET sensitive:
            # filtering below it would change its input rows and therefore
            # its values (reference: pushdown blocks on non-elementwise
            # projections, polars-plan/src/plans/optimizer/predicate_pushdown)
            new_input = _push(node.input, [])
            out = dataclasses.replace(node, input=new_input)
            return _with_filters(out, preds)
        # predicates referencing only pass-through input columns can move below
        in_schema = node_schema(node.input)
        if isinstance(node, L.LWithColumns):
            defined = set()
            for e in node.expressions:
                n = E.output_name(e)
                if n:
                    defined.add(n)
            passthrough = set(in_schema.names()) - defined
        else:
            # select: a column passes through if it is a bare/aliased column ref
            passthrough = set()
            rename_map = {}
            for e in node.expressions:
                base = e
                out_name = E.output_name(e)
                while isinstance(base, E.EAlias):
                    base = base.input
                if isinstance(base, E.EColumn) and out_name:
                    passthrough.add(out_name)
                    rename_map[out_name] = base.name
            below = []
            stay = []
            for p in preds:
                roots = E.root_column_names(p)
                if roots and all(r in passthrough for r in roots):
                    q = p
                    for out_n in roots:
                        if rename_map.get(out_n, out_n) != out_n:
                            q = _rename_cols(q, {out_n: rename_map[out_n]})
                    below.append(q)
                else:
                    stay.append(p)
            new_input = _push(node.input, below)
            out = dataclasses.replace(node, input=new_input)
            return _with_filters(out, stay)
        below = []
        stay = []
        for p in preds:
            roots = E.root_column_names(p)
            if all(r in passthrough for r in roots):
                below.append(p)
            else:
                stay.append(p)
        new_input = _push(node.input, below)
        out = dataclasses.replace(node, input=new_input)
        return _with_filters(out, stay)

    if isinstance(node, (L.LRename,)):
        inv = {new: old for old, new in node.mapping}
        below = []
        stay = []
        for p in preds:
            roots = E.root_column_names(p)
            if all(True for _ in roots):
                below.append(_rename_cols(p, inv))
            else:
                stay.append(p)
        new_input = _push(node.input, below)
        return _with_filters(dataclasses.replace(node, input=new_input), stay)

    if isinstance(node, (L.LDrop, L.LWithRowIndex)):
        defined = {node.name} if isinstance(node, L.LWithRowIndex) else set()
        below = [p for p in preds if not (set(E.root_column_names(p)) & defined)]
        stay = [p for p in preds if set(E.root_column_names(p)) & defined]
        new_input = _push(node.input, below)
        return _with_filters(dataclasses.replace(node, input=new_input), stay)

    if isinstance(node, L.LSort):
        # filters commute with sort
        new_input = _push(node.input, preds) if node.limit is None else _with_filters(_push_none(node), preds)
        if node.limit is None:
            return dataclasses.replace(node, input=new_input)
        return new_input

    if isinstance(node, L.LDistinct):
        if node.keep in ("any", "none"):
            new_input = _push(node.input, preds)
            return dataclasses.replace(node, input=new_input)
        return _with_filters(_push_none(node), preds)

    if isinstance(node, L.LGroupBy):
        key_names = set()
        for k in node.keys:
            n = E.output_name(k)
            if n:
                key_names.add(n)
        key_passthrough = {}
        for k in node.keys:
            base = k
            while isinstance(base, E.EAlias):
                base = base.input
            n = E.output_name(k)
            if isinstance(base, E.EColumn) and n:
                key_passthrough[n] = base.name
        below = []
        stay = []
        for p in preds:
            roots = E.root_column_names(p)
            if roots and all(r in key_passthrough for r in roots):
                q = p
                for r in roots:
                    if key_passthrough[r] != r:
                        q = _rename_cols(q, {r: key_passthrough[r]})
                below.append(q)
            else:
                stay.append(p)
        new_input = _push(node.input, below)
        return _with_filters(dataclasses.replace(node, input=new_input), stay)

    if isinstance(node, L.LJoin):
        left_schema = node_schema(node.input_left)
        right_schema = node_schema(node.input_right)
        left_names = set(left_schema.names())
        right_suffixed = {}
        out_schema = node_schema(node)
        for rn in right_schema.names():
            if rn in left_names:
                right_suffixed[rn + node.suffix] = rn
            else:
                right_suffixed[rn] = rn
        left_ok = node.how in ("inner", "left", "semi", "anti")
        right_ok = node.how in ("inner", "right")
        to_left, to_right, stay = [], [], []
        for p in preds:
            roots = set(E.root_column_names(p))
            if roots and roots <= left_names and left_ok:
                to_left.append(p)
            elif roots and all(r in right_suffixed for r in roots) and right_ok:
                q = p
                for r in roots:
                    if right_suffixed[r] != r:
                        q = _rename_cols(q, {r: right_suffixed[r]})
                to_right.append(q)
            else:
                stay.append(p)
        new_left = _push(node.input_left, to_left)
        new_right = _push(node.input_right, to_right)
        out = dataclasses.replace(node, input_left=new_left, input_right=new_right)
        return _with_filters(out, stay)

    if isinstance(node, L.LUnion):
        new_inputs = tuple(_push(i, list(preds)) for i in node.inputs_)
        return dataclasses.replace(node, inputs_=new_inputs)

    if isinstance(node, L.LSlice):
        # predicates do NOT commute with slice
        return _with_filters(_push_none(node), preds)

    # default: stop pushing here
    return _with_filters(_push_none(node), preds)


def _push_none(node: L.LNode) -> L.LNode:
    new_inputs = tuple(_push(i, []) for i in node.inputs())
    return L.rebuild(node, new_inputs) if new_inputs else node


def _rename_cols(node: E.ENode, mapping: dict[str, str]) -> E.ENode:
    if isinstance(node, E.EColumn):
        if node.name in mapping:
            return E.EColumn(mapping[node.name])
        return node
    kids = node.children()
    if not kids:
        return node
    from polars_tpu.plan.schema_resolve import _rebuild_expr

    new_kids = tuple(_rename_cols(k, mapping) for k in kids)
    if new_kids == kids:
        return node
    return _rebuild_expr(node, new_kids)
