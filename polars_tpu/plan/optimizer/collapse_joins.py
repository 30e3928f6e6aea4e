"""collapse_joins: FILTER over a CROSS JOIN whose predicate equates one
column from each side rewrites to an equi join with a residual filter
(reference: polars-plan/src/plans/optimizer/collapse_joins.rs).

The rewrite keeps the cross join's output schema: the equi join runs with
``coalesce=False`` so both key columns (right one suffixed) survive, exactly
as the filtered cross join would produce them.
"""

from __future__ import annotations

import dataclasses

from polars_tpu.plan import exprs as E
from polars_tpu.plan import logical as L


def _split_conjuncts(pred: E.ENode, out: list) -> None:
    if isinstance(pred, E.EBinary) and pred.op == "&":
        _split_conjuncts(pred.left, out)
        _split_conjuncts(pred.right, out)
    else:
        out.append(pred)


def _and_all(conj: list) -> E.ENode:
    e = conj[0]
    for c in conj[1:]:
        e = E.EBinary(e, "&", c)
    return e


def _side_of(name: str, lnames: set, rnames: set, suffix: str):
    """Which join input an OUTPUT column name belongs to (cross join renames
    clashing right columns with the suffix)."""
    if name in lnames:
        return ("l", name)
    if name in rnames:
        return ("r", name)
    if name.endswith(suffix) and name[: -len(suffix)] in rnames:
        return ("r", name[: -len(suffix)])
    return None


def collapse_joins(node: L.LNode) -> L.LNode:
    inputs = node.inputs()
    new_inputs = tuple(collapse_joins(i) for i in inputs)
    if any(a is not b for a, b in zip(new_inputs, inputs)):
        node = L.rebuild(node, new_inputs)

    if not (
        isinstance(node, L.LFilter)
        and isinstance(node.input, L.LJoin)
        and node.input.how == "cross"
    ):
        return node
    j = node.input
    from polars_tpu.plan.schema_resolve import node_schema

    try:
        lnames = set(node_schema(j.input_left).names())
        rnames = set(node_schema(j.input_right).names())
    except Exception:  # noqa: BLE001 — unresolvable schema: leave the plan
        return node

    conj: list = []
    _split_conjuncts(node.predicate, conj)
    left_keys: list[E.ENode] = []
    right_keys: list[E.ENode] = []
    residual: list[E.ENode] = []
    for c in conj:
        if (
            isinstance(c, E.EBinary)
            and c.op == "=="
            and isinstance(c.left, E.EColumn)
            and isinstance(c.right, E.EColumn)
        ):
            a = _side_of(c.left.name, lnames, rnames, j.suffix)
            b = _side_of(c.right.name, lnames, rnames, j.suffix)
            if a and b and {a[0], b[0]} == {"l", "r"}:
                lc, rc = (a, b) if a[0] == "l" else (b, a)
                left_keys.append(E.EColumn(lc[1]))
                right_keys.append(E.EColumn(rc[1]))
                continue
        residual.append(c)
    if not left_keys:
        return node
    nj = dataclasses.replace(
        j,
        left_on=tuple(left_keys),
        right_on=tuple(right_keys),
        how="inner",
        coalesce=False,  # both key columns survive, like the filtered cross
    )
    if residual:
        return L.LFilter(nj, _and_all(residual))
    return nj
