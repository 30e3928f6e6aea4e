"""Expression simplification: constant folding + boolean simplify
(reference: plans/optimizer/simplify_expr/)."""

from __future__ import annotations

import dataclasses

from polars_tpu.plan import exprs as E
from polars_tpu.plan import logical as L


def simplify_exprs(node: L.LNode) -> L.LNode:
    new_inputs = tuple(simplify_exprs(i) for i in node.inputs())
    node = L.rebuild(node, new_inputs) if new_inputs else node
    changes = {}
    for f in dataclasses.fields(node):
        v = getattr(node, f.name)
        if isinstance(v, E.ENode):
            s = _simplify(v)
            if s is not v:
                changes[f.name] = s
        elif isinstance(v, tuple) and v and isinstance(v[0], E.ENode):
            s = tuple(_simplify(x) for x in v)
            if any(a is not b for a, b in zip(s, v)):
                changes[f.name] = s
    if changes:
        node = dataclasses.replace(node, **changes)
    return node


def _is_lit(n: E.ENode, value=None) -> bool:
    if not isinstance(n, E.ELiteral):
        return False
    return value is None or n.value == value


def _simplify(node: E.ENode) -> E.ENode:
    kids = node.children()
    if kids:
        new_kids = tuple(_simplify(k) for k in kids)
        if any(a is not b for a, b in zip(new_kids, kids)):
            from polars_tpu.plan.schema_resolve import _rebuild_expr

            node = _rebuild_expr(node, new_kids)

    if isinstance(node, E.EBinary):
        a, b = node.left, node.right
        # constant folding on plain numeric literals
        if isinstance(a, E.ELiteral) and isinstance(b, E.ELiteral) and a.dtype is None and b.dtype is None:
            try:
                va, vb = a.value, b.value
                if va is not None and vb is not None:
                    out = _fold(node.op, va, vb)
                    if out is not NotImplemented:
                        return E.ELiteral(out)
            except Exception:
                pass
        # boolean identities
        if node.op == "&":
            if _is_lit(a, True):
                return b
            if _is_lit(b, True):
                return a
            if _is_lit(a, False) or _is_lit(b, False):
                return E.ELiteral(False)
        if node.op == "|":
            if _is_lit(a, False):
                return b
            if _is_lit(b, False):
                return a
            if _is_lit(a, True) or _is_lit(b, True):
                return E.ELiteral(True)
        # arithmetic identities
        if node.op == "+" and _is_lit(b, 0):
            return a
        if node.op == "+" and _is_lit(a, 0):
            return b
        if node.op in ("-",) and _is_lit(b, 0):
            return a
        if node.op == "*" and (_is_lit(b, 1)):
            return a
        if node.op == "*" and (_is_lit(a, 1)):
            return b
        if node.op == "/" and _is_lit(b, 1):
            return a

    if isinstance(node, E.ECast):
        # cast of cast to the same dtype collapses
        if isinstance(node.input, E.ECast) and node.input.dtype == node.dtype:
            return node.input

    if isinstance(node, E.EFunction) and node.name == "not":
        inner = node.inputs[0]
        if isinstance(inner, E.EFunction) and inner.name == "not":
            return inner.inputs[0]

    return node


def _fold(op: str, a, b):
    try:
        if op == "+":
            return a + b
        if op == "-":
            return a - b
        if op == "*":
            return a * b
        if op == "/":
            return a / b if b != 0 else NotImplemented
        if op == "//":
            return a // b if b != 0 else NotImplemented
        if op == "%":
            return a % b if b != 0 else NotImplemented
        if op == "==":
            return a == b
        if op == "!=":
            return a != b
        if op == "<":
            return a < b
        if op == "<=":
            return a <= b
        if op == ">":
            return a > b
        if op == ">=":
            return a >= b
    except TypeError:
        return NotImplemented
    return NotImplemented
