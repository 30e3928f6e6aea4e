"""Expression-level common-subexpression elimination (comm_subexpr_elim).

Reference: polars-plan/src/plans/optimizer/cse/ (cse_expr.rs) — there a
hash-cons over AExpr arenas inside one projection context. In this engine two
of the three duplication classes are already free:

- WITHIN one evaluation context, the tracer memoizes structurally-equal
  subtrees (engine/compiler.eval_expr memo) — one trace per subexpression.
- WITHIN one fused segment, XLA's own CSE dedupes identical subgraphs at
  compile time.

What remains is duplication ACROSS segment barriers: an expensive aggregate
or window computed in a ``with_columns`` below a barrier (sort, ...) and
recomputed verbatim above it. This pass walks each expression-bearing node's
row-preserving input spine, collects named definitions of expensive
subexpressions (EAgg/EWindow-containing), and rewrites later occurrences to
column references — so ``sum(x).over(k)`` traces ONCE per plan, not once per
segment.

Validity rules (conservative):
- definitions come from ``with_columns``/``select`` outputs; descent stops at
  any node that is not row-1:1-preserving with all columns intact
  (``with_columns`` and ``sort`` qualify; ``filter`` does NOT — group
  membership changes would alter agg/window values);
- a definition dies if its name, or any column its expression reads, is
  redefined between the definition and the use;
- only ROW-context expression lists are rewritten (select / with_columns /
  filter / sort keys) — group-by aggregation lists keep their own semantics.
"""

from __future__ import annotations

import dataclasses

from polars_tpu.plan import exprs as E
from polars_tpu.plan import logical as L

_MAX_DEPTH = 64


def _expensive(e: E.ENode) -> bool:
    return any(isinstance(s, (E.EAgg, E.EWindow)) for s in E.walk(e))


def _reads(e: E.ENode) -> set[str]:
    return {s.name for s in E.walk(e) if isinstance(s, E.EColumn)}


def _collect_defs(n: L.LNode) -> dict:
    """expr-structure -> column name, for definitions still valid at the
    OUTPUT of ``n`` (i.e. usable by the node directly above ``n``)."""
    defs: dict = {}
    shadow: set[str] = set()  # names (re)defined somewhere above the def site
    cur = n
    for _ in range(_MAX_DEPTH):
        if isinstance(cur, (L.LWithColumns, L.LSelect)):
            local_outs: set[str] = set()
            for e in cur.exprs():
                try:
                    name = E.output_name(e, raise_on_multi=False)
                except Exception:  # noqa: BLE001 — selectors etc.: no def
                    name = None
                if name is None:
                    continue
                local_outs.add(name)
                base = e
                while isinstance(base, E.EAlias):
                    base = base.input
                if (
                    _expensive(base)
                    and name not in shadow
                    and not (_reads(base) & shadow)
                ):
                    try:
                        defs.setdefault(base, name)
                    except TypeError:  # unhashable payload in options
                        pass
            shadow |= local_outs
            if isinstance(cur, L.LSelect):
                break  # columns below a projection may be dropped
            cur = cur.input
            continue
        if isinstance(cur, L.LSort):
            cur = cur.input
            continue
        break
    return defs


def _replace_expr(node: E.ENode, target: E.ENode, repl: E.ENode) -> E.ENode:
    if node == target:
        return repl
    changes = {}
    for f in dataclasses.fields(node):
        v = getattr(node, f.name)
        if isinstance(v, E.ENode):
            nv = _replace_expr(v, target, repl)
            if nv is not v:
                changes[f.name] = nv
        elif isinstance(v, tuple) and v and all(isinstance(x, E.ENode) for x in v):
            nv = tuple(_replace_expr(x, target, repl) for x in v)
            if any(a is not b for a, b in zip(nv, v)):
                changes[f.name] = nv
    return dataclasses.replace(node, **changes) if changes else node


def _rewrite_exprs(exprs, defs):
    out = []
    changed = False
    for e in exprs:
        ne = e
        for dexpr, name in defs.items():
            # never rewrite the def node's own (re)definition of itself
            base = ne
            while isinstance(base, E.EAlias):
                base = base.input
            if base == dexpr and E.output_name(ne, raise_on_multi=False) == name:
                continue
            ne = _replace_expr(ne, dexpr, E.EColumn(name))
        changed = changed or (ne is not e)
        out.append(ne)
    return tuple(out), changed


def cse_expressions(node: L.LNode) -> L.LNode:
    inputs = node.inputs()
    new_inputs = tuple(cse_expressions(i) for i in inputs)
    if any(a is not b for a, b in zip(new_inputs, inputs)):
        node = L.rebuild(node, new_inputs)

    if isinstance(node, (L.LSelect, L.LWithColumns, L.LFilter, L.LSort)):
        defs = _collect_defs(node.inputs()[0])
        if defs:
            if isinstance(node, L.LFilter):
                pred, ch = _rewrite_exprs((node.predicate,), defs)
                if ch:
                    node = dataclasses.replace(node, predicate=pred[0])
            elif isinstance(node, L.LSort):
                by, ch = _rewrite_exprs(node.by, defs)
                if ch:
                    node = dataclasses.replace(node, by=by)
            else:
                exprs, ch = _rewrite_exprs(node.exprs(), defs)
                if ch:
                    node = dataclasses.replace(node, expressions=exprs)
    return node
