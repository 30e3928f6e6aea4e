"""Order-observation pass: remove sorts whose ordering is provably never
observed downstream.

Reference: polars-plan/src/plans/optimizer/mod.rs CHECK_ORDER_OBSERVE /
set_order_flags.rs. The reference walks the plan marking which nodes observe
input order; sorts feeding only order-agnostic consumers are dropped. Here
we implement the two high-value conservative rewrites:

- ``group_by(maintain_order=False)`` with order-agnostic aggregations over a
  sorted input: the sort only reorders rows, the aggregate ignores order.
- ``unique(keep='any', maintain_order=False)`` over a sorted input.

A full sort (no limit) only permutes rows, so dropping it under an
order-agnostic consumer is value-preserving. Sorts with a limit are top-k
SELECTIONS and always kept. The rewrite looks through order-transparent
unary nodes (select / with_columns / filter / rename / drop whose
expressions are all elementwise).
"""

from __future__ import annotations

from polars_tpu.plan import exprs as E
from polars_tpu.plan import logical as L

# aggregation kinds whose result is independent of row order within a group
_ORDER_AGNOSTIC_AGGS = {
    "sum", "min", "max", "mean", "count", "len", "null_count", "n_unique",
    "any", "all", "std", "var", "median", "quantile", "product",
    "bitwise_and", "bitwise_or", "bitwise_xor", "is_sorted",
}

_PLAIN_NODES = (
    E.EColumn, E.EColumns, E.EDtypeColumns, E.ESelector, E.ELiteral,
    E.EBinary, E.ECast, E.EAlias, E.EKeepName, E.ERenameFn, E.ETernary,
)


def _expr_order_insensitive(node: E.ENode) -> bool:
    """True if evaluating ``node`` yields the same multiset of values for any
    row permutation of the input (elementwise / order-agnostic aggs only)."""
    from polars_tpu.engine.registry import get_spec

    for n in E.walk(node):
        if isinstance(n, _PLAIN_NODES):
            continue
        if isinstance(n, E.EAgg):
            if n.kind not in _ORDER_AGNOSTIC_AGGS:
                return False
            continue
        if isinstance(n, E.EFunction):
            try:
                spec = get_spec(n.name)
            except Exception:  # noqa: BLE001
                return False
            if not getattr(spec, "elementwise", False):
                return False
            continue
        return False  # EWindow / ESort / ESlice / EFilter / EGather / ...
    return True


def _strip_unobserved_sorts(node: L.LNode) -> L.LNode:
    """Remove full sorts reachable through order-transparent unary nodes."""
    if isinstance(node, L.LSort) and node.limit is None:
        return _strip_unobserved_sorts(node.input)
    if isinstance(node, (L.LFilter, L.LSelect, L.LWithColumns)):
        exprs = node.exprs() if hasattr(node, "exprs") else ()
        if isinstance(node, L.LFilter):
            exprs = (node.predicate,)
        if all(_expr_order_insensitive(e) for e in exprs):
            inner = _strip_unobserved_sorts(node.inputs()[0])
            if inner is not node.inputs()[0]:
                return L.rebuild(node, (inner,))
        return node
    if isinstance(node, (L.LRename, L.LDrop)):
        inner = _strip_unobserved_sorts(node.inputs()[0])
        if inner is not node.inputs()[0]:
            return L.rebuild(node, (inner,))
        return node
    return node


def order_observe(node: L.LNode) -> L.LNode:
    new_inputs = tuple(order_observe(i) for i in node.inputs())
    node = L.rebuild(node, new_inputs)
    if (
        isinstance(node, L.LGroupBy)
        and not node.maintain_order
        and all(_expr_order_insensitive(k) for k in node.keys)
        and all(_expr_order_insensitive(a) for a in node.aggs)
    ):
        inner = _strip_unobserved_sorts(node.input)
        if inner is not node.input:
            node = L.rebuild(node, (inner,))
    if (
        isinstance(node, L.LDistinct)
        and node.keep == "any"
        and not node.maintain_order
    ):
        inner = _strip_unobserved_sorts(node.input)
        if inner is not node.input:
            node = L.rebuild(node, (inner,))
    return node
