"""Common-subplan elimination + sort collapse.

Reference: polars-plan/src/plans/optimizer/cse/ (cse_lp) and the
collapse_sorts rewrite. Structurally-equal NON-TRIVIAL subplans appearing
more than once (Q15-style self-joins against an aggregated subquery) are
wrapped in :class:`LCache` so they materialize once per collect; redundant
inner sorts under a re-sorting node are dropped.

Expression-level CSE lives at trace time (engine/compiler.eval_expr memo):
structurally-equal subtrees within one evaluation context trace once.
"""

from __future__ import annotations

from polars_tpu.plan import logical as L
from polars_tpu.utils.tokens import next_token


def _is_trivial(node: L.LNode) -> bool:
    """Subplans not worth caching: bare table refs (no recomputation cost)."""
    return isinstance(node, (L.LDataFrameScan, L.LCache))


def _count_subplans(node: L.LNode, counts: dict) -> None:
    # Shared PYTHON objects (the same LazyFrame used twice) count per
    # occurrence too: object sharing does not survive per-branch rewrites by
    # earlier passes, so structural equality is the real dedup key.
    if not _is_trivial(node):
        counts[node] = counts.get(node, 0) + 1
    for i in node.inputs():
        _count_subplans(i, counts)


def _rewrite(node: L.LNode, cache_for: dict) -> L.LNode:
    hit = cache_for.get(node)
    if hit is not None:
        return hit
    new_inputs = tuple(_rewrite(i, cache_for) for i in node.inputs())
    return L.rebuild(node, new_inputs)


def collapse_common_subplans(root: L.LNode) -> L.LNode:
    """Wrap maximal repeated subplans in LCache nodes."""
    counts: dict[L.LNode, int] = {}
    _count_subplans(root, counts)
    repeated = {n for n, c in counts.items() if c > 1}
    if not repeated:
        return root
    # keep only MAXIMAL repeated subplans (a repeated subplan nested inside
    # another repeated one is covered by caching the outer)
    maximal = set(repeated)
    for n in repeated:
        stack = list(n.inputs())
        while stack:
            s = stack.pop()
            maximal.discard(s)
            stack.extend(s.inputs())
    maximal.discard(root)  # caching the whole query is a no-op
    if not maximal:
        return root
    cache_for = {n: L.LCache(input=n, ident=next_token()) for n in maximal}
    return _rewrite(root, cache_for)


# ---------------------------------------------------------------------------
# sort collapse
# ---------------------------------------------------------------------------

_REORDERS = (L.LSort,)  # nodes that fully re-define row order downstream


def collapse_sorts(node: L.LNode) -> L.LNode:
    """Drop an inner full sort that an outer sort immediately re-orders:
    sort(sort(x, a), b) == sort(x, b) when the inner sort has no limit (a
    limited inner sort is a top-k SELECTION, not just an ordering) and the
    outer is not stability-dependent (maintain_order uses the incoming
    order as the tiebreak)."""
    new_inputs = tuple(collapse_sorts(i) for i in node.inputs())
    node = L.rebuild(node, new_inputs)
    if isinstance(node, L.LSort) and not node.maintain_order:
        inner = node.input
        while (
            isinstance(inner, L.LSort)
            and inner.limit is None
            and not node.maintain_order
        ):
            inner = inner.input
        if inner is not node.input:
            node = L.rebuild(node, (inner,))
    return node
