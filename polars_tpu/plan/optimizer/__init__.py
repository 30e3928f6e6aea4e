"""Logical-plan optimizer.

Reference: polars-plan/src/plans/optimizer/mod.rs:85-300. Pass order mirrors
the reference's pipeline: simplify expressions -> predicate pushdown ->
projection pushdown -> slice pushdown -> common-subplan collapse. Because
fused segments compile to one XLA program anyway, several reference passes
(delay-rechunk, cluster_with_columns) are unnecessary here — XLA fusion does
that scheduling; the passes that matter are the ones that reduce *scanned and
shuffled* data.
"""

from __future__ import annotations

from polars_tpu.plan import logical as L
from polars_tpu.plan.optimizer.collapse_joins import collapse_joins
from polars_tpu.plan.optimizer.cse import collapse_common_subplans, collapse_sorts
from polars_tpu.plan.optimizer.predicate_pushdown import push_predicates
from polars_tpu.plan.optimizer.projection_pushdown import push_projections
from polars_tpu.plan.optimizer.simplify import simplify_exprs
from polars_tpu.plan.optimizer.slice_pushdown import push_slices


def optimize(node: L.LNode, flags=None) -> L.LNode:
    """Run the optimizer pipeline. ``flags`` is an optional
    :class:`polars_tpu.QueryOptFlags` — each pass is gated on its toggle
    (reference: polars-plan/src/frame/opt_state.rs OptFlags, consulted by
    optimize() at plans/optimizer/mod.rs:85)."""
    if flags is None or getattr(flags, "type_check", True):
        # early whole-plan schema + dtype resolution: unresolvable columns or
        # untypable expressions raise HERE, before any trace or IO starts
        # (reference: plans/conversion/type_coercion + the type_check pass —
        # in this engine binary-op supertype unification itself happens at
        # trace time via engine/cast.cast_val, so the plan pass is the check)
        from polars_tpu.plan.schema_resolve import node_schema

        node_schema(node)
    if flags is None or getattr(flags, "simplify_expression", True):
        node = simplify_exprs(node)
    if flags is None or getattr(flags, "comm_subexpr_elim", True):
        # expensive agg/window subexpressions recomputed above a barrier
        # collapse to column references of their first computation — BEFORE
        # the pushdown passes, so they see the new column dependencies
        from polars_tpu.plan.optimizer.cse_expr import cse_expressions

        node = cse_expressions(node)
    if flags is None or getattr(flags, "check_order_observe", True):
        from polars_tpu.plan.optimizer.order_observe import order_observe

        node = collapse_sorts(node)
        node = order_observe(node)
    if flags is None or getattr(flags, "predicate_pushdown", True):
        node = push_predicates(node)
    if flags is None or getattr(flags, "collapse_joins", True):
        # after predicate pushdown: single-side conjuncts have sunk into the
        # cross join's inputs; the cross-side equalities remain in the filter
        rewritten = collapse_joins(node)
        if rewritten is not node and (flags is None or getattr(flags, "predicate_pushdown", True)):
            # residual conjuncts can now sink through the new equi join
            rewritten = push_predicates(rewritten)
        node = rewritten
    if flags is None or getattr(flags, "fast_projection", True):
        # COUNT(*) from file metadata — no data pages read or shipped
        from polars_tpu.plan.optimizer.count_star import count_star

        node = count_star(node)
    if flags is None or getattr(flags, "projection_pushdown", True):
        node = push_projections(node)
    if flags is None or getattr(flags, "slice_pushdown", True):
        node = push_slices(node)
    if flags is None or getattr(flags, "comm_subplan_elim", True):
        # LAST: pushdowns may specialize two copies of a shared subplan
        # differently; only still-identical subplans are safe to cache
        node = collapse_common_subplans(node)
    return node
