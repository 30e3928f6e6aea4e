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
from polars_tpu.plan.optimizer.cse import collapse_common_subplans, collapse_sorts
from polars_tpu.plan.optimizer.predicate_pushdown import push_predicates
from polars_tpu.plan.optimizer.projection_pushdown import push_projections
from polars_tpu.plan.optimizer.simplify import simplify_exprs
from polars_tpu.plan.optimizer.slice_pushdown import push_slices


def optimize(node: L.LNode) -> L.LNode:
    node = simplify_exprs(node)
    node = collapse_sorts(node)
    node = push_predicates(node)
    node = push_projections(node)
    node = push_slices(node)
    # LAST: pushdowns may specialize two copies of a shared subplan
    # differently; only still-identical subplans are safe to cache
    node = collapse_common_subplans(node)
    return node
