"""Evaluation value/context types shared by the expression compiler.

The ``Val.domain`` tag is the AggState analogue (polars-expr/src/expressions/
mod.rs:65-156): it tracks whether a value is per-row, per-group, or a
broadcastable scalar as expressions are traced.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Any

import jax
import jax.numpy as jnp

from polars_tpu import datatypes as dt
from polars_tpu.utils.strtable import StringTable

ROW = "row"
GROUP = "group"
SCALAR = "scalar"


@dataclass
class TracedChild:
    """The flat child of a List (or Struct) column inside a trace.

    The parent's traced values are packed (start<<32|len) pairs — position-
    independent, so row ops permute them freely without touching the child.
    ``values``/``validity``/``length`` are traced arrays fed as jit ARGUMENTS
    (fresh per call — capturing the host Column was a silent stale-cache bug:
    two frames with equal signatures but different child data shared one jit
    entry). ``src`` is host provenance ``(leaf_pos, col_name)``: output list
    columns reattach the CURRENT leaf's host child through it. Struct columns
    carry ``src`` only (``values is None``) — their children are host-side
    field Column lists."""

    values: Any  # traced child values, or None (struct / provenance-only)
    validity: Any  # traced bool validity or None
    dtype: Any  # inner dtype
    table: Any  # StringTable of the child, or None
    length: Any  # traced int32 scalar — flat child element count
    src: tuple  # (leaf_pos, col_name) host provenance
    child: "TracedChild | None" = None  # nested lists
    # static host-known bound on any single list's length, when the producer
    # knows one (dictionary-derived lists: str.split over uniques). Explode
    # sizes its output as n * max_list_len for SHARED child ranges (rows
    # re-using dictionary ranges fan out past the n + child_len bound).
    max_list_len: int | None = None


@dataclass
class Val:
    values: jax.Array
    validity: jax.Array | None  # bool, same shape, None = all valid
    dtype: dt.DataType
    table: StringTable | None = None
    domain: str = ROW
    # List/Struct columns: TracedChild inside segment traces; the host child
    # Column in eager contexts (ops/list_ops.py).
    child: Any = None

    def with_(self, **kw: Any) -> Val:
        return replace(self, **kw)

    def valid_or_true(self) -> jax.Array:
        if self.validity is None:
            return jnp.ones(self.values.shape, bool)
        return self.validity


@dataclass
class GroupCtx:
    """Group assignment for one group-by (or window) evaluation."""

    gids: jax.Array  # (padded_rows,) int32 — group id per row (garbage where ~rowmask)
    num_groups: jax.Array  # traced int32 scalar
    capacity: int  # static upper bound on group count
    group_valid: jax.Array  # (capacity,) bool — slot < num_groups
    sort_perm: jax.Array | None = None  # rows sorted by (key, order) — for order-aware aggs
    order_words: list | None = None  # within-group ordering words (over(order_by=...))


@dataclass
class EvalCtx:
    cols: dict[str, Val]
    rowmask: jax.Array  # (padded,) bool — logical+filter mask
    length: Any  # traced int32 scalar (valid row count upper... logical length)
    padded: int
    schema: Any  # Schema of input
    literals: dict[Any, jax.Array]  # ELiteral node -> traced scalar
    groups: GroupCtx | None = None
    # pre-fused aggregation results (EAgg node -> Val), see executors._batch_aggs
    precomputed: dict | None = None
    # trace-time common-subexpression memo (structural ENode -> Val): repeated
    # subtrees within one evaluation context trace ONCE (the reference's
    # cse_expr pass, polars-plan/src/plans/optimizer/cse/; here it also cuts
    # Python trace time — XLA would dedupe the HLO anyway, the trace wouldn't)
    memo: dict | None = None
    # in-trace validation flags (shared with the segment's _TraceCtx): ops
    # with data-dependent capacity bounds (list.sort child contiguization)
    # append overflow conditions; failures ride the count channel. A flag
    # may register a specific error message via add_flag().
    flags: list | None = None
    flag_msgs: dict | None = None  # flag index -> message

    def add_flag(self, flag: Any, msg: str) -> None:
        if self.flags is None:
            return
        if self.flag_msgs is not None:
            self.flag_msgs[len(self.flags)] = msg
        self.flags.append(flag)

    def out_mask(self) -> jax.Array:
        """Validity domain mask for the produced frame."""
        if self.groups is not None:
            return self.groups.group_valid
        return self.rowmask


def combine_validity(*vals: jax.Array | None) -> jax.Array | None:
    out = None
    for v in vals:
        if v is None:
            continue
        out = v if out is None else (out & v)
    return out


def broadcast_pair(a: Val, b: Val) -> tuple[Val, Val, str]:
    """Reconcile domains for an elementwise binary op."""
    if a.domain == b.domain:
        return a, b, a.domain
    if SCALAR in (a.domain, b.domain):
        dom = a.domain if b.domain == SCALAR else b.domain
        return a, b, dom
    from polars_tpu.errors import ShapeError

    raise ShapeError(
        f"cannot combine {a.domain}-domain and {b.domain}-domain expressions"
    )
