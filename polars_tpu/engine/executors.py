"""Plan execution: fused trace segments between barriers.

The TPU replacement for both reference engines (polars-mem-engine pull
executors + polars-stream's morsel pipeline): every maximal chain of
map/filter/group/sort/distinct nodes compiles to ONE XLA program over padded
arrays — filters are row-mask updates (zero materialization), group-by outputs
stay capacity-padded with a traced group count, and the only host
synchronisation points are join sizing, host string/UDF ops, and final
materialization. Compiled programs are cached globally keyed on plan structure
+ input signatures (the jit analogue of the reference's per-node physical plan
cache), so repeated eager calls do not re-trace.
"""

from __future__ import annotations

import dataclasses
import os as _os
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from polars_tpu import datatypes as dt
from polars_tpu.config import config, verbose
from polars_tpu.core.buffer import Buffer, pad_to, padded_size, row_mask
from polars_tpu.core.column import Column
from polars_tpu.core.frame import DataFrame
from polars_tpu.core.schema import Schema
from polars_tpu.engine import groupby as G
from polars_tpu.engine.common import GROUP, ROW, SCALAR, EvalCtx, Val
from polars_tpu.engine.compiler import collect_literals, eval_expr, literal_host_value
from polars_tpu.engine.sort import apply_perm, sort_perm
from polars_tpu.errors import ComputeError, InvalidOperationError, ShapeError
from polars_tpu.plan import exprs as E
from polars_tpu.plan import logical as L
from polars_tpu.plan.schema_resolve import expand_exprs, node_schema

# ---------------------------------------------------------------------------
# traced table
# ---------------------------------------------------------------------------


@dataclass
class TTable:
    cols: dict[str, Val]  # all ROW domain, padded arrays of equal length
    rowmask: jax.Array
    padded: int

    def length(self) -> jax.Array:
        return jnp.sum(self.rowmask.astype(jnp.int32))

    def schema(self) -> Schema:
        return Schema([(n, v.dtype) for n, v in self.cols.items()])


# ---------------------------------------------------------------------------
# barriers / fusability
# ---------------------------------------------------------------------------

_FUSABLE = (
    L.LFilter, L.LSelect, L.LWithColumns, L.LSlice, L.LDistinct, L.LSort,
    L.LGroupBy, L.LRename, L.LDrop, L.LWithRowIndex, L.LUnion, L.LHConcat,
    L.LJoin, L.LExplode,
)


def _join_fusable(node: L.LJoin) -> bool:
    """m:1/1:1 joins (and inner 1:m, flipped) have statically-sized outputs,
    so they trace into the segment — no host sizing barrier (see
    engine/join_traced.py). Semi/anti joins are ALWAYS statically sized
    (output ⊆ left rows), so they fuse too when the key comparison is exact
    (single non-float key: the in-trace matcher verifies only the first
    candidate of a hash run, which is only sound for exact key words)."""
    if _os.environ.get("POLARS_TPU_NO_FUSED_JOIN"):
        # escape hatch: the fused join program crashed the TPU worker on
        # 60M-row probe sides (axon v5e, 2026-08-19); the barrier join path
        # is immune
        return False
    if node.validate in ("m:1", "1:1"):
        return node.how in ("inner", "left", "semi", "anti")
    if node.validate == "1:m":
        return node.how == "inner"
    if node.how in ("semi", "anti") and len(node.left_on) == 1 and not node.nulls_equal:
        from polars_tpu.plan.schema_resolve import expr_dtype

        try:
            lt = expr_dtype(node.left_on[0], node_schema(node.input_left))
            rt = expr_dtype(node.right_on[0], node_schema(node.input_right))
        except Exception:
            return False
        return not lt.is_float() and not rt.is_float()
    return False

HOST_FNS = {
    "concat_str", "dt.to_string", "cat.get_categories",
    "list.join",
    "explode", "as_struct", "struct.field", "struct.rename_fields",
    "sample", "shuffle", "arg_where_self", "rle",
    "int_ranges", "date_ranges", "datetime_ranges", "linear_spaces", "time_ranges",
}
# list.len/sum/mean/min/max/get/contains are TRACED since round 2
# (engine/fn_nested.py) — prefix-sum range queries over the packed layout.
# list.sort/reverse/unique are TRACED too (in-trace child rebuild via the
# run_segment child_outs protocol); conditionally host below.


def _is_column_ref(e: E.ENode) -> bool:
    """True when ``e`` is a bare column reference (possibly aliased): only
    those bind a traced child chain — lists born inside the expression (e.g.
    a hoisted str.split series literal) have no child in the trace."""
    while isinstance(e, (E.EAlias, E.EKeepName)):
        e = e.input
    return isinstance(e, E.EColumn)


# traced list ops that REBUILD a freshly contiguized child (fn_nested
# _contiguize/_rebuild): their outputs never share ranges, so chained
# rebuild ops are safe on them
_TRACED_LIST_PRODUCERS = {
    "list.sort", "list.reverse", "list.unique", "list.drop_nulls",
    "list.slice", "list.head", "list.tail", "list.shift", "list.diff",
    "list.gather_every", "list.filter", "list.concat", "list.set_union",
}


def _has_traced_child(e: E.ENode) -> bool:
    """Column refs AND in-trace list producers (str.split/extract_all build
    a TracedChild from the dictionary; the traced list rebuilds and list.eval
    emit one, r5) bind a child chain in the trace — range-reading list ops
    (len/sum/get/contains/any/all/...) work on them. If a producer's own gate
    routes it host, the whole expression routes host anyway (_expr_needs_host
    walks every node), so claiming traceability here is safe."""
    while isinstance(e, (E.EAlias, E.EKeepName)):
        e = e.input
    if isinstance(e, E.EColumn):
        return True
    return isinstance(e, E.EFunction) and (
        e.name in ("str.split", "str.extract_all", "list.eval")
        or e.name in _TRACED_LIST_PRODUCERS
    )


def _rebuild_safe_input(e: E.ENode) -> bool:
    """Inputs whose traced child can be contiguized within the child's padded
    extent: bare columns (ranges may share only after join fan-out — those
    flag at runtime), traced rebuilds (freshly contiguized by construction),
    and list.eval over such inputs (packing pass-through). Split-derived
    children stay excluded: their SHARED ranges can overflow the extent."""
    while isinstance(e, (E.EAlias, E.EKeepName)):
        e = e.input
    if isinstance(e, E.EColumn):
        return True
    if isinstance(e, E.EFunction):
        if e.name in _TRACED_LIST_PRODUCERS:
            return True
        if e.name == "list.eval":
            return _rebuild_safe_input(e.inputs[0])
    return False


def _fn_conditionally_host(n: E.EFunction, schema: Schema) -> bool:
    """Fns that trace only for some input shapes/dtypes."""
    from polars_tpu.plan.schema_resolve import expr_dtype

    if n.name.startswith("list.") and _os.environ.get("POLARS_TPU_FORCE_HOST_LISTOPS"):
        # differential-test hook: route every conditional list op to the host
        # oracle (tests/test_fuzz_differential.py traced-vs-host sweep)
        return True

    # list.len only reads the packed words (no child) — traces for ANY input
    if n.name in (
        "list.sum", "list.mean", "list.min", "list.max",
        "list.get", "list.contains",
    ) and not _has_traced_child(n.inputs[0]):
        return True
    if n.name == "list.contains":
        # string children need dict-code translation of the needle; per-row
        # (non-literal) needles need a child->parent map — both host for now
        if len(n.inputs) > 1 and not isinstance(n.inputs[1], E.ELiteral):
            return True
        try:
            d = expr_dtype(n.inputs[0], schema)
        except Exception:
            return True
        inner = getattr(d, "inner", None)
        return inner is None or not (inner.is_numeric() or isinstance(inner, dt.Boolean))
    if n.name in ("list.sum", "list.mean", "list.min", "list.max", "list.get"):
        try:
            d = expr_dtype(n.inputs[0], schema)
        except Exception:
            return True
        if not isinstance(d, dt.List):
            return True  # Array etc. stay on the host path
        if n.name == "list.get" and isinstance(d.inner, (dt.List, dt.Array, dt.Struct)):
            return True  # nested gather keeps host semantics
    if n.name in ("str.extract_many", "str.find_many"):
        # literal patterns trace via the dictionary LUT (fn_strings); a
        # per-row pattern COLUMN needs row data on the host
        return len(n.inputs) > 1
    if n.name == "cumulative_eval":
        # traced only for prefix-agg shapes (element().sum/min/max/mean) over
        # numeric/bool inputs — one segmented scan instead of the O(n^2) host
        # prefix loop (fn_position._cumulative_eval)
        from polars_tpu.engine.fn_position import cum_eval_kind

        if cum_eval_kind(n.opt("expr")) is None:
            return True
        try:
            d = expr_dtype(n.inputs[0], schema)
        except Exception:
            return True
        return not (d.is_numeric() or isinstance(d, dt.Boolean))
    if n.name in ("list.eval", "list.filter"):
        # traced only for ELEMENTWISE inner exprs over pl.element() (the
        # reference's streamable-expr classification, lower_expr.rs:39-53);
        # aggregating / length-changing inner exprs keep the host group path
        sub = n.opt("expr")
        if sub is None or not E.is_elementwise(sub):
            return True
        gate = _rebuild_safe_input if n.name == "list.filter" else _has_traced_child
        if not gate(n.inputs[0]):
            return True
        try:
            d = expr_dtype(n.inputs[0], schema)
        except Exception:
            return True
        if not isinstance(d, dt.List) or isinstance(d.inner, (dt.List, dt.Array, dt.Struct)):
            return True
        saw_element = False
        for c in E.walk(sub):
            if isinstance(c, E.EColumn):
                if c.name != "":
                    return True
                saw_element = True
        if not saw_element:
            # input-independent exprs (lit(5)) have per-empty-list broadcast
            # semantics only the host group path reproduces
            return True
        from polars_tpu.core.schema import Schema as _Schema

        elem_schema = _Schema({"": d.inner})
        if _expr_needs_host(sub, elem_schema):
            return True
        try:
            out_d = expr_dtype(sub, elem_schema)
        except Exception:
            return True
        if n.name == "list.filter" and not isinstance(out_d, dt.Boolean):
            return True
        if isinstance(out_d, (dt.List, dt.Array, dt.Struct, dt.Unknown)):
            return True
        return False
    if n.name in (
        "list.concat", "list.set_union", "list.set_intersection",
        "list.set_difference", "list.set_symmetric_difference",
    ):
        # traced row-wise concat (+ first-occurrence dedup for union): every
        # input needs a traced child and the SAME flat inner dtype (mixed
        # inners keep host supertype semantics)
        inners = []
        for arg in n.inputs:
            if not _has_traced_child(arg):
                return True
            try:
                d = expr_dtype(arg, schema)
            except Exception:
                return True
            if not isinstance(d, dt.List) or isinstance(
                d.inner, (dt.List, dt.Array, dt.Struct)
            ):
                return True
            inners.append(d.inner)
        if any(i != inners[0] for i in inners[1:]):
            return True
        return False
    if n.name in ("list.gather", "list.to_array"):
        if not (_rebuild_safe_input(n.inputs[0]) if n.name == "list.gather"
                else _has_traced_child(n.inputs[0])):
            return True
        try:
            d = expr_dtype(n.inputs[0], schema)
        except Exception:
            return True
        if not isinstance(d, dt.List) or isinstance(
            d.inner, (dt.List, dt.Array, dt.Struct)
        ):
            return True
        if n.name == "list.gather" and n.opt("indices") is None:
            # per-row index column: needs its own traced child of int lists
            if len(n.inputs) < 2 or not _has_traced_child(n.inputs[1]):
                return True
            try:
                di = expr_dtype(n.inputs[1], schema)
            except Exception:
                return True
            if not isinstance(di, dt.List) or not di.inner.is_integer():
                return True
        return False
    if n.name == "list.item":
        if not _has_traced_child(n.inputs[0]):
            return True
        try:
            d = expr_dtype(n.inputs[0], schema)
        except Exception:
            return True
        return not isinstance(d, dt.List) or isinstance(
            d.inner, (dt.List, dt.Array, dt.Struct)
        )
    if n.name in ("list.any", "list.all", "list.count_matches"):
        # range queries over the original packed ranges: safe for shared /
        # split-derived children, so the lighter traced-child gate applies
        if not _has_traced_child(n.inputs[0]):
            return True
        try:
            d = expr_dtype(n.inputs[0], schema)
        except Exception:
            return True
        if not isinstance(d, dt.List):
            return True
        if n.name in ("list.any", "list.all"):
            return not isinstance(d.inner, dt.Boolean)
        # count_matches: non-null literal needle, numeric/bool inner (string
        # needles need dict-code translation — host, like list.contains)
        item = n.inputs[1] if len(n.inputs) > 1 else None
        if not isinstance(item, E.ELiteral) or item.value is None:
            return True
        return not (d.inner.is_numeric() or isinstance(d.inner, dt.Boolean))
    if n.name in (
        "list.sort", "list.reverse", "list.unique",
        # round-5 long tail: contiguizing rank/moment/shape ops share the
        # same capacity constraint (fn_nested._contiguize / _rebuild)
        "list.var", "list.std", "list.median", "list.n_unique",
        "list.arg_min", "list.arg_max", "list.drop_nulls",
        "list.slice", "list.head", "list.tail", "list.shift",
        "list.gather_every", "list.diff",
    ):
        # traced child rebuild needs: a bound child (column ref), a flat List
        # (no nested inner), and a contiguization that fits the child's padded
        # extent — packed words of distinct parents may SHARE child ranges
        # after join fan-out, which could overflow; conservative: only
        # rebuild-safe inputs qualify, others rebuild on host
        if not _rebuild_safe_input(n.inputs[0]):
            return True
        try:
            d = expr_dtype(n.inputs[0], schema)
        except Exception:
            return True
        if not isinstance(d, dt.List) or isinstance(d.inner, (dt.List, dt.Array, dt.Struct)):
            return True
        if n.name in ("list.var", "list.std", "list.median", "list.diff"):
            # numeric math on the inner values; temporal diff (-> Duration)
            # and string moments keep host semantics
            if not (d.inner.is_numeric() and not d.inner.is_temporal()):
                return True
        # opts must be plain host ints (the expr layer passes literals; an
        # Expr-valued n/offset/periods keeps the host path)
        for key in ("n", "offset", "length"):
            val = n.opt(key) if hasattr(n, "opt") else None
            if val is not None and not isinstance(val, int):
                return True
    return False


HOST_AGG_KINDS = {"str_concat", "implode", "mode"}


def _expr_needs_host(node: E.ENode, schema: Schema) -> bool:
    from polars_tpu.plan.schema_resolve import expr_dtype

    for n in E.walk(node):
        if isinstance(n, E.EAnonymous):
            return True
        if isinstance(n, E.EBinary) and n.op == "+":
            try:
                lt = expr_dtype(n.left, schema)
            except Exception:
                return True
            if type(lt).__name__ in ("String", "Binary"):
                return True
        if isinstance(n, E.EBinary) and n.op in ("==", "!="):
            try:
                lt = expr_dtype(n.left, schema)
            except Exception:
                return True
            if isinstance(lt, dt.Struct):
                return True
        if isinstance(n, E.EAgg) and n.kind in HOST_AGG_KINDS:
            return True
        if isinstance(n, E.EFunction) and (
            n.name in HOST_FNS or _fn_conditionally_host(n, schema)
        ):
            return True
        if isinstance(n, E.ECast):
            try:
                target = dt.resolve_dtype(n.dtype, schema, expr_dtype(n.input, schema))
            except Exception:
                return True

            def _stringy(d) -> bool:
                return type(d).__name__ in ("String", "Categorical", "Enum", "Binary")

            if type(target).__name__ in ("String",):
                try:
                    src = expr_dtype(n.input, schema)
                except Exception:
                    return True
                if not _stringy(src):
                    return True
            if isinstance(target, (dt.List, dt.Array)) and _stringy(target.inner):
                try:
                    src = expr_dtype(n.input, schema)
                except Exception:
                    return True
                inner = getattr(src, "inner", None)
                if inner is not None and not _stringy(inner):
                    return True
    return False


def _aggs_all_reduce(node) -> bool:
    """True when every agg expr REDUCES at its root (static AggState
    analysis, E.reduces_in_agg) — the traced group-by's precondition;
    anything else (bare columns, rank, x - x.mean()) implodes per group on
    the host apply path."""
    return all(E.reduces_in_agg(a) for a in node.aggs)


def _is_fusable(node: L.LNode) -> bool:
    if not isinstance(node, _FUSABLE):
        return False
    if isinstance(node, L.LJoin) and not _join_fusable(node):
        return False
    if isinstance(node, L.LGroupBy) and not _aggs_all_reduce(node):
        return False
    try:
        in_schemas = [node_schema(i) for i in node.inputs()]
    except Exception:
        return False
    schema = in_schemas[0] if in_schemas else Schema()
    if isinstance(node, L.LExplode):
        # traced explode needs the packed-List layout with a FLAT inner:
        # Array/Struct columns and nested inners (List-of-Struct keeps its
        # fields only through the host child-passthrough) -> host path
        return all(
            c in schema
            and isinstance(schema[c], dt.List)
            and not isinstance(schema[c].inner, dt.Struct)
            for c in node.columns
        )
    for e in node.exprs():
        if e is None:
            continue
        try:
            for ex in expand_exprs((e,), schema):
                if _expr_needs_host(ex, schema):
                    return False
                for sub in E.walk(ex):
                    if isinstance(sub, E.ESlice):
                        return False
                    if isinstance(sub, E.EFunction) and sub.name in (
                        "int_range", "repeat_value", "date_range", "datetime_range",
                        "arg_where", "gather_every", "unique", "unique_counts",
                    ):
                        return False
        except Exception:
            return False
    return True


# ---------------------------------------------------------------------------
# segment tracing
# ---------------------------------------------------------------------------


class _TraceCtx:
    """State while tracing one segment."""

    def __init__(self, leaf_tables: dict[int, TTable], literals: dict[E.ELiteral, jax.Array]):
        self.leaf_tables = leaf_tables  # id(node) -> TTable
        self.literals = literals
        self.flags: list[jax.Array] = []  # in-trace validation failures
        self.flag_msgs: dict[int, str] = {}  # flag index -> specific message


def _eval_ctx(tt: TTable, tc_or_literals) -> EvalCtx:
    literals = getattr(tc_or_literals, "literals", tc_or_literals)
    flags = getattr(tc_or_literals, "flags", None)
    flag_msgs = getattr(tc_or_literals, "flag_msgs", None)
    return EvalCtx(
        cols=dict(tt.cols),
        rowmask=tt.rowmask,
        length=tt.length(),
        padded=tt.padded,
        schema=tt.schema(),
        literals=literals,
        groups=None,
        memo={},
        flags=flags,
        flag_msgs=flag_msgs,
    )


def trace_node(node: L.LNode, tc: _TraceCtx) -> TTable:
    if id(node) in tc.leaf_tables:
        return tc.leaf_tables[id(node)]

    if isinstance(node, L.LJoin):
        from polars_tpu.engine.join_traced import trace_join

        tt_l = trace_node(node.input_left, tc)
        tt_r = trace_node(node.input_right, tc)

        def eval_key(e, tt):
            exprs = expand_exprs((e,), tt.schema())
            return eval_expr(exprs[0], _eval_ctx(tt, tc))

        cols, rowmask, bad = trace_join(node, tt_l, tt_r, eval_key)
        tc.flags.append(bad)
        padded = rowmask.shape[0]
        return TTable(cols, rowmask, padded)

    if isinstance(node, L.LFilter):
        tt = trace_node(node.input, tc)
        schema = tt.schema()
        preds = expand_exprs((node.predicate,), schema)
        ctx = _eval_ctx(tt, tc)
        mask = tt.rowmask
        for p in preds:
            v = eval_expr(p, ctx)
            if not isinstance(v.dtype, dt.Boolean):
                raise ComputeError(f"filter predicate must be Boolean, got {v.dtype!r}")
            pv = v.values.astype(bool)
            if v.validity is not None:
                pv = pv & v.validity
            if v.domain == SCALAR:
                pv = jnp.broadcast_to(pv, (tt.padded,))
            mask = mask & pv
        return TTable(tt.cols, mask, tt.padded)

    if isinstance(node, L.LSelect):
        tt = trace_node(node.input, tc)
        return _trace_select(tt, node.expressions, tc, keep_input=False)

    if isinstance(node, L.LWithColumns):
        tt = trace_node(node.input, tc)
        return _trace_select(tt, node.expressions, tc, keep_input=True)

    if isinstance(node, L.LRename):
        tt = trace_node(node.input, tc)
        mapping = dict(node.mapping)
        cols = {mapping.get(n, n): v for n, v in tt.cols.items()}
        return TTable(cols, tt.rowmask, tt.padded)

    if isinstance(node, L.LDrop):
        tt = trace_node(node.input, tc)
        drop = set(node.columns)
        cols = {n: v for n, v in tt.cols.items() if n not in drop}
        return TTable(cols, tt.rowmask, tt.padded)

    if isinstance(node, L.LWithRowIndex):
        tt = trace_node(node.input, tc)
        rank = jnp.cumsum(tt.rowmask.astype(jnp.int64)) - 1
        vals = (rank + node.offset).astype(jnp.uint32)
        cols = {node.name: Val(vals, None, dt.UInt32(), None, ROW)}
        cols.update(tt.cols)
        return TTable(cols, tt.rowmask, tt.padded)

    if isinstance(node, L.LSlice):
        tt = trace_node(node.input, tc)
        rank = jnp.cumsum(tt.rowmask.astype(jnp.int64))  # 1-based among valid
        total = rank[-1]
        offset = node.offset
        if offset < 0:
            start = jnp.maximum(total + offset, 0)
        else:
            start = jnp.minimum(jnp.asarray(offset, jnp.int64), total)
        if node.length is None:
            stop = total
        else:
            stop = jnp.minimum(start + node.length, total)
        mask = tt.rowmask & (rank > start) & (rank <= stop)
        return TTable(tt.cols, mask, tt.padded)

    if isinstance(node, L.LExplode):
        tt = trace_node(node.input, tc)
        return _trace_explode(tt, node, tc)

    if isinstance(node, L.LDistinct):
        tt = trace_node(node.input, tc)
        subset = node.subset if node.subset is not None else tuple(tt.cols)
        keys = [tt.cols[c] for c in subset]
        flags = _distinct_rowmask(keys, tt.rowmask, node.keep)
        return TTable(tt.cols, tt.rowmask & flags, tt.padded)

    if isinstance(node, L.LSort):
        tt = trace_node(node.input, tc)
        schema = tt.schema()
        by = expand_exprs(node.by, schema)
        ctx = _eval_ctx(tt, tc)
        key_vals = [eval_expr(b, ctx) for b in by]
        desc = list(node.descending)
        nl = list(node.nulls_last)
        while len(desc) < len(key_vals):
            desc.append(desc[-1] if desc else False)
        while len(nl) < len(key_vals):
            nl.append(nl[-1] if nl else False)
        perm = sort_perm(key_vals, desc, nl, tt.rowmask, stable=True)
        cols = {n: apply_perm(v, perm) for n, v in tt.cols.items()}
        n_valid = tt.length()
        iota = jax.lax.broadcasted_iota(jnp.int32, (tt.padded, 1), 0).squeeze(-1)
        mask = iota < n_valid
        if node.limit is not None:
            mask = mask & (iota < node.limit)
        return TTable(cols, mask, tt.padded)

    if isinstance(node, L.LGroupBy):
        tt = trace_node(node.input, tc)
        return _trace_groupby(tt, node, tc)

    if isinstance(node, L.LUnion):
        tts = [trace_node(i, tc) for i in node.inputs_]
        names = list(tts[0].cols)
        out_schema = node_schema(node)
        cols: dict[str, Val] = {}
        for n in names:
            vals = []
            valids = []
            any_valid = any(t.cols[n].validity is not None for t in tts)
            target = out_schema[n]
            for t in tts:
                v = t.cols[n]
                if v.dtype != target:
                    from polars_tpu.engine.cast import cast_val

                    v = cast_val(v, target, strict=False)
                vals.append(v.values)
                if any_valid:
                    valids.append(
                        v.validity if v.validity is not None else jnp.ones((t.padded,), bool)
                    )
            table = None
            if tts[0].cols[n].table is not None:
                # unify string tables across inputs
                from polars_tpu.engine.strings import unify_vals

                base = tts[0].cols[n]
                unified = [base]
                for t in tts[1:]:
                    b2, o2 = unify_vals(unified[0], t.cols[n])
                    unified = [b2.with_(values=u.values if i > 0 else b2.values) for i, u in enumerate(unified)]
                    # simpler: redo pairwise for all
                # robust pairwise re-unify
                cur = tts[0].cols[n]
                others = []
                for t in tts[1:]:
                    cur, o = unify_vals(cur, t.cols[n])
                    others = [unify_vals(cur, x)[1] for x in others]
                    others.append(o)
                vals = [cur.values] + [o.values for o in others]
                table = cur.table
            values = jnp.concatenate(vals)
            validity = jnp.concatenate(valids) if any_valid else None
            cols[n] = Val(values, validity, target, table, ROW)
        rowmask = jnp.concatenate([t.rowmask for t in tts])
        return TTable(cols, rowmask, sum(t.padded for t in tts))

    if isinstance(node, L.LHConcat):
        tts = [trace_node(i, tc) for i in node.inputs_]
        padded = max(t.padded for t in tts)
        cols: dict[str, Val] = {}
        mask = None
        for t in tts:
            for n, v in t.cols.items():
                vv = v
                if t.padded != padded:
                    vv = v.with_(
                        values=pad_to(v.values, padded),
                        validity=None if v.validity is None else pad_to(v.validity, padded),
                    )
                cols[n] = vv
            m = t.rowmask if t.padded == padded else pad_to(t.rowmask, padded)
            mask = m if mask is None else (mask | m)
        return TTable(cols, mask, padded)

    raise InvalidOperationError(f"cannot trace {type(node).__name__}")


def _distinct_rowmask(keys: list[Val], rowmask: jax.Array, keep: str) -> jax.Array:
    """Distinct-keeper flags over multi-key rows without reordering."""
    from polars_tpu.kernels.argsort import (
        boundaries_from_words,
        key_words,
        stable_argsort_words,
    )

    n = rowmask.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    words: list = [(~rowmask).astype(jnp.int8)]
    for k in keys:
        invalid = (
            jnp.zeros((n,), jnp.int8) if k.validity is None else (~k.validity).astype(jnp.int8)
        )
        words.append(invalid)
        words.extend(key_words(k.values, k.dtype))
    perm = stable_argsort_words(words)
    s_oob = (~rowmask[perm]).astype(jnp.int8)
    first = iota == 0
    diff = boundaries_from_words(words[1:], perm) & ~first
    diff = diff | first
    same_prev = (~first) & ~diff & (s_oob == 0) & (jnp.roll(s_oob, 1) == 0)
    same_next = jnp.roll(same_prev, -1)
    same_next = same_next & (iota != n - 1)
    if keep in ("any", "first"):
        flag = ~same_prev
    elif keep == "last":
        flag = ~same_next
    else:  # none
        flag = ~(same_prev | same_next)
    return jnp.zeros((n,), bool).at[perm].set(flag, unique_indices=True)


def _trace_select(
    tt: TTable, expressions: tuple[E.ENode, ...], tc: _TraceCtx, *, keep_input: bool
) -> TTable:
    schema = tt.schema()
    exprs = expand_exprs(expressions, schema)
    ctx = _eval_ctx(tt, tc)
    results: list[tuple[str, Val]] = []
    for e in exprs:
        name = E.output_name(e) or "literal"
        v = eval_expr(e, ctx)
        if v.domain == GROUP:
            raise ShapeError("group-domain expression outside aggregation")
        results.append((name, v))

    if keep_input:
        cols = dict(tt.cols)
        for name, v in results:
            if v.domain == SCALAR:
                v = _broadcast_scalar(v, tt.padded)
            cols[name] = v
        return TTable(cols, tt.rowmask, tt.padded)

    if results and all(v.domain == SCALAR for _, v in results):
        # pure-aggregate select -> one-row table
        size = padded_size(1)
        cols = {}
        for name, v in results:
            values = pad_to(jnp.broadcast_to(v.values, (1,)), size)
            validity = (
                None
                if v.validity is None
                else pad_to(jnp.broadcast_to(v.validity, (1,)), size)
            )
            cols[name] = Val(values, validity, v.dtype, v.table, ROW)
        mask = row_mask(size, 1)
        return TTable(cols, mask, size)

    cols = {}
    for name, v in results:
        if v.domain == SCALAR:
            v = _broadcast_scalar(v, tt.padded)
        cols[name] = v
    return TTable(cols, tt.rowmask, tt.padded)


def _broadcast_scalar(v: Val, padded: int) -> Val:
    return Val(
        jnp.broadcast_to(v.values, (padded,)),
        None if v.validity is None else jnp.broadcast_to(v.validity, (padded,)),
        v.dtype,
        v.table,
        ROW,
    )


def _trace_explode(tt: TTable, node: L.LExplode, tc: _TraceCtx) -> TTable:
    """Traced explode (reference: polars-ops explode.rs, re-designed for the
    packed (start<<32|len) layout): each valid parent row emits max(len, 1)
    output rows (null/empty lists emit one null row). Output rows map back to
    parents with ONE searchsorted over the emit prefix sum — no per-list
    loops; child values gather directly. Mismatched list lengths across the
    exploded columns raise through the in-trace validation flag channel."""
    from polars_tpu.engine.common import TracedChild

    n = tt.padded
    lens_all = None
    exploded: dict[str, tuple] = {}
    for name in node.columns:
        v = tt.cols[name]
        ch = v.child
        if not isinstance(ch, TracedChild) or ch.values is None:
            raise InvalidOperationError(
                f"explode({name!r}): list child unavailable in this trace"
            )
        st = (v.values >> 32).astype(jnp.int32)
        ln = (v.values & 0xFFFFFFFF).astype(jnp.int32)
        if v.validity is not None:
            ln = jnp.where(v.validity, ln, 0)
        ln = jnp.where(tt.rowmask, ln, 0)
        if lens_all is None:
            lens_all = ln
        else:
            tc.flags.append(jnp.any(ln != lens_all))
        exploded[name] = (st, v, ch)
    if lens_all is None:
        return tt
    emit = jnp.where(tt.rowmask, jnp.maximum(lens_all, 1), 0)
    offs = jnp.cumsum(emit)  # inclusive
    total = offs[-1]
    ch_max = max(e[2].values.shape[0] for e in exploded.values())
    out_n = padded_size(n + ch_max)  # static bound: every list + placeholders
    # dictionary-derived lists (str.split): rows SHARE child ranges, so the
    # n + child_len bound undercounts by the fan-out — the producer's static
    # per-list bound gives the exact one
    mll = [e[2].max_list_len for e in exploded.values()]
    if all(m is not None for m in mll):
        out_n = padded_size(n * max(1, *mll, 1))
    # duplicated parents sharing child ranges (post-join fan-out) can exceed
    # the bound — flag it (rides the count channel) instead of truncating
    tc.flags.append(total > jnp.int32(out_n))
    j = jax.lax.broadcasted_iota(jnp.int32, (out_n, 1), 0).squeeze(-1)
    out_valid = j < total
    parent = jnp.searchsorted(offs, j, side="right").astype(jnp.int32)
    parentc = jnp.clip(parent, 0, n - 1)
    excl = offs - emit  # exclusive prefix
    within = j - excl[parentc]
    placeholder = lens_all[parentc] == 0

    cols: dict[str, Val] = {}
    for name, v in tt.cols.items():
        if name in exploded:
            st, pv, ch = exploded[name]
            cidx = jnp.clip(st[parentc] + within, 0, ch.values.shape[0] - 1)
            values = ch.values[cidx]
            ok = row_mask(ch.values.shape[0], ch.length)
            if ch.validity is not None:
                ok = ok & ch.validity
            validity = out_valid & ~placeholder & ok[cidx]
            cols[name] = Val(values, validity, v.dtype.inner, ch.table, ROW, ch.child)
        else:
            values = v.values[parentc]
            validity = None if v.validity is None else (v.validity[parentc] & out_valid)
            cols[name] = Val(values, validity, v.dtype, v.table, ROW, v.child)
    return TTable(cols, out_valid, out_n)


def _trace_groupby(tt: TTable, node: L.LGroupBy, tc: _TraceCtx) -> TTable:
    schema = tt.schema()
    keys = expand_exprs(node.keys, schema)
    aggs = expand_exprs(node.aggs, schema)
    ctx = _eval_ctx(tt, tc)
    key_vals = [(E.output_name(k) or "literal", eval_expr(k, ctx)) for k in keys]
    for _, kv in key_vals:
        if kv.domain == SCALAR:
            raise ShapeError("scalar group keys not supported")

    # dense (perfect-hash) path for dictionary-coded/bool keys
    sizes = []
    dense_ok = True
    for _, kv in key_vals:
        if kv.table is not None:
            if getattr(kv.table, "hashed", False):
                # hashed-key strings: codes are int64 hashes, not dense
                # dictionary indices — radix path only (utils/hashstore.py)
                dense_ok = False
                break
            sizes.append(max(len(kv.table), 1))
        elif isinstance(kv.dtype, dt.Boolean):
            sizes.append(2)
        else:
            dense_ok = False
            break
    cap_limit = config().hot_table_size * 16
    if dense_ok and key_vals:
        prod = 1
        for s in sizes:
            prod *= s + 1
        dense_ok = prod <= cap_limit
    if dense_ok and key_vals:
        kvs = [kv for _, kv in key_vals]
        bool_as_int = [
            kv.with_(values=kv.values.astype(jnp.int32)) if isinstance(kv.dtype, dt.Boolean) else kv
            for kv in kvs
        ]
        gctx = G.dense_group_ctx(bool_as_int, tt.rowmask, sizes)
    else:
        gctx = G.sorted_group_ctx([kv for _, kv in key_vals], tt.rowmask)

    if node.maintain_order:
        gctx = G.reorder_by_first_occurrence(gctx, tt.rowmask)

    # representative row per group for key materialization
    rep_idx, rep_has = G.seg_first_idx(tt.rowmask, gctx.gids, gctx.capacity)

    out_cols: dict[str, Val] = {}
    for name, kv in key_vals:
        values = kv.values[rep_idx]
        validity = None if kv.validity is None else (kv.validity[rep_idx])
        if validity is not None:
            validity = validity & rep_has
        out_cols[name] = Val(values, validity, kv.dtype, kv.table, ROW)

    gctx_ctx = EvalCtx(
        cols=dict(tt.cols),
        rowmask=tt.rowmask,
        length=tt.length(),
        padded=tt.padded,
        schema=schema,
        literals=tc.literals,
        groups=gctx,
        memo={},
    )
    gctx_ctx.precomputed = _batch_aggs(aggs, gctx_ctx)
    for a in aggs:
        name = E.output_name(a) or "literal"
        v = eval_expr(a, gctx_ctx)
        if v.domain == ROW:
            raise InvalidOperationError(
                f"expression for {name!r} does not aggregate; wrap it in an "
                "aggregation (implode of bare columns is not yet supported)"
            )
        if v.domain == SCALAR:
            v = Val(
                jnp.broadcast_to(v.values, (gctx.capacity,)),
                None if v.validity is None else jnp.broadcast_to(v.validity, (gctx.capacity,)),
                v.dtype,
                v.table,
                GROUP,
            )
        out_cols[name] = Val(v.values, v.validity, v.dtype, v.table, ROW)

    return TTable(out_cols, gctx.group_valid, gctx.capacity)


def _batch_aggs(aggs, ctx: EvalCtx) -> dict:
    """Fuse sum-class and min/max aggregations sharing the group assignment
    into batched 2-D scatters — ONE pass over HBM instead of one per agg.

    The TPU form of the reference's GroupedReduction update loop
    (polars-expr/src/reduce/): all reductions for a morsel update together.
    """
    from polars_tpu.engine.compiler import _agg_out_dtype
    from polars_tpu.plan.schema_resolve import expr_dtype

    gctx = ctx.groups
    cap = gctx.capacity

    sum_jobs: list[tuple[E.EAgg, Val, jax.Array]] = []  # (node, input val, contrib mask)
    minmax_jobs: list[tuple[E.EAgg, Val, jax.Array, bool]] = []
    seen: set = set()
    for a in aggs:
        for sub in E.walk(a):
            if not isinstance(sub, E.EAgg) or sub in seen:
                continue
            inner = sub.input
            extra = None
            if isinstance(inner, E.EFilter):
                cond_node, inner = inner.by, inner.input
            else:
                cond_node = None
            if sub.kind not in ("sum", "mean", "count", "len", "min", "max"):
                continue
            if sub.kind != "len" and not E.is_elementwise(inner):
                continue
            if cond_node is not None and not E.is_elementwise(cond_node):
                continue
            seen.add(sub)
            rowmask = ctx.rowmask
            if cond_node is not None:
                cv = eval_expr(cond_node, ctx)
                cm = cv.values.astype(bool)
                if cv.validity is not None:
                    cm = cm & cv.validity
                rowmask = rowmask & cm
            if sub.kind == "len":
                v = None
                data_mask = rowmask
            else:
                v = eval_expr(inner, ctx)
                if v.domain != ROW:
                    seen.discard(sub)
                    continue
                data_mask = rowmask if v.validity is None else (rowmask & v.validity)
            if sub.kind in ("min", "max"):
                minmax_jobs.append((sub, v, data_mask, sub.kind == "min"))
            else:
                sum_jobs.append((sub, v, data_mask))

    out: dict = {}
    if len(sum_jobs) + len(minmax_jobs) < 3:
        return out  # not worth batching

    def _in_dtype(node_a, v):
        if node_a.kind in ("count", "len"):
            return dt.Int64()
        return v.dtype

    # ---- sum-class batches, exact per accumulation dtype -------------------
    # float inputs + means + counts -> one f64 scatter; int sums -> one i64
    f_cols: list = []
    f_meta: list = []  # (node, kind, slots...)
    i_cols: list = []
    i_meta: list = []
    for node_a, v, m in sum_jobs:
        if node_a.kind in ("count", "len"):
            i_cols.append(m.astype(jnp.int64))
            i_meta.append((node_a, "count", len(i_cols) - 1))
        elif node_a.kind == "mean":
            f_cols.append(jnp.where(m, v.values.astype(jnp.float64), 0.0))
            f_cols.append(jnp.where(m, 1.0, 0.0))
            f_meta.append((node_a, "mean", len(f_cols) - 2, len(f_cols) - 1))
        elif v.dtype.is_float():
            f_cols.append(jnp.where(m, v.values.astype(jnp.float64), 0.0))
            f_meta.append((node_a, "sum", len(f_cols) - 1))
        else:  # exact integer/bool/temporal sums in i64
            i_cols.append(jnp.where(m, v.values.astype(jnp.int64), 0))
            i_meta.append((node_a, "sum", len(i_cols) - 1))

    def _finish_sum(node_a, vals, v_dt):
        out_dt = _agg_out_dtype(node_a, v_dt)
        np_d = jnp.dtype(dt.dtype_to_numpy(out_dt))
        return Val(vals.astype(np_d), None, out_dt, None, GROUP)

    # one 1-D scatter per aggregated column: 2-D batched scatters force XLA to
    # materialize an index-major (n, k) copy of the updates, which TPU tiling
    # pads k -> 128 (a 34GB allocation at SF10). 1-D scatters fuse cleanly and
    # run at bandwidth roofline; all of them live in the same XLA program, so
    # there is no dispatch-count cost.
    # tiny capacities: masked-reduction stacks instead of the serialized TPU
    # scatter (engine/groupby._use_stack; XLA multi-output-fuses siblings)
    if f_cols:
        if G._use_stack(cap):
            table = [G._stack_seg_sum(c, gctx.gids, cap) for c in f_cols]
        else:
            table = [
                jnp.zeros((cap,), jnp.float64).at[gctx.gids].add(c, mode="drop")
                for c in f_cols
            ]
        for meta in f_meta:
            node_a = meta[0]
            v = next(v for n_, v, _ in sum_jobs if n_ is node_a)
            if meta[1] == "mean":
                s, c = table[meta[2]], table[meta[3]]
                out_dt = _agg_out_dtype(node_a, v.dtype)
                np_d = jnp.dtype(dt.dtype_to_numpy(out_dt))
                out[node_a] = Val((s / jnp.maximum(c, 1.0)).astype(np_d), c > 0, out_dt, None, GROUP)
            else:
                out[node_a] = _finish_sum(node_a, table[meta[2]], v.dtype)
    if i_cols:
        if G._use_stack(cap):
            table = [G._stack_seg_sum(c, gctx.gids, cap) for c in i_cols]
        else:
            table = [
                jnp.zeros((cap,), jnp.int64).at[gctx.gids].add(c, mode="drop")
                for c in i_cols
            ]
        for meta in i_meta:
            node_a = meta[0]
            if meta[1] == "count":
                out[node_a] = Val(
                    table[meta[2]].astype(jnp.uint32), None, dt.UInt32(), None, GROUP
                )
            else:
                v = next(v for n_, v, _ in sum_jobs if n_ is node_a)
                out[node_a] = _finish_sum(node_a, table[meta[2]], v.dtype)

    # ---- min/max batches per (direction, physical dtype): exact ------------
    from collections import defaultdict

    groups = defaultdict(list)
    for node_a, v, m, ismin in minmax_jobs:
        groups[(ismin, str(v.values.dtype))].append((node_a, v, m))
    for (want_min, _dts), jobs in groups.items():
        ident = G._big(jobs[0][1].values.dtype) if want_min else G._small(jobs[0][1].values.dtype)
        for node_a, v, m in jobs:
            x = jnp.where(m, v.values, ident)
            is_float = jnp.issubdtype(x.dtype, jnp.floating)
            has_nan = None
            if is_float:
                # NaN-total-order semantics, mirroring seg_min/seg_max: NaN is
                # greatest, so min skips NaN; max returns NaN iff any present
                if not want_min:
                    nan_in = m & jnp.isnan(v.values)
                    if G._use_stack(cap):
                        has_nan = G._stack_seg_red(nan_in, gctx.gids, cap, jnp.max, False)
                    else:
                        has_nan = jnp.zeros((cap,), bool).at[gctx.gids].max(
                            nan_in, mode="drop"
                        )
                x = jnp.where(jnp.isnan(x), ident, x)
            if G._use_stack(cap):
                tbl = G._stack_seg_red(
                    x, gctx.gids, cap, jnp.min if want_min else jnp.max, ident
                )
            else:
                init = jnp.full((cap,), ident, x.dtype)
                tbl = (
                    init.at[gctx.gids].min(x, mode="drop")
                    if want_min
                    else init.at[gctx.gids].max(x, mode="drop")
                )
            if has_nan is not None:
                tbl = jnp.where(has_nan, jnp.asarray(jnp.nan, x.dtype), tbl)
            if G._use_stack(cap):
                has = G._stack_seg_red(m, gctx.gids, cap, jnp.max, False)
            else:
                has = jnp.zeros((cap,), bool).at[gctx.gids].max(m, mode="drop")
            out[node_a] = Val(tbl, has, v.dtype, v.table, GROUP)
    return out


# ---------------------------------------------------------------------------
# cache keys
# ---------------------------------------------------------------------------


def _expr_key(node: E.ENode) -> tuple:
    if isinstance(node, E.ELiteral):
        # literal values are baked into the trace as constants, so they are
        # part of the cache key (positional traced-literal passing would be
        # fragile across structurally-equal plans with different value counts)
        return ("litc", node.value, repr(node.dtype))
    if isinstance(node, E.ESeriesLit):
        col = node.column
        return (
            "slit",
            # the column's DATA is baked into the trace as a constant, so its
            # identity must be part of the key: two hoisted host-op results
            # with equal shape/dtype (e.g. list.sample then list.shift over
            # the same frame) otherwise collide and replay the stale program
            node.ident,
            repr(col.dtype),
            col.buffer.padded,
            col.buffer.length,
            col.buffer.validity is not None,
            col.table.ident if col.table is not None else 0,
        )
    if isinstance(node, E.EAnonymous):
        return ("anon", node.ident)
    base: tuple = (type(node).__name__,)
    for f in dataclasses.fields(node):
        v = getattr(node, f.name)
        if isinstance(v, E.ENode):
            base += (_expr_key(v),)
        elif isinstance(v, tuple) and v and isinstance(v[0], E.ENode):
            base += (tuple(_expr_key(x) for x in v),)
        elif isinstance(v, tuple):
            base += (v,)
        else:
            base += (repr(v),)
    return base


def _child_sig(child) -> tuple:
    """STRUCTURAL signature of a column's child chain (List flat children).
    Child DATA is a jit argument, so only shape/dtype/table identity matter."""
    from polars_tpu.core.column import Column as _Col

    sig: tuple = ()
    while isinstance(child, _Col):
        sig += (
            repr(child.dtype),
            child.buffer.padded,
            child.buffer.validity is not None,
            child.table.ident if child.table is not None else 0,
        )
        child = child.child
    if isinstance(child, list):  # struct fields — host metadata, identity-keyed
        from polars_tpu.utils.tokens import obj_token

        sig += tuple(obj_token(f) for f in child)
    return sig


def _table_sig(df: DataFrame) -> tuple:
    parts = []
    for c in df._columns:
        parts.append(
            (
                c.name,
                repr(c.dtype),
                c.buffer.padded,
                c.buffer.validity is not None,
                c.table.ident if c.table is not None else 0,
                _child_sig(getattr(c, "child", None)),
            )
        )
    return (tuple(parts), padded_size(df.height))


def _segment_key(node: L.LNode, leaf_ids: list[int]) -> tuple:
    if id(node) in leaf_ids:
        return ("leaf", leaf_ids.index(id(node)))
    base: tuple = (type(node).__name__,)
    for f in dataclasses.fields(node):
        v = getattr(node, f.name)
        if isinstance(v, L.LNode):
            base += (_segment_key(v, leaf_ids),)
        elif isinstance(v, tuple) and v and isinstance(v[0], L.LNode):
            base += (tuple(_segment_key(x, leaf_ids) for x in v),)
        elif isinstance(v, E.ENode):
            base += (_expr_key(v),)
        elif isinstance(v, tuple) and v and isinstance(v[0], E.ENode):
            base += (tuple(_expr_key(x) for x in v),)
        elif f.name in ("df", "function", "schema_fn", "ident"):
            base += ("?",)
        else:
            base += (repr(v),)
    return base


_JIT_CACHE: dict[tuple, Any] = {}


# ---------------------------------------------------------------------------
# materialization
# ---------------------------------------------------------------------------


def _df_to_arrays(df: DataFrame) -> tuple[list, int]:
    """Flatten a DataFrame into jit arguments. Order: per column values
    [+validity] [+flat child chain: values [+validity] + length, recursively],
    then the frame length scalar."""
    from polars_tpu.core.column import Column as _Col

    args: list = []
    for c in df._columns:
        args.append(c.buffer.values)
        if c.buffer.validity is not None:
            args.append(c.buffer.validity)
        ch = getattr(c, "child", None)
        while isinstance(ch, _Col):
            args.append(ch.buffer.values)
            if ch.buffer.validity is not None:
                args.append(ch.buffer.validity)
            args.append(np.int32(ch.buffer.length))
            ch = ch.child
    # deferred (flip-free) frames carry their TRUE count as a device scalar
    # while _height is the padded upper bound — the trace consumes it as the
    # same i32 length argument (engine/pending.py)
    dc = getattr(df, "_device_count", None)
    args.append(np.int32(df.height) if dc is None else dc)
    return args, padded_size(df.height)


def _args_to_ttable(df: DataFrame, args_iter, leaf_pos: int = -1) -> TTable:
    from polars_tpu.core.column import Column as _Col
    from polars_tpu.engine.common import TracedChild

    cols: dict[str, Val] = {}
    # NOT clamped to 128 for 0-column frames: pl.len() counts the row
    # mask, so the mask must span the logical height even with no columns
    padded = padded_size(df.height)
    for c in df._columns:
        values = next(args_iter)
        validity = next(args_iter) if c.buffer.validity is not None else None
        host_child = getattr(c, "child", None)
        child = None
        if isinstance(host_child, _Col):
            # rebuild the traced child chain from the argument stream; src
            # carries (leaf_pos, col_name, depth) so nested children resolve
            chain = []
            ch = host_child
            while isinstance(ch, _Col):
                cvals = next(args_iter)
                cvalid = next(args_iter) if ch.buffer.validity is not None else None
                clen = next(args_iter)
                chain.append((cvals, cvalid, ch.dtype, ch.table, clen))
                ch = ch.child
            child = None
            for depth, (cvals, cvalid, cdt, ctab, clen) in reversed(list(enumerate(chain))):
                child = TracedChild(cvals, cvalid, cdt, ctab, clen, (leaf_pos, c.name, depth), child)
        elif host_child is not None:  # struct fields: provenance only
            child = TracedChild(None, None, None, None, None, (leaf_pos, c.name, 0), None)
        cols[c.name] = Val(values, validity, c.dtype, c.table, ROW, child)
    length = next(args_iter)
    mask = row_mask(padded, length)
    return TTable(cols, mask, padded)


def run_segment(node: L.LNode, leaf_dfs: list[tuple[L.LNode, DataFrame]], *, sync: bool = True) -> DataFrame:
    """Trace/execute one fused segment rooted at ``node`` with materialized
    barrier inputs ``leaf_dfs``."""
    import os as _os
    import time as _time

    _timing = bool(_os.environ.get("POLARS_TPU_TIME"))
    _t0 = _time.perf_counter()
    leaf_ids = [id(n) for n, _ in leaf_dfs]
    lit_nodes: list[E.ELiteral] = []  # literals are baked as constants
    out_schema = node_schema(node)
    out_names = out_schema.names()

    key = (
        _segment_key(node, leaf_ids),
        tuple(_table_sig(df) for _, df in leaf_dfs),
        # env toggles that change the TRACED program (stale-program hazard
        # if flipped mid-process with a structurally equal plan)
        _os.environ.get("POLARS_TPU_STACK_AGG", "1"),
        _os.environ.get("POLARS_TPU_ONEHOT_AGG", "0"),
        _os.environ.get("POLARS_TPU_SOFT_DIV", ""),
        _os.environ.get("POLARS_TPU_RADIX_SORT", ""),
    )
    captured_children: dict[str, Any] = {}
    captured_msgs: dict[int, str] = {}

    entry = _JIT_CACHE.get(key)
    if entry is None:
        # string tables are trace-time metadata: deterministic functions of the
        # input table identities (which are part of the cache key), so they are
        # captured once at trace time and reused on every cache hit
        captured_tables: dict[str, Any] = {}
        schemas = [df.schema for _, df in leaf_dfs]
        val_presence = [
            tuple(c.buffer.validity is not None for c in df._columns) for _, df in leaf_dfs
        ]
        leaf_meta = [
            (lnode, df._columns, df.height) for lnode, df in leaf_dfs
        ]

        def traced(leaf_args: list, lit_args: list):
            from polars_tpu.engine.common import TracedChild

            literals = {ln: a for ln, a in zip(lit_nodes, lit_args)}
            leaf_tables: dict[int, TTable] = {}
            for pos, ((lnode, _df), args) in enumerate(zip(leaf_dfs, leaf_args)):
                it = iter(args)
                leaf_tables[id(lnode)] = _args_to_ttable(_df, it, pos)
            tc = _TraceCtx(leaf_tables, literals)
            tt = trace_node(node, tc)
            captured_msgs.update(tc.flag_msgs)
            for name, v in tt.cols.items():
                captured_tables[name] = v.table
                if isinstance(v.child, TracedChild):
                    if v.child.src is not None:
                        # capture host PROVENANCE, not the trace-time child
                        # object: the current call's leaf frames resolve it
                        # fresh (capturing the Column was a silent stale-cache
                        # bug on sig-equal frames)
                        captured_children[name] = ("src", *v.child.src)
                    else:
                        # child computed IN-TRACE (list.sort/reverse/unique):
                        # its arrays are emitted as extra outputs (child_outs)
                        captured_children[name] = (
                            "traced", v.child.dtype, v.child.table,
                        )
                elif v.child is not None:
                    captured_children[name] = v.child
            # compact: valid rows first (stable single-word radix pass)
            from polars_tpu.kernels.argsort import stable_argsort_words

            perm = stable_argsort_words([(~tt.rowmask).astype(jnp.int8)])
            count = jnp.sum(tt.rowmask.astype(jnp.int32))
            for _i in range(len(tc.flags) - 1, -1, -1):
                # validation failures (e.g. a violated m:1 join hint) ride the
                # count channel as a negated value with the flag INDEX in the
                # high word, so the raise can carry the registering op's
                # message — no extra sync. Applied in reverse: the earliest
                # raised flag wins.
                count = jnp.where(
                    tc.flags[_i],
                    -(count.astype(jnp.int64) + 1 + (jnp.int64(_i) << 32)),
                    count.astype(jnp.int64),
                )
            rm_sorted = tt.rowmask[perm]  # True on exactly the first `count` rows
            outs = []
            child_outs = []  # in-trace-computed list children (UNpermuted:
            # packed words address child positions directly)
            for name in out_names:
                v = tt.cols[name]
                outs.append(v.values[perm])
                outs.append((v.validity[perm] & rm_sorted) if v.validity is not None else None)
                ch = v.child
                if isinstance(ch, TracedChild) and ch.src is None and ch.values is not None:
                    child_outs.append(ch.values)
                    child_outs.append(ch.validity)
            return outs, child_outs, count

        jfn = jax.jit(traced)
        entry = (jfn, captured_tables, captured_children, captured_msgs)
        _JIT_CACHE[key] = entry
        if verbose():
            print(
                f"[polars_tpu] compiling segment {type(node).__name__} "
                f"key_hash={hash(key) & 0xFFFFFFFF:x}"
            )
    jfn, captured_tables, captured_children, captured_msgs = entry

    leaf_args = []
    for _, df in leaf_dfs:
        args, _ = _df_to_arrays(df)
        leaf_args.append(args)
    lit_args = [literal_host_value(ln) for ln in lit_nodes]
    if _timing:
        _t1 = _time.perf_counter()
    outs, child_outs, count = jfn(leaf_args, lit_args)
    # exactly ONE synchronization here (a scalar: ~26ms tunnel round trip once
    # any readback has happened — CLAUDE.md §1). Output buffers stay on device;
    # host materialization batches them in one device_get (frame._prefetch_host)
    if _timing:
        _t2 = _time.perf_counter()
    deferred = False
    if not sync or _os.environ.get("POLARS_TPU_NO_SYNC"):
        from polars_tpu.engine import pending

        if pending.active():
            # DEFERRED mode (engine/pending.py): register the raw count for
            # the batched end-of-query readback; the frame carries its true
            # count as a device scalar for downstream segments
            pending.defer(count, msgs=captured_msgs,
                          label=type(node).__name__)
            deferred = True
        else:
            # execute-only mode: block until device completion WITHOUT any
            # readback (a readback permanently flips this runtime into slow
            # sync mode — CLAUDE.md §1). Row counts are the padded upper
            # bound; callers (LazyFrame.execute) discard the frame.
            jax.block_until_ready(
                [count, *[o for o in outs if o is not None],
                 *[o for o in child_outs if o is not None]]
            )
        n = outs[0].shape[0] if outs else 0
    else:
        n = int(count)
        if n < 0:
            decoded = -n - 1
            idx, n_ok = decoded >> 32, decoded & 0xFFFFFFFF
            msg = captured_msgs.get(idx)
            if msg is not None:
                from polars_tpu.errors import InvalidOperationError

                raise InvalidOperationError(msg)
            from polars_tpu.errors import ComputeError

            raise ComputeError(
                "in-trace validation failed: join keys do not satisfy the "
                "declared m:1/1:1/1:m cardinality, or exploded columns have "
                "mismatched list lengths"
            )
    if _timing:
        _t3 = _time.perf_counter()
        print(
            f"[seg {type(node).__name__}] setup {(_t1-_t0)*1e3:.1f}ms "
            f"dispatch {(_t2-_t1)*1e3:.1f}ms count-sync {(_t3-_t2)*1e3:.1f}ms",
            flush=True,
        )
    size = padded_size(n)

    cols = []
    it = iter(outs)
    cit = iter(child_outs)
    for name in out_names:
        values = next(it)
        validity = next(it)
        if values.shape[0] != size:
            # shrink (or grow) to the canonical padded size; this allocates
            # new device arrays, so only hit when the row count changed class
            values = values[:size] if values.shape[0] >= size else pad_to(values, size)
            if validity is not None:
                validity = validity[:size] if validity.shape[0] >= size else pad_to(validity, size)
        child = captured_children.get(name)
        if isinstance(child, tuple) and child and child[0] == "src":
            # resolve provenance against THIS call's leaf frames
            _, lpos, cname, depth = child
            child = leaf_dfs[lpos][1]._get(cname).child
            for _ in range(depth):
                child = child.child
        elif isinstance(child, tuple) and child and child[0] == "traced":
            # child arrays computed in-trace: build a fresh host child Column.
            # length = full padded extent (no extra count sync): positions are
            # only addressed through packed words; padding carries validity=0
            _, cdt, ctab = child
            cvals = next(cit)
            cvalid = next(cit)
            child = Column(
                name, cdt, Buffer(cvals, cvalid, int(cvals.shape[0])), ctab, 0, None,
            )
        cols.append(
            Column(
                name, out_schema[name], Buffer(values, validity, n),
                captured_tables.get(name), 0, child,
            )
        )
    out_df = DataFrame._from_columns(cols, n)
    if deferred:
        out_df._device_count = jnp.maximum(count, 0)
    return out_df
