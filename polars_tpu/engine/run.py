"""Plan orchestration: barrier-recursive execution.

The ``create_physical_plan`` analogue (polars-mem-engine/src/planner/lp.rs:75):
walks the optimized logical plan, materializes barrier nodes (scans, joins,
host ops), and hands maximal fusable chains to run_segment (one XLA program
per chain).
"""

from __future__ import annotations

import contextlib
import dataclasses
import os as _os
from typing import Any

import numpy as np

from polars_tpu import datatypes as dt
from polars_tpu.core.buffer import Buffer
from polars_tpu.core.column import Column
from polars_tpu.core.frame import DataFrame
from polars_tpu.engine.executors import _aggs_all_reduce, _expr_needs_host, _is_fusable, run_segment
from polars_tpu.errors import ComputeError, InvalidOperationError, ShapeError
from polars_tpu.plan import exprs as E
from polars_tpu.plan import logical as L
from polars_tpu.plan.schema_resolve import expand_exprs, node_schema
from polars_tpu.utils.tokens import obj_token

_SPECIAL_FNS = {
    "int_range", "repeat_value", "date_range", "datetime_range", "arg_where",
    "int_ranges", "date_ranges", "datetime_ranges", "linear_spaces", "time_ranges",
    "gather_every", "unique", "unique_counts", "cat.get_categories",
    "list.join",
    "explode", "str.split_exact", "str.splitn",
    "str.extract_groups", "str.json_decode",
    "hist", "reshape", "rolling_median_by", "rolling_quantile_by",
    "rolling_rank_by", "rolling_map",
    "as_struct", "struct.field", "struct.rename_fields", "struct.map_field_names",
    "unnest", "sample", "shuffle", "arg_where_self", "rle", "value_counts",
    "shrink_dtype",
    # list long tail still on the host: set ops (pairwise two-column
    # sort-merge), per-row-index gather, nested reshapes, expr-over-child
    "list.to_struct",
    "list.sample",
    "struct.with_fields", "struct.json_encode", "struct.drop",
    "repeat_by", "extend_constant",
}

# list ops that trace for primitive inner dtypes but keep the host path for
# strings / nested inners / non-literal needles (executors._fn_conditionally_host)
_COND_FNS = {
    "list.sum", "list.mean", "list.min", "list.max", "list.get", "list.contains",
    "list.sort", "list.reverse", "list.unique",
    # round-5 traced long tail (host fallback for shapes the gates reject)
    "list.any", "list.all", "list.count_matches",
    "list.var", "list.std", "list.median", "list.n_unique",
    "list.arg_min", "list.arg_max", "list.drop_nulls",
    "list.slice", "list.head", "list.tail", "list.shift",
    "list.gather_every", "list.diff", "list.eval", "list.filter",
    "list.concat", "list.set_union", "list.set_intersection",
    "list.set_difference", "list.set_symmetric_difference", "list.item",
    "list.gather", "list.to_array",
    "cumulative_eval", "str.extract_many", "str.find_many",
}


def _is_special_fn(s: E.ENode, schema) -> bool:
    if not isinstance(s, E.EFunction):
        return False
    if s.name in _SPECIAL_FNS:
        return True
    if s.name.startswith("list.") and _os.environ.get("POLARS_TPU_FORCE_HOST_LISTOPS"):
        # test hook: must agree with executors._fn_conditionally_host's
        # override for EVERY list op (incl. list.len, which is otherwise
        # unconditionally traced) — a needs-host/not-special disagreement
        # recurses forever between _eval_subexpr and the special select
        return True
    if s.name in _COND_FNS:
        from polars_tpu.engine.executors import _fn_conditionally_host

        return _fn_conditionally_host(s, schema)
    return False


# --- hashed-string gating (utils/hashstore.py; VERDICT r4 #5) ---------------
#
# Hashed-key columns (device hash64 codes, raw bytes spilled) are exact for
# EQUALITY semantics: group keys, join keys, ==/!= against literals, distinct,
# first/last/count. Anything that interprets the VALUE (ordering, string
# functions, casts, min/max) must see a real dictionary — the pre-pass below
# densifies such columns before the segment traces. Default-unsafe: an
# expression shape the walker doesn't recognize densifies the column, so a
# miss costs memory, never correctness.

_HASH_SAFE_AGGS = {"first", "last", "count", "n_unique", "len"}
_HASH_SAFE_EQ = {"==", "!=", "eq_missing", "ne_missing"}

_ALL = "__ALL_COLUMNS_UNSAFE__"  # sentinel: densify every hashed column


def _leaf_unsafe_names(node: L.LNode, unsafe_out, acc: dict,
                       stop_ids: frozenset | None = None) -> None:
    """Descend the plan translating order-sensitive ("unsafe") usage down to
    LEAF-frame column names. ``unsafe_out`` is the set of names unsafe in
    this node's OUTPUT space (or _ALL); renames / aliases / join suffixes
    translate it into each input's space so a rename never defeats the
    densify pre-pass (r5 review). Leaves record their final set in ``acc``
    keyed by id(leaf)."""

    local: set = set()
    local_all = unsafe_out is _ALL

    def add(name: str) -> None:
        local.add(name)

    def mark_expr(e: E.ENode, safe: bool) -> None:
        if isinstance(e, E.EColumn):
            if not safe:
                add(e.name)
            return
        if isinstance(e, E.EAlias):
            mark_expr(e.input, safe)
            return
        if isinstance(e, E.EBinary):
            ok = safe and e.op in _HASH_SAFE_EQ
            mark_expr(e.left, ok)
            mark_expr(e.right, ok)
            return
        if isinstance(e, E.EAgg):
            mark_expr(e.input, safe and e.kind in _HASH_SAFE_AGGS)
            for sub in e.children():
                if sub is not e.input:
                    mark_expr(sub, False)
            return
        if isinstance(e, E.EWindow):
            for p in e.partition_by:
                mark_expr(p, safe and isinstance(p, (E.EColumn, E.EAlias)))
            for o in e.order_by:
                mark_expr(o, False)
            mark_expr(e.function, safe)
            return
        if isinstance(e, E.ETernary):
            mark_expr(e.predicate, safe)
            mark_expr(e.truthy, safe)
            mark_expr(e.falsy, safe)
            return
        if isinstance(e, E.EFunction) and e.name in ("is_null", "is_not_null"):
            for sub in e.children():
                mark_expr(sub, safe)
            return
        for sub in e.children():
            mark_expr(sub, False)

    def out_unsafe(name) -> bool:
        return unsafe_out is _ALL or name in unsafe_out

    if isinstance(node, (L.LScan, L.LDataFrameScan)) or (
        stop_ids is not None and id(node) in stop_ids
    ):
        prev = acc.get(id(node))
        if local_all or prev is _ALL:
            acc[id(node)] = _ALL
        else:
            acc[id(node)] = (prev or set()) | set(unsafe_out)
        return

    if isinstance(node, L.LGroupBy):
        for k in node.keys:
            kn = E.output_name(k)
            safe_shape = isinstance(k, (E.EColumn, E.EAlias))
            mark_expr(k, safe_shape and not (kn and out_unsafe(kn)))
        for a in node.aggs:
            an = E.output_name(a)
            mark_expr(a, not (an and out_unsafe(an)))
        down = _ALL if local_all else local
    elif isinstance(node, L.LJoin):
        for k in (*node.left_on, *node.right_on):
            mark_expr(k, isinstance(k, E.EColumn))
        if local_all:
            down_l = down_r = _ALL
        else:
            sfx = getattr(node, "suffix", "_right") or "_right"
            translated = set(unsafe_out) | local
            down_l = set(translated)
            down_r = set(translated) | {
                n[: -len(sfx)] for n in translated if n.endswith(sfx)
            }
        _leaf_unsafe_names(node.input_left, down_l, acc, stop_ids)
        _leaf_unsafe_names(node.input_right, down_r, acc, stop_ids)
        return
    elif isinstance(node, L.LSort):
        for b in node.by:
            mark_expr(b, False)
        down = _ALL if local_all else (set(unsafe_out) | local)
    elif isinstance(node, L.LDistinct):
        # distinct-by-hash == distinct-by-value: passthrough
        down = _ALL if local_all else (set(unsafe_out) | local)
    elif isinstance(node, L.LRename):
        if local_all:
            down = _ALL
        else:
            mapping = {}
            for attr_new, attr_old in (("new", "old"), ("to", "from_")):
                if hasattr(node, attr_new) and hasattr(node, attr_old):
                    mapping = dict(
                        zip(getattr(node, attr_new), getattr(node, attr_old))
                    )
                    break
            if not mapping and hasattr(node, "mapping"):
                mapping = {v: k for k, v in dict(node.mapping).items()}
            src = set(unsafe_out) | local
            down = {mapping.get(n, n) for n in src} | src
    elif isinstance(node, (L.LFilter, L.LSelect, L.LWithColumns)):
        for e in node.exprs():
            en = E.output_name(e)
            # an output that is unsafe downstream taints its SOURCE columns
            mark_expr(e, not (en and out_unsafe(en)))
        if local_all:
            down = _ALL
        else:
            down = set(local)
            if isinstance(node, (L.LWithColumns, L.LFilter)):
                # passthrough columns keep their downstream unsafety
                produced = (
                    {
                        E.output_name(e)
                        for e in node.exprs()
                        if E.output_name(e)
                    }
                    if isinstance(node, L.LWithColumns)
                    else set()
                )
                down |= {n for n in unsafe_out if n not in produced}
    else:
        # unknown node kind: be conservative — everything below is unsafe
        down = _ALL

    for i in node.inputs():
        _leaf_unsafe_names(i, down, acc, stop_ids)


def _densify_hashed_leaves(
    node: L.LNode, leaves: list[tuple[L.LNode, DataFrame]]
) -> list[tuple[L.LNode, DataFrame]]:
    """Replace hashed-key leaf columns used order-sensitively in this segment
    with densified dictionary columns (see the module-note above). Also used
    by the SPMD engine with its dist-region leaves as the stop set."""
    if not any(
        getattr(c.table, "hashed", False)
        for _, df in leaves
        for c in df._columns
    ):
        return leaves
    acc: dict = {}
    _leaf_unsafe_names(
        node, set(), acc, frozenset(id(ln) for ln, _ in leaves)
    )
    out = []
    for ln, df in leaves:
        unsafe = acc.get(id(ln), _ALL)  # unreached leaf: be conservative

        def is_unsafe(c) -> bool:
            return getattr(c.table, "hashed", False) and (
                unsafe is _ALL or c.name in unsafe
            )

        if not any(is_unsafe(c) for c in df._columns):
            out.append((ln, df))
            continue
        cols = [c.densify_hashed() if is_unsafe(c) else c for c in df._columns]
        out.append((ln, DataFrame._from_columns(cols, df.height)))
    return out


# --- per-node profiling (NodeTimer analogue, polars-expr/src/state/node_timer.rs:19-40)
# A sink is active during LazyFrame.profile() or when POLARS_TRACK_METRICS is
# set; every executed plan node records a real (start, end) wall-time span,
# with end taken after block_until_ready on the node's output buffers so device
# time is attributed to the node that launched it. Spans are INCLUSIVE of the
# node's inputs (pull-based recursion), like the reference's executor spans.
_PROF_SINKS: list[list] = []


@contextlib.contextmanager
def profiling_session():
    sink: list = []
    _PROF_SINKS.append(sink)
    try:
        yield sink
    finally:
        _PROF_SINKS.remove(sink)


def _prof_describe(node: L.LNode) -> str:
    name = type(node).__name__
    return name[1:] if name.startswith("L") else name


# --- common-subplan memo (IR::Cache executor analogue) ----------------------
# One dict per collect: LCache nodes (structural key) -> materialized frame.
_PLAN_CACHES: list[dict] = []


@contextlib.contextmanager
def plan_cache_scope():
    """Open a cache scope for one logical collect; nested scopes reuse the
    outermost dict so streaming/distributed sub-executions share results."""
    if _PLAN_CACHES:
        yield _PLAN_CACHES[-1]
        return
    cache: dict = {}
    _PLAN_CACHES.append(cache)
    try:
        yield cache
    finally:
        _PLAN_CACHES.remove(cache)


def _with_sorted_flags(node: L.LNode, df: DataFrame) -> DataFrame:
    """Stamp sortedness metadata on the first sort key when the plan root is a
    sort (the reference sets IS_SORTED_ASC/DESC on sort output,
    polars-core/src/chunked_array/ops/sort/mod.rs)."""
    root = node
    while isinstance(root, (L.LSlice, L.LCache)):
        root = root.input
    if not isinstance(root, L.LSort) or not root.by:
        return df
    first = root.by[0]
    while isinstance(first, E.EAlias):
        first = first.input
    if not isinstance(first, E.EColumn):
        return df
    name = first.name
    from polars_tpu.core.column import SORTED_ASC, SORTED_DESC

    desc = bool(root.descending[0]) if root.descending else False
    flag = SORTED_DESC if desc else SORTED_ASC
    cols = [
        c.with_buffer(c.buffer, sorted_flag=flag) if c.name == name else c
        for c in df._columns
    ]
    return _copy_deferred(df, DataFrame._from_columns(cols, df.height))


def _copy_deferred(src: DataFrame, dst: DataFrame) -> DataFrame:
    """Frame rebuilds must carry the deferred device count along (a dropped
    count silently turns a padded upper bound into a 'real' height —
    engine/pending.py)."""
    dc = getattr(src, "_device_count", None)
    if dc is not None:
        dst._device_count = dc
    return dst


def execute_plan(node: L.LNode, *, sync: bool = True) -> DataFrame:
    if not _PLAN_CACHES:
        with plan_cache_scope():
            return execute_plan(node, sync=sync)
    if _PROF_SINKS:
        return _with_sorted_flags(node, _timed_execute(node, sync))
    if _cfg_config().track_metrics:
        import sys

        with profiling_session() as sink:
            out = _timed_execute(node, sync)
            for name, t0, t1, rows, nbytes in sorted(
                sink, key=lambda r: r[2] - r[1], reverse=True
            ):
                print(
                    f"[metrics] {name}: {1e3 * (t1 - t0):.3f} ms  "
                    f"{rows} rows  {nbytes / 1e6:.2f} MB out",
                    file=sys.stderr,
                )
        return _with_sorted_flags(node, out)
    return _with_sorted_flags(node, _execute_node(node, sync=sync))


def _timed_execute(node: L.LNode, sync: bool) -> DataFrame:
    import time

    import jax

    t0 = time.perf_counter()
    out = _execute_node(node, sync=sync)
    try:
        jax.block_until_ready([c.buffer.values for c in out._columns])
    except Exception:
        pass
    t1 = time.perf_counter()
    nbytes = 0
    for c in out._columns:
        try:
            item = c.buffer.values.dtype.itemsize
        except Exception:  # noqa: BLE001
            item = 8
        nbytes += out.height * item + (out.height if c.buffer.validity is not None else 0)
    for sink in _PROF_SINKS:
        sink.append((_prof_describe(node), t0, t1, out.height, nbytes))
    return out


def _cfg_config():
    from polars_tpu.config import config

    return config()


def _execute_node(node: L.LNode, *, sync: bool = True) -> DataFrame:
    from polars_tpu.engine.cancel import check_cancel

    check_cancel()  # cooperative cancellation/timeout at every plan barrier
    if isinstance(node, L.LCache):
        cache = _PLAN_CACHES[-1] if _PLAN_CACHES else None
        if cache is not None:
            hit = cache.get(node)
            if hit is not None:
                return hit
        out = execute_plan(node.input, sync=sync)
        if cache is not None and getattr(out, "_device_count", None) is None:
            # deferred frames don't enter the plan cache: a later consumer
            # on a sync path would read the padded tail as data
            cache[node] = out
        return out

    if isinstance(node, L.LDataFrameScan):
        df = node.df
        if node.projection is not None:
            df = DataFrame._from_columns(
                [df._get(n) for n in node.projection], df.height
            )
        return df

    if isinstance(node, L.LScan):
        from polars_tpu.io.scan_exec import execute_scan

        return execute_scan(node)

    if isinstance(node, L.LJoin):
        from polars_tpu.engine.executors import _join_fusable

        if not _join_fusable(node):
            return _exec_join(node)
        # m:1/1:1/(inner)1:m joins fuse into the segment below

    if isinstance(node, L.LJoinWhere):
        return _exec_join_where(node)

    if isinstance(node, L.LAsofJoin):
        return _exec_asof(node)

    if isinstance(node, L.LMapFunction):
        df = execute_plan(node.input)
        return node.function(df)

    if isinstance(node, L.LSink):
        df = execute_plan(node.input)
        from polars_tpu.io.sink import write_sink

        write_sink(df, node.path, node.fmt, dict(node.options))
        return df

    if isinstance(node, L.LUnpivot):
        return _exec_unpivot(node)

    if isinstance(node, L.LExplode) and not _is_fusable(node):
        return _exec_explode(node)  # Array/Struct columns: host layout rebuild

    if isinstance(node, (L.LSelect, L.LWithColumns)) and _needs_special(node):
        lowered = _lower_select_explode(node)
        if lowered is None:
            lowered = _lower_select_arg_where(node)
        if lowered is not None:
            return execute_plan(lowered)
        return _exec_special_select(node)

    if isinstance(node, L.LSort) and not _is_fusable(node):
        # sort keyed by host expressions (struct.field, UDFs, ...): evaluate
        # the keys eagerly, sort by the materialized columns, drop them
        df = execute_plan(node.input)
        schema = node_schema(node.input)
        key_names = []
        cols = list(df._columns)
        for i, b in enumerate(node.by):
            kn = f"__pl_sortkey_{i}"
            key_names.append(kn)
            cols.append(_eval_special_expr(df, b, schema).rename(kn))
        tmp = DataFrame._from_columns(cols, df.height)
        inner = L.LSort(
            L.LDataFrameScan(df=tmp, ident=obj_token(tmp)),
            tuple(E.EColumn(n) for n in key_names),
            node.descending, node.nulls_last, node.maintain_order, node.limit,
        )
        out = execute_plan(inner, sync=sync)
        keep = [c for c in out._columns if c.name not in set(key_names)]
        return _copy_deferred(out, DataFrame._from_columns(keep, out.height))

    if isinstance(node, L.LGroupBy) and any(
        isinstance(s, E.EAgg) and s.kind == "agg_groups"
        for a in node.aggs
        for s in E.walk(a)
    ):
        return execute_plan(_rewrite_agg_groups(node), sync=sync)

    if isinstance(node, L.LGroupBy) and _has_nested_host_aggs(node):
        # a host agg nested under a larger expression (mode().min()):
        # per-group apply path evaluates the whole chain on each sub-frame
        return _exec_groupby_apply(node)

    if isinstance(node, L.LGroupBy) and _has_host_aggs(node):
        return _exec_groupby_host_aggs(node)

    if isinstance(node, L.LGroupBy) and any(
        isinstance(s, E.EAnonymous) for a in node.aggs for s in E.walk(a)
    ):
        # a UDF inside agg exprs is a GROUP-context function (map_groups /
        # map_batches-in-agg): it must see each group's series, so the
        # whole-frame host hoisting below would be silently wrong
        return _exec_groupby_apply(node)

    if isinstance(node, L.LGroupBy) and not _aggs_all_reduce(node):
        # non-reducing agg exprs (rank/sort/head/bare columns) implode to List
        # per group — the reference's apply path (expressions/aggregation.rs)
        return _exec_groupby_apply(node)

    if isinstance(node, L.LGroupBy) and _groupby_needs_host(node):
        return _exec_groupby_hosted(node)

    if _is_fusable(node):
        leaves: list[tuple[L.LNode, DataFrame]] = []
        seen: dict[int, DataFrame] = {}

        def collect(n: L.LNode):
            for i in n.inputs():
                if _is_fusable(i):
                    collect(i)
                else:
                    if id(i) not in seen:
                        seen[id(i)] = execute_plan(i)
                        leaves.append((i, seen[id(i)]))

        collect(node)
        leaves = _densify_hashed_leaves(node, leaves)
        return run_segment(node, leaves, sync=sync)

    if isinstance(node, L.LGroupBy):
        return _exec_groupby_apply(node)

    raise InvalidOperationError(f"cannot execute {type(node).__name__}")


# ---------------------------------------------------------------------------
# special / host-op selects
# ---------------------------------------------------------------------------


def _needs_special(node: L.LNode) -> bool:
    try:
        schema = node_schema(node.input)
    except Exception:
        return True
    for e in node.exprs():
        try:
            exprs = expand_exprs((e,), schema)
        except Exception:
            return True
        for ex in exprs:
            if _expr_needs_host(ex, schema):
                return True
            if _has_bare_filter(ex):
                # select-context filter/drop_nulls/drop_nans shortens the
                # column (reference: Expr::filter outside agg); filters under
                # an aggregation stay traced
                return True
            for sub in E.walk(ex):
                if isinstance(sub, E.ESlice):
                    return True
                if isinstance(sub, E.EGather):
                    # select-context gather changes the frame length to
                    # len(indices) (reference: Expr::gather semantics)
                    return True
                if _is_special_fn(sub, schema):
                    return True
    return False


def jnp_itemsize(d: dt.DataType) -> int:
    import numpy as _np

    return _np.dtype(dt.dtype_to_numpy(d)).itemsize


def _has_bare_filter(ex: E.ENode) -> bool:
    if isinstance(ex, E.EFilter):
        return True
    if isinstance(ex, (E.EAgg, E.EWindow)):
        return False
    return any(_has_bare_filter(c) for c in ex.children())


def _groupby_needs_host(node: L.LGroupBy) -> bool:
    try:
        schema = node_schema(node.input)
    except Exception:
        return True
    for e in (*node.keys, *node.aggs):
        try:
            for ex in expand_exprs((e,), schema):
                if _expr_needs_host(ex, schema):
                    return True
        except Exception:
            return True
    return False


def _lit_node_for_column(col: Column) -> E.ENode:
    return E.ESeriesLit(column=col, ident=obj_token(col))


def _hoist_host_exprs(
    df: DataFrame, exprs: tuple[E.ENode, ...], schema
) -> tuple[tuple[E.ENode, ...], DataFrame]:
    """Replace host-op subtrees with materialized Series literals."""
    out = []
    for e in exprs:
        out.append(_hoist_one(df, e, schema))
    return tuple(out), df


def _hoist_one(df: DataFrame, node: E.ENode, schema) -> E.ENode:
    if _is_host_root(node, schema):
        col = _eval_host(df, node, schema)
        return E.EAlias(_lit_node_for_column(col), E.output_name(node) or col.name or "literal")
    kids = node.children()
    if not kids:
        return node
    new_kids = tuple(_hoist_one(df, k, schema) for k in kids)
    if new_kids == kids:
        return node
    from polars_tpu.plan.schema_resolve import _rebuild_expr

    return _rebuild_expr(node, new_kids)


def _is_host_root(node: E.ENode, schema) -> bool:
    if isinstance(node, E.EAnonymous):
        return True
    if isinstance(node, E.EBinary) and node.op == "+":
        from polars_tpu.plan.schema_resolve import expr_dtype

        try:
            lt = expr_dtype(node.left, schema)
        except Exception:
            return False
        if type(lt).__name__ in ("String", "Binary"):
            return True
    if isinstance(node, E.EBinary) and node.op in ("==", "!="):
        from polars_tpu.plan.schema_resolve import expr_dtype

        try:
            lt = expr_dtype(node.left, schema)
        except Exception:
            return False
        if isinstance(lt, dt.Struct):
            return True
    if isinstance(node, E.EFunction) and node.name in ("concat_str", "dt.to_string", "cat.get_categories"):
        return True
    if isinstance(node, E.ECast):
        from polars_tpu.plan.schema_resolve import expr_dtype as _edt

        try:
            target = dt.resolve_dtype(node.dtype, schema, _edt(node.input, schema))
        except Exception:
            return False
        def _stringy(d) -> bool:
            return type(d).__name__ in ("String", "Categorical", "Enum", "Binary")

        if isinstance(target, dt.String):
            from polars_tpu.plan.schema_resolve import expr_dtype

            try:
                src = expr_dtype(node.input, schema)
            except Exception:
                return False
            if not _stringy(src):
                return True
        if isinstance(target, (dt.List, dt.Array)) and _stringy(
            getattr(target, "inner", None) or dt.Null()
        ):
            # List(non-string) -> List(String) stringifies every element on
            # the host, like the flat int->String cast above
            from polars_tpu.plan.schema_resolve import expr_dtype

            try:
                src = expr_dtype(node.input, schema)
            except Exception:
                return False
            inner = getattr(src, "inner", None)
            if inner is not None and not _stringy(inner):
                return True
    return False


def _eval_subexpr(df: DataFrame, node: E.ENode) -> Column:
    """Evaluate an arbitrary (traceable) expression on df eagerly."""
    sub = L.LSelect(
        L.LDataFrameScan(df=df, ident=obj_token(df)),
        (E.EAlias(node, "__tmp"),),
    )
    out = execute_plan(sub)
    return out._columns[0]


def _eval_host(df: DataFrame, node: E.ENode, schema) -> Column:
    """Evaluate a host-op root: inputs via the engine, op on the host."""
    from polars_tpu.core.series import Series

    if isinstance(node, E.EBinary) and node.op in ("==", "!="):
        # struct equality: field-wise host compare (reference: struct eq kernels)
        a = _eval_subexpr(df, node.left)
        b = _eval_subexpr(df, node.right)
        av, bv = a.to_pylist(), b.to_pylist()
        if len(av) == 1 and len(bv) > 1:
            av = av * len(bv)
        if len(bv) == 1 and len(av) > 1:
            bv = bv * len(av)
        eq = [x == y for x, y in zip(av, bv)]
        if node.op == "!=":
            eq = [not v for v in eq]
        return Column.from_values(E.output_name(node) or "literal", eq, dt.Boolean())

    if isinstance(node, E.EBinary) and node.op == "+":
        # string/binary concatenation (reference: Add on Utf8/BinaryChunked)
        a = _eval_subexpr(df, node.left)
        b = _eval_subexpr(df, node.right)
        av, bv = a.to_pylist(), b.to_pylist()
        if len(av) == 1 and len(bv) > 1:
            av = av * len(bv)
        if len(bv) == 1 and len(av) > 1:
            bv = bv * len(av)
        out = [
            None if (x is None or y is None) else x + y for x, y in zip(av, bv)
        ]
        d = dt.Binary() if isinstance(a.dtype, dt.Binary) else dt.String()
        return Column.from_values(E.output_name(node) or "literal", out, d)

    if isinstance(node, E.EAnonymous):
        in_cols = [
            Series._from_column(
                _eval_subexpr(df, i).rename(E.output_name(i) or "")
            )
            for i in node.input
        ]
        # method map_batches passes ONE Series; the top-level pl.map_batches /
        # pl.map_groups contract is a LIST of Series (functions/lazy.py)
        arg = in_cols[0] if len(in_cols) == 1 else in_cols
        res = node.function(arg)
        if isinstance(res, Series):
            col = res._column
        elif np.ndim(res) == 0:  # scalar return (map_groups reductions)
            col = Series("", [res.item() if hasattr(res, "item") else res])._column
        else:
            col = Series("", list(np.asarray(res)))._column
        if node.return_dtype is not None and col.dtype != node.return_dtype:
            from polars_tpu.ops.cast import cast_column

            col = cast_column(col, node.return_dtype, strict=False)
        return col

    if isinstance(node, E.ECast):
        in_col = _eval_subexpr(df, node.input)
        from polars_tpu.ops.cast import cast_column

        return cast_column(in_col, dt.parse_into_dtype(node.dtype), strict=node.strict)

    if isinstance(node, E.EFunction) and node.name == "concat_str":
        sep = node.opt("separator", "")
        ignore_nulls = node.opt("ignore_nulls", False)
        cols = [_eval_subexpr(df, i) for i in node.inputs]
        arrays = []
        for c in cols:
            if type(c.dtype).__name__ in ("String", "Categorical", "Enum"):
                arrays.append(c.to_numpy())
            else:
                arrays.append(np.asarray([None if v is None else _fmt_scalar(v) for v in c.to_pylist()], object))
        n = max((len(a) for a in arrays), default=0)
        arrays = [np.repeat(a, n) if len(a) == 1 and n > 1 else a for a in arrays]
        out = np.empty(n, object)
        for i in range(n):
            parts = []
            isnull = False
            for a in arrays:
                v = a[i]
                if v is None or (isinstance(v, float) and v != v):
                    if ignore_nulls:
                        continue
                    isnull = True
                    break
                parts.append(str(v))
            out[i] = None if isnull else sep.join(parts)
        return Column.from_values("literal", out.tolist(), dt.String())

    if isinstance(node, E.EFunction) and node.name == "dt.to_string":
        in_col = _eval_subexpr(df, node.inputs[0])
        fmt = node.opt("format")
        vals = in_col.to_numpy()
        out = []
        for v in vals:
            if v is None:
                out.append(None)
            elif fmt is None:
                out.append(str(v))
            else:
                out.append(v.strftime(_chrono_to_py(fmt)) if hasattr(v, "strftime") else str(v))
        return Column.from_values("literal", out, dt.String())

    if isinstance(node, E.EFunction) and node.name == "cat.get_categories":
        in_col = df._get(E.root_column_names(node)[0])
        vals = [str(v) for v in in_col.table.values]
        return Column.from_values(in_col.name, vals, dt.String())

    raise InvalidOperationError(f"unknown host op {node!r}")


def _fmt_scalar(v: Any) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        s = f"{v:.6f}".rstrip("0")
        return s + "0" if s.endswith(".") else s
    return str(v)


def _chrono_to_py(fmt: str) -> str:
    return fmt  # chrono strftime specifiers largely match python's


def _lower_select_explode(node: L.LNode) -> L.LNode | None:
    """``select(col("a").explode(), ...)`` where EVERY output is an explode
    of a plain List column lowers onto the traced LExplode plan node — the
    fused, readback-free device path (executors._trace_explode) — instead of
    the host barrier (which reads the packed offsets back and flips the
    runtime on axon). Reference: the reference lowers expression-level
    explode to the same physical node as DataFrame.explode
    (crates/polars-plan/src/plans/conversion/expr_expansion.rs)."""
    if not isinstance(node, L.LSelect):
        return None
    try:
        schema = node_schema(node.input)
        exprs = expand_exprs(node.expressions, schema)
    except Exception:  # noqa: BLE001
        return None
    sels: list[E.ENode] = []
    names: list[str] = []
    for e in exprs:
        base = e.input if isinstance(e, E.EAlias) else e
        name = E.output_name(e)
        if not (isinstance(base, E.EFunction) and base.name == "explode"
                and len(base.inputs) == 1
                and isinstance(base.inputs[0], E.EColumn)):
            return None
        src = base.inputs[0].name
        d = schema.get(src)
        if not isinstance(d, dt.List) or isinstance(d.inner, dt.Struct):
            return None  # host layout rebuild path (matches _is_fusable)
        if name is None:
            name = src
        sels.append(E.EAlias(E.EColumn(src), name)
                    if name != src else E.EColumn(src))
        names.append(name)
    if not names or len(set(names)) != len(names):
        return None
    return L.LExplode(L.LSelect(node.input, tuple(sels)), tuple(names))


def _lower_select_arg_where(node: L.LNode) -> L.LNode | None:
    """``select(arg_where(cond))`` (and ``Expr.arg_true``) lowers onto
    with_row_index -> filter -> select(index): the condition and the index
    stay inside fused segments and the filter rides the row-mask machinery —
    no host readback of the mask (the host path np.nonzero's it, which on
    axon is the permanent flip). Single-expression selects only: distinct
    conditions cannot share one filter. Reference: arg_where is a
    materialized filter over a row-count in the reference too
    (crates/polars-plan/src/dsl/functions/index.rs arg_where)."""
    if not isinstance(node, L.LSelect):
        return None
    try:
        schema = node_schema(node.input)
        exprs = expand_exprs(node.expressions, schema)
    except Exception:  # noqa: BLE001
        return None
    if len(exprs) != 1:
        return None
    e = exprs[0]
    base = e.input if isinstance(e, E.EAlias) else e
    if not (isinstance(base, E.EFunction)
            and base.name in ("arg_where", "arg_where_self")
            and len(base.inputs) == 1):
        return None
    cond = base.inputs[0]
    name = E.output_name(e) or ("literal" if base.name == "arg_where" else None)
    if name is None:
        return None
    try:
        if not isinstance(expr_dtype_of(cond, schema), dt.Boolean):
            return None
    except Exception:  # noqa: BLE001
        return None
    # the condition itself must be traceable (no host fns inside)
    if _expr_needs_host(cond, schema) or _is_special_fn(cond, schema):
        return None
    idx = "__pl_arg_where_idx"
    while idx in schema:
        idx += "_"
    return L.LSelect(
        L.LFilter(L.LWithRowIndex(node.input, idx, 0), cond),
        (E.EAlias(E.EColumn(idx), name),),
    )


def expr_dtype_of(e, schema):
    from polars_tpu.plan.schema_resolve import expr_dtype

    return expr_dtype(e, schema)


def _struct_from_unique_fields(col: Column, field_names, field_vals_per_unique) -> Column:
    """Struct column whose String fields are defined PER UNIQUE of ``col``'s
    dictionary: each field is one device LUT gather over the codes — row
    values never leave the device (r5; extract_groups/split_exact use this)."""
    import jax.numpy as _jnp

    from polars_tpu.utils import strtable as _st

    n = len(col)
    nu = max(len(col.table.values), 1)
    codes = _jnp.clip(col.buffer.values.astype(_jnp.int32), 0, nu - 1)
    children = []
    for fname, uvals in zip(field_names, field_vals_per_unique):
        arr = np.asarray(uvals if uvals else [None], object)
        ucodes, uval, ftab = _st.encode_strings(arr)
        fcodes = _jnp.asarray(ucodes.astype(np.int32))[codes]
        fval = None if uval is None else _jnp.asarray(uval)[codes]
        if col.buffer.validity is not None:
            fval = (
                col.buffer.validity if fval is None
                else (fval & col.buffer.validity)
            )
        children.append(
            Column(fname, dt.String(), Buffer(fcodes, fval, n), ftab)
        )
    fields_dt = dt.Struct([(c.name, dt.String()) for c in children])
    base = Buffer.from_numpy(np.arange(n, dtype=np.int64), None)
    ids = Buffer(base.values, col.buffer.validity, n)
    return Column(col.name, fields_dt, ids, None, 0, children)


def _exec_special_select(node: L.LSelect | L.LWithColumns) -> DataFrame:
    df = execute_plan(node.input)
    schema = df.schema
    exprs = expand_exprs(node.expressions, schema)

    results: list[Column] = []
    for e in exprs:
        name = E.output_name(e) or "literal"
        col = _eval_special_expr(df, e, schema).rename(name)
        results.append(col)

    if isinstance(node, L.LWithColumns):
        out_cols = {c.name: c for c in df._columns}
        heights = {len(c) for c in results} | ({df.height} if df.width else set())
        for c in results:
            if len(c) == 1 and df.height != 1:
                from polars_tpu.core.column import full_column

                vals = c.to_pylist()
                c = full_column(c.name, vals[0], df.height, c.dtype)
            out_cols[c.name] = c
        return DataFrame._from_columns(list(out_cols.values()), df.height)

    heights = {len(c) for c in results}
    if len(heights) > 1:
        target = max(heights)
        if heights <= {1, target}:
            from polars_tpu.core.column import full_column

            results = [
                c if len(c) == target else full_column(c.name, c.to_pylist()[0], target, c.dtype)
                for c in results
            ]
        else:
            raise ComputeError(f"select produced differing lengths {sorted(heights)}")
    h = max(heights) if heights else 0
    return DataFrame._from_columns(results, h)


def _eval_special_expr(df: DataFrame, e: E.ENode, schema) -> Column:
    # host hoisting first
    e = _hoist_one(df, e, schema)

    if isinstance(e, E.EAlias):
        return _eval_special_expr(df, e.input, schema).rename(e.name)

    if isinstance(e, E.EColumn):
        return df._get(e.name)

    if isinstance(e, E.EAgg) and e.kind in ("str_concat", "implode", "mode"):
        in_col = _eval_special_expr(df, e.input, schema)
        vals = in_col.to_pylist()
        if e.kind == "mode":
            # all most-occurring values, first-seen order (reference:
            # Expr.mode "can return multiple values")
            from collections import Counter

            items = [v for v in vals if v is not None]
            if not items:
                return Column.from_values(in_col.name, [], in_col.dtype)
            c = Counter(items)
            mx = max(c.values())
            modes = [v for v in dict.fromkeys(items) if c[v] == mx]
            return Column.from_values(in_col.name, modes, in_col.dtype)
        if e.kind == "str_concat":
            sep = e.opt("delimiter", "-")
            ignore_nulls = e.opt("ignore_nulls", True)
            if not ignore_nulls and any(v is None for v in vals):
                out = [None]
            else:
                out = [sep.join(str(v) for v in vals if v is not None)]
            return Column.from_values(in_col.name, out, dt.String())
        return Column.from_values(in_col.name, [ [v for v in vals] ], dt.List(in_col.dtype))

    if isinstance(e, E.ESeriesLit):
        return e.column

    if isinstance(e, E.ESlice):
        inner = _eval_special_expr(df, e.input, schema)
        off = e.offset if e.offset >= 0 else max(0, len(inner) + e.offset)
        ln = e.length if e.length is not None else len(inner) - off
        return inner.with_buffer(inner.buffer.slice(off, ln))

    if isinstance(e, E.EFilter):
        # select-context filter: shorten the column by the predicate
        # (reference: Expr::filter outside aggregation)
        from polars_tpu.engine.gather import gather_column

        inner = _eval_special_expr(df, e.input, schema)
        pred = _eval_special_expr(df, e.by, schema)
        keep_vals = pred.to_pylist()
        idx = np.asarray(
            [i for i, k in enumerate(keep_vals) if k is True], dtype=np.int64
        )
        return gather_column(inner, idx)

    if isinstance(e, E.EGather):
        from polars_tpu.engine.gather import gather_column

        inner = _eval_special_expr(df, e.input, schema)
        idx_col = _eval_special_expr(df, e.indices, schema)
        idx = np.asarray(idx_col.to_pylist(), dtype=np.int64)
        idx = np.where(idx < 0, idx + len(inner), idx)
        if idx.size and (idx.min() < 0 or idx.max() >= len(inner)):
            raise ComputeError(
                f"gather index out of bounds for column of length {len(inner)}"
            )
        return gather_column(inner, idx).rename(inner.name)

    if isinstance(e, E.EFunction) and _is_special_fn(e, schema):
        return _eval_generator(df, e, schema)

    # otherwise traceable — check for nested special parts (incl. host aggs
    # like mode/implode nested under a larger agg: mode().min())
    def _is_special_sub(s) -> bool:
        return (
            isinstance(s, E.ESlice)
            or _is_special_fn(s, schema)
            or (isinstance(s, E.EAgg) and s.kind in ("str_concat", "implode", "mode"))
        )

    has_special = any(_is_special_sub(s) for s in E.walk(e) if s is not e)
    if has_special:
        # hoist nested special subtrees
        kids = e.children()
        new_kids = []
        for k in kids:
            if any(_is_special_sub(s) for s in E.walk(k)):
                col = _eval_special_expr(df, k, schema)
                new_kids.append(_lit_node_for_column(col))
            else:
                new_kids.append(k)
        from polars_tpu.plan.schema_resolve import _rebuild_expr

        e = _rebuild_expr(e, tuple(new_kids))
        # generators hoisted inside a bare select (e.g. linear_space's
        # int_range arithmetic over pl.select / DataFrame({})) set the
        # output length; re-base the empty frame so the trace isn't
        # clipped to height 0
        hoisted = [k.column for k in new_kids if isinstance(k, E.ESeriesLit)]
        if df.height == 0 and not df._columns:
            if hoisted:
                df = DataFrame._from_columns([], max(len(c) for c in hoisted))
        elif hoisted and not any(isinstance(s, E.EColumn) for s in E.walk(e)):
            # the rebuilt expr references ONLY the hoisted literals (e.g.
            # mode().min()): evaluate at the literal's length, not the source
            # frame's — padding rows of a shorter literal would otherwise
            # count as valid data
            df = DataFrame._from_columns([], max(len(c) for c in hoisted))
    return _eval_subexpr(df, e)


def _temporal_range(start, end, interval: str, closed: str) -> list:
    """Step date/datetime values from start through end honoring `closed`
    (reference: polars-time/src/date_range.rs)."""
    import datetime as _dtm

    from polars_tpu.engine.fn_temporal import _parse_every

    n_, unit = _parse_every(interval)

    def _parse(x):
        if not isinstance(x, str):
            return x
        if len(x) > 10 or "T" in x:
            return _dtm.datetime.fromisoformat(x)
        d = _dtm.date.fromisoformat(x)
        # sub-day stepping over a bare date needs datetime arithmetic
        return _dtm.datetime(d.year, d.month, d.day) if unit in ("h", "m", "s", "ms", "us") else d

    start = _parse(start)
    end = _parse(end)
    if isinstance(start, _dtm.date) and not isinstance(start, _dtm.datetime) and unit in ("h", "m", "s", "ms", "us"):
        start = _dtm.datetime(start.year, start.month, start.day)
    if isinstance(end, _dtm.date) and not isinstance(end, _dtm.datetime) and unit in ("h", "m", "s", "ms", "us"):
        end = _dtm.datetime(end.year, end.month, end.day)
    out = []
    cur = start
    while True:
        cmp = (cur <= end) if closed in ("both", "right") else (cur < end)
        if not cmp:
            break
        prev = cur
        out.append(cur)
        if unit == "d":
            cur = cur + _dtm.timedelta(days=n_)
        elif unit == "w":
            cur = cur + _dtm.timedelta(weeks=n_)
        elif unit == "h":
            cur = cur + _dtm.timedelta(hours=n_)
        elif unit == "m":
            cur = cur + _dtm.timedelta(minutes=n_)
        elif unit == "s":
            cur = cur + _dtm.timedelta(seconds=n_)
        elif unit == "ms":
            cur = cur + _dtm.timedelta(milliseconds=n_)
        elif unit == "us":
            cur = cur + _dtm.timedelta(microseconds=n_)
        elif unit == "mo":
            y, m = cur.year, cur.month + n_
            y += (m - 1) // 12
            m = (m - 1) % 12 + 1
            cur = cur.replace(year=y, month=m)
        elif unit == "y":
            cur = cur.replace(year=cur.year + n_)
        else:
            raise InvalidOperationError(f"range interval {unit!r}")
        if cur == prev:
            raise InvalidOperationError(
                f"interval {interval!r} makes no progress over {type(prev).__name__} bounds"
            )
    if closed in ("right", "none") and out and out[0] == start:
        out = out[1:]
    return out


def _eval_per_row_ranges(df: DataFrame, e: E.EFunction) -> Column:
    """int_ranges / date_ranges / datetime_ranges / linear_spaces: per-row
    List outputs with data-dependent lengths (host-materialized; the packed
    child layout cannot be statically shaped in-trace). Reference:
    py-polars functions/range/*.py."""

    def rows_of(n: E.ENode):
        if isinstance(n, E.ELiteral):
            return None, n.value
        col = _eval_subexpr(df, n)
        return col.to_pylist(), None

    evaled = [rows_of(i) for i in e.inputs]
    height = max((len(v) for v, _ in evaled if v is not None), default=1)
    cols = [v if v is not None else [s] * height for v, s in evaled]
    if any(len(c) not in (1, height) for c in cols):
        raise ComputeError("range inputs must be equal length or scalar")
    cols = [c * height if len(c) == 1 and height > 1 else c for c in cols]

    closed = e.opt("closed", "both")
    out: list = []
    if e.name == "int_ranges":
        dtype = dt.List(e.opt("dtype", dt.Int64()))
        step_default = 1
        for s, en, st in zip(cols[0], cols[1], cols[2] if len(cols) > 2 else [step_default] * height):
            out.append(None if s is None or en is None or st is None
                       else list(range(int(s), int(en), int(st))))
        return Column.from_values("int_range", out, dtype)
    if e.name in ("date_ranges", "datetime_ranges"):
        interval = e.opt("interval", "1d")
        inner = dt.Date() if e.name == "date_ranges" else dt.Datetime(e.opt("time_unit", "us"))
        for s, en in zip(cols[0], cols[1]):
            out.append(None if s is None or en is None
                       else _temporal_range(s, en, interval, closed))
        return Column.from_values("date_range" if e.name == "date_ranges" else "datetime_range",
                                  out, dt.List(inner))
    if e.name == "time_ranges":
        import datetime as _dtm

        from polars_tpu.engine.fn_temporal import _parse_every

        n_, unit = _parse_every(e.opt("interval", "1h"))
        ticks = {"h": 3_600_000_000, "m": 60_000_000, "s": 1_000_000, "ms": 1_000, "us": 1}
        if unit not in ticks:
            raise InvalidOperationError(f"time_ranges interval {unit!r} must be sub-day")
        step = n_ * ticks[unit]

        def t_us(t):
            return t.hour * 3_600_000_000 + t.minute * 60_000_000 + t.second * 1_000_000 + t.microsecond

        for s, en in zip(cols[0], cols[1]):
            if s is None or en is None:
                out.append(None)
                continue
            lo, hi = t_us(s), t_us(en)
            first = lo + step if closed in ("right", "none") else lo
            last = hi if closed in ("both", "right") else hi - 1
            out.append([_dtm.time((u // 3_600_000_000) % 24, (u // 60_000_000) % 60,
                                  (u // 1_000_000) % 60, u % 1_000_000)
                        for u in range(first, last + 1, step)])
        return Column.from_values("time_range", out, dt.List(dt.Time()))
    # linear_spaces
    for s, en, num in zip(cols[0], cols[1], cols[2]):
        if s is None or en is None or num is None:
            out.append(None)
            continue
        s, en, num = float(s), float(en), int(num)
        if closed == "both":
            denom, i0 = max(num - 1, 1), 0
        elif closed == "left":
            denom, i0 = num, 0
        elif closed == "right":
            denom, i0 = num, 1
        else:
            denom, i0 = num + 1, 1
        out.append([s + (en - s) * (i + i0) / denom for i in range(num)])
    return Column.from_values("linear_space", out, dt.List(dt.Float64()))


def _eval_generator(df: DataFrame, e: E.EFunction, schema) -> Column:
    def scalar_of(n: E.ENode):
        if isinstance(n, E.ELiteral):
            return n.value
        col = _eval_subexpr(df, n)
        vals = col.to_pylist()
        if len(vals) != 1:
            raise ComputeError("range bounds must be scalar")
        return vals[0]

    if e.name in ("sample", "shuffle"):
        col = _eval_special_expr(df, e.inputs[0], schema)
        rng = np.random.default_rng(e.opt("seed"))
        n_rows = len(col)
        if e.name == "shuffle":
            idx = rng.permutation(n_rows)
        else:
            n = e.opt("n")
            frac = e.opt("fraction")
            k = int(round(frac * n_rows)) if frac is not None else (int(n) if n is not None else 1)
            idx = rng.choice(n_rows, size=k, replace=bool(e.opt("with_replacement", False)))
            if not e.opt("shuffle", False) and not e.opt("with_replacement", False):
                idx = np.sort(idx)
        from polars_tpu.engine.gather import gather_column

        return gather_column(col, idx)

    if e.name == "arg_where_self":
        col = _eval_special_expr(df, e.inputs[0], schema)
        vals, validity = col.buffer.to_numpy()
        mask = vals.astype(bool)
        if validity is not None:
            mask = mask & validity
        return Column.from_values(col.name, np.nonzero(mask)[0].astype(np.uint32), dt.UInt32())

    if e.name == "repeat_by":
        col = _eval_special_expr(df, e.inputs[0], schema)
        by = _eval_special_expr(df, e.inputs[1], schema)
        vals = col.to_pylist()
        ns = by.to_pylist()
        if len(ns) == 1 and len(vals) > 1:
            ns = ns * len(vals)
        out = [
            None if n is None else [v] * int(n) for v, n in zip(vals, ns)
        ]
        return Column.from_values(col.name, out, dt.List(col.dtype))

    if e.name == "extend_constant":
        col = _eval_special_expr(df, e.inputs[0], schema)
        value = e.inputs[1]
        v = value.value if isinstance(value, E.ELiteral) else value
        n = int(e.opt("n", 0))
        if n >= 0 and not isinstance(col.dtype, (dt.List, dt.Array, dt.Struct)):
            # DEVICE path (r5): build only the n-row constant tail on the
            # host and concatenate on device — the existing column's values
            # are never read back (CLAUDE.md §1)
            tail = Column.from_values(col.name, [v] * n, col.dtype)
            a = DataFrame._from_columns([col], len(col))
            b = DataFrame._from_columns([tail], n)
            return a.vstack(b)._columns[0]
        return Column.from_values(
            col.name, col.to_pylist() + [v] * n, col.dtype
        )

    if e.name == "rle":
        # DEVICE path (VERDICT r4 #8): run ids via the traced rle_id (null
        # transitions included), then ONE fused group-by segment computes
        # (len, first) per run — no value readback (the old path pulled the
        # whole column to the host). Reference: polars-ops series/ops rle.
        import polars_tpu as pl

        col = _eval_special_expr(df, e.inputs[0], schema)
        key = col.name or "__v"
        sub = DataFrame._from_columns([col.rename(key)], len(col))
        out = (
            sub.lazy()
            .with_columns(pl.col(key).rle_id().alias("__rid"))
            .group_by("__rid", maintain_order=True)
            .agg(
                pl.len().alias("len"),
                pl.col(key).first().alias("value"),
            )
            .collect()
        )
        ids = Buffer.from_numpy(np.arange(out.height, dtype=np.int64), None)
        children = [out._get("len"), out._get("value")]
        fields = dt.Struct([("len", dt.UInt32()), ("value", col.dtype)])
        return Column(col.name, fields, ids, None, 0, children)

    if e.name == "as_struct":
        cols = [_eval_special_expr(df, i, schema) for i in e.inputs]
        n = len(cols[0]) if cols else df.height
        fields = dt.Struct([(c.name, c.dtype) for c in cols])
        import numpy as _np

        ids = Buffer.from_numpy(_np.arange(n, dtype=_np.int64), None)
        return Column("struct", fields, ids, None, 0, list(cols))

    if e.name == "struct.field":
        col = _eval_special_expr(df, e.inputs[0], schema)
        want = e.opt("name")
        field = next((c for c in (col.child or []) if c.name == want), None)
        if field is None:
            raise ComputeError(f"struct has no field {want!r}")
        from polars_tpu.engine.gather import gather_struct_field

        return gather_struct_field(col, field).rename(want)

    if e.name == "struct.drop":
        col = _eval_special_expr(df, e.inputs[0], schema)
        names = set(e.opt("names", ()))
        if e.opt("strict", True):
            have = {c.name for c in (col.child or [])}
            missing = names - have
            if missing:
                raise ComputeError(f"struct has no field(s) {sorted(missing)}")
        kids = [c for c in (col.child or []) if c.name not in names]
        fields = dt.Struct([(c.name, c.dtype) for c in kids])
        return Column(col.name, fields, col.buffer, None, 0, kids)

    if e.name == "struct.rename_fields":
        col = _eval_special_expr(df, e.inputs[0], schema)
        names = list(e.opt("names"))
        kids = [c.rename(n) for c, n in zip(col.child or [], names)]
        fields = dt.Struct([(c.name, c.dtype) for c in kids])
        return Column(col.name, fields, col.buffer, None, 0, kids)

    if e.name == "struct.map_field_names":
        # name.map_fields / prefix_fields / suffix_fields (reference:
        # py-polars expr/name.py)
        col = _eval_special_expr(df, e.inputs[0], schema)
        kind, arg = e.opt("kind"), e.opt("arg")
        ren = {
            "prefix": lambda n: f"{arg}{n}",
            "suffix": lambda n: f"{n}{arg}",
            "map": arg,
        }[kind]
        kids = [c.rename(ren(c.name)) for c in (col.child or [])]
        fields = dt.Struct([(c.name, c.dtype) for c in kids])
        return Column(col.name, fields, col.buffer, None, 0, kids)

    if e.name == "struct.with_fields":
        # evaluate the field exprs against a row-aligned frame of the struct's
        # fields (pl.field == pl.col there), then add/overwrite
        # (reference: py-polars expr/struct.py with_fields)
        import polars_tpu as pl
        from polars_tpu.engine.gather import gather_struct_field

        col = _eval_special_expr(df, e.inputs[0], schema)
        n = len(col)
        # device field alignment (r5): the id gather stays on device
        aligned = [gather_struct_field(col, f) for f in (col.child or [])]
        fdf = DataFrame._from_columns(aligned, n)
        new_fields = {c.name: c for c in aligned}
        for sub_node in e.opt("exprs", ()):
            out = fdf.select(pl.Expr(sub_node))._columns[0]
            new_fields[out.name] = out
        kids = list(new_fields.values())
        fields_dt = dt.Struct([(c.name, c.dtype) for c in kids])
        import numpy as _np

        base = Buffer.from_numpy(_np.arange(n, dtype=_np.int64), None)
        ids2 = Buffer(base.values, col.buffer.validity, n)
        return Column(col.name, fields_dt, ids2, None, 0, kids)

    if e.name == "struct.json_encode":
        import json as _json

        col = _eval_special_expr(df, e.inputs[0], schema)
        rows = col.to_pylist()
        out = [None if r is None else _json.dumps(r, default=str, separators=(",", ":")) for r in rows]
        return Column.from_values(col.name, out, dt.String())

    if e.name == "str.split":
        col = _eval_special_expr(df, e.inputs[0], schema)
        by = e.opt("by", " ")
        inclusive = e.opt("inclusive", False)
        vals = col.to_pylist()
        out = []
        for v in vals:
            if v is None:
                out.append(None)
            elif inclusive:
                parts = v.split(by)
                out.append([p + by for p in parts[:-1]] + [parts[-1]])
            else:
                out.append(v.split(by))
        return Column.from_values(col.name, out, dt.List(dt.String()))

    if e.name == "str.extract_all":
        import re as _re

        col = _eval_special_expr(df, e.inputs[0], schema)
        pat = _re.compile(e.opt("pattern", ""))
        vals = col.to_pylist()
        out = [
            None if v is None else [m.group(0) for m in pat.finditer(v)]
            for v in vals
        ]
        return Column.from_values(col.name, out, dt.List(dt.String()))

    if e.name == "shrink_dtype":
        # value-dependent narrowing: pick the smallest dtype that holds the
        # observed range (reference: Expr.shrink_dtype)
        col = _eval_special_expr(df, e.inputs[0], schema)
        d = col.dtype
        if not d.is_numeric() or isinstance(d, dt.Decimal):
            return col
        from polars_tpu.ops.cast import cast_column

        if d.is_float():
            return cast_column(col, dt.Float32(), strict=False) if type(d).__name__ == "Float64" else col
        # 2-scalar device reduce instead of reading the whole column back
        # (the dtype DECISION is inherently host — the schema depends on it)
        import jax as _jax
        import jax.numpy as _jnp

        from polars_tpu.core.buffer import row_mask as _row_mask

        mask = _row_mask(col.buffer.values.shape[0], len(col))
        if col.buffer.validity is not None:
            mask = mask & col.buffer.validity
        iv = col.buffer.values.astype(_jnp.int64)
        info = _jnp.iinfo(_jnp.int64)
        lo_d = _jnp.min(_jnp.where(mask, iv, info.max))
        hi_d = _jnp.max(_jnp.where(mask, iv, info.min))
        cnt_d = _jnp.sum(mask.astype(_jnp.int32))
        cnt, lo, hi = (int(x) for x in _jax.device_get([cnt_d, lo_d, hi_d]))
        if cnt == 0:
            return cast_column(col, dt.Int8(), strict=False)
        if d.is_unsigned_integer():
            for cand in (dt.UInt8(), dt.UInt16(), dt.UInt32(), dt.UInt64()):
                if hi <= 2 ** (8 * jnp_itemsize(cand)) - 1:
                    return cast_column(col, cand, strict=False)
            return col
        for cand in (dt.Int8(), dt.Int16(), dt.Int32(), dt.Int64()):
            b = 8 * jnp_itemsize(cand) - 1
            if -(2**b) <= lo and hi <= 2**b - 1:
                return cast_column(col, cand, strict=False)
        return col

    if e.name == "cumulative_eval":
        import polars_tpu as pl
        from polars_tpu.core.series import Series as _Series

        col = _eval_special_expr(df, e.inputs[0], schema)
        sub = e.opt("expr")
        minp = int(e.opt("min_samples", 1) or 1)
        vals = col.to_pylist()
        out = []
        for i in range(len(vals)):
            if i + 1 < minp:
                out.append(None)
                continue
            prefix = _Series("", vals[: i + 1], dtype=col.dtype)
            fr = DataFrame._from_columns([prefix._column.rename("")], i + 1)
            r = fr.select(pl.Expr(sub))._columns[0].to_pylist()
            out.append(r[0] if r else None)
        return Column.from_values(col.name, out, None)

    if e.name == "value_counts":
        # DEVICE path (VERDICT r4 #8): value_counts IS a group-by — run it as
        # one fused group-by segment (engine/groupby.py) instead of reading
        # every value back to the host. The only host work left is struct
        # metadata assembly (an id buffer over the device result columns);
        # reference: polars-ops value_counts is ChunkedArray::value_counts =
        # group_tuples + counts.
        import polars_tpu as pl

        col = _eval_special_expr(df, e.inputs[0], schema)
        cname = e.opt("count_name", "count")
        vname = col.name or ""
        key = vname or "__v"
        sub = DataFrame._from_columns([col.rename(key)], len(col))
        lf = sub.lazy().group_by(key, maintain_order=True).agg(
            pl.len().alias(cname)
        )
        if e.opt("normalize", False):
            lf = lf.with_columns(
                (pl.col(cname) / pl.col(cname).sum()).alias(cname)
            )
            cnt_dt = dt.Float64()
        else:
            cnt_dt = dt.UInt32()
        if e.opt("sort", False):
            lf = lf.sort(cname, descending=True)
        out = lf.collect()
        ids = Buffer.from_numpy(np.arange(out.height, dtype=np.int64), None)
        children = [out._get(key).rename(vname), out._get(cname)]
        fields = dt.Struct([(vname, col.dtype), (cname, cnt_dt)])
        return Column(col.name, fields, ids, None, 0, children)

    if e.name == "hist":
        # DEVICE binning (r5): searchsorted + scatter-add over the device
        # buffer — values never leave the device. Host work is limited to
        # edge metadata: zero readbacks with explicit ``bins``; a 2-scalar
        # (lo, hi) readback only for bin_count + breakpoint/category labels
        # (the old path to_pylist'd the entire column either way).
        # Reference: polars-ops/src/chunked_array/hist.rs.
        import jax.numpy as _jnp
        import numpy as _np

        from polars_tpu.core.buffer import pad_to as _pad_to
        from polars_tpu.core.buffer import padded_size as _padded_size
        from polars_tpu.core.buffer import row_mask as _row_mask

        col = _eval_special_expr(df, e.inputs[0], schema)
        n = len(col)
        mask = _row_mask(col.buffer.values.shape[0], n)
        if col.buffer.validity is not None:
            mask = mask & col.buffer.validity
        xf = col.buffer.values.astype(_jnp.float64)
        bins = e.opt("bins")
        include_bp = bool(e.opt("include_breakpoint", False))
        include_cat = bool(e.opt("include_category", False))
        host_edges = None
        if bins is not None:
            host_edges = _np.asarray(list(bins), _np.float64)
            nb = max(len(host_edges) - 1, 0)
            edges = _jnp.asarray(host_edges)
        else:
            bc = int(e.opt("bin_count") or 10)
            nb = bc
            cnt_valid = _jnp.sum(mask.astype(_jnp.int32))
            lo = _jnp.min(_jnp.where(mask, xf, _jnp.inf))
            hi = _jnp.max(_jnp.where(mask, xf, -_jnp.inf))
            lo = _jnp.where(cnt_valid > 0, lo, 0.0)
            hi = _jnp.where(cnt_valid > 0, hi, 1.0)
            same = lo == hi
            lo = _jnp.where(same, lo - 0.5, lo)
            hi = _jnp.where(same, hi + 0.5, hi)
            w = _jnp.linspace(0.0, 1.0, bc + 1)
            edges = lo + (hi - lo) * w
        counts32 = _jnp.zeros((max(nb, 1),), _jnp.uint32)
        if nb:
            idx = _jnp.searchsorted(edges, xf, side="left").astype(_jnp.int32) - 1
            idx = _jnp.where(xf == edges[0], 0, idx)  # first bin closed both sides
            sel = mask & (idx >= 0) & (idx < nb) & (xf >= edges[0]) & (xf <= edges[-1])
            counts32 = counts32.at[_jnp.where(sel, idx, nb)].add(
                _jnp.uint32(1), mode="drop"
            )
        cname = col.name or "count"
        cbuf = Buffer(_pad_to(counts32, _padded_size(max(nb, 1))), None, nb)
        count_col = Column(cname, dt.UInt32(), cbuf)
        if not (include_bp or include_cat):
            return count_col
        if host_edges is None:
            import jax as _jax

            lo_h, hi_h = (float(x) for x in _jax.device_get([edges[0], edges[-1]]))
            host_edges = _np.linspace(lo_h, hi_h, nb + 1)
        children = []
        fields = []
        if include_bp:
            children.append(
                Column.from_values("breakpoint", host_edges[1:].tolist(), dt.Float64())
            )
            fields.append(("breakpoint", dt.Float64()))
        if include_cat:
            cats = [
                f"({host_edges[i]:g}, {host_edges[i + 1]:g}]" for i in range(nb)
            ]
            children.append(Column.from_values("category", cats, dt.Categorical()))
            fields.append(("category", dt.Categorical()))
        children.append(count_col.rename("count"))
        fields.append(("count", dt.UInt32()))
        ids = Buffer.from_numpy(_np.arange(nb, dtype=np.int64), None)
        return Column(cname, dt.Struct(fields), ids, None, 0, children)

    if e.name == "reshape":
        col = _eval_special_expr(df, e.inputs[0], schema)
        dims = tuple(int(d) for d in e.opt("dimensions", ()))
        if len(dims) == 1:
            return col
        if len(dims) != 2:
            raise InvalidOperationError("reshape supports 1 or 2 dimensions")
        r, c = dims
        n = len(col)
        if c <= 0:
            raise InvalidOperationError("only the first reshape dimension may be -1")
        if r == -1:
            r = n // c
        if r * c != n:
            raise ShapeError(f"cannot reshape {n} elements into {r}x{c}")
        # DEVICE path (r5): the packed layout is STATIC — (i*c)<<32 | c over
        # the existing flat column as child; element values never leave the
        # device (the old path to_pylist'd the whole column)
        starts = np.arange(r, dtype=np.int64) * c
        packed = (starts << 32) | np.int64(c)
        return Column(
            col.name, dt.Array(col.dtype, c),
            Buffer.from_numpy(packed, None), None, 0, col.rename(""),
        )

    if e.name in ("rolling_median_by", "rolling_quantile_by", "rolling_rank_by"):
        import numpy as _np

        col = _eval_special_expr(df, e.inputs[0], schema)
        bycol = _eval_special_expr(df, e.inputs[1], schema)
        from polars_tpu.lazyframe import LazyGroupByDynamic

        ticks = int(LazyGroupByDynamic._ticks(e.opt("window_size"), bycol.dtype))
        closed = e.opt("closed", "right") or "right"
        minp = int(e.opt("min_samples", 1) or 1)
        tvals, tvalid = bycol.buffer.to_numpy()
        xlist = col.to_pylist()
        n = len(col)
        t = _np.asarray(tvals[:n], _np.int64)
        ok = _np.ones(n, bool) if tvalid is None else _np.asarray(tvalid[:n], bool)
        x = _np.asarray(
            [float("nan") if v is None else float(v) for v in xlist], _np.float64
        )
        val_ok = ~_np.asarray([v is None for v in xlist], bool)
        order = _np.argsort(t[ok], kind="stable")
        ts = t[ok][order]
        xs = x[ok][order]
        xs_ok = val_ok[ok][order]
        out = _np.full(n, _np.nan, _np.float64)
        has = _np.zeros(n, bool)
        q = float(e.opt("quantile", 0.5) or 0.5)
        interp = e.opt("interpolation", "nearest") or "nearest"
        method = e.opt("method", "average") or "average"
        desc = bool(e.opt("descending", False))
        for i in range(n):
            if not ok[i]:
                continue
            lo_b, hi_b = t[i] - ticks, t[i]
            if closed == "right":
                lo = _np.searchsorted(ts, lo_b, side="right")
                hi = _np.searchsorted(ts, hi_b, side="right")
            elif closed == "left":
                lo = _np.searchsorted(ts, lo_b, side="left")
                hi = _np.searchsorted(ts, hi_b, side="left")
            elif closed == "both":
                lo = _np.searchsorted(ts, lo_b, side="left")
                hi = _np.searchsorted(ts, hi_b, side="right")
            else:  # none
                lo = _np.searchsorted(ts, lo_b, side="right")
                hi = _np.searchsorted(ts, hi_b, side="left")
            w = xs[lo:hi][xs_ok[lo:hi]]
            if len(w) < minp or len(w) == 0:
                continue
            has[i] = True
            if e.name == "rolling_median_by":
                out[i] = float(_np.median(w))
            elif e.name == "rolling_quantile_by":
                meth = {"nearest": "nearest", "linear": "linear", "lower": "lower",
                        "higher": "higher", "midpoint": "midpoint"}.get(interp, "nearest")
                out[i] = float(_np.quantile(w, q, method=meth))
            else:  # rank of the current value within its window
                if not val_ok[i]:
                    has[i] = False
                    continue
                cur = x[i]
                wv = -w if desc else w
                cv = -cur if desc else cur
                less = int((wv < cv).sum())
                ties = int((wv == cv).sum())
                if method == "min":
                    out[i] = less + 1
                elif method == "max":
                    out[i] = less + ties
                elif method == "dense":
                    out[i] = len(_np.unique(wv[wv < cv])) + 1
                else:  # average
                    out[i] = less + (ties + 1) / 2.0
        pyout = [float(v) if h else None for v, h in zip(out.tolist(), has.tolist())]
        if e.name == "rolling_rank_by" and method != "average":
            return Column.from_values(col.name, [None if v is None else int(v) for v in pyout], dt.UInt32())
        return Column.from_values(col.name, pyout, dt.Float64())

    if e.name == "rolling_map":
        from polars_tpu.core.series import Series as _Series

        col = _eval_special_expr(df, e.inputs[0], schema)
        fn = e.opt("function")
        w = int(e.opt("window_size", 2))
        minp = int(e.opt("min_samples", w) or w)
        center = bool(e.opt("center", False))
        vals = col.to_pylist()
        n = len(vals)
        out = []
        shift = (w - 1) // 2 if center else 0
        for i in range(n):
            end = i + 1 + shift
            start = end - w
            window = vals[max(start, 0) : min(end, n)]
            if len(window) < minp:
                out.append(None)
                continue
            r = fn(_Series("", window, dtype=col.dtype))
            if hasattr(r, "to_list"):
                lst = r.to_list()
                r = lst[0] if lst else None
            out.append(r)
        return Column.from_values(col.name, out, None)

    if e.name == "str.json_decode":
        import json as _json

        col = _eval_special_expr(df, e.inputs[0], schema)
        vals = col.to_pylist()
        out = []
        for v in vals:
            if v is None:
                out.append(None)
            else:
                try:
                    out.append(_json.loads(v))
                except Exception:  # noqa: BLE001
                    out.append(None)
        target = e.opt("dtype")
        return Column.from_values(col.name, out, target)

    if e.name in ("str.extract_many", "str.find_many"):
        from polars_tpu.engine.fn_strings import ac_occurrences

        col = _eval_special_expr(df, e.inputs[0], schema)
        vals = col.to_pylist()
        if len(e.inputs) > 1:
            pcol = _eval_special_expr(df, e.inputs[1], schema)
            per_row = pcol.to_pylist()
        else:
            per_row = None
            pats = list(e.opt("patterns", ()))
        ci = bool(e.opt("ascii_case_insensitive", False))
        overlapping = bool(e.opt("overlapping", False))
        leftmost = bool(e.opt("leftmost", False))
        out = []
        for i, v in enumerate(vals):
            if v is None:
                out.append(None)
                continue
            p = (per_row[i] or []) if per_row is not None else pats
            occ = ac_occurrences(
                v, p, overlapping=overlapping, leftmost=leftmost, ascii_ci=ci
            )
            if e.name == "str.extract_many":
                out.append([v[s:en] for s, en, _ in occ])
            else:
                # byte offsets (reference: find_many returns utf8 byte starts)
                out.append([len(v[:s].encode()) for s, _en, _ in occ])
        out_dt = dt.List(dt.String() if e.name == "str.extract_many" else dt.UInt32())
        return Column.from_values(col.name, out, out_dt)

    if e.name == "str.extract_groups":
        import re as _re

        from polars_tpu.engine.fn_strings import (
            group_field_names,
            translate_group_syntax,
        )

        col = _eval_special_expr(df, e.inputs[0], schema)
        pattern = e.opt("pattern", "")
        rx = _re.compile(translate_group_syntax(pattern))
        fields = group_field_names(pattern)
        tbl = col.table
        if tbl is not None and not getattr(tbl, "hashed", False):
            # DICTIONARY path (r5): regex over the uniques (host, O(uniques)),
            # fields become LUT gathers over the DEVICE codes — row values
            # never leave the device
            per_field: list[list] = [[] for _ in fields]
            for u in tbl.values:
                m = rx.search(u)
                for i in range(len(fields)):
                    per_field[i].append(None if m is None else m.group(i + 1))
            return _struct_from_unique_fields(col, fields, per_field)
        vals = col.to_pylist()
        out = []
        for v in vals:
            if v is None:
                out.append(None)
                continue
            m = rx.search(v)
            if m is None:
                out.append(dict.fromkeys(fields))
            else:
                out.append({f: m.group(i + 1) for i, f in enumerate(fields)})
        fields_dt = dt.Struct([(f, dt.String()) for f in fields])
        return Column.from_values(col.name, out, fields_dt)

    if e.name in ("str.split_exact", "str.splitn"):
        # struct-of-fields splits (reference: py-polars expr/string.py
        # split_exact/splitn; crates/polars-ops src/chunked_array/strings/split.rs)
        col = _eval_special_expr(df, e.inputs[0], schema)
        by = e.opt("by", " ")
        if e.name == "str.split_exact":
            nf = int(e.opt("n", 0)) + 1
            inclusive = e.opt("inclusive", False)
        else:
            nf = max(int(e.opt("n", 1)), 1)
            inclusive = False
        tbl = col.table
        if tbl is not None and not getattr(tbl, "hashed", False):
            # DICTIONARY path (r5): split the uniques once, LUT-gather fields
            per_field: list[list] = [[] for _ in range(nf)]
            for u in tbl.values:
                parts = u.split(by, nf - 1)
                if inclusive and len(parts) > 1:
                    parts = [p + by for p in parts[:-1]] + [parts[-1]]
                for i in range(nf):
                    per_field[i].append(parts[i] if i < len(parts) else None)
            return _struct_from_unique_fields(
                col, [f"field_{i}" for i in range(nf)], per_field
            ).rename(col.name)
        vals = col.to_pylist()
        fields_vals = [[] for _ in range(nf)]
        validity = []
        for v in vals:
            if v is None:
                validity.append(False)
                for f in fields_vals:
                    f.append(None)
                continue
            validity.append(True)
            parts = v.split(by, nf - 1)
            if inclusive and len(parts) > 1:
                parts = [p + by for p in parts[:-1]] + [parts[-1]]
            for i in range(nf):
                fields_vals[i].append(parts[i] if i < len(parts) else None)
        kids = [
            Column.from_values(f"field_{i}", fv, dt.String())
            for i, fv in enumerate(fields_vals)
        ]
        fields_dt = dt.Struct([(c.name, c.dtype) for c in kids])
        import numpy as _np

        n = len(vals)
        ids = Buffer.from_numpy(_np.arange(n, dtype=_np.int64), None)
        if not all(validity):
            from polars_tpu.core.buffer import pad_to, padded_size
            import jax.numpy as _jnp

            vmask = pad_to(_jnp.asarray(validity, bool), padded_size(n))
            ids = Buffer(ids.values, vmask, n)
        return Column(col.name, fields_dt, ids, None, 0, kids)

    if e.name.startswith("list.") or e.name == "explode":
        from polars_tpu.ops import list_ops as LO

        col = _eval_special_expr(df, e.inputs[0], schema)
        kind = e.name.split(".", 1)[-1]
        if e.name == "explode":
            flat, _parent = LO.explode_column(col)
            return flat
        if kind == "len":
            return LO.list_len(col)
        if kind in ("sum", "mean", "min", "max"):
            return LO.list_agg(col, kind)
        if kind == "get":
            return LO.list_get(
                col, int(e.opt("index", 0)), e.opt("null_on_oob", True)
            )
        if kind == "contains":
            item = e.inputs[1]
            if isinstance(item, E.ELiteral):
                return LO.list_contains(col, item.value)
            # per-row item column: python fallback (host path already
            # materialized; the traced path handles the fused case)
            item_col = _eval_special_expr(df, item, schema)
            nulls_equal = bool(e.opt("nulls_equal", False))
            vals = col.to_pylist()
            items = item_col.to_pylist()
            out = []
            for v, it in zip(vals, items):
                if v is None:
                    out.append(None)
                elif it is None and not nulls_equal:
                    out.append(None)
                else:
                    out.append(it in v)
            from polars_tpu.core.column import Column as _Col

            return _Col.from_values(col.name, out, dt.Boolean())
        if kind == "join":
            return LO.list_join(col, e.opt("separator", "-"), e.opt("ignore_nulls", True))
        if kind == "sort":
            return LO.list_sort(col, e.opt("descending", False), e.opt("nulls_last", False))
        if kind == "reverse":
            return LO.list_reverse(col)
        if kind == "unique":
            return LO.list_unique(col, e.opt("maintain_order", False))
        # round-3 long tail (verdict #4)
        if kind == "slice":
            return LO.list_slice(col, int(e.opt("offset", 0)), e.opt("length"))
        if kind == "head":
            return LO.list_head(col, int(e.opt("n", 5)))
        if kind == "tail":
            return LO.list_tail(col, int(e.opt("n", 5)))
        if kind == "shift":
            return LO.list_shift(col, int(e.opt("n", 1)))
        if kind == "diff":
            return LO.list_diff(col, int(e.opt("n", 1)), e.opt("null_behavior", "ignore"))
        if kind == "drop_nulls":
            return LO.list_drop_nulls(col)
        if kind in ("arg_min", "arg_max"):
            return LO.list_arg_minmax(col, kind[4:])
        if kind in ("any", "all"):
            return LO.list_any_all(col, kind)
        if kind == "n_unique":
            return LO.list_n_unique(col)
        if kind == "count_matches":
            item = e.inputs[1]
            val = item.value if isinstance(item, E.ELiteral) else item
            return LO.list_count_matches(col, val)
        if kind in ("var", "std", "median"):
            return LO.list_moment(col, kind, int(e.opt("ddof", 1)))
        if kind == "item":
            allow_empty = bool(e.opt("allow_empty", False))
            lens = LO.list_len(col).to_pylist()
            for ln in lens:
                if ln is None:
                    continue
                if ln > 1 or (ln == 0 and not allow_empty):
                    raise ComputeError(
                        "can only call `.list.item()` on lists of length 1"
                    )
            return LO.list_get(col, 0)
        if kind in (
            "set_union", "set_intersection", "set_difference",
            "set_symmetric_difference",
        ):
            other = _eval_special_expr(df, e.inputs[1], schema)
            return LO.list_set_op(col, other, kind[4:])
        if kind == "gather":
            idx = e.opt("indices")
            if idx is None:
                idx = _eval_special_expr(df, e.inputs[1], schema)
            return LO.list_gather(col, idx, e.opt("null_on_oob", False))
        if kind == "gather_every":
            return LO.list_gather_every(col, int(e.opt("n", 1)), int(e.opt("offset", 0)))
        if kind == "concat":
            others = [_eval_special_expr(df, i, schema) for i in e.inputs[1:]]
            return LO.list_concat_cols([col, *others])
        if kind == "to_struct":
            return LO.list_to_struct(
                col, e.opt("n_field_strategy", "first_non_null"),
                e.opt("fields"), int(e.opt("upper_bound") or 0),
            )
        if kind == "to_array":
            return LO.list_to_array(col, int(e.opt("width", 0)))
        if kind == "sample":
            return LO.list_sample(
                col, e.opt("n"), e.opt("fraction"),
                e.opt("with_replacement", False), e.opt("shuffle", False),
                e.opt("seed"),
            )
        if kind == "eval":
            return LO.list_eval(col, e.opt("expr"))
        if kind == "filter":
            return LO.list_filter(col, e.opt("expr"))
        raise InvalidOperationError(f"unsupported list op {e.name!r}")

    if e.name == "int_range":
        start = scalar_of(e.inputs[0])
        end = scalar_of(e.inputs[1])
        step = e.opt("step", 1)
        dtype = e.opt("dtype", dt.Int64())
        return Column.from_values("int", np.arange(start, end, step), dtype)
    if e.name == "repeat_value":
        val = scalar_of(e.inputs[0])
        n = scalar_of(e.inputs[1])
        dtype = e.opt("dtype")
        return Column.from_values("repeat", [val] * int(n), dtype)
    if e.name in ("date_range", "datetime_range"):
        start = scalar_of(e.inputs[0])
        end = scalar_of(e.inputs[1])
        out = _temporal_range(start, end, e.opt("interval", "1d"), e.opt("closed", "both"))
        dtype = dt.Date() if e.name == "date_range" else dt.Datetime(e.opt("time_unit", "us"))
        return Column.from_values("literal", out, dtype)
    if e.name in ("int_ranges", "date_ranges", "datetime_ranges", "linear_spaces", "time_ranges"):
        return _eval_per_row_ranges(df, e)
    if e.name == "arg_where":
        col = _eval_subexpr(df, e.inputs[0])
        vals = col.to_numpy()
        idx = np.nonzero(np.asarray([bool(v) if v is not None else False for v in vals]))[0]
        return Column.from_values("literal", idx.astype(np.uint32), dt.UInt32())
    if e.name == "gather_every":
        col = _eval_subexpr(df, e.inputs[0])
        from polars_tpu.engine.gather import gather_column

        return gather_column(col, np.arange(e.opt("offset", 0), len(col), e.opt("n", 1)))
    if e.name == "unique":
        col = _eval_subexpr(df, e.inputs[0])
        sub = DataFrame._from_columns([col.rename("__u")], len(col))
        out = sub.unique(maintain_order=e.opt("maintain_order", False))
        return out._columns[0]
    if e.name == "unique_counts":
        col = _eval_subexpr(df, e.inputs[0])
        sub = DataFrame._from_columns([col.rename("__u")], len(col))
        import polars_tpu as pl

        out = sub.group_by("__u", maintain_order=True).agg(pl.len().alias("c"))
        return out._columns[1]
    if e.name == "cat.get_categories":
        return _eval_host(df, e, schema)
    raise InvalidOperationError(f"unknown generator {e.name!r}")


_HOST_AGGS = {"str_concat", "implode", "mode"}


def _has_host_aggs(node: L.LGroupBy) -> bool:
    for e in node.aggs:
        for sub in E.walk(e):
            if isinstance(sub, E.EAgg) and sub.kind in _HOST_AGGS:
                return True
    return False


def _has_nested_host_aggs(node: L.LGroupBy) -> bool:
    """True when a host agg sits UNDER a larger agg expression (not at the
    alias-stripped root) — those need the per-group apply path."""
    for a in node.aggs:
        root = a
        while isinstance(root, (E.EAlias, E.EKeepName)):
            root = root.input
        for sub in E.walk(a):
            if isinstance(sub, E.EAgg) and sub.kind in _HOST_AGGS and sub is not root:
                return True
    return False


def _exec_groupby_host_aggs(node: L.LGroupBy) -> DataFrame:
    """Group-by with host-only aggs (string concat / implode / mode): run the
    traceable part on device, host-compute the rest, align on key order."""
    df = execute_plan(node.input)
    schema = df.schema
    keys = expand_exprs(node.keys, schema)
    aggs = expand_exprs(node.aggs, schema)
    traced_aggs = []
    host_aggs = []
    for a in aggs:
        if any(isinstance(s, E.EAgg) and s.kind in _HOST_AGGS for s in E.walk(a)):
            host_aggs.append(a)
        else:
            traced_aggs.append(a)
    import polars_tpu as pl

    scan = L.LDataFrameScan(df=df, ident=obj_token(df))
    base = execute_plan(
        L.LGroupBy(scan, keys, tuple(traced_aggs), node.maintain_order)
    )
    if not host_aggs:
        return base
    key_names = [E.output_name(k) or "literal" for k in keys]
    # host grouping: map key tuple -> row values
    key_rows = [tuple(r) for r in base.select(key_names).rows()]
    order = {kr: i for i, kr in enumerate(key_rows)}
    src_keys = [tuple(r) for r in df.select([pl.Expr(k) for k in keys]).rows()]
    extra_cols = []
    for a in host_aggs:
        agg_node = next(s for s in E.walk(a) if isinstance(s, E.EAgg) and s.kind in _HOST_AGGS)
        if agg_node is not a and not (isinstance(a, E.EAlias) and a.input is agg_node):
            raise InvalidOperationError(
                "host aggregations (mode/implode/str_concat) cannot be nested "
                "in larger agg expressions yet; aggregate first, then operate "
                "on the resulting List column"
            )
        name = E.output_name(a) or "literal"
        in_col = _eval_subexpr(df, agg_node.input)
        vals = in_col.to_pylist()
        buckets: dict = {kr: [] for kr in key_rows}
        for kr, v in zip(src_keys, vals):
            if kr in buckets:
                buckets[kr].append(v)
        if agg_node.kind == "str_concat":
            sep = agg_node.opt("delimiter", "-")
            ignore_nulls = agg_node.opt("ignore_nulls", True)
            out_vals = []
            for kr in key_rows:
                items = buckets[kr]
                if not ignore_nulls and any(v is None for v in items):
                    out_vals.append(None)
                else:
                    out_vals.append(sep.join(str(v) for v in items if v is not None))
            extra_cols.append(Column.from_values(name, out_vals, dt.String()))
        elif agg_node.kind == "mode":
            # all most-occurring values per group -> List (reference:
            # Expr.mode "can return multiple values")
            from collections import Counter

            out_vals = []
            for kr in key_rows:
                items = [v for v in buckets[kr] if v is not None]
                if not items:
                    out_vals.append(None)
                    continue
                c = Counter(items)
                mx = max(c.values())
                out_vals.append([v for v in dict.fromkeys(items) if c[v] == mx])
            inner = in_col.dtype if in_col.table is None else dt.String()
            extra_cols.append(Column.from_values(name, out_vals, dt.List(inner)))
        elif agg_node.kind == "implode":
            out_vals = [buckets[kr] for kr in key_rows]
            inner_dt = in_col.dtype
            extra_cols.append(Column.from_values(name, out_vals, dt.List(inner_dt)))
        else:
            raise InvalidOperationError(f"unsupported host agg {agg_node.kind!r}")
    cols = list(base._columns) + extra_cols
    # restore requested column order (keys, then aggs in original order)
    want = key_names + [E.output_name(a) or "literal" for a in aggs]
    by_name = {c.name: c for c in cols}
    return DataFrame._from_columns([by_name[n] for n in want], base.height)


def _exec_groupby_apply(node: L.LGroupBy) -> DataFrame:
    """Generic per-group host fallback (the reference's agg apply path,
    polars-expr/src/expressions/aggregation.rs): evaluate each agg expression
    eagerly over every group's sub-frame. Reducing expressions stay scalar;
    length-changing expressions (top_k, sort().head(), filters...) implode to
    List — correct but host-looped, so only reached when no traced path
    accepts the plan."""
    import numpy as np

    import polars_tpu as pl
    from polars_tpu.engine.gather import gather_frame

    df = execute_plan(node.input)
    schema = df.schema
    keys = expand_exprs(node.keys, schema)
    aggs = expand_exprs(node.aggs, schema)
    key_names = [E.output_name(k) or "literal" for k in keys]
    kcols = [
        _eval_subexpr(df, k).rename(nm) for k, nm in zip(keys, key_names)
    ]
    kframe = DataFrame._from_columns(kcols, df.height)
    groups: dict[tuple, list[int]] = {}
    for i, kr in enumerate(tuple(r) for r in kframe.rows()):
        groups.setdefault(kr, []).append(i)

    def reduces(e: E.ENode) -> bool:
        while isinstance(e, E.EAlias):
            e = e.input
        if isinstance(e, E.EAnonymous):
            return e.returns_scalar
        # mode yields multiple values -> List per group (reference Expr.mode)
        if isinstance(e, E.EAgg):
            return e.kind not in ("implode", "mode")
        # compound exprs (implode().list.len(), max().dt.year()): static
        # AggState analysis decides whether one value per group survives
        return E.reduces_in_agg(e)

    agg_names = [E.output_name(a) or "literal" for a in aggs]
    results: list[list] = [[] for _ in aggs]
    inner_dts: list = [None] * len(aggs)
    for kr, idxs in groups.items():
        sub_cols = gather_frame(list(df._columns), np.asarray(idxs, np.int64))
        sub = DataFrame._from_columns(sub_cols, len(idxs))
        for j, a in enumerate(aggs):
            out = sub.select(pl.Expr(a).alias(agg_names[j]))._columns[0]
            inner_dts[j] = out.dtype
            if reduces(a):
                results[j].append(out.to_pylist()[0] if len(out) else None)
            else:
                results[j].append(out.to_pylist())
    n_groups = len(groups)
    out_cols = [
        Column.from_values(nm, [kr[i] for kr in groups], kcols[i].dtype)
        for i, nm in enumerate(key_names)
    ]
    for j, nm in enumerate(agg_names):
        d = inner_dts[j] if inner_dts[j] is not None else dt.Null()
        out_dt = d if reduces(aggs[j]) else dt.List(d)
        out_cols.append(Column.from_values(nm, results[j], out_dt))
    return DataFrame._from_columns(out_cols, n_groups)


def _exec_groupby_hosted(node: L.LGroupBy) -> DataFrame:
    df = execute_plan(node.input)
    schema = df.schema
    keys, _ = _hoist_host_exprs(df, expand_exprs(node.keys, schema), schema)
    aggs, _ = _hoist_host_exprs(df, expand_exprs(node.aggs, schema), schema)
    new = L.LGroupBy(
        L.LDataFrameScan(df=df, ident=obj_token(df)), keys, aggs, node.maintain_order
    )
    return execute_plan(new)


# ---------------------------------------------------------------------------
# joins
# ---------------------------------------------------------------------------


def _exec_join(node: L.LJoin) -> DataFrame:
    from polars_tpu.engine.join import join_frames

    left = execute_plan(node.input_left)
    right = execute_plan(node.input_right)

    def key_names(df: DataFrame, on: tuple[E.ENode, ...], side_node) -> tuple[DataFrame, list[str]]:
        names = []
        extra = []
        for i, e in enumerate(on):
            if isinstance(e, E.EColumn):
                names.append(e.name)
            else:
                kname = f"__join_key_{i}"
                col = _eval_subexpr(df, e).rename(kname)
                extra.append(col)
                names.append(kname)
        if extra:
            df = DataFrame._from_columns(list(df._columns) + extra, df.height)
        return df, names

    lf, lnames = key_names(left, node.left_on, node.input_left)
    rf, rnames = key_names(right, node.right_on, node.input_right)
    out_schema = node_schema(node)
    out = join_frames(
        lf, rf, lnames, rnames, node.how, node.suffix, node.nulls_equal,
        node.coalesce, out_schema,
    )
    drop = [n for n in out.columns if n.startswith("__join_key_")]
    if drop:
        out = out.drop(*drop, strict=False)
    return out


def _exec_join_where(node: L.LJoinWhere) -> DataFrame:
    """Split conjunctive equality predicates into a hash join; remaining
    inequality predicates filter the (much smaller) equi output (reference:
    the dsl->ir join_where lowering, polars-plan/src/plans/conversion/
    dsl_to_ir/join.rs:455). Falls back to cross+filter when no equi
    conjunct exists."""
    ls = node_schema(node.input_left)
    rs = node_schema(node.input_right)

    def origin(e: E.ENode) -> str:
        names = {n.name for n in E.walk(e) if isinstance(n, E.EColumn)}
        in_l = names & set(ls.names())
        in_r = names & set(rs.names())
        if in_l and not in_r:
            return "left"
        if in_r and not in_l:
            return "right"
        return "mixed"

    equi_l: list[E.ENode] = []
    equi_r: list[E.ENode] = []
    rest: list[E.ENode] = []
    for pred in node.predicates:
        if isinstance(pred, E.EBinary) and pred.op == "==":
            ol, orr = origin(pred.left), origin(pred.right)
            if ol == "left" and orr == "right":
                equi_l.append(pred.left)
                equi_r.append(pred.right)
                continue
            if ol == "right" and orr == "left":
                equi_l.append(pred.right)
                equi_r.append(pred.left)
                continue
        rest.append(pred)

    lnames = set(ls.names())

    def filter_rest(out: DataFrame, preds) -> DataFrame:
        if not preds:
            return out

        # rename right-side refs in remaining predicates if suffixed
        def fix(e: E.ENode) -> E.ENode:
            if isinstance(e, E.EColumn):
                if e.name in lnames or e.name in out.columns:
                    return e
                return E.EColumn(e.name + node.suffix)
            kids = e.children()
            if not kids:
                return e
            from polars_tpu.plan.schema_resolve import _rebuild_expr

            return _rebuild_expr(e, tuple(fix(k) for k in kids))

        filt = L.LFilter(
            L.LDataFrameScan(df=out, ident=obj_token(out)),
            _and_all(tuple(fix(p) for p in preds)),
        )
        return execute_plan(filt)

    if equi_l:
        j = L.LJoin(
            node.input_left, node.input_right, tuple(equi_l), tuple(equi_r),
            "inner", node.suffix, False, False, "none",
        )
        return filter_rest(execute_plan(j), tuple(rest))

    # pure-inequality: sort-based range join on the first orderable predicate
    # (iejoin analogue — memory bounded by that predicate's selectivity, not
    # |L|x|R|; reference polars-ops/src/frame/join/iejoin/mod.rs:52)
    from polars_tpu.engine.join import range_join_frames

    _FLIP = {"<": ">", "<=": ">=", ">": "<", ">=": "<="}
    left = execute_plan(node.input_left)
    right = execute_plan(node.input_right)
    driver = None
    rest2: list[E.ENode] = []
    for pred in node.predicates:
        if driver is None and isinstance(pred, E.EBinary) and pred.op in _FLIP:
            ol, orr = origin(pred.left), origin(pred.right)
            if ol == "left" and orr == "right":
                driver = (pred.left, pred.op, pred.right)
                continue
            if ol == "right" and orr == "left":
                driver = (pred.right, _FLIP[pred.op], pred.left)
                continue
        rest2.append(pred)
    if driver is not None:
        lexpr, op, rexpr = driver
        lcol = _eval_subexpr(left, lexpr)
        rcol = _eval_subexpr(right, rexpr)
        out = range_join_frames(left, right, lcol, rcol, op, node.suffix)
        if out is not None:
            return filter_rest(out, tuple(rest2))

    cross = L.LJoin(
        L.LDataFrameScan(df=left, ident=obj_token(left)),
        L.LDataFrameScan(df=right, ident=obj_token(right)),
        (), (), "cross", node.suffix, False, False, "none",
    )
    return filter_rest(execute_plan(cross), tuple(node.predicates))


def _and_all(preds: tuple[E.ENode, ...]) -> E.ENode:
    node = preds[0]
    for p in preds[1:]:
        node = E.EBinary(node, "&", p)
    return node


def _exec_asof(node: L.LAsofJoin) -> DataFrame:
    from polars_tpu.engine.join import asof_join_frames

    left = execute_plan(node.input_left)
    right = execute_plan(node.input_right)
    lon = E.output_name(node.left_on)
    ron = E.output_name(node.right_on)
    by_l = [E.output_name(e) for e in node.by_left] or None
    by_r = [E.output_name(e) for e in node.by_right] or None
    return asof_join_frames(
        left, right, lon, ron, node.strategy, node.suffix, node.tolerance,
        node_schema(node), by_l, by_r,
    )


def _exec_explode(node: L.LExplode) -> DataFrame:
    from polars_tpu.engine.gather import gather_frame
    from polars_tpu.ops.list_ops import explode_column

    df = execute_plan(node.input)
    flats = {}
    parent = None
    for name in node.columns:
        flat, par = explode_column(df._get(name))
        if parent is not None and len(par) != len(parent):
            raise ComputeError("exploded columns must have matching list lengths")
        parent = par
        flats[name] = flat
    if parent is None:
        return df
    others = [c for c in df._columns if c.name not in flats]
    gathered = gather_frame(others, parent) if others else []
    by_name = {c.name: c for c in gathered}
    cols = [flats.get(c.name, by_name.get(c.name)) for c in df._columns]
    return DataFrame._from_columns(cols, len(parent))


def _exec_unpivot(node: L.LUnpivot) -> DataFrame:
    df = execute_plan(node.input)
    on = list(node.on) if node.on is not None else [
        c for c in df.columns if c not in set(node.index)
    ]
    frames = []
    import polars_tpu as pl

    for c in on:
        sel = [pl.col(i) for i in node.index]
        sel.append(pl.lit(c).alias(node.variable_name))
        sel.append(pl.col(c).alias(node.value_name))
        frames.append(df.select(sel))
    from polars_tpu.functions.eager import concat

    return concat(frames, how="vertical_relaxed")


def _rewrite_agg_groups(node: L.LGroupBy) -> L.LGroupBy:
    """agg_groups = implode of a prepended global row index (reference:
    AggGroups returns each group's member row positions). Rewritten at the
    barrier so the standard implode machinery serves it."""
    idx_name = "__agg_groups_idx"

    def rw(e: E.ENode) -> E.ENode:
        if isinstance(e, E.EAgg) and e.kind == "agg_groups":
            return dataclasses.replace(
                e, kind="implode", input=E.ECast(E.EColumn(idx_name), dt.UInt32(), True)
            )
        kids = e.children()
        if not kids:
            return e
        new = tuple(rw(k) for k in kids)
        if new == kids:
            return e
        from polars_tpu.plan.schema_resolve import _rebuild_expr

        return _rebuild_expr(e, new)

    new_aggs = []
    for a in node.aggs:
        r = rw(a)
        # keep the ORIGINAL output name (implode of __agg_groups_idx would
        # otherwise rename the column)
        name = E.output_name(a)
        new_aggs.append(E.EAlias(r, name) if name and E.output_name(r) != name else r)
    return L.LGroupBy(
        L.LWithRowIndex(node.input, idx_name, 0),
        node.keys,
        tuple(new_aggs),
        node.maintain_order,
    )
