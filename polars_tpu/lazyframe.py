"""LazyFrame: the lazy query builder (reference: polars-lazy/src/frame/mod.rs +
py-polars lazyframe/frame.py)."""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from typing import Any

from polars_tpu import datatypes as dt
from polars_tpu.core.frame import DataFrame
from polars_tpu.core.schema import Schema
from polars_tpu.errors import InvalidOperationError
from polars_tpu.expr.expr import Expr, parse_into_expr, parse_into_expr_list
from polars_tpu.plan import exprs as E
from polars_tpu.plan import logical as L
from polars_tpu.plan.schema_resolve import node_schema
from polars_tpu.utils.tokens import obj_token


class LazyFrame:
    __slots__ = ("_node",)

    def __init__(self, data: Any = None, schema: Any = None, **kwargs: Any) -> None:
        if data is None and schema is None:
            df = DataFrame()
        elif isinstance(data, DataFrame):
            df = data
        else:
            df = DataFrame(data, schema=schema, **kwargs)
        self._node = L.LDataFrameScan(df=df, ident=obj_token(df))

    @classmethod
    def _from_node(cls, node: L.LNode) -> LazyFrame:
        lf = cls.__new__(cls)
        lf._node = node
        return lf

    @classmethod
    def _from_df(cls, df: DataFrame) -> LazyFrame:
        return cls._from_node(L.LDataFrameScan(df=df, ident=obj_token(df)))

    def _wrap(self, node: L.LNode) -> LazyFrame:
        return LazyFrame._from_node(node)

    # -- introspection -------------------------------------------------------

    @property
    def schema(self) -> Schema:
        return node_schema(self._node)

    def collect_schema(self) -> Schema:
        return node_schema(self._node)

    @property
    def columns(self) -> list[str]:
        return self.schema.names()

    @property
    def dtypes(self) -> list[dt.DataType]:
        return self.schema.dtypes()

    @property
    def width(self) -> int:
        return len(self.schema)

    def explain(self, *, optimized: bool = True, optimizations: Any = None, **kwargs: Any) -> str:
        from polars_tpu.plan.fmt import explain_plan
        from polars_tpu.plan.optimizer import optimize

        node = optimize(self._node, optimizations) if optimized else self._node
        return explain_plan(node)

    def show_graph(self, *, optimized: bool = True, raw_output: bool = True, **kwargs: Any) -> str:
        """Graphviz dot text of the (optimized) plan (reference:
        polars-lazy/src/dot.rs). Shared LCache subplans render once."""
        from polars_tpu.plan.fmt import plan_to_dot
        from polars_tpu.plan.optimizer import optimize

        node = optimize(self._node) if optimized else self._node
        return plan_to_dot(node)

    def __repr__(self) -> str:
        return f"<LazyFrame at 0x{id(self):X}>\n{self.explain(optimized=False)}"

    # -- execution ------------------------------------------------------------

    def collect(
        self,
        *,
        engine: str = "auto",
        no_optimization: bool = False,
        optimizations: Any = None,
        **kwargs: Any,
    ) -> DataFrame:
        """Materialize the plan. ``optimizations`` takes a
        :class:`polars_tpu.QueryOptFlags`; each optimizer pass consults its
        toggle (reference: py-polars lazyframe/opt_flags.py,
        LazyFrame.collect(optimizations=...))."""
        from polars_tpu.engine.run import execute_plan
        from polars_tpu.plan.optimizer import optimize

        from polars_tpu.engine.cancel import CancelToken, cancel_scope
        from polars_tpu.engine.run import plan_cache_scope

        token = kwargs.get("cancel_token")
        deadline = (
            CancelToken(timeout=float(kwargs["timeout"]))
            if kwargs.get("timeout") is not None
            else None
        )
        if no_optimization:
            node = self._node
        else:
            node = optimize(self._node, optimizations)
        if not isinstance(engine, str):
            # a GPUEngine config object routes to the default TPU engine
            engine = "auto"
        if engine == "auto":
            # memory router (SURVEY 2.12): over-budget plans stream + spill
            from polars_tpu.engine.memory_router import route

            if route(node) == "streaming":
                engine = "streaming"
        with cancel_scope(token), cancel_scope(deadline), plan_cache_scope():
            # common subplans (LCache) run once per collect
            if engine == "streaming":
                from polars_tpu.engine.streaming import collect_streaming

                return collect_streaming(
                    node,
                    batch_rows=kwargs.get("batch_rows"),
                    checkpoint_dir=kwargs.get("checkpoint_dir"),
                )
            if engine == "distributed":
                from polars_tpu.engine.distributed import collect_distributed

                return collect_distributed(node, mesh=kwargs.get("mesh"))
            if engine == "auto":
                # last line of defense when the router's footprint estimate
                # was wrong (SURVEY 2.12 spill): a device OOM falls back to
                # the streaming engine's batched + out-of-core path
                try:
                    return execute_plan(node)
                except Exception as exc:  # noqa: BLE001
                    msg = str(exc)
                    if ("RESOURCE_EXHAUSTED" not in msg
                            and "Out of memory" not in msg
                            and "out of memory" not in msg):
                        raise
                    import sys

                    print(
                        "[polars_tpu] in-memory collect hit device OOM; "
                        "retrying via the streaming engine",
                        file=sys.stderr,
                    )
                    from polars_tpu.engine.streaming import collect_streaming

                    return collect_streaming(
                        node, batch_rows=kwargs.get("batch_rows")
                    )
            return execute_plan(node)

    def execute(self) -> DataFrame:
        """Dispatch the plan ON DEVICE without any host readback; returns the
        device-resident result frame (row count = padded upper bound).

        On this platform the first device->host readback permanently switches
        the runtime into a slow synchronous dispatch mode, and before that
        flip there is NO working completion fence (``block_until_ready`` and
        ``is_ready`` return immediately — CLAUDE.md §1). ``execute()``
        therefore only *enqueues*; callers that need honest device timing
        chain executions and fence via probe readbacks
        (``utils/device_timer.DeviceTimeline``, as bench.py does). Fetch
        results with ``collect()`` when the session is done timing."""
        from polars_tpu.engine.run import execute_plan
        from polars_tpu.plan.optimizer import optimize

        return execute_plan(optimize(self._node), sync=False)

    def fetch(self, n_rows: int = 500, **kwargs: Any) -> DataFrame:
        return self.limit(n_rows).collect(**kwargs)

    def serialize(self, file: Any = None, *, format: str = "json") -> str | None:
        """Serialize the logical plan to a versioned JSON document
        (reference: dsl/serializable_plan.rs; py-polars LazyFrame.serialize).
        Plans containing python UDFs do not serialize."""
        from polars_tpu.plan.serialize import serialize_plan

        if format != "json":
            raise InvalidOperationError(f"unsupported plan format {format!r}")
        data = serialize_plan(self._node)
        if file is None:
            return data
        if hasattr(file, "write"):
            file.write(data)
        else:
            with open(file, "w") as f:
                f.write(data)
        return None

    @classmethod
    def deserialize(cls, source: Any, *, format: str = "json") -> "LazyFrame":
        """Inverse of :meth:`serialize` — versioned, rejects unknown versions."""
        from polars_tpu.plan.serialize import deserialize_plan

        if format != "json":
            raise InvalidOperationError(f"unsupported plan format {format!r}")
        if hasattr(source, "read"):
            data = source.read()
        elif isinstance(source, (str, bytes)) and not (
            isinstance(source, str) and source.lstrip().startswith("{")
        ):
            with open(source) as f:
                data = f.read()
        else:
            data = source
        return cls._from_node(deserialize_plan(data))

    def profile(self, **kwargs: Any):
        """Execute the plan recording REAL per-node wall times (reference:
        NodeTimer, polars-expr/src/state/node_timer.rs:19-40).

        Each executed plan node contributes a measured (start, end) span in
        microseconds relative to query start; end is taken after
        ``block_until_ready`` on the node's outputs, so device time lands on
        the node that launched it. Spans are inclusive of the node's inputs
        (pull-based recursion). Profiling synchronizes per node, so the total
        can exceed an unprofiled ``collect``.
        """
        import time

        from polars_tpu.engine.run import execute_plan, profiling_session
        from polars_tpu.plan.optimizer import optimize

        t0 = time.perf_counter()
        node = optimize(self._node)
        t_opt = time.perf_counter()
        with profiling_session() as sink:
            out = execute_plan(node)
        names = ["optimization"]
        starts = [0]
        ends = [int((t_opt - t0) * 1e6)]
        rows_out = [0]
        bytes_out = [0]
        for name, s, e, rows, nbytes in sorted(sink, key=lambda r: (r[1], r[2])):
            names.append(name)
            starts.append(int((s - t0) * 1e6))
            ends.append(int((e - t0) * 1e6))
            rows_out.append(rows)
            bytes_out.append(nbytes)
        timings = DataFrame({
            "node": names, "start": starts, "end": ends,
            "rows": rows_out, "bytes": bytes_out,
        })
        return out, timings

    def lazy(self) -> LazyFrame:
        return self

    def cache(self) -> LazyFrame:
        return self

    def clone(self) -> LazyFrame:
        return LazyFrame._from_node(self._node)

    def pipe(self, function, *args: Any, **kwargs: Any):
        return function(self, *args, **kwargs)

    def pipe_with_schema(self, function) -> LazyFrame:
        """Plan-stage pipe that receives the resolved schema (reference:
        LazyFrame.pipe_with_schema). Schema resolution is cheap and eager
        here, so the rewrite applies immediately."""
        return function(self, self.collect_schema())

    def gather(self, indices: Any) -> LazyFrame:
        import polars_tpu as pl

        idx = list(indices.to_list() if hasattr(indices, "to_list") else indices)
        return self.select(pl.all().gather(idx))

    def inspect(self, fmt: str = "{}") -> LazyFrame:
        def _show(df):
            print(fmt.format(df))
            return df

        return self.map_batches(_show)

    def show(self, limit: int = 5, **kwargs: Any) -> None:
        print(self.limit(limit).collect() if limit is not None else self.collect())

    def pivot(self, on: Any, *, index: Any = None, values: Any = None, aggregate_function: Any = None, maintain_order: bool = True, sort_columns: bool = False, separator: str = "_") -> LazyFrame:
        """Lazy pivot (reference: LazyFrame.pivot) — the spine collects
        eagerly at this node since output columns depend on the data."""
        return (
            self.collect()
            .pivot(
                on,
                index=index,
                values=values,
                aggregate_function=aggregate_function,
                maintain_order=maintain_order,
                sort_columns=sort_columns,
                separator=separator,
            )
            .lazy()
        )

    def remote(self, context: Any = None, **kwargs: Any):
        raise InvalidOperationError(
            "polars-cloud remote execution contexts are not available in this build"
        )

    def with_context(self, other: Any) -> LazyFrame:
        raise InvalidOperationError(
            "with_context is deprecated upstream and not supported here; "
            "use a join or pl.concat(..., how='horizontal') to combine frames"
        )

    def sink_batches(self, lambda_function: Any = None, *, chunk_size: int | None = None, maintain_order: bool = True, **kwargs: Any) -> None:
        """Stream the result into a callback batch-by-batch (reference:
        LazyFrame.sink_batches). Returning True from the callback stops early."""
        fn = lambda_function or kwargs.get("function")
        if fn is None:
            raise InvalidOperationError("sink_batches requires a callback")
        for batch in self.collect_batches(batch_rows=chunk_size):
            if fn(batch) is True:
                break

    def sink_delta(self, target: Any, *, mode: str = "error", **kwargs: Any) -> None:
        self.collect(engine="streaming").write_delta(target, mode=mode, **kwargs)

    def sink_iceberg(self, target: Any, *, mode: str = "append", **kwargs: Any) -> None:
        self.collect(engine="streaming").write_iceberg(target, mode=mode, **kwargs)

    # -- projections / mutations ------------------------------------------------

    def select(self, *exprs: Any, **named_exprs: Any) -> LazyFrame:
        nodes = tuple(parse_into_expr_list(list(exprs), named_exprs))
        if not nodes:
            # select() with no columns is an EMPTY frame (reference (0, 0))
            from polars_tpu.core.frame import DataFrame as _DF

            empty = _DF._from_columns([], 0)
            return self._wrap(L.LDataFrameScan(df=empty, ident=obj_token(empty)))
        return self._wrap(L.LSelect(self._node, nodes))

    def select_seq(self, *exprs: Any, **named_exprs: Any) -> LazyFrame:
        return self.select(*exprs, **named_exprs)

    def with_columns(self, *exprs: Any, **named_exprs: Any) -> LazyFrame:
        nodes = tuple(parse_into_expr_list(list(exprs), named_exprs))
        return self._wrap(L.LWithColumns(self._node, nodes))

    def with_columns_seq(self, *exprs: Any, **named_exprs: Any) -> LazyFrame:
        return self.with_columns(*exprs, **named_exprs)

    def with_column(self, expr: Any) -> LazyFrame:
        return self.with_columns(expr)

    def filter(self, *predicates: Any, **constraints: Any) -> LazyFrame:
        preds = list(predicates)
        nodes = parse_into_expr_list(preds)
        for name, value in constraints.items():
            nodes.append(E.EBinary(E.EColumn(name), "==", parse_into_expr(value, str_as_lit=True)))
        if not nodes:
            return self
        node = self._node
        pred = nodes[0]
        for p in nodes[1:]:
            pred = E.EBinary(pred, "&", p)
        return self._wrap(L.LFilter(node, pred))

    def remove(self, *predicates: Any, **constraints: Any) -> LazyFrame:
        from polars_tpu.functions.lazy import all_horizontal

        pred = all_horizontal(*predicates) if predicates else None
        for name, value in constraints.items():
            c = Expr(E.EBinary(E.EColumn(name), "==", parse_into_expr(value, str_as_lit=True)))
            pred = c if pred is None else (pred & c)
        if pred is None:
            return self
        return self.filter(~pred)

    def drop(self, *columns: Any, strict: bool = True) -> LazyFrame:
        from polars_tpu.core.frame import _flatten_names

        names = tuple(_flatten_names(columns))
        return self._wrap(L.LDrop(self._node, names, strict))

    def rename(self, mapping: Mapping[str, str] | Any, *, strict: bool = True) -> LazyFrame:
        if callable(mapping):
            mapping = {n: mapping(n) for n in self.columns}
        return self._wrap(L.LRename(self._node, tuple(mapping.items()), strict))

    def cast(self, dtypes: Any, *, strict: bool = True) -> LazyFrame:
        import polars_tpu as pl

        if isinstance(dtypes, Mapping):
            exprs = [pl.col(n).cast(d, strict=strict) for n, d in dtypes.items()]
            return self.with_columns(exprs)
        return self.select(pl.col("*").cast(dtypes, strict=strict))

    def with_row_index(self, name: str = "index", offset: int = 0) -> LazyFrame:
        return self._wrap(L.LWithRowIndex(self._node, name, offset))

    def with_row_count(self, name: str = "row_nr", offset: int = 0) -> LazyFrame:
        return self.with_row_index(name, offset)

    def reverse(self) -> LazyFrame:
        import polars_tpu as pl

        n = "__rev_idx"
        return (
            self.with_row_index(n)
            .sort(n, descending=True)
            .drop(n)
        )

    def fill_null(self, value: Any = None, strategy: str | None = None, limit: int | None = None, *, matches_supertype: bool = True) -> LazyFrame:
        import polars_tpu as pl

        return self.with_columns(pl.col("*").fill_null(value, strategy, limit))

    def fill_nan(self, value: Any) -> LazyFrame:
        import polars_tpu as pl
        from polars_tpu import datatypes as dtt

        return self.with_columns(pl.col(dtt.Float64, dtt.Float32).fill_nan(value))

    def drop_nulls(self, subset: Any = None) -> LazyFrame:
        import polars_tpu as pl

        if subset is None:
            pred = pl.all_horizontal(pl.col("*").is_not_null())
        else:
            from polars_tpu.core.frame import _flatten_names

            names = _flatten_names(subset if isinstance(subset, (list, tuple)) else [subset])
            pred = pl.all_horizontal(*[pl.col(n).is_not_null() for n in names])
        return self.filter(pred)

    def drop_nans(self, subset: Any = None) -> LazyFrame:
        import polars_tpu as pl
        from polars_tpu import datatypes as dtt

        if subset is None:
            pred = pl.all_horizontal(pl.col(dtt.Float64, dtt.Float32).is_not_nan())
        else:
            from polars_tpu.core.frame import _flatten_names

            names = _flatten_names(subset if isinstance(subset, (list, tuple)) else [subset])
            pred = pl.all_horizontal(*[pl.col(n).is_not_nan() for n in names])
        return self.filter(pred)

    # -- slicing ------------------------------------------------------------------

    def slice(self, offset: int, length: int | None = None) -> LazyFrame:
        return self._wrap(L.LSlice(self._node, offset, length))

    def head(self, n: int = 5) -> LazyFrame:
        return self.slice(0, n)

    def tail(self, n: int = 5) -> LazyFrame:
        return self.slice(-n, n)

    def limit(self, n: int = 5) -> LazyFrame:
        return self.head(n)

    def first(self) -> LazyFrame:
        return self.head(1)

    def last(self) -> LazyFrame:
        return self.tail(1)

    def gather_every(self, n: int, offset: int = 0) -> LazyFrame:
        import polars_tpu as pl

        idx = "__ge_idx"
        return (
            self.with_row_index(idx)
            .filter(((pl.col(idx).cast(dt.Int64()) - offset) % n == 0) & (pl.col(idx) >= offset))
            .drop(idx)
        )

    # -- sorting -----------------------------------------------------------------

    def sort(
        self,
        by: Any,
        *more_by: Any,
        descending: bool | Sequence[bool] = False,
        nulls_last: bool | Sequence[bool] = False,
        maintain_order: bool = False,
        multithreaded: bool = True,
    ) -> LazyFrame:
        by_nodes = tuple(parse_into_expr_list([by, *more_by]))
        k = len(by_nodes)
        desc = tuple(descending) if isinstance(descending, (list, tuple)) else (descending,) * k
        nl = tuple(nulls_last) if isinstance(nulls_last, (list, tuple)) else (nulls_last,) * k
        return self._wrap(L.LSort(self._node, by_nodes, desc, nl, maintain_order))

    def top_k(self, k: int, *, by: Any, reverse: Any = False) -> LazyFrame:
        by_nodes = tuple(parse_into_expr_list([by]))
        rev = tuple(reverse) if isinstance(reverse, (list, tuple)) else (reverse,) * len(by_nodes)
        desc = tuple(not r for r in rev)
        return self._wrap(
            L.LSort(self._node, by_nodes, desc, (True,) * len(by_nodes), False, k)
        )

    def bottom_k(self, k: int, *, by: Any, reverse: Any = False) -> LazyFrame:
        by_nodes = tuple(parse_into_expr_list([by]))
        rev = tuple(reverse) if isinstance(reverse, (list, tuple)) else (reverse,) * len(by_nodes)
        return self._wrap(
            L.LSort(self._node, by_nodes, rev, (True,) * len(by_nodes), False, k)
        )

    # -- distinct ------------------------------------------------------------------

    def unique(
        self,
        subset: Any = None,
        *,
        keep: str = "any",
        maintain_order: bool = False,
    ) -> LazyFrame:
        names = None
        if subset is not None:
            from polars_tpu.core.frame import _flatten_names

            names = tuple(_flatten_names(subset if isinstance(subset, (list, tuple)) else [subset]))
        return self._wrap(L.LDistinct(self._node, names, keep, maintain_order))


    # -- py-polars parity batch (round 1) -------------------------------------

    def clear(self, n: int = 0) -> LazyFrame:
        from polars_tpu.core.frame import DataFrame

        schema = self.collect_schema()
        if n:
            return DataFrame({name: [None] * n for name in schema.names()}).cast(
                dict(schema.items())
            ).lazy()
        return DataFrame(schema=dict(schema.items())).lazy()

    def shift(self, n: int = 1, *, fill_value: Any = None) -> LazyFrame:
        import polars_tpu as pl

        return self.select(pl.all().shift(n, fill_value=fill_value))

    def interpolate(self) -> LazyFrame:
        import polars_tpu as pl

        return self.select(pl.all().interpolate())

    def approx_n_unique(self) -> LazyFrame:
        import polars_tpu as pl

        return self.select(pl.all().n_unique())

    def set_sorted(self, column: Any, *more: Any, descending: bool = False) -> LazyFrame:
        return self

    def collect_batches(
        self,
        *,
        batch_rows: int | None = None,
        optimizations: Any = None,
        **kwargs: Any,
    ):
        """Iterator over the query result as DataFrame batches (reference:
        LazyFrame::collect_batches, crates/polars-lazy/src/frame/mod.rs ~746).
        Per-batch-safe plans stream with bounded memory; blocking terminals
        stream the scan side then re-chunk the result."""
        from polars_tpu.engine.run import plan_cache_scope
        from polars_tpu.engine.streaming import stream_batches
        from polars_tpu.plan.optimizer import optimize

        node = optimize(self._node, optimizations)

        def gen():
            with plan_cache_scope():
                yield from stream_batches(node, batch_rows=batch_rows)

        return gen()

    def collect_async(self, **kwargs: Any) -> "InProcessQuery":
        """Start the collect on a background thread; returns a cancelable
        :class:`InProcessQuery` (reference: py-polars
        lazyframe/in_process.py:24-26 + collect_concurrently)."""
        return InProcessQuery(self, kwargs)

    def describe(self, percentiles=(0.25, 0.5, 0.75)):
        return self.collect().describe(percentiles)

    def match_to_schema(
        self,
        schema: Any,
        *,
        missing_columns: Any = "raise",
        extra_columns: str = "raise",
        integer_cast: str = "forbid",
        float_cast: str = "forbid",
        **_unstable: Any,
    ) -> LazyFrame:
        """Match/evolve to a target schema with per-column coercion rules
        (reference: py-polars frame.py match_to_schema)."""
        import polars_tpu as pl
        from polars_tpu.errors import SchemaError

        target = dict(schema.items()) if hasattr(schema, "items") else dict(schema)
        target = {k: dt.parse_into_dtype(v) for k, v in target.items()}
        cur = self.collect_schema()
        extra = [n for n in cur.names() if n not in target]
        if extra and extra_columns == "raise":
            raise SchemaError(
                "extra columns in `match_to_schema`: " + ", ".join(map(repr, extra))
            )

        def _policy(rules, name, default):
            if isinstance(rules, str):
                return rules
            return rules.get(name, default)

        exprs = []
        for name, d in target.items():
            if name in cur.names():
                have = cur[name]
                if have == d:
                    exprs.append(pl.col(name))
                    continue
                pol_i = _policy(integer_cast, name, "forbid")
                pol_f = _policy(float_cast, name, "forbid")
                ok_int = have.is_integer() and d.is_integer() and pol_i == "upcast"
                ok_float = have.is_float() and d.is_float() and pol_f == "upcast"
                if not (ok_int or ok_float):
                    raise SchemaError(
                        f"type mismatch for column {name!r} in `match_to_schema`: "
                        f"expected `{d!r}`, got `{have!r}`"
                    )
                exprs.append(pl.col(name).cast(d))
                continue
            pol = _policy(missing_columns, name, "raise")
            if pol == "insert":
                exprs.append(pl.lit(None, dtype=d).alias(name))
            elif isinstance(pol, pl.Expr):
                exprs.append(pol.cast(d).alias(name))
            else:
                raise SchemaError(f"missing columns in `match_to_schema`: {name!r}")
        return self.select(exprs)

    def sql(self, query: str, *, table_name: str = "self") -> LazyFrame:
        from polars_tpu.sql.context import SQLContext

        ctx = SQLContext(frames={table_name: self})
        out = ctx.execute(query, eager=False)
        return out

    # -- group by -------------------------------------------------------------------

    def group_by(self, *by: Any, maintain_order: bool = False, **named_by: Any) -> LazyGroupBy:
        keys = tuple(parse_into_expr_list(list(by), named_by))
        return LazyGroupBy(self, keys, maintain_order)

    def group_by_dynamic(
        self,
        index_column: Any,
        *,
        every: str,
        period: str | None = None,
        offset: str | None = None,
        include_boundaries: bool = False,
        closed: str = "left",
        label: str = "left",
        group_by: Any = None,
        start_by: str = "window",
    ) -> LazyGroupByDynamic:
        """Temporal/integer window group-by (reference: polars-time
        group_by_dynamic). Desugars into window-start arithmetic + the fused
        group_by engine; overlapping windows (period > every) replicate rows
        into ceil(period/every) shifted frames (static fan-out, jit-friendly)."""
        idx = parse_into_expr(index_column)
        name = E.output_name(idx)
        if not name:
            raise InvalidOperationError("group_by_dynamic needs a named index column")
        gb = tuple(parse_into_expr_list(list(group_by) if isinstance(group_by, (list, tuple)) else [group_by])) if group_by is not None else ()
        return LazyGroupByDynamic(
            self, name, every, period, offset, include_boundaries, closed, label, gb, start_by
        )

    def rolling(
        self,
        index_column: Any,
        *,
        period: str,
        offset: str | None = None,
        closed: str = "right",
        group_by: Any = None,
    ) -> LazyRolling:
        """Per-row time-window group-by (reference: polars-time rolling).

        Windows are (t+offset, t+offset+period] per row (closed='right'
        default); aggregation happens via searchsorted bounds + prefix sums in
        one traced program — see engine/rolling.py."""
        idx = parse_into_expr(index_column)
        name = E.output_name(idx)
        if not name:
            raise InvalidOperationError("rolling needs a named index column")
        gb = list(group_by) if isinstance(group_by, (list, tuple)) else ([group_by] if group_by is not None else [])
        gb_names = [g if isinstance(g, str) else E.output_name(parse_into_expr(g)) for g in gb]
        return LazyRolling(self, name, period, offset, closed, gb_names)

    # -- joins ----------------------------------------------------------------------

    def join(
        self,
        other: LazyFrame,
        on: Any = None,
        how: str = "inner",
        *,
        left_on: Any = None,
        right_on: Any = None,
        suffix: str = "_right",
        validate: str = "m:m",
        nulls_equal: bool = False,
        coalesce: bool | None = None,
        maintain_order: str | None = None,
        allow_parallel: bool = True,
        force_parallel: bool = False,
        join_nulls: bool | None = None,
    ) -> LazyFrame:
        if join_nulls is not None:
            nulls_equal = join_nulls
        if how == "cross":
            lo = ro = ()
        else:
            if on is not None:
                lo = ro = tuple(parse_into_expr_list([on]))
            elif left_on is not None and right_on is not None:
                lo = tuple(parse_into_expr_list([left_on]))
                ro = tuple(parse_into_expr_list([right_on]))
            else:
                raise InvalidOperationError("join requires `on` or `left_on`+`right_on`")
        if how == "outer":
            how = "full"
        return self._wrap(
            L.LJoin(
                self._node, other._node, lo, ro, how, suffix, nulls_equal,
                coalesce, maintain_order or "none", validate,
            )
        )

    def join_where(self, other: LazyFrame, *predicates: Any, suffix: str = "_right") -> LazyFrame:
        preds = tuple(parse_into_expr_list(list(predicates)))
        return self._wrap(L.LJoinWhere(self._node, other._node, preds, suffix))

    def join_asof(
        self,
        other: LazyFrame,
        *,
        on: Any = None,
        left_on: Any = None,
        right_on: Any = None,
        by: Any = None,
        by_left: Any = None,
        by_right: Any = None,
        strategy: str = "backward",
        tolerance: Any = None,
        suffix: str = "_right",
        **kwargs: Any,
    ) -> LazyFrame:
        lo = parse_into_expr(on if on is not None else left_on)
        ro = parse_into_expr(on if on is not None else right_on)
        bl = tuple(parse_into_expr_list([by if by is not None else by_left])) if (by or by_left) else ()
        br = tuple(parse_into_expr_list([by if by is not None else by_right])) if (by or by_right) else ()
        return self._wrap(
            L.LAsofJoin(self._node, other._node, lo, ro, bl, br, strategy, tolerance, suffix)
        )

    # -- reshape ---------------------------------------------------------------------

    def unnest(self, columns: Any, *more: Any) -> LazyFrame:
        lf = self

        def apply(df):
            return df.unnest(columns, *more)

        return LazyFrame._from_node(
            L.LDataFrameScan(df=apply(lf.collect()), ident=obj_token(apply))
        ) if False else lf._wrap_eager_unnest(columns, *more)

    def _wrap_eager_unnest(self, columns: Any, *more: Any) -> LazyFrame:
        df = self.collect().unnest(columns, *more)
        return df.lazy()

    def explode(self, columns: Any, *more_columns: Any) -> LazyFrame:
        from polars_tpu.core.frame import _flatten_names

        names = tuple(_flatten_names((columns, *more_columns)))
        return self._wrap(L.LExplode(self._node, names))

    def unpivot(
        self,
        on: Any = None,
        *,
        index: Any = None,
        variable_name: str = "variable",
        value_name: str = "value",
    ) -> LazyFrame:
        from polars_tpu.core.frame import _flatten_names

        on_t = tuple(_flatten_names(on if isinstance(on, (list, tuple)) else [on])) if on is not None else None
        idx_t = tuple(_flatten_names(index if isinstance(index, (list, tuple)) else [index])) if index is not None else ()
        return self._wrap(L.LUnpivot(self._node, on_t, idx_t, variable_name, value_name))

    def melt(self, id_vars: Any = None, value_vars: Any = None, variable_name: str = "variable", value_name: str = "value") -> LazyFrame:
        return self.unpivot(value_vars, index=id_vars or (), variable_name=variable_name, value_name=value_name)

    def update(
        self,
        other: LazyFrame,
        on: Any = None,
        how: str = "left",
        *,
        left_on: Any = None,
        right_on: Any = None,
        include_nulls: bool = False,
    ) -> LazyFrame:
        """Overwrite matching rows' values with ``other``'s (reference:
        py-polars frame.update)."""
        import polars_tpu as pl

        if on is None and left_on is None:
            on = [c for c in self.columns if c in set(other.columns)][:1]
        on_names = on if isinstance(on, list) else [on]
        upd_cols = [c for c in other.columns if c not in set(on_names)]
        marked = other.with_columns(pl.lit(True).alias("__upd_matched"))
        joined = self.join(marked, on=on, how=how, suffix="__upd")
        matched = pl.col("__upd_matched").fill_null(False)
        exprs = []
        for c in upd_cols:
            u = pl.col(c + "__upd")
            if include_nulls:
                exprs.append(pl.when(matched).then(u).otherwise(pl.col(c)).alias(c))
            else:
                exprs.append(
                    pl.when(matched & u.is_not_null()).then(u).otherwise(pl.col(c)).alias(c)
                )
        return joined.with_columns(exprs).drop(
            ["__upd_matched"] + [c + "__upd" for c in upd_cols]
        )

    def merge_sorted(self, other: LazyFrame, key: str) -> LazyFrame:
        """Merge two sorted frames preserving order on ``key`` (reference:
        polars-ops merge_sorted.rs — implemented as union + stable sort)."""
        import polars_tpu as pl

        return LazyFrame._concat([self, other]).sort(key, maintain_order=True)

    def map_batches(self, function, *, schema: Any = None, streamable: bool = False, validate_output_schema: bool = True, **kwargs: Any) -> LazyFrame:
        return self._wrap(
            L.LMapFunction(self._node, function=function, ident=obj_token(function))
        )

    # -- frame-level aggregation shortcuts ----------------------------------------------

    def _agg_all(self, method: str, **kwargs: Any) -> LazyFrame:
        import polars_tpu as pl

        schema = self.schema
        exprs = []
        for n, d in schema.items():
            e = pl.col(n)
            exprs.append(getattr(e, method)(**kwargs))
        return self.select(exprs)

    def sum(self) -> LazyFrame:
        return self._agg_all("sum")

    def mean(self) -> LazyFrame:
        return self._agg_all("mean")

    def min(self) -> LazyFrame:
        return self._agg_all("min")

    def max(self) -> LazyFrame:
        return self._agg_all("max")

    def median(self) -> LazyFrame:
        return self._agg_all("median")

    def std(self, ddof: int = 1) -> LazyFrame:
        return self._agg_all("std", ddof=ddof)

    def var(self, ddof: int = 1) -> LazyFrame:
        return self._agg_all("var", ddof=ddof)

    def quantile(self, quantile: float, interpolation: str = "nearest") -> LazyFrame:
        return self._agg_all("quantile", quantile=quantile, interpolation=interpolation)

    def count(self) -> LazyFrame:
        return self._agg_all("count")

    def null_count(self) -> LazyFrame:
        return self._agg_all("null_count")

    # -- sinks -------------------------------------------------------------------------

    def _sink(self, path: Any, fmt: str, kwargs: dict) -> None:
        """Streaming sink (reference: polars-stream io_sinks/mod.rs:27-49):
        the plan streams batch-by-batch into an incremental per-format
        writer — a larger-than-memory chain sunk to disk never materializes
        the full result. PartitionBy composes (per-partition rolling
        writers)."""
        from polars_tpu.io.partition import PartitionBy
        from polars_tpu.io.sink_stream import sink_stream
        from polars_tpu.plan.optimizer import optimize

        kwargs = dict(kwargs)
        batch_rows = kwargs.pop("batch_rows", None)
        optimizations = kwargs.pop("optimizations", None)
        pb = None
        if isinstance(path, PartitionBy):
            pb = path
            path = path.base_path
        node = optimize(self._node, optimizations)
        sink_stream(node, str(path), fmt, kwargs, partition_by=pb, batch_rows=batch_rows)

    def sink_parquet(self, path: Any, **kwargs: Any) -> None:
        self._sink(path, "parquet", kwargs)

    def sink_csv(self, path: Any, **kwargs: Any) -> None:
        self._sink(path, "csv", kwargs)

    def sink_ipc(self, path: Any, **kwargs: Any) -> None:
        self._sink(path, "ipc", kwargs)

    def sink_ndjson(self, path: Any, **kwargs: Any) -> None:
        self._sink(path, "ndjson", kwargs)

    # -- concat helper -------------------------------------------------------------------

    @staticmethod
    def _concat(frames: list[LazyFrame], how: str = "vertical") -> LazyFrame:
        if how.startswith("vertical") or how.startswith("diagonal"):
            return LazyFrame._from_node(L.LUnion(tuple(f._node for f in frames)))
        if how == "horizontal":
            return LazyFrame._from_node(L.LHConcat(tuple(f._node for f in frames)))
        raise InvalidOperationError(f"concat strategy {how!r}")


class LazyGroupBy:
    __slots__ = ("_lf", "_keys", "_maintain_order")

    def __init__(self, lf: LazyFrame, keys: tuple[E.ENode, ...], maintain_order: bool) -> None:
        self._lf = lf
        self._keys = keys
        self._maintain_order = maintain_order

    def agg(self, *aggs: Any, **named_aggs: Any) -> LazyFrame:
        nodes = tuple(parse_into_expr_list(list(aggs), named_aggs))
        return self._lf._wrap(
            L.LGroupBy(self._lf._node, self._keys, nodes, self._maintain_order)
        )

    def _agg_all(self, method: str, **kwargs: Any) -> LazyFrame:
        import polars_tpu as pl

        schema = self._lf.schema
        key_names = set()
        for k in self._keys:
            n = E.output_name(k)
            if n:
                key_names.add(n)
        exprs = [
            getattr(pl.col(n), method)(**kwargs)
            for n in schema.names()
            if n not in key_names
        ]
        return self.agg(exprs)

    def sum(self) -> LazyFrame:
        return self._agg_all("sum")

    def mean(self) -> LazyFrame:
        return self._agg_all("mean")

    def min(self) -> LazyFrame:
        return self._agg_all("min")

    def max(self) -> LazyFrame:
        return self._agg_all("max")

    def median(self) -> LazyFrame:
        return self._agg_all("median")

    def first(self) -> LazyFrame:
        return self._agg_all("first")

    def last(self) -> LazyFrame:
        return self._agg_all("last")

    def n_unique(self) -> LazyFrame:
        return self._agg_all("n_unique")

    def quantile(self, quantile: float, interpolation: str = "nearest") -> LazyFrame:
        return self._agg_all("quantile", quantile=quantile, interpolation=interpolation)

    def count(self) -> LazyFrame:
        import polars_tpu as pl

        return self.agg(pl.len().alias("count"))

    def len(self, name: str = "len") -> LazyFrame:
        import polars_tpu as pl

        return self.agg(pl.len().alias(name))

    def head(self, n: int = 5) -> LazyFrame:
        import polars_tpu as pl

        pos = pl.lit(True).cum_count().over([Expr(k) for k in self._keys])
        return self._lf.filter(pos <= n)

    def tail(self, n: int = 5) -> LazyFrame:
        import polars_tpu as pl

        keys = [Expr(k) for k in self._keys]
        pos = pl.lit(True).cum_count(reverse=True).over(keys)
        return self._lf.filter(pos <= n)

    def all(self) -> LazyFrame:
        raise NotImplementedError("group_by().all() requires List dtype")

class LazyGroupByDynamic:
    """Builder returned by LazyFrame.group_by_dynamic (polars-time analogue)."""

    __slots__ = (
        "_lf", "_index", "_every", "_period", "_offset",
        "_boundaries", "_closed", "_label", "_group_by", "_start_by",
    )

    def __init__(self, lf, index, every, period, offset, boundaries, closed, label, group_by, start_by):
        self._lf = lf
        self._index = index
        self._every = every
        self._period = period
        self._offset = offset
        self._boundaries = boundaries
        self._closed = closed
        self._label = label
        self._group_by = group_by
        self._start_by = start_by

    @staticmethod
    def _ticks(interval: str, idx_dtype) -> int:
        """Interval -> integer ticks in the index column's own unit."""
        import re as _re

        total = 0
        pos = 0
        for m in _re.finditer(r"(\d+)(ns|us|ms|s|mo|m|h|d|w|q|y|i)", interval):
            if m.start() != pos:
                raise InvalidOperationError(f"unsupported interval {interval!r}")
            pos = m.end()
            n, unit = int(m.group(1)), m.group(2)
            if unit == "i":
                total += n
                continue
            if unit in ("mo", "q", "y"):
                raise InvalidOperationError("calendar intervals handled separately")
            us = {"ns": 1e-3, "us": 1, "ms": 1_000, "s": 1_000_000, "m": 60_000_000,
                  "h": 3_600_000_000, "d": 86_400_000_000, "w": 604_800_000_000}[unit]
            tn = type(idx_dtype).__name__
            if tn == "Date":
                if us % 86_400_000_000:
                    raise InvalidOperationError(f"sub-day interval {interval!r} on Date index")
                total += n * int(us // 86_400_000_000)
            elif tn == "Datetime":
                per_us = {"ms": 1e-3, "us": 1, "ns": 1e3}[idx_dtype.time_unit]
                total += int(n * us * per_us)
            elif tn == "Time":
                total += int(n * us * 1e3)
            else:
                raise InvalidOperationError(f"interval {interval!r} on integer index needs 'i' units")
        if pos != len(interval) or total <= 0:
            raise InvalidOperationError(f"unsupported interval {interval!r}")
        return total

    def agg(self, *aggs: Any, **named_aggs: Any) -> LazyFrame:
        import math

        import polars_tpu as pl

        agg_nodes = list(parse_into_expr_list(list(aggs), named_aggs))
        name = self._index
        schema = self._lf.schema
        idx_dtype = schema[name]
        tn = type(idx_dtype).__name__
        gb = list(self._group_by)
        gb_names = [E.output_name(k) for k in gb]
        every = self._every

        import re as _re
        calendar = bool(_re.search(r"\d+(mo|q|y)", every))
        ws_name = "__dyn_ws"
        if calendar:
            if self._period not in (None, every) or self._offset or self._start_by != "window" or self._closed != "left":
                raise InvalidOperationError(
                    "calendar intervals support only tumbling left-closed windows from the epoch grid"
                )
            ws = pl.col(name).dt.truncate(every)
            lf = self._lf.with_columns(ws.alias(ws_name))
            upper = pl.col(ws_name).dt.offset_by(every)
        else:
            ev = self._ticks(every, idx_dtype)
            per = self._ticks(self._period, idx_dtype) if self._period else ev
            t = pl.col(name).cast(dt.Int64())
            if self._start_by == "datapoint":
                off = t.min()
            elif self._offset:
                neg = self._offset.startswith("-")
                off = pl.lit(
                    (-1 if neg else 1) * self._ticks(self._offset.lstrip("-"), idx_dtype),
                    dtype=dt.Int64(),
                )
            else:
                off = pl.lit(0, dtype=dt.Int64())
            shifted = t - off
            min_shift = t.min() - off
            if self._closed == "right":
                base = ((shifted - 1) // ev) * ev
                first_ws = ((min_shift - 1) // ev) * ev
                in_win = lambda ws_e: (shifted > ws_e) & (shifted <= ws_e + per)  # noqa: E731
            else:
                base = (shifted // ev) * ev
                first_ws = (min_shift // ev) * ev
                in_win = lambda ws_e: (shifted >= ws_e) & (shifted < ws_e + per)  # noqa: E731
            k = max(1, math.ceil(per / ev))
            frames = []
            for r in range(k):
                ws_e = base - r * ev
                fr = self._lf.with_columns((ws_e + off).cast(dt.Int64()).alias(ws_name))
                if not (r == 0 and per == ev):
                    # polars emits no window earlier than the first datapoint's
                    # grid slot (reference: polars-time group_by_windows)
                    fr = fr.filter(in_win(ws_e) & (ws_e >= first_ws))
                frames.append(fr)
            if len(frames) == 1:
                lf = frames[0]
            else:
                from polars_tpu.functions.eager import concat

                lf = concat(frames, how="vertical")
            upper = (pl.col(ws_name) + per).cast(idx_dtype)

        grouped = lf.group_by(*gb_names, pl.col(ws_name), maintain_order=False)
        full_aggs = list(agg_nodes)
        if self._label == "datapoint":
            full_aggs.insert(0, pl.col(name).first().alias("__dyn_label"))
        agged = grouped.agg(*full_aggs)
        out = agged.sort([*gb_names, ws_name])

        ws_col = pl.col(ws_name) if calendar else pl.col(ws_name).cast(idx_dtype)
        posts = []
        if self._label == "left":
            posts.append(ws_col.alias(name))
        elif self._label == "right":
            if calendar:
                posts.append(pl.col(ws_name).dt.offset_by(every).alias(name))
            else:
                posts.append((pl.col(ws_name) + ev).cast(idx_dtype).alias(name))
        elif self._label == "datapoint":
            posts.append(pl.col("__dyn_label").alias(name))
        if self._boundaries:
            posts.append(ws_col.alias("_lower_boundary"))
            posts.append(upper.alias("_upper_boundary"))
        out = out.with_columns(posts)
        order = [*gb_names]
        if self._boundaries:
            order += ["_lower_boundary", "_upper_boundary"]
        order.append(name)
        order += [n for n in out.collect_schema().names() if n not in (*order, ws_name, "__dyn_label")]
        return out.select(order)

class LazyRolling:
    """Builder for LazyFrame.rolling — supports simple column aggregations
    (sum/mean/count/len/min/max/first/last/var/std)."""

    __slots__ = ("_lf", "_index", "_period", "_offset", "_closed", "_gb")

    def __init__(self, lf, index, period, offset, closed, gb):
        self._lf = lf
        self._index = index
        self._period = period
        self._offset = offset
        self._closed = closed
        self._gb = gb

    def agg(self, *aggs: Any, **named_aggs: Any) -> LazyFrame:
        from polars_tpu.engine.rolling import rolling_frames

        nodes = parse_into_expr_list(list(aggs), named_aggs)
        df = self._lf.collect()
        schema = df.schema
        ticks = LazyGroupByDynamic._ticks
        idx_dt = schema[self._index]
        per = ticks(self._period, idx_dt)
        if self._offset is None:
            off = -per
        else:
            o = self._offset
            off = (-1 if o.startswith("-") else 1) * ticks(o.lstrip("-"), idx_dt)
        specs = []
        for node in nodes:
            out_name = E.output_name(node)
            inner = node
            while isinstance(inner, E.EAlias):
                inner = inner.input
            if isinstance(inner, E.EAgg) and isinstance(inner.input, E.EColumn):
                src, kind = inner.input.name, inner.kind
            elif isinstance(inner, E.ELen) or (
                isinstance(inner, E.EFunction) and inner.name == "len"
            ):
                src, kind = self._index, "len"
                if not out_name:
                    out_name = "len"
            else:
                raise InvalidOperationError(
                    "rolling().agg supports simple column aggregations "
                    "(sum/mean/count/len/min/max/first/last/var/std)"
                )
            if kind in ("count", "len"):
                out_dt = dt.UInt32()
            elif kind in ("first", "last", "min", "max"):
                out_dt = schema[src]
            elif kind == "sum":
                # reference agg dtype rule (small ints widen to 64-bit);
                # resolved by the schema resolver for consistency
                from polars_tpu.plan.schema_resolve import expr_dtype as _edt

                out_dt = _edt(E.EAgg(E.EColumn(src), "sum", ()), schema)
            else:
                out_dt = dt.Float64()
            specs.append((src, kind, out_name, out_dt))
        out = rolling_frames(df, self._index, per, off, self._closed, self._gb, specs)
        return out.lazy()

def pl_empty(d):
    return []



class InProcessQuery:
    """A collect running on a background thread, cancelable mid-query
    (reference: py-polars lazyframe/in_process.py InProcessQuery — cancel /
    fetch / fetch_blocking; cancellation is cooperative through the engine's
    CancelToken checked at every materialization barrier)."""

    def __init__(self, lf: "LazyFrame", kwargs: dict) -> None:
        import threading

        from polars_tpu.engine.cancel import CancelToken

        self._token = kwargs.pop("cancel_token", None) or CancelToken()
        self._result: DataFrame | None = None
        self._error: BaseException | None = None
        self._done = threading.Event()

        def run() -> None:
            try:
                self._result = lf.collect(cancel_token=self._token, **kwargs)
            except BaseException as e:  # noqa: BLE001 — surfaced on fetch
                self._error = e
            finally:
                self._done.set()

        self._thread = threading.Thread(
            target=run, name="polars-tpu-collect", daemon=True
        )
        self._thread.start()

    def cancel(self) -> None:
        self._token.cancel()

    def fetch(self) -> DataFrame | None:
        """Non-blocking: the result if the query finished, else None."""
        if not self._done.is_set():
            return None
        if self._error is not None:
            raise self._error
        return self._result

    def fetch_blocking(self) -> DataFrame:
        self._done.wait()
        if self._error is not None:
            raise self._error
        return self._result

    # Future-style aliases (round-2 collect_async returned .result())
    def result(self, timeout: float | None = None) -> DataFrame:
        self._done.wait(timeout)
        if not self._done.is_set():
            raise TimeoutError("query still running")
        if self._error is not None:
            raise self._error
        return self._result
