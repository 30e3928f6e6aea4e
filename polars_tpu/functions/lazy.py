"""Lazy top-level functions (reference: py-polars functions/lazy.py)."""

from __future__ import annotations

import datetime as _pydt
from typing import Any, Iterable

from polars_tpu import datatypes as dt
from polars_tpu.expr.expr import Expr, parse_into_expr, parse_into_expr_list
from polars_tpu.plan import exprs as E
from polars_tpu.utils.tokens import obj_token

# module-level len()/all()/any()/... shadow the builtins below
_len, _all, _any = len, all, any


def col(name: Any, *more_names: Any) -> Expr:
    """Column reference(s); supports wildcard "*" and dtype selection."""
    names: list[Any] = [name, *more_names]
    if _len(names) == 1:
        n = names[0]
        if isinstance(n, str):
            if n == "*":
                return Expr(E.EColumns(()))
            return Expr(E.EColumn(n))
        if isinstance(n, (dt.DataType, dt.DataTypeClass)):
            return Expr(E.EDtypeColumns((dt.parse_into_dtype(n),)))
        if isinstance(n, Iterable):
            names = list(n)
    if _all(isinstance(n, str) for n in names):
        return Expr(E.EColumns(tuple(names)))
    if _all(isinstance(n, (dt.DataType, dt.DataTypeClass)) for n in names):
        return Expr(E.EDtypeColumns(tuple(dt.parse_into_dtype(n) for n in names)))
    raise TypeError("col() accepts strings or datatypes, not a mix")


def nth(*indices: int) -> Expr:
    return Expr(E.ESelector("nth", tuple(indices)))


def lit(value: Any, dtype: Any = None, *, allow_object: bool = False) -> Expr:
    from polars_tpu.core.series import Series

    if isinstance(value, Series):
        node = E.ESeriesLit(column=value._column, ident=obj_token(value._column))
        if dtype is not None:
            return Expr(E.ECast(node, dt.parse_into_dtype(dtype), True))
        return Expr(node)
    if isinstance(value, Expr):
        return value
    if isinstance(value, _pydt.datetime) and dtype is None:
        return Expr(E.ELiteral(value.isoformat(), dt.Datetime("us")))
    if isinstance(value, _pydt.date) and not isinstance(value, _pydt.datetime) and dtype is None:
        return Expr(E.ELiteral(value.isoformat(), dt.Date()))
    if isinstance(value, _pydt.timedelta) and dtype is None:
        us = round(value.total_seconds() * 1_000_000)
        return Expr(E.ELiteral(us, dt.Duration("us")))
    if isinstance(value, (list, tuple)):
        s = Series("literal", list(value))
        return Expr(E.ESeriesLit(column=s._column, ident=obj_token(s._column)))
    import numpy as np

    if isinstance(value, np.ndarray):
        s = Series("literal", value)
        return Expr(E.ESeriesLit(column=s._column, ident=obj_token(s._column)))
    if isinstance(value, np.generic):
        value = value.item()
        if dtype is None:
            dtype = dt.numpy_to_dtype(np.asarray(value).dtype)
    if isinstance(value, _pydt.date) and dtype is not None:
        value = value.isoformat()
    return Expr(E.ELiteral(value, dt.parse_into_dtype(dtype) if dtype is not None else None))


def len() -> Expr:  # noqa: A001
    return Expr(E.ELen())


def count(*columns: str) -> Expr:
    if not columns:
        return Expr(E.ELen()).alias("count")
    return col(*columns).count()


def element() -> Expr:
    return Expr(E.EColumn(""))


# -- column-wise shortcuts ----------------------------------------------------


def all(*names: str, ignore_nulls: bool = True) -> Expr:  # noqa: A001
    if not names:
        return Expr(E.EColumns(()))
    return col(*names).all(ignore_nulls=ignore_nulls)


def any(*names: str, ignore_nulls: bool = True) -> Expr:  # noqa: A001
    return col(*names).any(ignore_nulls=ignore_nulls)


def exclude(*names: str) -> Expr:
    return Expr(E.EColumns(())).exclude(*names)


def sum(*names: Any) -> Expr:  # noqa: A001
    return col(*names).sum()


def min(*names: Any) -> Expr:  # noqa: A001
    return col(*names).min()


def max(*names: Any) -> Expr:  # noqa: A001
    return col(*names).max()


def mean(*names: Any) -> Expr:
    return col(*names).mean()


def median(*names: Any) -> Expr:
    return col(*names).median()


def std(column: str, ddof: int = 1) -> Expr:
    return col(column).std(ddof=ddof)


def var(column: str, ddof: int = 1) -> Expr:
    return col(column).var(ddof=ddof)


def first(column: str | None = None) -> Expr:
    if column is None:
        return Expr(E.ESelector("nth", (0,)))
    return col(column).first()


def last(column: str | None = None) -> Expr:
    if column is None:
        return Expr(E.ESelector("nth", (-1,)))
    return col(column).last()


def n_unique(*columns: str) -> Expr:
    return col(*columns).n_unique()


def approx_n_unique(*columns: str) -> Expr:
    return col(*columns).n_unique()


def quantile(column: str, quantile: float, interpolation: str = "nearest") -> Expr:
    return col(column).quantile(quantile, interpolation)


def implode(*columns: str) -> Expr:
    return col(*columns).implode()


def cum_sum(*columns: str) -> Expr:
    return col(*columns).cum_sum()


def head(column: str, n: int = 10) -> Expr:
    return col(column).head(n)


def tail(column: str, n: int = 10) -> Expr:
    return col(column).tail(n)


def corr(a: Any, b: Any, *, method: str = "pearson", ddof: int = 1) -> Expr:
    return Expr(
        E.EAgg(
            E.EFunction("pack_pair", (parse_into_expr(a), parse_into_expr(b))),
            "corr",
            (("method", method),),
        )
    )


def cov(a: Any, b: Any, *, ddof: int = 1) -> Expr:
    return Expr(
        E.EAgg(
            E.EFunction("pack_pair", (parse_into_expr(a), parse_into_expr(b))),
            "cov",
            (("ddof", ddof),),
        )
    )


# -- horizontal ops -------------------------------------------------------------


def _horizontal(op: str, *exprs: Any) -> Expr:
    nodes = tuple(parse_into_expr_list(list(exprs)))
    return Expr(E.EFunction(op, nodes))


def all_horizontal(*exprs: Any) -> Expr:
    return _horizontal("all_horizontal", *exprs)


def any_horizontal(*exprs: Any) -> Expr:
    return _horizontal("any_horizontal", *exprs)


def sum_horizontal(*exprs: Any, ignore_nulls: bool = True) -> Expr:
    return _horizontal("sum_horizontal", *exprs)


def min_horizontal(*exprs: Any) -> Expr:
    return _horizontal("min_horizontal", *exprs)


def max_horizontal(*exprs: Any) -> Expr:
    return _horizontal("max_horizontal", *exprs)


def mean_horizontal(*exprs: Any, ignore_nulls: bool = True) -> Expr:
    return _horizontal("mean_horizontal", *exprs)


def coalesce(*exprs: Any, **named_exprs: Any) -> Expr:
    nodes = tuple(parse_into_expr_list(list(exprs), named_exprs, str_as_lit=False))
    return Expr(E.EFunction("coalesce", nodes))


def fold(acc: Any, function: Any, exprs: Any) -> Expr:
    """Horizontal fold. Composition happens at schema-resolve time (after
    selector expansion) so pl.all()/selectors splice INTO the input list —
    the reference's INPUT_WILDCARD_EXPANSION (schema_resolve._splice_horizontal
    expands the 'fold' macro)."""
    nodes = tuple(parse_into_expr_list(exprs))
    out = parse_into_expr(acc, str_as_lit=True)
    return Expr(E.EFunction("fold", (out, *nodes), (("function", function),)))


def reduce(function: Any, exprs: Any) -> Expr:
    nodes = tuple(parse_into_expr_list(exprs))
    if not nodes:
        raise ValueError("reduce requires at least one expression")
    return Expr(E.EFunction("reduce", tuple(nodes), (("function", function),)))


# -- construction ------------------------------------------------------------------


def int_range(start: Any = 0, end: Any = None, step: int = 1, *, dtype: Any = None, eager: bool = False):
    if end is None:
        start, end = 0, start
    node = E.EFunction(
        "int_range",
        (parse_into_expr(start, str_as_lit=True), parse_into_expr(end, str_as_lit=True)),
        (("step", step), ("dtype", dt.parse_into_dtype(dtype) if dtype is not None else dt.Int64())),
    )
    e = Expr(node)
    if eager:
        from polars_tpu.core.frame import DataFrame

        return DataFrame({}).select(e.alias("int_range" if dtype is None else "int_range")).to_series(0).rename("int_range")
    return e


def arange(start: Any = 0, end: Any = None, step: int = 1, *, dtype: Any = None, eager: bool = False):
    return int_range(start, end, step, dtype=dtype, eager=eager)


def int_ranges(start: Any = 0, end: Any = None, step: Any = 1, *, dtype: Any = None, eager: bool = False):
    """Per-row integer ranges as a List column (host-generated: the child
    layout is data-dependent; reference functions/range/int_range.py)."""
    if end is None:
        start, end = 0, start
    node = E.EFunction(
        "int_ranges",
        (
            parse_into_expr(start, str_as_lit=False),
            parse_into_expr(end, str_as_lit=False),
            parse_into_expr(step, str_as_lit=False),
        ),
        (("dtype", dt.parse_into_dtype(dtype) if dtype is not None else dt.Int64()),),
    )
    e = Expr(node).alias("int_range")
    if eager:
        from polars_tpu.core.frame import DataFrame

        return DataFrame({}).select(e).to_series(0)
    return e


def date_ranges(start: Any, end: Any, interval: str = "1d", *, closed: str = "both", eager: bool = False):
    node = E.EFunction(
        "date_ranges",
        (parse_into_expr(start, str_as_lit=False), parse_into_expr(end, str_as_lit=False)),
        (("interval", interval), ("closed", closed)),
    )
    e = Expr(node).alias("date_range")
    if eager:
        from polars_tpu.core.frame import DataFrame

        return DataFrame({}).select(e).to_series(0)
    return e


def datetime_ranges(start: Any, end: Any, interval: str = "1d", *, closed: str = "both", time_unit: str = "us", time_zone: str | None = None, eager: bool = False):
    node = E.EFunction(
        "datetime_ranges",
        (parse_into_expr(start, str_as_lit=False), parse_into_expr(end, str_as_lit=False)),
        (("interval", interval), ("closed", closed), ("time_unit", time_unit)),
    )
    e = Expr(node).alias("datetime_range")
    if eager:
        from polars_tpu.core.frame import DataFrame

        return DataFrame({}).select(e).to_series(0)
    return e


def linear_spaces(start: Any, end: Any, num_samples: Any, *, closed: str = "both", eager: bool = False):
    node = E.EFunction(
        "linear_spaces",
        (
            parse_into_expr(start, str_as_lit=False),
            parse_into_expr(end, str_as_lit=False),
            parse_into_expr(num_samples, str_as_lit=False),
        ),
        (("closed", closed),),
    )
    e = Expr(node).alias("linear_space")
    if eager:
        from polars_tpu.core.frame import DataFrame

        return DataFrame({}).select(e).to_series(0)
    return e


def repeat(value: Any, n: Any, *, dtype: Any = None, eager: bool = False):
    node = E.EFunction(
        "repeat_value",
        (parse_into_expr(value, str_as_lit=True), parse_into_expr(n, str_as_lit=True)),
        (("dtype", dt.parse_into_dtype(dtype) if dtype is not None else None),),
    )
    e = Expr(node).alias("repeat")
    if eager:
        from polars_tpu.core.frame import DataFrame

        return DataFrame({}).select(e).to_series(0)
    return e


def ones(n: int, dtype: Any = None, *, eager: bool = True):
    return repeat(1, n, dtype=dtype or dt.Float64(), eager=eager)


def zeros(n: int, dtype: Any = None, *, eager: bool = True):
    return repeat(0, n, dtype=dtype or dt.Float64(), eager=eager)


def date_range(start: Any, end: Any, interval: str = "1d", *, closed: str = "both", eager: bool = False):
    node = E.EFunction(
        "date_range",
        (parse_into_expr(start, str_as_lit=True), parse_into_expr(end, str_as_lit=True)),
        (("interval", interval), ("closed", closed)),
    )
    e = Expr(node).alias("literal")
    if eager:
        from polars_tpu.core.frame import DataFrame

        return DataFrame({}).select(e).to_series(0).rename("literal")
    return e


def datetime_range(start: Any, end: Any, interval: str = "1d", *, closed: str = "both", time_unit: str = "us", time_zone: str | None = None, eager: bool = False):
    node = E.EFunction(
        "datetime_range",
        (parse_into_expr(start, str_as_lit=True), parse_into_expr(end, str_as_lit=True)),
        (("interval", interval), ("closed", closed), ("time_unit", time_unit)),
    )
    e = Expr(node).alias("literal")
    if eager:
        from polars_tpu.core.frame import DataFrame

        return DataFrame({}).select(e).to_series(0).rename("literal")
    return e


def date(year: Any, month: Any, day: Any) -> Expr:
    return Expr(
        E.EFunction(
            "make_date",
            (
                parse_into_expr(year, str_as_lit=True),
                parse_into_expr(month, str_as_lit=True),
                parse_into_expr(day, str_as_lit=True),
            ),
        )
    ).alias("date")


def datetime(year: Any, month: Any, day: Any, hour: Any = 0, minute: Any = 0, second: Any = 0, microsecond: Any = 0, *, time_unit: str = "us", time_zone: str | None = None) -> Expr:
    return Expr(
        E.EFunction(
            "make_datetime",
            tuple(
                parse_into_expr(v, str_as_lit=True)
                for v in (year, month, day, hour, minute, second, microsecond)
            ),
            (("time_unit", time_unit),),
        )
    ).alias("datetime")


def duration(
    *,
    weeks: Any = None, days: Any = None, hours: Any = None, minutes: Any = None,
    seconds: Any = None, milliseconds: Any = None, microseconds: Any = None,
    nanoseconds: Any = None, time_unit: str = "us",
) -> Expr:
    parts = {
        "weeks": weeks, "days": days, "hours": hours, "minutes": minutes,
        "seconds": seconds, "milliseconds": milliseconds,
        "microseconds": microseconds, "nanoseconds": nanoseconds,
    }
    used = [(k, v) for k, v in parts.items() if v is not None]
    return Expr(
        E.EFunction(
            "make_duration",
            tuple(parse_into_expr(v, str_as_lit=True) for _, v in used),
            (("units", tuple(k for k, _ in used)), ("time_unit", time_unit)),
        )
    ).alias("duration")


# -- strings / struct ------------------------------------------------------------------


def concat_str(exprs: Any, *more_exprs: Any, separator: str = "", ignore_nulls: bool = False) -> Expr:
    nodes = tuple(parse_into_expr_list([exprs, *more_exprs]))
    return Expr(E.EFunction("concat_str", nodes, (("separator", separator), ("ignore_nulls", ignore_nulls))))


def format(f_string: str, *args: Any) -> Expr:
    parts = f_string.split("{}")
    if _len(parts) - 1 != _len(args):
        raise ValueError("number of placeholders should equal the number of arguments")
    exprs: list[Any] = []
    for i, p in enumerate(parts):
        if p:
            exprs.append(lit(p))
        if i < _len(args):
            exprs.append(args[i])
    return concat_str(exprs, separator="").alias("literal")


def concat_list(exprs: Any, *more_exprs: Any) -> Expr:
    """Horizontally combine columns into a List column — fully traced
    (engine/fn_nested._concat_list)."""
    nodes = tuple(parse_into_expr_list(exprs if isinstance(exprs, (list, tuple)) else [exprs]))
    nodes += tuple(parse_into_expr_list(list(more_exprs)))
    return Expr(E.EFunction("concat_list", nodes)).alias(
        E.output_name(nodes[0]) or "literal"
    )


def concat_arr(exprs: Any, *more_exprs: Any) -> Expr:
    """Horizontally combine columns into a fixed-width Array column."""
    nodes = tuple(parse_into_expr_list(exprs if isinstance(exprs, (list, tuple)) else [exprs]))
    nodes += tuple(parse_into_expr_list(list(more_exprs)))
    return Expr(E.EFunction("concat_list", nodes, (("as_array", True),))).alias(
        E.output_name(nodes[0]) or "literal"
    )


def struct(*exprs: Any, **named_exprs: Any) -> Expr:
    nodes = tuple(parse_into_expr_list(list(exprs), named_exprs))
    return Expr(E.EFunction("as_struct", nodes)).alias("struct")


def arg_where(condition: Any, *, eager: bool = False):
    """Indices where ``condition`` is true.

    Reference: py-polars functions/lazy.py arg_where; the lazy form lowers
    onto with_row_index -> filter (engine/run._lower_select_arg_where)."""
    if eager:
        from polars_tpu.core.series import Series

        if not isinstance(condition, Series):
            raise TypeError(
                "expected Series in `arg_where` with eager=True, got "
                f"{type(condition).__name__}"
            )
        name = condition.name
        df = condition.alias("__aw_cond").to_frame()
        out = df.lazy().select(arg_where(_col_of("__aw_cond"))).collect()
        return out[out.columns[0]].alias(name)
    return Expr(E.EFunction("arg_where", (parse_into_expr(condition),)))


def _col_of(name: str):
    from polars_tpu.functions import col

    return col(name)


def arg_sort_by(exprs: Any, *more_exprs: Any, descending: Any = False) -> Expr:
    nodes = tuple(parse_into_expr_list([exprs, *more_exprs]))
    k = nodes.__len__()  # builtin len() is shadowed by the module-level len()
    desc = tuple(descending) if isinstance(descending, (list, tuple)) else (descending,) * k
    return Expr(E.EFunction("arg_sort_by", nodes, (("descending", desc),)))


def select(*exprs: Any, **named_exprs: Any):
    from polars_tpu.core.frame import DataFrame

    return DataFrame({}).select(*exprs, **named_exprs)


# -- when/then/otherwise -------------------------------------------------------------------


class When:
    __slots__ = ("_condition",)

    def __init__(self, condition: E.ENode) -> None:
        self._condition = condition

    def then(self, statement: Any) -> Then:
        return Then([(self._condition, parse_into_expr(statement, str_as_lit=False))])


class Then(Expr):
    __slots__ = ("_branches",)

    def __init__(self, branches: list[tuple[E.ENode, E.ENode]]) -> None:
        self._branches = branches
        super().__init__(self._build(E.ELiteral(None)))

    def _build(self, otherwise: E.ENode) -> E.ENode:
        node = otherwise
        for cond, stmt in reversed(self._branches):
            node = E.ETernary(cond, stmt, node)
        return node

    def when(self, *predicates: Any, **constraints: Any) -> ChainedWhen:
        cond = _when_condition(predicates, constraints)
        return ChainedWhen(self._branches, cond)

    def otherwise(self, statement: Any) -> Expr:
        return Expr(self._build(parse_into_expr(statement, str_as_lit=False)))


class ChainedWhen:
    __slots__ = ("_branches", "_condition")

    def __init__(self, branches: list, condition: E.ENode) -> None:
        self._branches = branches
        self._condition = condition

    def then(self, statement: Any) -> Then:
        return Then([*self._branches, (self._condition, parse_into_expr(statement, str_as_lit=False))])


def _when_condition(predicates: tuple, constraints: dict) -> E.ENode:
    conds: list[E.ENode] = [parse_into_expr(p) for p in predicates]
    for name, value in constraints.items():
        conds.append(E.EBinary(E.EColumn(name), "==", parse_into_expr(value, str_as_lit=True)))
    if not conds:
        raise ValueError("when() requires at least one predicate")
    node = conds[0]
    for c in conds[1:]:
        node = E.EBinary(node, "&", c)
    return node


def when(*predicates: Any, **constraints: Any) -> When:
    return When(_when_condition(predicates, constraints))
