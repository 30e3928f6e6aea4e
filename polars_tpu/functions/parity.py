"""API-parity batch: the long tail of py-polars top-level functions.

Each entry cites its reference counterpart under
/root/reference/py-polars/src/polars/functions/ (or io/). Substantive logic
(rolling corr/cov, business-day math, ranges, align_frames) is built by
COMPOSITION over the engine's traced expressions — these stay inside fused
segments; nothing here adds a host barrier.
"""

from __future__ import annotations

import re as _re
from typing import Any, Callable, Iterable

from polars_tpu import datatypes as dt
from polars_tpu.errors import InvalidOperationError
from polars_tpu.expr.expr import Expr, parse_into_expr
from polars_tpu.plan import exprs as E


def _col(x: Any, str_as_lit: bool = False) -> Expr:
    return x if isinstance(x, Expr) else Expr(parse_into_expr(x, str_as_lit=str_as_lit))


# -- trig ----------------------------------------------------------------------


def arctan2(y: Any, x: Any) -> Expr:
    """Element-wise arctangent of y/x using both signs (functions/lazy.py)."""
    return Expr(E.EFunction("arctan2", (_col(y)._node, _col(x)._node)))


def arctan2d(y: Any, x: Any) -> Expr:
    return Expr(E.EFunction("arctan2", (_col(y)._node, _col(x)._node), (("degrees", True),)))


# -- cumulative / horizontal ----------------------------------------------------


def cum_count(*columns: str, reverse: bool = False) -> Expr:
    exprs = [_col(c).is_not_null().cum_sum(reverse=reverse).cast(dt.UInt32()) for c in columns]
    if len(exprs) == 1:
        return exprs[0].alias(columns[0])
    from polars_tpu.functions.lazy import struct as _struct

    return _struct([e.alias(c) for e, c in zip(exprs, columns)])


def cum_fold(acc: Any, function: Callable, exprs: Any, *, include_init: bool = False) -> Expr:
    """Struct of every intermediate fold state (functions/lazy.py cum_fold)."""
    from polars_tpu.functions.lazy import struct as _struct
    from polars_tpu.expr.expr import parse_into_expr_list

    nodes = parse_into_expr_list(exprs)
    out = _col(acc, str_as_lit=True)
    fields = [out.alias("acc")] if include_init else []
    for n in nodes:
        out = function(out, Expr(n))
        fields.append(out.alias(E.output_name(n) or f"field_{len(fields)}"))
    return _struct(fields).alias("cum_fold")


def cum_reduce(function: Callable, exprs: Any) -> Expr:
    from polars_tpu.functions.lazy import struct as _struct
    from polars_tpu.expr.expr import parse_into_expr_list

    nodes = parse_into_expr_list(exprs)
    if not nodes:
        raise ValueError("cum_reduce requires at least one expression")
    out = Expr(nodes[0])
    fields = [out.alias(E.output_name(nodes[0]) or "field_0")]
    for i, n in enumerate(nodes[1:], 1):
        out = function(out, Expr(n))
        fields.append(out.alias(E.output_name(n) or f"field_{i}"))
    return _struct(fields).alias("cum_reduce")


def cum_sum_horizontal(*exprs: Any) -> Expr:
    """Struct of running horizontal sums (functions/lazy.py cum_sum_horizontal)."""
    from polars_tpu.expr.expr import parse_into_expr_list

    nodes = parse_into_expr_list(list(exprs))
    return cum_reduce(lambda a, b: a + b, [Expr(n) for n in nodes]).alias("cum_sum")


# -- rolling pairwise moments ----------------------------------------------------


def _rolling_pair(a: Any, b: Any, window_size: int, min_samples: int | None, ddof: int, want: str) -> Expr:
    """rolling_corr / rolling_cov by composition over rolling sums of the
    pairwise-complete values (reference functions/lazy.py rolling_corr/cov)."""
    x = _col(a)
    y = _col(b)
    both = x.is_not_null() & y.is_not_null()
    xz = (
        Expr(
            E.ETernary(both._node, x._node, parse_into_expr(0.0))
        )
        .cast(dt.Float64())
    )
    yz = Expr(E.ETernary(both._node, y._node, parse_into_expr(0.0))).cast(dt.Float64())
    ms = 1  # window emits from the first row; validity handled by n below
    n = both.cast(dt.Float64()).rolling_sum(window_size, min_samples=ms)
    sx = xz.rolling_sum(window_size, min_samples=ms)
    sy = yz.rolling_sum(window_size, min_samples=ms)
    sxy = (xz * yz).rolling_sum(window_size, min_samples=ms)
    need = float(min_samples if min_samples is not None else window_size)
    if want == "cov":
        out = (sxy - sx * sy / n) / (n - ddof)
        ok = (n >= need) & (n > ddof)
    else:
        sxx = (xz * xz).rolling_sum(window_size, min_samples=ms)
        syy = (yz * yz).rolling_sum(window_size, min_samples=ms)
        denom = ((n * sxx - sx * sx) * (n * syy - sy * sy)).sqrt()
        out = (n * sxy - sx * sy) / denom
        ok = n >= need
    from polars_tpu.functions.lazy import lit as _lit

    return Expr(E.ETernary(ok._node, out._node, _lit(None)._node))


def rolling_corr(a: Any, b: Any, *, window_size: int, min_samples: int | None = None, ddof: int = 1) -> Expr:
    return _rolling_pair(a, b, window_size, min_samples, ddof, "corr")


def rolling_cov(a: Any, b: Any, *, window_size: int, min_samples: int | None = None, ddof: int = 1) -> Expr:
    return _rolling_pair(a, b, window_size, min_samples, ddof, "cov")


# -- temporal --------------------------------------------------------------------


def business_day_count(start: Any, end: Any, week_mask: Any = None, holidays: Any = None) -> Expr:
    """Business days in [start, end) (functions/business.py)."""
    mask = tuple(bool(x) for x in (week_mask if week_mask is not None else (1, 1, 1, 1, 1, 0, 0)))
    hol = tuple(sorted(int(_to_days(h)) for h in (holidays or ())))
    return Expr(
        E.EFunction(
            "business_day_count",
            (_col(start)._node, _col(end)._node),
            (("week_mask", mask), ("holidays", hol)),
        )
    )


def _to_days(d: Any) -> int:
    import datetime as _dt

    if isinstance(d, _dt.datetime):
        d = d.date()
    if isinstance(d, _dt.date):
        return (d - _dt.date(1970, 1, 1)).days
    return int(d)


def from_epoch(column: Any, time_unit: str = "s"):
    from polars_tpu.core.series import Series

    if isinstance(column, Series):
        # eager form (reference: from_epoch on a Series returns a Series)
        name = column.name
        out = column.to_frame().select(from_epoch(_col(name or ""), time_unit))
        return out.to_series()
    c = _col(column)
    if time_unit == "d":
        return c.cast(dt.Date())
    if time_unit == "s":
        return (c.cast(dt.Int64()) * 1_000_000).cast(dt.Datetime("us"))
    if time_unit in ("ms", "us", "ns"):
        return c.cast(dt.Int64()).cast(dt.Datetime(time_unit))
    raise InvalidOperationError(f"from_epoch: unknown time_unit {time_unit!r}")


def time(hour: Any = 0, minute: Any = 0, second: Any = 0, microsecond: Any = 0) -> Expr:
    """Time-of-day literal/expression (functions/as_datetime.py time)."""
    e = (
        (_col(hour, True).cast(dt.Int64()) * 3_600_000_000)
        + (_col(minute, True).cast(dt.Int64()) * 60_000_000)
        + (_col(second, True).cast(dt.Int64()) * 1_000_000)
        + _col(microsecond, True).cast(dt.Int64())
    )
    return (e * 1000).cast(dt.Time()).alias("time")


def time_range(start: Any = None, end: Any = None, interval: str = "1h", *, closed: str = "both", eager: bool = False):
    import datetime as _dt

    from polars_tpu.functions.lazy import datetime_range

    def t2us(t, default):
        if t is None:
            t = default
        return t.hour * 3_600_000_000 + t.minute * 60_000_000 + t.second * 1_000_000 + t.microsecond

    s = t2us(start, _dt.time(0, 0, 0))
    e = t2us(end, _dt.time(23, 59, 59, 999999))
    import datetime as _d

    base = _d.datetime(1970, 1, 1)
    rng = datetime_range(
        base + _d.timedelta(microseconds=s), base + _d.timedelta(microseconds=e),
        interval, closed=closed, eager=eager,
    )
    if eager:
        return rng.cast(dt.Time()).rename("time")
    return rng.cast(dt.Time()).alias("time")


def time_ranges(start: Any, end: Any, interval: str = "1h", *, closed: str = "both", eager: bool = False):
    """Per-row Time ranges as a List column (functions/range/time_range.py)."""
    node = E.EFunction(
        "time_ranges",
        (_col(start)._node, _col(end)._node),
        (("interval", interval), ("closed", closed)),
    )
    e = Expr(node).alias("time_range")
    if eager:
        from polars_tpu.core.frame import DataFrame

        return DataFrame({}).select(e).to_series(0)
    return e


def linear_space(start: Any, end: Any, num_samples: Any, *, closed: str = "both", eager: bool = False):
    """Evenly spaced floats (functions/linear_space.py)."""
    from polars_tpu.functions.lazy import int_range

    n = int(num_samples)
    s = _col(start, True).cast(dt.Float64())
    e = _col(end, True).cast(dt.Float64())
    if closed == "both":
        denom = max(n - 1, 1)
        idx = int_range(0, n)
    elif closed == "left":
        denom = n
        idx = int_range(0, n)
    elif closed == "right":
        denom = n
        idx = int_range(1, n + 1)
    else:  # "none"
        denom = n + 1
        idx = int_range(1, n + 1)
    out = (s + (e - s) * idx.cast(dt.Float64()) / float(denom)).alias("literal")
    if eager:
        from polars_tpu.core.frame import DataFrame

        return DataFrame({}).select(out).to_series(0).rename("literal")
    return out


# -- frame-level helpers ----------------------------------------------------------


def align_frames(*frames: Any, on: Any, how: str = "full", descending: bool = False) -> list:
    """Row-align frames on key columns (functions/eager.py align_frames):
    every output frame has one row per key in the join of all key sets,
    sorted, with nulls where a frame lacked the key."""
    if len(frames) < 2:
        return list(frames)
    import polars_tpu as pl

    keys = [on] if isinstance(on, str) else list(on)
    lazy = hasattr(frames[0], "_node")
    lfs = [f if lazy else f.lazy() for f in frames]
    idx = lfs[0].select(keys)
    for f in lfs[1:]:
        idx = idx.join(f.select(keys), on=keys, how="full", coalesce=True)
    idx = idx.unique(subset=keys).sort(keys, descending=descending)
    out = []
    for f in lfs:
        a = idx.join(f, on=keys, how="left", coalesce=True).sort(keys, descending=descending)
        out.append(a if lazy else a.collect())
    return out


def collect_all(lazy_frames: Iterable[Any], **kwargs: Any) -> list:
    return [lf.collect(**kwargs) for lf in lazy_frames]


def collect_all_async(lazy_frames: Iterable[Any], **kwargs: Any):
    import concurrent.futures as _cf

    pool = _cf.ThreadPoolExecutor(max_workers=1)  # device dispatch is serial
    return pool.submit(collect_all, list(lazy_frames), **kwargs)


def explain_all(lazy_frames: Iterable[Any], **kwargs: Any) -> str:
    return "\n".join(lf.explain(**kwargs) for lf in lazy_frames)


def union(items: Any, *, how: str = "vertical", strict: bool | None = None):
    """Order-unspecified concat (functions/eager.py:382)."""
    from polars_tpu.functions.eager import concat

    return concat(items, how=how)


def merge_sorted(left: Any, right: Any, key: str):
    return left.merge_sorted(right, key)


# -- misc ------------------------------------------------------------------------


def escape_regex(s: str) -> str:
    return _re.escape(s)


def field(name: Any) -> Expr:
    """Struct field reference inside a struct context (functions/col.py field)."""
    if isinstance(name, (list, tuple)):
        raise InvalidOperationError("field: multiple names not supported yet")
    from polars_tpu.functions.lazy import col

    return col(name)


def row_index(name: str = "index") -> Expr:
    from polars_tpu.functions.lazy import int_range, len as _len

    return int_range(0, _len(), dtype=dt.UInt32()).alias(name)


def set_random_seed(seed: int) -> None:
    """Global seed for sample/shuffle (functions/random.py)."""
    from polars_tpu.config import _config

    _config.random_seed = int(seed)


def sql_expr(sql: str) -> Expr | list[Expr]:
    from polars_tpu.sql import parser as P
    from polars_tpu.sql.translate import _expr

    p = P.Parser(P.tokenize(sql))
    return _expr(p.parse_expr())


def show_versions() -> None:
    import sys

    import jax
    import numpy as _np

    import polars_tpu

    print(f"polars_tpu {polars_tpu.__version__}")
    print(f"python     {sys.version.split()[0]}")
    print(f"jax        {jax.__version__}")
    print(f"numpy      {_np.__version__}")
    try:
        print(f"devices    {jax.devices()}")
    except Exception:  # noqa: BLE001
        pass


def build_info() -> dict:
    import polars_tpu

    return {"version": polars_tpu.__version__, "features": ["tpu", "jax", "xla"]}


def thread_pool_size() -> int:
    import os

    return os.cpu_count() or 1


threadpool_size = thread_pool_size


def get_index_type() -> dt.DataType:
    return dt.UInt32()


# -- string cache shims ------------------------------------------------------------
# Strings are per-column ordinal dictionaries (utils/strtable.py); cross-table
# code spaces unify on demand, so a process-global cache adds nothing. These
# exist for API compatibility and are honest no-ops.


class StringCache:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def enable_string_cache() -> None:
    return None


def disable_string_cache() -> None:
    return None


def using_string_cache() -> bool:
    return False


# -- multi-column UDFs --------------------------------------------------------------


def map_batches(exprs: Any, function: Callable, return_dtype: Any = None, *, is_elementwise: bool = False, returns_scalar: bool = False) -> Expr:
    """Apply a UDF over several whole columns at once: the function receives a
    LIST of Series (reference functions/lazy.py map_batches; the Expr METHOD
    passes a single Series)."""
    from polars_tpu.expr.expr import parse_into_expr_list
    from polars_tpu.utils.tokens import obj_token

    nodes = tuple(parse_into_expr_list(exprs if isinstance(exprs, (list, tuple)) else [exprs]))

    def as_list(arg):
        return function(arg if isinstance(arg, list) else [arg])

    return Expr(
        E.EAnonymous(
            nodes,
            function=as_list,
            return_dtype=dt.parse_into_dtype(return_dtype) if return_dtype is not None else None,
            ident=obj_token(function),
            returns_scalar=returns_scalar,
        )
    ).alias("map" if not nodes else (E.output_name(nodes[0]) or "map"))


def map_groups(exprs: Any, function: Callable, return_dtype: Any = None, *, returns_scalar: bool = False) -> Expr:
    """Per-group UDF over several columns: inside a group_by().agg() the
    function receives each group's list of Series (the engine's generic
    per-group host apply, engine/run.py _exec_groupby_apply)."""
    return map_batches(exprs, function, return_dtype, returns_scalar=returns_scalar)


def groups(column: str) -> Expr:
    """Deprecated sugar for col(x).agg_groups() (reference functions/lazy.py:1885)."""
    import warnings

    warnings.warn(
        "`groups` is deprecated; use pl.col(name).agg_groups() instead",
        DeprecationWarning,
        stacklevel=2,
    )
    return _col(column).agg_groups()
