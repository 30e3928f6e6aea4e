"""Series: a single named column with an eager method surface.

Reference: polars-core/src/series/mod.rs:150 + py-polars series/series.py.
Nearly every operation delegates to the expression engine over a one-column
frame — the same single-engine strategy py-polars uses — so Series, DataFrame
and LazyFrame semantics can never drift apart.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np

from polars_tpu import datatypes as dt
from polars_tpu.core.column import Column
from polars_tpu.core.frame import DataFrame


class Series:
    __slots__ = ("_column",)

    def __init__(
        self,
        name: Any = "",
        values: Any = None,
        dtype: Any = None,
        *,
        strict: bool = True,
    ) -> None:
        if name is not None and not isinstance(name, str) and values is None:
            values, name = name, ""
        if values is None:
            values = []
        self._column = Column.from_values(
            name, values, dt.parse_into_dtype(dtype) if dtype is not None else None, strict=strict
        )

    @classmethod
    def _from_column(cls, column: Column) -> Series:
        s = cls.__new__(cls)
        s._column = column
        return s

    # -- basic properties ------------------------------------------------------

    @property
    def name(self) -> str:
        return self._column.name

    @property
    def dtype(self) -> dt.DataType:
        return self._column.dtype

    @property
    def shape(self) -> tuple[int]:
        return (len(self._column),)

    def __len__(self) -> int:
        return len(self._column)

    def len(self) -> int:
        return len(self._column)

    def alias(self, name: str) -> Series:
        return Series._from_column(self._column.rename(name))

    def rename(self, name: str) -> Series:
        return self.alias(name)

    def null_count(self) -> int:
        return self._column.null_count()

    @property
    def flags(self) -> dict:
        from polars_tpu.core import column as colmod

        return {
            "SORTED_ASC": self._column.sorted_flag == colmod.SORTED_ASC,
            "SORTED_DESC": self._column.sorted_flag == colmod.SORTED_DESC,
        }

    # -- expression delegation -------------------------------------------------

    def _frame(self) -> DataFrame:
        col = self._column if self._column.name else self._column.rename("")
        return DataFrame._from_columns([col], len(self._column))

    def _expr(self):
        import polars_tpu as pl

        return pl.col(self._column.name if self._column.name else "")

    def _select(self, expr) -> Series:
        out = self._frame().select(expr)
        return Series._from_column(out._columns[0].rename(self.name))

    def _scalar(self, expr) -> Any:
        out = self._frame().select(expr)
        return out.item(0, 0)

    def _apply_expr(self, method: str, *args: Any, **kwargs: Any) -> Series:
        return self._select(getattr(self._expr(), method)(*args, **kwargs))

    def _apply_scalar(self, method: str, *args: Any, **kwargs: Any) -> Any:
        return self._scalar(getattr(self._expr(), method)(*args, **kwargs))

    @staticmethod
    def _coerce_other(other: Any):
        import polars_tpu as pl

        if isinstance(other, Series):
            return pl.lit(other)
        return pl.lit(other)

    def _binary(self, method: str, other: Any, *, swap: bool = False) -> Series:
        import polars_tpu as pl

        rhs = self._coerce_other(other)
        lhs = self._expr()
        if swap:
            lhs, rhs = rhs, lhs
        return self._select(getattr(lhs, method)(rhs))

    # -- operators ------------------------------------------------------------------

    def __add__(self, other: Any) -> Series:
        return self._binary("__add__", other)

    def __radd__(self, other: Any) -> Series:
        return self._binary("__add__", other, swap=True)

    def __sub__(self, other: Any) -> Series:
        return self._binary("__sub__", other)

    def __rsub__(self, other: Any) -> Series:
        return self._binary("__sub__", other, swap=True)

    def __mul__(self, other: Any) -> Series:
        return self._binary("__mul__", other)

    def __rmul__(self, other: Any) -> Series:
        return self._binary("__mul__", other, swap=True)

    def __truediv__(self, other: Any) -> Series:
        return self._binary("__truediv__", other)

    def __rtruediv__(self, other: Any) -> Series:
        return self._binary("__truediv__", other, swap=True)

    def __floordiv__(self, other: Any) -> Series:
        return self._binary("__floordiv__", other)

    def __rfloordiv__(self, other: Any) -> Series:
        return self._binary("__floordiv__", other, swap=True)

    def __mod__(self, other: Any) -> Series:
        return self._binary("__mod__", other)

    def __rmod__(self, other: Any) -> Series:
        return self._binary("__mod__", other, swap=True)

    def __pow__(self, other: Any) -> Series:
        return self._binary("__pow__", other)

    def __neg__(self) -> Series:
        return self._select(-self._expr())

    def __abs__(self) -> Series:
        return self.abs()

    def __invert__(self) -> Series:
        return self._select(~self._expr())

    def __eq__(self, other: Any) -> Series:  # type: ignore[override]
        return self._binary("__eq__", other)

    def __ne__(self, other: Any) -> Series:  # type: ignore[override]
        return self._binary("__ne__", other)

    def __lt__(self, other: Any) -> Series:
        return self._binary("__lt__", other)

    def __le__(self, other: Any) -> Series:
        return self._binary("__le__", other)

    def __gt__(self, other: Any) -> Series:
        return self._binary("__gt__", other)

    def __ge__(self, other: Any) -> Series:
        return self._binary("__ge__", other)

    def __and__(self, other: Any) -> Series:
        return self._binary("__and__", other)

    def __or__(self, other: Any) -> Series:
        return self._binary("__or__", other)

    def __xor__(self, other: Any) -> Series:
        return self._binary("__xor__", other)

    # -- indexing --------------------------------------------------------------------

    def __getitem__(self, key: Any) -> Any:
        if isinstance(key, int):
            if key < 0:
                key += len(self)
            return self._column.to_pylist()[key]
        if isinstance(key, slice):
            start, stop, step = key.indices(len(self))
            if step == 1:
                return self.slice(start, stop - start)
            return self.gather(np.arange(start, stop, step))
        if isinstance(key, (list, np.ndarray, Series)):
            if isinstance(key, Series):
                key = key.to_numpy()
            key = np.asarray(key)
            if key.dtype == bool:
                return self.filter(Series("", key))
            return self.gather(key)
        raise TypeError(f"cannot index Series with {key!r}")

    def __iter__(self):
        return iter(self.to_list())

    def __contains__(self, item: Any) -> bool:
        return item in set(self.to_list())

    # -- conversion --------------------------------------------------------------------

    def to_list(self) -> list:
        return self._column.to_pylist()

    def to_numpy(self, **kwargs: Any) -> np.ndarray:
        return self._column.to_numpy()

    def to_jax(self):
        """Device array of the physical values (no padding)."""
        return self._column.buffer.values[: len(self)]

    def to_pandas(self) -> Any:
        import pandas as pd

        return pd.Series(self.to_numpy(), name=self.name)

    def to_frame(self, name: str | None = None) -> DataFrame:
        col = self._column if name is None else self._column.rename(name)
        return DataFrame._from_columns([col], len(col))

    def to_arrow(self) -> Any:
        return self.to_frame(self.name or "").to_arrow().column(0)

    def item(self, index: int | None = None) -> Any:
        if index is None:
            if len(self) != 1:
                raise ValueError(f"can only call .item() on Series of length 1, got {len(self)}")
            index = 0
        return self[index]

    # -- eager ops on the frame path ------------------------------------------------------

    def slice(self, offset: int, length: int | None = None) -> Series:
        return Series._from_column(
            self._column.with_buffer(
                self._column.buffer.slice(
                    offset if offset >= 0 else max(0, len(self) + offset),
                    length if length is not None else len(self),
                ),
                sorted_flag=self._column.sorted_flag,
            )
        )

    def head(self, n: int = 10) -> Series:
        return self.slice(0, n if n >= 0 else max(0, len(self) + n))

    def tail(self, n: int = 10) -> Series:
        n = n if n >= 0 else max(0, len(self) + n)
        return self.slice(max(0, len(self) - n), n)

    def limit(self, n: int = 10) -> Series:
        return self.head(n)

    def gather(self, indices: Any) -> Series:
        from polars_tpu.engine.gather import gather_column

        if isinstance(indices, Series):
            indices = indices.to_numpy()
        return Series._from_column(gather_column(self._column, np.asarray(indices)))

    def gather_every(self, n: int, offset: int = 0) -> Series:
        return self.gather(np.arange(offset, len(self), n))

    def filter(self, predicate: Any) -> Series:
        import polars_tpu as pl

        if isinstance(predicate, Series):
            mask_col = predicate._column.rename("__mask__")
            df = DataFrame._from_columns([self._frame()._columns[0], mask_col], len(self))
            out = df.filter(pl.col("__mask__")).drop("__mask__")
            return Series._from_column(out._columns[0].rename(self.name))
        return Series._from_column(
            self._frame().filter(predicate)._columns[0].rename(self.name)
        )

    def append(self, other: Series) -> Series:
        from polars_tpu.functions.eager import concat_series

        out = concat_series([self, other])
        self._column = out._column
        return self

    def extend(self, other: Series) -> Series:
        return self.append(other)

    def clone(self) -> Series:
        return Series._from_column(self._column)

    # -- repr -------------------------------------------------------------------------------

    def __repr__(self) -> str:
        from polars_tpu.utils.fmt import format_series

        return format_series(self)

    def equals(self, other: Series, *, check_names: bool = False, null_equal: bool = True) -> bool:
        if len(self) != len(other) or (check_names and self.name != other.name):
            return False
        if self.dtype != other.dtype:
            return False
        for x, y in zip(self.to_list(), other.to_list()):
            if x is None or y is None:
                if not (null_equal and x is None and y is None):
                    return False
            elif isinstance(x, float) and isinstance(y, float):
                if x != y and not (x != x and y != y):
                    return False
            elif x != y:
                return False
        return True


# ---------------------------------------------------------------------------
# Delegated expression methods — each routes through the one engine.
# ---------------------------------------------------------------------------

_ELEMENTWISE = [
    "abs", "round", "floor", "ceil", "sqrt", "cbrt", "exp", "log", "log10", "log1p",
    "sin", "cos", "tan", "arcsin", "arccos", "arctan", "sinh", "cosh", "tanh",
    "sign", "clip", "is_null", "is_not_null", "is_nan", "is_not_nan",
    "is_finite", "is_infinite", "fill_null", "fill_nan", "cast", "not_",
    "is_in", "is_between", "shift", "diff", "pct_change", "cum_sum", "cum_prod",
    "cum_min", "cum_max", "cum_count", "interpolate", "forward_fill", "backward_fill",
    "rank", "reverse", "arg_sort",
]

_SCALARS = [
    "sum", "mean", "min", "max", "median", "std", "var", "first", "last",
    "n_unique", "count", "product", "skew", "kurtosis", "arg_min", "arg_max",
    "any", "all", "implode", "quantile", "entropy",
]


def _make_elementwise(name: str) -> Callable:
    def method(self: Series, *args: Any, **kwargs: Any) -> Series:
        return self._apply_expr(name, *args, **kwargs)

    method.__name__ = name
    return method


def _make_scalar(name: str) -> Callable:
    def method(self: Series, *args: Any, **kwargs: Any) -> Any:
        return self._apply_scalar(name, *args, **kwargs)

    method.__name__ = name
    return method


for _n in _ELEMENTWISE:
    if not hasattr(Series, _n):
        setattr(Series, _n, _make_elementwise(_n))
for _n in _SCALARS:
    if not hasattr(Series, _n):
        setattr(Series, _n, _make_scalar(_n))


def _series_unique(self: Series, *, maintain_order: bool = False) -> Series:
    return Series._from_column(
        self._frame().unique(maintain_order=maintain_order)._columns[0].rename(self.name)
    )


def _series_sort(self: Series, *, descending: bool = False, nulls_last: bool = False) -> Series:
    return Series._from_column(
        self._frame()
        .sort(self.name or "", descending=descending, nulls_last=nulls_last)
        ._columns[0]
        .rename(self.name)
    )


def _series_value_counts(
    self: Series, *, sort: bool = False, parallel: bool = False,
    name: str | None = None, normalize: bool = False,
) -> DataFrame:
    import polars_tpu as pl

    if name is None:
        name = "proportion" if normalize else "count"
    colname = self.name or ""
    agg = pl.len().alias(name)
    if normalize:
        agg = (agg.cast(dt.Float64()) / self.len()).alias(name)
    else:
        agg = agg.cast(dt.UInt32())
    out = self._frame().group_by(colname).agg(agg)
    if sort:
        out = out.sort(name, descending=True)
    return out


def _series_drop_nulls(self: Series) -> Series:
    return Series._from_column(
        self._frame().drop_nulls()._columns[0].rename(self.name)
    )


Series.unique = _series_unique
Series.sort = _series_sort
Series.value_counts = _series_value_counts
Series.drop_nulls = _series_drop_nulls


# namespaces (str/dt/list/...) are attached lazily to mirror py-polars
def _ns_property(ns_name: str, ns_cls_path: tuple[str, str]):
    def getter(self: Series):
        mod_name, cls_name = ns_cls_path
        import importlib

        mod = importlib.import_module(mod_name)
        return getattr(mod, cls_name)(self)

    return property(getter)


_EXPR_DELEGATED_AGGS = {
    "dot", "nan_max", "nan_min", "bitwise_and", "bitwise_or", "bitwise_xor",
    "approx_n_unique", "has_nulls", "lower_bound", "upper_bound", "index_of",
    "is_sorted",
}


def _series_describe(self, percentiles=(0.25, 0.5, 0.75), *, interpolation="nearest"):
    df = DataFrame._from_columns([self._column], len(self))
    out = df.describe(percentiles)
    return out.rename({out.columns[1]: "value"})


def _series_to_dummies(self, *, separator: str = "_", drop_first: bool = False):
    df = DataFrame._from_columns([self._column], len(self))
    return df.to_dummies(separator=separator, drop_first=drop_first)


def _series_scatter(self, indices, values):
    """Set values at indices (reference: Series.scatter — returns the
    modified series; host-side rebuild, not a device mutation)."""
    import numpy as _np

    lst = self.to_list()
    idx = indices.to_list() if hasattr(indices, "to_list") else _np.asarray(indices).tolist()
    if isinstance(idx, (int, _np.integer)):
        idx = [int(idx)]
    vals = values.to_list() if hasattr(values, "to_list") else values
    if not isinstance(vals, (list, tuple)):
        vals = [vals] * len(idx)
    for i, v in zip(idx, vals):
        lst[int(i)] = v
    return Series._from_column(Column.from_values(self.name, lst, self.dtype))


def _series_set(self, filter_mask, value):
    import polars_tpu as pl

    mask = filter_mask if isinstance(filter_mask, Series) else Series("", filter_mask)
    return self.zip_with(~mask, Series("", [value] * len(self), dtype=self.dtype))


def _series_zip_with(self, mask, other):
    """self where mask else other (reference: Series.zip_with)."""
    import polars_tpu as pl

    df = DataFrame._from_columns(
        [
            self._column.rename("__self__"),
            (mask._column if isinstance(mask, Series) else Series("", mask)._column).rename("__mask__"),
            (other._column if isinstance(other, Series) else Series("", other)._column).rename("__other__"),
        ],
        len(self),
    )
    out = df.select(
        pl.when(pl.col("__mask__")).then(pl.col("__self__")).otherwise(pl.col("__other__")).alias(self.name or "")
    )
    return Series._from_column(out._columns[0])


def _series_estimated_size(self, unit: str = "b"):
    vals = self._column.buffer.values
    n = int(vals.size) * vals.dtype.itemsize
    if self._column.table is not None:
        n += sum(len(str(v).encode()) for v in self._column.table.values)
    div = {"b": 1, "kb": 1024, "mb": 1024**2, "gb": 1024**3, "tb": 1024**4}[unit]
    return n / div if div > 1 else n


def _series_new_from_index(self, index: int, length: int):
    v = self[index]
    return Series._from_column(Column.from_values(self.name, [v] * length, self.dtype))


def _series_to_init_repr(self, n: int = 1000) -> str:
    vals = self.to_list()[:n]
    return f"pl.Series({self.name!r}, {vals!r}, dtype=pl.{self.dtype!r})"


def _series_sql(self, query: str, *, table_name: str = "self"):
    import polars_tpu as pl

    df = DataFrame._from_columns([self._column], len(self))
    ctx = pl.SQLContext(frames={table_name: df.lazy()})
    return ctx.execute(query).collect().to_series()


def _series_to_torch(self):
    import torch

    return torch.from_numpy(np.ascontiguousarray(self.to_numpy()).copy())


class _PlotShim:
    """`.plot` namespace placeholder: accessing any plot method raises (the
    reference requires altair, which this image lacks)."""

    def __getattr__(self, name: str):
        raise ModuleNotFoundError(
            "altair is required for `.plot` and is not available in this build"
        )


def _series_plot(self):
    return _PlotShim()


Series.describe = _series_describe
Series.to_dummies = _series_to_dummies
Series.scatter = _series_scatter
Series.set = _series_set
Series.zip_with = _series_zip_with
Series.estimated_size = _series_estimated_size
Series.new_from_index = _series_new_from_index
Series.to_init_repr = _series_to_init_repr
Series.sql = _series_sql
Series.to_torch = _series_to_torch
Series.plot = property(lambda self: _series_plot(self))
Series.chunk_lengths = lambda self: [len(self)]
Series.n_chunks = lambda self: 1
Series.get_chunks = lambda self: [self]
Series.rechunk = lambda self, *, in_place=False: self
Series.clear = lambda self, n=0: Series._from_column(
    Column.from_values(self.name, [None] * n, self.dtype)
)
Series.shrink_to_fit = lambda self, *, in_place=False: self
Series.has_validity = lambda self: self.null_count() > 0


def _series_getattr(self, name: str):
    """Fallback: any Expr method not explicitly implemented on Series runs
    through the expression engine (py-polars parity without 120 wrappers)."""
    if name.startswith("_"):
        raise AttributeError(name)
    from polars_tpu.expr.expr import Expr

    if not hasattr(Expr, name):
        raise AttributeError(f"'Series' object has no attribute {name!r}")

    def method(*args, **kwargs):
        e = getattr(self._expr(), name)(*args, **kwargs)
        if name in _EXPR_DELEGATED_AGGS:
            return self._scalar(e)
        return self._select(e)

    return method


Series.__getattr__ = _series_getattr


def _series_search_sorted(self, element, side: str = "any"):
    """Eager binary search (reference: Series.search_sorted — scalar needle
    returns an int, list needle a Series; output length = needle count, not
    the frame height, so this cannot ride the select context)."""
    is_many = isinstance(element, (list, tuple, np.ndarray, Series))
    needles = list(element) if not isinstance(element, Series) and is_many else (
        element.to_list() if isinstance(element, Series) else [element]
    )
    vals = self.to_list()
    n_null = sum(1 for v in vals if v is None)  # nulls sort first
    arr = np.asarray([v for v in vals if v is not None])
    np_side = "right" if side == "right" else "left"
    idx = [int(np.searchsorted(arr, e, side=np_side)) + n_null for e in needles]
    if is_many:
        from polars_tpu.core.column import Column as _C
        from polars_tpu import datatypes as _dt

        return Series._from_column(
            _C.from_values(self.name, idx, _dt.UInt32())
        )
    return idx[0]


Series.search_sorted = _series_search_sorted


def _series_explode(self):
    from polars_tpu.core.frame import DataFrame

    df = DataFrame._from_columns([self._column], len(self))
    return Series._from_column(df.explode(self.name)._columns[0])


Series.explode = _series_explode


Series.str = _ns_property("str", ("polars_tpu.core.series_ns", "SeriesStringNamespace"))
Series.dt = _ns_property("dt", ("polars_tpu.core.series_ns", "SeriesDateTimeNamespace"))
Series.cat = _ns_property("cat", ("polars_tpu.core.series_ns", "SeriesCatNamespace"))
Series.list = _ns_property("list", ("polars_tpu.core.series_ns", "SeriesListNamespace"))
Series.struct = _ns_property("struct", ("polars_tpu.core.series_ns", "SeriesStructNamespace"))
Series.bin = _ns_property("bin", ("polars_tpu.core.series_ns", "SeriesBinaryNamespace"))
Series.arr = _ns_property("arr", ("polars_tpu.core.series_ns", "SeriesArrayNamespace"))
