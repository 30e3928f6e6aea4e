"""The fluent ``Expr`` wrapper over the expression AST.

Reference: py-polars/src/polars/expr/expr.py (12.8k LoC). Every method builds a
new immutable AST node; nothing executes until a plan is collected.
"""

from __future__ import annotations

import datetime as _pydt
from typing import Any, Callable, Iterable, Sequence

import numpy as np

from polars_tpu import datatypes as dt
from polars_tpu.errors import InvalidOperationError
from polars_tpu.plan import exprs as E
from polars_tpu.utils.tokens import obj_token


def parse_into_expr(value: Any, *, str_as_lit: bool = False) -> E.ENode:
    """Coerce user input into an AST node (py-polars parse_into_expression)."""
    if isinstance(value, Expr):
        return value._node
    if isinstance(value, E.ENode):
        return value
    if isinstance(value, str) and not str_as_lit:
        return E.EColumn(value)
    from polars_tpu.core.series import Series

    if isinstance(value, Series):
        return E.ESeriesLit(column=value._column, ident=obj_token(value._column))
    if isinstance(value, (list, tuple, np.ndarray)):
        s = Series("literal", list(value))
        return E.ESeriesLit(column=s._column, ident=obj_token(s._column))
    if isinstance(value, _pydt.datetime):
        return E.ELiteral(value.isoformat(), dt.Datetime("us"))
    if isinstance(value, _pydt.date):
        return E.ELiteral(value.isoformat(), dt.Date())
    if isinstance(value, _pydt.timedelta):
        # Duration("us") stores MICROseconds
        return E.ELiteral(round(value.total_seconds() * 1_000_000), dt.Duration("us"))
    if isinstance(value, np.generic):
        return E.ELiteral(value.item(), dt.numpy_to_dtype(value.dtype))
    return E.ELiteral(value)


def parse_into_expr_list(
    exprs: Any, named: dict[str, Any] | None = None, *, str_as_lit: bool = False
) -> list[E.ENode]:
    out: list[E.ENode] = []
    if exprs is None:
        items: list[Any] = []
    elif isinstance(exprs, (Expr, str, E.ENode)) or not isinstance(exprs, Iterable):
        items = [exprs]
    else:
        items = list(exprs)
    flat: list[Any] = []
    for it in items:
        if isinstance(it, (list, tuple)) or (
            isinstance(it, Iterable) and not isinstance(it, (str, Expr, E.ENode))
            and not hasattr(it, "_column")
        ):
            flat.extend(it)
        else:
            flat.append(it)
    for it in flat:
        out.append(parse_into_expr(it, str_as_lit=str_as_lit))
    for name, v in (named or {}).items():
        out.append(E.EAlias(parse_into_expr(v, str_as_lit=str_as_lit), name))
    return out


def _weights_list(weights: Any) -> tuple | None:
    """Normalize rolling weights to a hashable tuple of floats (they are part
    of the jit cache key via the expr options)."""
    if weights is None:
        return None
    return tuple(float(w) for w in weights)


def _opts(**kwargs: Any) -> tuple[tuple[str, Any], ...]:
    return tuple(sorted(kwargs.items()))


class Expr:
    __slots__ = ("_node",)

    def __init__(self, node: E.ENode) -> None:
        self._node = node

    @classmethod
    def _from_node(cls, node: E.ENode) -> Expr:
        return cls(node)

    def _wrap(self, node: E.ENode) -> Expr:
        return Expr(node)

    def _fn(self, name: str, *inputs: Any, **options: Any) -> Expr:
        nodes = (self._node, *(parse_into_expr(i, str_as_lit=True) for i in inputs))
        return Expr(E.EFunction(name, nodes, _opts(**options)))

    def __repr__(self) -> str:
        return f"<Expr [{self._node!r}]>"

    # -- naming ------------------------------------------------------------------

    def alias(self, name: str) -> Expr:
        return Expr(E.EAlias(self._node, name))

    @property
    def name(self):
        return ExprNameNamespace(self)

    def meta_output_name(self) -> str | None:
        return E.output_name(self._node)

    @property
    def meta(self):
        return ExprMetaNamespace(self)

    @classmethod
    def deserialize(cls, source: Any, *, format: str = "json") -> Expr:
        from polars_tpu.plan.serialize import deserialize_expr

        if hasattr(source, "read"):
            data = source.read()
        elif isinstance(source, (str, bytes)) and not str(source).lstrip().startswith("{"):
            with open(source) as f:
                data = f.read()
        else:
            data = source
        return cls(deserialize_expr(data))

    @classmethod
    def from_json(cls, value: str) -> Expr:
        return cls.deserialize(value)

    def register_plugin(self, *args: Any, **kwargs: Any) -> Expr:
        from polars_tpu.errors import InvalidOperationError as _IOE

        raise _IOE(
            "expression plugins are compiled against the reference's Rust ABI "
            "and cannot load into the TPU engine; see polars_tpu.plugins"
        )

    @property
    def ext(self):
        return _ExtNamespaceShim()

    # -- binary ops -----------------------------------------------------------------

    def _bin(self, op: str, other: Any, *, swap: bool = False) -> Expr:
        rhs = parse_into_expr(other, str_as_lit=True)
        left, right = (rhs, self._node) if swap else (self._node, rhs)
        return Expr(E.EBinary(left, op, right))

    def __add__(self, other: Any) -> Expr:
        return self._bin("+", other)

    def __radd__(self, other: Any) -> Expr:
        return self._bin("+", other, swap=True)

    def __sub__(self, other: Any) -> Expr:
        return self._bin("-", other)

    def __rsub__(self, other: Any) -> Expr:
        return self._bin("-", other, swap=True)

    def __mul__(self, other: Any) -> Expr:
        return self._bin("*", other)

    def __rmul__(self, other: Any) -> Expr:
        return self._bin("*", other, swap=True)

    def __truediv__(self, other: Any) -> Expr:
        return self._bin("/", other)

    def __rtruediv__(self, other: Any) -> Expr:
        return self._bin("/", other, swap=True)

    def __floordiv__(self, other: Any) -> Expr:
        return self._bin("//", other)

    def __rfloordiv__(self, other: Any) -> Expr:
        return self._bin("//", other, swap=True)

    def __mod__(self, other: Any) -> Expr:
        return self._bin("%", other)

    def __rmod__(self, other: Any) -> Expr:
        return self._bin("%", other, swap=True)

    def __pow__(self, other: Any) -> Expr:
        return self._bin("**", other)

    def __rpow__(self, other: Any) -> Expr:
        return self._bin("**", other, swap=True)

    def __eq__(self, other: Any) -> Expr:  # type: ignore[override]
        return self._bin("==", other)

    def __ne__(self, other: Any) -> Expr:  # type: ignore[override]
        return self._bin("!=", other)

    def __lt__(self, other: Any) -> Expr:
        return self._bin("<", other)

    def __le__(self, other: Any) -> Expr:
        return self._bin("<=", other)

    def __gt__(self, other: Any) -> Expr:
        return self._bin(">", other)

    def __ge__(self, other: Any) -> Expr:
        return self._bin(">=", other)

    def __and__(self, other: Any) -> Expr:
        return self._bin("&", other)

    def __rand__(self, other: Any) -> Expr:
        return self._bin("&", other, swap=True)

    def __or__(self, other: Any) -> Expr:
        return self._bin("|", other)

    def __ror__(self, other: Any) -> Expr:
        return self._bin("|", other, swap=True)

    def __xor__(self, other: Any) -> Expr:
        return self._bin("^", other)

    def __invert__(self) -> Expr:
        return self._fn("not")

    def __neg__(self) -> Expr:
        # reference: FunctionExpr::Negate, same dtype, unsigned unsupported
        return self._fn("negate")

    def __pos__(self) -> Expr:
        return self

    def __hash__(self) -> int:
        return hash(self._node)

    def eq(self, other: Any) -> Expr:
        return self._bin("==", other)

    def eq_missing(self, other: Any) -> Expr:
        return self._bin("eq_missing", other)

    def ne(self, other: Any) -> Expr:
        return self._bin("!=", other)

    def ne_missing(self, other: Any) -> Expr:
        return self._bin("ne_missing", other)

    def lt(self, other: Any) -> Expr:
        return self._bin("<", other)

    def le(self, other: Any) -> Expr:
        return self._bin("<=", other)

    def gt(self, other: Any) -> Expr:
        return self._bin(">", other)

    def ge(self, other: Any) -> Expr:
        return self._bin(">=", other)

    def add(self, other: Any) -> Expr:
        return self._bin("+", other)

    def sub(self, other: Any) -> Expr:
        return self._bin("-", other)

    def mul(self, other: Any) -> Expr:
        return self._bin("*", other)

    def truediv(self, other: Any) -> Expr:
        return self._bin("/", other)

    def floordiv(self, other: Any) -> Expr:
        return self._bin("//", other)

    def mod(self, other: Any) -> Expr:
        return self._bin("%", other)

    def pow(self, other: Any) -> Expr:
        return self._bin("**", other)

    def not_(self) -> Expr:
        return self._fn("not")

    def and_(self, *others: Any) -> Expr:
        out = self
        for o in others:
            out = out._bin("&", o)
        return out

    def or_(self, *others: Any) -> Expr:
        out = self
        for o in others:
            out = out._bin("|", o)
        return out

    def xor(self, other: Any) -> Expr:
        return self._bin("^", other)

    # -- casts ----------------------------------------------------------------------

    def cast(self, dtype: Any, *, strict: bool = True, wrap_numerical: bool = False) -> Expr:
        if isinstance(dtype, dt.DataTypeExpr):
            return Expr(E.ECast(self._node, dtype, strict))
        return Expr(E.ECast(self._node, dt.parse_into_dtype(dtype), strict))

    # -- aggregations ------------------------------------------------------------------

    def _agg(self, kind: str, **options: Any) -> Expr:
        return Expr(E.EAgg(self._node, kind, _opts(**options)))

    def sum(self) -> Expr:
        return self._agg("sum")

    def mean(self) -> Expr:
        return self._agg("mean")

    def min(self) -> Expr:
        return self._agg("min")

    def max(self) -> Expr:
        return self._agg("max")

    def median(self) -> Expr:
        return self._agg("median")

    def std(self, ddof: int = 1) -> Expr:
        return self._agg("std", ddof=ddof)

    def var(self, ddof: int = 1) -> Expr:
        return self._agg("var", ddof=ddof)

    def count(self) -> Expr:
        return self._agg("count")

    def len(self) -> Expr:
        return self._agg("len")

    def first(self) -> Expr:
        return self._agg("first")

    def last(self) -> Expr:
        return self._agg("last")

    def n_unique(self) -> Expr:
        return self._agg("n_unique")

    def approx_n_unique(self) -> Expr:
        return self._agg("n_unique")

    def null_count(self) -> Expr:
        return self._agg("null_count")

    def product(self) -> Expr:
        return self._agg("product")

    def implode(self) -> Expr:
        return self._agg("implode")

    def quantile(self, quantile: float, interpolation: str = "nearest") -> Expr:
        return self._agg("quantile", quantile=quantile, interpolation=interpolation)

    def any(self, *, ignore_nulls: bool = True) -> Expr:
        return self._agg("any", ignore_nulls=ignore_nulls)

    def all(self, *, ignore_nulls: bool = True) -> Expr:
        return self._agg("all", ignore_nulls=ignore_nulls)

    def item(self, *, allow_empty: bool = False) -> Expr:
        return self._agg("item", allow_empty=allow_empty)

    def is_sorted(self, *, descending: bool | None = False, nulls_last: bool | None = False) -> Expr:
        return self._agg("is_sorted", descending=descending, nulls_last=nulls_last)

    def bitwise_and(self) -> Expr:
        return self._agg("bitwise_and")

    def bitwise_or(self) -> Expr:
        return self._agg("bitwise_or")

    def bitwise_xor(self) -> Expr:
        return self._agg("bitwise_xor")

    def arg_min(self) -> Expr:
        return self._agg("arg_min")

    def arg_max(self) -> Expr:
        return self._agg("arg_max")

    def skew(self, *, bias: bool = True) -> Expr:
        return self._agg("skew", bias=bias)

    def kurtosis(self, *, fisher: bool = True, bias: bool = True) -> Expr:
        return self._agg("kurtosis", fisher=fisher, bias=bias)

    def entropy(self, base: float = 2.718281828459045, *, normalize: bool = True) -> Expr:
        return self._agg("entropy", base=base, normalize=normalize)

    def agg_groups(self) -> Expr:
        return self._agg("agg_groups")

    # -- elementwise math -----------------------------------------------------------------

    def abs(self) -> Expr:
        return self._fn("abs")

    def round(self, decimals: int = 0) -> Expr:
        return self._fn("round", decimals=decimals)

    def floor(self) -> Expr:
        return self._fn("floor")

    def ceil(self) -> Expr:
        return self._fn("ceil")

    def sqrt(self) -> Expr:
        return self._fn("sqrt")

    def cbrt(self) -> Expr:
        return self._fn("cbrt")

    def exp(self) -> Expr:
        return self._fn("exp")

    def log(self, base: float | None = None) -> Expr:
        return self._fn("log", base=base)

    def log10(self) -> Expr:
        return self._fn("log10")

    def bitwise_count_ones(self) -> Expr:
        return self._fn("bitwise_count_ones")

    def bitwise_count_zeros(self) -> Expr:
        return self._fn("bitwise_count_zeros")

    def bitwise_leading_ones(self) -> Expr:
        return self._fn("bitwise_leading_ones")

    def bitwise_leading_zeros(self) -> Expr:
        return self._fn("bitwise_leading_zeros")

    def bitwise_trailing_ones(self) -> Expr:
        return self._fn("bitwise_trailing_ones")

    def bitwise_trailing_zeros(self) -> Expr:
        return self._fn("bitwise_trailing_zeros")

    def log1p(self) -> Expr:
        return self._fn("log1p")

    def sin(self) -> Expr:
        return self._fn("sin")

    def cos(self) -> Expr:
        return self._fn("cos")

    def tan(self) -> Expr:
        return self._fn("tan")

    def cot(self) -> Expr:
        return self._fn("cot")

    def arcsin(self) -> Expr:
        return self._fn("arcsin")

    def arccos(self) -> Expr:
        return self._fn("arccos")

    def arctan(self) -> Expr:
        return self._fn("arctan")

    def sinh(self) -> Expr:
        return self._fn("sinh")

    def cosh(self) -> Expr:
        return self._fn("cosh")

    def tanh(self) -> Expr:
        return self._fn("tanh")

    def arcsinh(self) -> Expr:
        return self._fn("arcsinh")

    def arccosh(self) -> Expr:
        return self._fn("arccosh")

    def arctanh(self) -> Expr:
        return self._fn("arctanh")

    def degrees(self) -> Expr:
        return self._fn("degrees")

    def radians(self) -> Expr:
        return self._fn("radians")

    def sign(self) -> Expr:
        return self._fn("sign")

    def clip(self, lower_bound: Any = None, upper_bound: Any = None) -> Expr:
        inputs = []
        has_lower = lower_bound is not None
        has_upper = upper_bound is not None
        if has_lower:
            inputs.append(lower_bound)
        if has_upper:
            inputs.append(upper_bound)
        return self._fn("clip", *inputs, has_lower=has_lower, has_upper=has_upper)

    # -- null handling ---------------------------------------------------------------------

    def is_null(self) -> Expr:
        return self._fn("is_null")

    def is_not_null(self) -> Expr:
        return self._fn("is_not_null")

    def is_nan(self) -> Expr:
        return self._fn("is_nan")

    def is_not_nan(self) -> Expr:
        return self._fn("is_not_nan")

    def is_finite(self) -> Expr:
        return self._fn("is_finite")

    def is_infinite(self) -> Expr:
        return self._fn("is_infinite")

    def fill_null(
        self,
        value: Any = None,
        strategy: str | None = None,
        limit: int | None = None,
    ) -> Expr:
        if value is not None and strategy is None:
            return self._fn("fill_null", value)
        if strategy is None:
            raise InvalidOperationError("must specify either a value or a strategy")
        return self._fn("fill_null_with_strategy", strategy=strategy, limit=limit)

    def fill_nan(self, value: Any) -> Expr:
        return self._fn("fill_nan", value)

    def drop_nulls(self) -> Expr:
        return Expr(E.EFilter(self._node, E.EFunction("is_not_null", (self._node,))))

    def drop_nans(self) -> Expr:
        return Expr(E.EFilter(self._node, E.EFunction("is_not_nan", (self._node,))))

    def coalesce(self, *others: Any) -> Expr:
        from polars_tpu.functions.lazy import coalesce

        return coalesce(self, *others)

    # -- membership / range -------------------------------------------------------------------

    def is_in(self, other: Any, *, nulls_equal: bool = False) -> Expr:
        return self._fn("is_in", other, nulls_equal=nulls_equal)

    def is_between(
        self, lower_bound: Any, upper_bound: Any, closed: str = "both"
    ) -> Expr:
        return self._fn("is_between", lower_bound, upper_bound, closed=closed)

    def is_duplicated(self) -> Expr:
        return self._fn("is_duplicated")

    def is_unique(self) -> Expr:
        return self._fn("is_unique")

    def is_first_distinct(self) -> Expr:
        return self._fn("is_first_distinct")

    def is_last_distinct(self) -> Expr:
        return self._fn("is_last_distinct")

    def unique(self, *, maintain_order: bool = False) -> Expr:
        return self._fn("unique", maintain_order=maintain_order)

    def unique_counts(self) -> Expr:
        return self._fn("unique_counts")

    def value_counts(self, *, sort: bool = False, parallel: bool = False, name: str = "count", normalize: bool = False) -> Expr:
        return self._fn(
            "value_counts",
            sort=sort, count_name=name, normalize=normalize,
            _field=E.output_name(self._node) or "",
        )

    def mode(self) -> Expr:
        return self._agg("mode")

    # -- positional ---------------------------------------------------------------------------

    def shift(self, n: int = 1, *, fill_value: Any = None) -> Expr:
        if fill_value is None:
            return self._fn("shift", n=n)
        return self._fn("shift_fill", fill_value, n=n)

    def diff(self, n: int = 1, null_behavior: str = "ignore") -> Expr:
        out = self._fn("diff", n=n, null_behavior="ignore")
        if null_behavior == "drop":
            # drop the first |n| undefined rows (reference: diff NullBehavior)
            return out.slice(n, None) if n >= 0 else out.slice(0, None)
        return out

    def pct_change(self, n: int = 1) -> Expr:
        return self._fn("pct_change", n=n)

    def cum_sum(self, *, reverse: bool = False) -> Expr:
        return self._fn("cum_sum", reverse=reverse)

    def cum_prod(self, *, reverse: bool = False) -> Expr:
        return self._fn("cum_prod", reverse=reverse)

    def cum_min(self, *, reverse: bool = False) -> Expr:
        return self._fn("cum_min", reverse=reverse)

    def cum_max(self, *, reverse: bool = False) -> Expr:
        return self._fn("cum_max", reverse=reverse)

    def cum_count(self, *, reverse: bool = False) -> Expr:
        return self._fn("cum_count", reverse=reverse)

    def cumulative_eval(self, expr: Expr, *, min_samples: int = 1) -> Expr:
        return self._fn("cumulative_eval", expr=expr._node, min_samples=min_samples)

    def rolling_sum(self, window_size: int, *, weights: Any = None, min_samples: int | None = None, center: bool = False) -> Expr:
        return self._fn("rolling_sum", window_size=window_size, min_samples=min_samples, center=center, weights=_weights_list(weights))

    def rolling_mean(self, window_size: int, *, weights: Any = None, min_samples: int | None = None, center: bool = False) -> Expr:
        return self._fn("rolling_mean", window_size=window_size, min_samples=min_samples, center=center, weights=_weights_list(weights))

    def rolling_min(self, window_size: int, *, weights: Any = None, min_samples: int | None = None, center: bool = False) -> Expr:
        return self._fn("rolling_min", window_size=window_size, min_samples=min_samples, center=center, weights=_weights_list(weights))

    def rolling_max(self, window_size: int, *, weights: Any = None, min_samples: int | None = None, center: bool = False) -> Expr:
        return self._fn("rolling_max", window_size=window_size, min_samples=min_samples, center=center, weights=_weights_list(weights))

    def rolling_std(self, window_size: int, *, weights: Any = None, ddof: int = 1, min_samples: int | None = None, center: bool = False) -> Expr:
        return self._fn("rolling_std", window_size=window_size, ddof=ddof, min_samples=min_samples, center=center, weights=_weights_list(weights))

    def rolling_var(self, window_size: int, *, weights: Any = None, ddof: int = 1, min_samples: int | None = None, center: bool = False) -> Expr:
        return self._fn("rolling_var", window_size=window_size, ddof=ddof, min_samples=min_samples, center=center, weights=_weights_list(weights))

    def ewm_mean(self, *, com: float | None = None, span: float | None = None, half_life: float | None = None, alpha: float | None = None, adjust: bool = True, min_samples: int = 1, ignore_nulls: bool = False) -> Expr:
        return self._fn("ewm_mean", com=com, span=span, half_life=half_life, alpha=alpha, adjust=adjust, ignore_nulls=ignore_nulls, min_samples=min_samples)

    def ewm_sum(self, *, com: float | None = None, span: float | None = None, half_life: float | None = None, alpha: float | None = None, min_samples: int = 1, ignore_nulls: bool = False) -> Expr:
        return self._fn("ewm_sum", com=com, span=span, half_life=half_life, alpha=alpha, min_samples=min_samples, ignore_nulls=ignore_nulls)

    def ewm_mean_by(self, by: Any, *, half_life: Any) -> Expr:
        by_e = by if isinstance(by, Expr) else Expr(parse_into_expr(by))
        return Expr(E.EFunction("ewm_mean_by", (self._node, by_e._node), (("half_life", half_life),)))

    def ewm_sum_by(self, by: Any, *, half_life: Any) -> Expr:
        by_e = by if isinstance(by, Expr) else Expr(parse_into_expr(by))
        return Expr(E.EFunction("ewm_sum_by", (self._node, by_e._node), (("half_life", half_life),)))

    def interpolate_by(self, by: Any) -> Expr:
        by_e = by if isinstance(by, Expr) else Expr(parse_into_expr(by))
        return Expr(E.EFunction("interpolate_by", (self._node, by_e._node), ()))

    def truncate(self, decimals: int = 0) -> Expr:
        return self._fn("truncate", decimals=decimals)

    def reinterpret(self, *, signed: bool | None = None, dtype: Any = None) -> Expr:
        return self._fn("reinterpret", signed=signed, dtype=dtype)

    def hist(self, bins: Any = None, *, bin_count: int | None = None, include_category: bool = False, include_breakpoint: bool = False) -> Expr:
        return self._fn(
            "hist",
            bins=tuple(bins) if bins is not None else None,
            bin_count=bin_count,
            include_category=include_category,
            include_breakpoint=include_breakpoint,
        )

    def reshape(self, dimensions: tuple) -> Expr:
        return self._fn("reshape", dimensions=tuple(int(d) for d in dimensions))

    def inspect(self, fmt: str = "{}") -> Expr:
        def _show(s):
            print(fmt.format(s))
            return s

        return self.map_batches(_show)

    def rolling_median_by(self, by: Any, window_size: str, *, min_samples: int = 1, closed: str = "right") -> Expr:
        return self._rolling_by("median", by, window_size, min_samples, closed)

    def rolling_quantile_by(self, by: Any, window_size: str, *, quantile: float = 0.5, interpolation: str = "nearest", min_samples: int = 1, closed: str = "right") -> Expr:
        by_e = by if isinstance(by, Expr) else Expr(parse_into_expr(by))
        return Expr(E.EFunction(
            "rolling_quantile_by", (self._node, by_e._node),
            (("window_size", window_size), ("min_samples", min_samples), ("closed", closed), ("quantile", quantile), ("interpolation", interpolation)),
        ))

    def rolling_rank_by(self, by: Any, window_size: str, *, method: str = "average", descending: bool = False, seed: int | None = None, min_samples: int = 1, closed: str = "right") -> Expr:
        by_e = by if isinstance(by, Expr) else Expr(parse_into_expr(by))
        return Expr(E.EFunction(
            "rolling_rank_by", (self._node, by_e._node),
            (("window_size", window_size), ("min_samples", min_samples), ("closed", closed), ("method", method), ("descending", descending)),
        ))

    def rolling(self, index_column: Any, *, period: Any, offset: Any = None, closed: str = "right") -> Expr:
        """Postfix temporal-window grouping on an aggregation expression:
        `pl.col("v").sum().rolling(index_column="t", period="2d")` desugars to
        the traced `rolling_sum_by` path (reference: Expr.rolling)."""
        node = self._node
        if not isinstance(node, E.EAgg):
            raise InvalidOperationError(
                ".rolling() must be applied to an aggregation expression "
                "(e.g. pl.col('v').sum().rolling(...))"
            )
        if offset is not None:
            raise InvalidOperationError("Expr.rolling with a custom offset is not supported yet")
        inner = Expr(node.input)
        kind = node.kind
        if kind in ("sum", "mean", "min", "max", "first", "last", "count"):
            return inner._rolling_by(kind, index_column, period, 1, closed)
        if kind in ("std", "var"):
            return inner._rolling_by(kind, index_column, period, 1, closed, node.opt("ddof", 1))
        if kind == "median":
            return inner.rolling_median_by(index_column, period, closed=closed)
        if kind == "quantile":
            return inner.rolling_quantile_by(
                index_column, period,
                quantile=node.opt("quantile", 0.5),
                interpolation=node.opt("interpolation", "nearest"),
                closed=closed,
            )
        raise InvalidOperationError(f".rolling() does not support aggregation {kind!r}")

    def rolling_map(self, function: Any, window_size: int, *, weights: Any = None, min_samples: int | None = None, center: bool = False) -> Expr:
        return self._fn(
            "rolling_map",
            function=function,
            window_size=window_size,
            min_samples=min_samples if min_samples is not None else window_size,
            center=center,
        )

    def peak_min(self) -> Expr:
        return self._fn("peak_min")

    def peak_max(self) -> Expr:
        return self._fn("peak_max")

    def rolling_median(self, window_size: int, *, weights: Any = None, min_samples: int | None = None, center: bool = False) -> Expr:
        return self._fn("rolling_median", window_size=window_size, min_samples=min_samples, weights=_weights_list(weights), center=center)

    def _rolling_by(self, kind: str, by: Any, window_size: str, min_samples: int, closed: str, ddof: int = 1) -> Expr:
        by_e = by if isinstance(by, Expr) else Expr(parse_into_expr(by))
        return Expr(E.EFunction(
            f"rolling_{kind}_by", (self._node, by_e._node),
            (("window_size", window_size), ("min_samples", min_samples), ("closed", closed), ("ddof", ddof)),
        ))

    def rolling_sum_by(self, by: Any, window_size: str, *, min_samples: int = 1, closed: str = "right") -> Expr:
        return self._rolling_by("sum", by, window_size, min_samples, closed)

    def rolling_mean_by(self, by: Any, window_size: str, *, min_samples: int = 1, closed: str = "right") -> Expr:
        return self._rolling_by("mean", by, window_size, min_samples, closed)

    def rolling_min_by(self, by: Any, window_size: str, *, min_samples: int = 1, closed: str = "right") -> Expr:
        return self._rolling_by("min", by, window_size, min_samples, closed)

    def rolling_max_by(self, by: Any, window_size: str, *, min_samples: int = 1, closed: str = "right") -> Expr:
        return self._rolling_by("max", by, window_size, min_samples, closed)

    def rolling_std_by(self, by: Any, window_size: str, *, min_samples: int = 1, closed: str = "right", ddof: int = 1) -> Expr:
        return self._rolling_by("std", by, window_size, min_samples, closed, ddof)

    def rolling_var_by(self, by: Any, window_size: str, *, min_samples: int = 1, closed: str = "right", ddof: int = 1) -> Expr:
        return self._rolling_by("var", by, window_size, min_samples, closed, ddof)

    def rolling_quantile(self, quantile: float, interpolation: str = "nearest", window_size: int = 2, *, weights: Any = None, min_samples: int | None = None, center: bool = False) -> Expr:
        return self._fn("rolling_quantile", window_size=window_size, quantile=quantile, interpolation=interpolation, min_samples=min_samples, weights=_weights_list(weights), center=center)

    def rolling_rank(self, window_size: int, *, method: str = "average", descending: bool = False, seed: int | None = None, min_samples: int | None = None) -> Expr:
        return self._fn("rolling_rank", window_size=window_size, method=method, min_samples=min_samples, descending=descending, seed=seed)

    def rolling_skew(self, window_size: int, *, bias: bool = True, min_samples: int | None = None, center: bool = False) -> Expr:
        return self._fn("rolling_skew", window_size=window_size, bias=bias, min_samples=min_samples, center=center)

    def rolling_kurtosis(self, window_size: int, *, fisher: bool = True, bias: bool = True, min_samples: int | None = None, center: bool = False) -> Expr:
        return self._fn("rolling_kurtosis", window_size=window_size, fisher=fisher, bias=bias, min_samples=min_samples, center=center)

    def ewm_std(self, *, com: float | None = None, span: float | None = None, half_life: float | None = None, alpha: float | None = None, adjust: bool = True, min_samples: int = 1, ignore_nulls: bool = False, bias: bool = False) -> Expr:
        return self._fn("ewm_std", com=com, span=span, half_life=half_life, alpha=alpha, adjust=adjust, ignore_nulls=ignore_nulls, min_samples=min_samples, bias=bias)

    def ewm_var(self, *, com: float | None = None, span: float | None = None, half_life: float | None = None, alpha: float | None = None, adjust: bool = True, min_samples: int = 1, ignore_nulls: bool = False, bias: bool = False) -> Expr:
        return self._fn("ewm_var", com=com, span=span, half_life=half_life, alpha=alpha, adjust=adjust, ignore_nulls=ignore_nulls, min_samples=min_samples, bias=bias)

    def cut(self, breaks: Any, *, labels: Any = None, left_closed: bool = False, include_breaks: bool = False) -> Expr:
        cat = self._fn("cut", breaks=tuple(breaks), labels=tuple(labels) if labels is not None else None, left_closed=left_closed)
        if not include_breaks:
            return cat
        bp = self._fn("cut_breakpoint", breaks=tuple(breaks), left_closed=left_closed)
        return self._include_breaks_struct(bp, cat)

    def qcut(self, quantiles: Any, *, labels: Any = None, left_closed: bool = False, allow_duplicates: bool = False, include_breaks: bool = False) -> Expr:
        if isinstance(quantiles, int):
            quantiles = [i / quantiles for i in range(1, quantiles)]
        cat = self._fn("qcut", quantiles=tuple(quantiles), labels=tuple(labels) if labels is not None else None, left_closed=left_closed)
        if not include_breaks:
            return cat
        bp = self._fn("qcut_breakpoint", quantiles=tuple(quantiles), left_closed=left_closed)
        return self._include_breaks_struct(bp, cat)

    def _include_breaks_struct(self, bp: Expr, cat: Expr) -> Expr:
        """struct{breakpoint, category} for include_breaks=True (reference
        py-polars tests test_cut_include_breaks)."""
        from polars_tpu.functions.lazy import struct as _struct

        out = _struct(bp.alias("breakpoint"), cat.alias("category"))
        name = self.meta_output_name()
        return out.alias(name) if name else out

    def interpolate(self, method: str = "linear") -> Expr:
        return self._fn("interpolate", method=method)

    def forward_fill(self, limit: int | None = None) -> Expr:
        return self._fn("forward_fill", limit=limit)

    def backward_fill(self, limit: int | None = None) -> Expr:
        return self._fn("backward_fill", limit=limit)

    def rank(self, method: str = "average", *, descending: bool = False, seed: int | None = None) -> Expr:
        return self._fn("rank", method=method, descending=descending, seed=seed)

    def reverse(self) -> Expr:
        return self._fn("reverse")

    def head(self, n: int = 10) -> Expr:
        return Expr(E.ESlice(self._node, 0, n))

    def tail(self, n: int = 10) -> Expr:
        return Expr(E.ESlice(self._node, -n, None))

    def limit(self, n: int = 10) -> Expr:
        return self.head(n)

    def slice(self, offset: int, length: int | None = None) -> Expr:
        return Expr(E.ESlice(self._node, offset, length))

    def gather(self, indices: Any) -> Expr:
        return Expr(E.EGather(self._node, parse_into_expr(indices)))

    def get(self, index: Any) -> Expr:
        return Expr(E.EGather(self._node, parse_into_expr(index)))

    def gather_every(self, n: int, offset: int = 0) -> Expr:
        return self._fn("gather_every", n=n, offset=offset)

    def repeat_by(self, by: Any) -> Expr:
        # strings are COLUMN names here (py-polars repeat_by semantics)
        return self._fn("repeat_by", parse_into_expr(by))

    def explode(self) -> Expr:
        return self._fn("explode")

    def flatten(self) -> Expr:
        return self._fn("explode")

    # -- sorting ----------------------------------------------------------------------------------

    def sort(self, *, descending: bool = False, nulls_last: bool = False) -> Expr:
        return Expr(E.ESort(self._node, descending, nulls_last))

    def arg_sort(self, *, descending: bool = False, nulls_last: bool = False) -> Expr:
        return self._fn("arg_sort", descending=descending, nulls_last=nulls_last)

    def sort_by(
        self,
        by: Any,
        *more_by: Any,
        descending: bool | Sequence[bool] = False,
        nulls_last: bool | Sequence[bool] = False,
    ) -> Expr:
        by_nodes = tuple(parse_into_expr(b) for b in _flat((by, *more_by)))
        k = len(by_nodes)
        desc = tuple(descending) if isinstance(descending, (list, tuple)) else (descending,) * k
        nl = tuple(nulls_last) if isinstance(nulls_last, (list, tuple)) else (nulls_last,) * k
        return Expr(E.ESortBy(self._node, by_nodes, desc, nl))

    def top_k(self, k: int = 5) -> Expr:
        return Expr(E.ESlice(E.ESort(self._node, True, True), 0, k))

    def bottom_k(self, k: int = 5) -> Expr:
        return Expr(E.ESlice(E.ESort(self._node, False, True), 0, k))

    def search_sorted(self, element: Any, side: str = "any") -> Expr:
        return self._fn("search_sorted", element, side=side)

    # -- filtering ---------------------------------------------------------------------------------

    def filter(self, *predicates: Any) -> Expr:
        from polars_tpu.functions.lazy import all_horizontal

        pred = all_horizontal(*predicates)
        return Expr(E.EFilter(self._node, pred._node))

    def where(self, predicate: Any) -> Expr:
        return self.filter(predicate)

    # -- windows ------------------------------------------------------------------------------------

    def over(
        self,
        partition_by: Any,
        *more_exprs: Any,
        order_by: Any = None,
        descending: Any = False,
        mapping_strategy: str = "group_to_rows",
    ) -> Expr:
        parts = tuple(parse_into_expr(p) for p in _flat((partition_by, *more_exprs)))
        order = ()
        if order_by is not None:
            order = tuple(parse_into_expr(o) for o in _flat((order_by,)))
        desc = tuple(descending) if isinstance(descending, (list, tuple)) else (bool(descending),) * len(order)
        return Expr(E.EWindow(self._node, parts, order, mapping_strategy, desc))

    # -- UDF ------------------------------------------------------------------------------------------

    def map_batches(
        self,
        function: Callable,
        return_dtype: Any = None,
        *,
        agg_list: bool = False,
        is_elementwise: bool = False,
    ) -> Expr:
        return Expr(
            E.EAnonymous(
                (self._node,),
                function=function,
                return_dtype=dt.parse_into_dtype(return_dtype) if return_dtype is not None else None,
                ident=obj_token(function),
            )
        )

    def map_elements(
        self,
        function: Callable,
        return_dtype: Any = None,
        **kwargs: Any,
    ) -> Expr:
        def batch_fn(s):
            from polars_tpu.core.series import Series

            return Series(s.name, [None if v is None else function(v) for v in s.to_list()],
                          dtype=return_dtype)

        return Expr(
            E.EAnonymous(
                (self._node,),
                function=batch_fn,
                return_dtype=dt.parse_into_dtype(return_dtype) if return_dtype is not None else None,
                ident=obj_token(function),
            )
        )

    # -- misc -----------------------------------------------------------------------------------------

    def hash(self, seed: int = 0, *more_seeds: int) -> Expr:
        # fold the k1/k2/k3 seeds into one 64-bit mix (this engine's hash
        # values are engine-specific anyway; the reference feeds all four
        # seeds to xxhash — what matters is that DIFFERENT seeds produce
        # DIFFERENT hashes, which a fold preserves)
        s = seed & 0xFFFFFFFFFFFFFFFF
        for i, m in enumerate(more_seeds):
            s ^= (int(m) * (0x9E3779B97F4A7C15 + 2 * i + 1)) & 0xFFFFFFFFFFFFFFFF
        if s >= 1 << 63:  # signed two's-complement form (CLAUDE.md: uint64-
            s -= 1 << 64  # domain constants overflow JAX weak-int parsing)
        return self._fn("hash", seed=s)

    @staticmethod
    def _replace_pairs(old: Any, new: Any) -> tuple[tuple, tuple]:
        if isinstance(old, dict):
            olds = list(old.keys())
            news = list(old.values())
        else:
            olds, news = old, new
        if not isinstance(olds, (list, tuple)):
            olds, news = [olds], [news]
        return tuple(olds), tuple(news)

    def replace(self, old: Any, new: Any = None) -> Expr:
        # old/new are static mapping tables (host-side), not expression inputs
        olds, news = self._replace_pairs(old, new)
        return self._fn("replace", olds=olds, news=news)

    def replace_strict(self, old: Any, new: Any = None, *, default: Any = None, return_dtype: Any = None) -> Expr:
        olds, news = self._replace_pairs(old, new)
        return self._fn(
            "replace_strict", olds=olds, news=news, default=default,
            return_dtype=dt.parse_into_dtype(return_dtype) if return_dtype is not None else None,
        )

    def repeat(self, n: int) -> Expr:
        return self._fn("repeat", n=n)

    def append(self, other: Any) -> Expr:
        return self._fn("append", other)

    def exclude(self, *names: str) -> Expr:
        if isinstance(self._node, (E.EColumns, E.ESelector)):
            excl = E.ESelector("by_name", tuple(_flat(names)))
            return Expr(
                E.ESelector("set", (), op="difference",
                            left=_as_selector(self._node), right=excl)
            )
        raise InvalidOperationError("exclude() only valid on wildcard/selector expressions")

    def rechunk(self) -> Expr:
        return self

    def set_sorted(self, *, descending: bool = False) -> Expr:
        return self._fn("set_sorted", descending=descending)

    def shrink_dtype(self) -> Expr:
        return self._fn("shrink_dtype")

    def to_physical(self) -> Expr:
        return self._fn("to_physical")

    def pipe(self, function: Callable, *args: Any, **kwargs: Any) -> Any:
        return function(self, *args, **kwargs)

    def extend_constant(self, value: Any, n: int) -> Expr:
        return self._fn("extend_constant", value, n=n)

    def dot(self, other: Any) -> Expr:
        return (self * other).sum()

    # -- py-polars parity batch (round 1) ---------------------------------------

    def neg(self) -> Expr:
        return -self

    def has_nulls(self) -> Expr:
        return self.null_count() > 0

    def is_empty(self) -> Expr:
        return self.len() == 0

    def nan_max(self) -> Expr:
        import polars_tpu as pl

        return pl.when(self.is_nan().any()).then(float("nan")).otherwise(self.max())

    def nan_min(self) -> Expr:
        import polars_tpu as pl

        return pl.when(self.is_nan().any()).then(float("nan")).otherwise(self.min())

    def is_close(self, other: Any, *, abs_tol: float = 1e-12, rel_tol: float = 1e-9, nans_equal: bool = False) -> Expr:
        other = parse_into_expr(other) if not isinstance(other, Expr) else other
        o = other if isinstance(other, Expr) else Expr(other)
        close = (self - o).abs() <= (abs_tol + rel_tol * o.abs())
        if nans_equal:
            return close | (self.is_nan() & o.is_nan())
        return close

    def max_by(self, by: Any) -> Expr:
        by_e = by if isinstance(by, Expr) else Expr(parse_into_expr(by))
        return self.sort_by(by_e, descending=True).first()

    def min_by(self, by: Any) -> Expr:
        by_e = by if isinstance(by, Expr) else Expr(parse_into_expr(by))
        return self.sort_by(by_e).first()

    def top_k_by(self, by: Any, k: int = 5) -> Expr:
        by_e = by if isinstance(by, Expr) else Expr(parse_into_expr(by))
        return self.sort_by(by_e, descending=True).head(k)

    def bottom_k_by(self, by: Any, k: int = 5) -> Expr:
        by_e = by if isinstance(by, Expr) else Expr(parse_into_expr(by))
        return self.sort_by(by_e).head(k)

    def index_of(self, element: Any) -> Expr:
        import polars_tpu as pl

        hit = self == element
        return pl.when(hit.any()).then((~hit).cast(int).arg_min()).otherwise(None)

    def rle_id(self) -> Expr:
        return self._fn("rle_id")

    def arg_true(self) -> Expr:
        return self._fn("arg_where_self")

    def arg_unique(self) -> Expr:
        return self.is_first_distinct().arg_true()

    def round_sig_figs(self, digits: int) -> Expr:
        return self._fn("round_sig_figs", digits=digits)

    def lower_bound(self) -> Expr:
        return self._fn("lower_bound")

    def upper_bound(self) -> Expr:
        return self._fn("upper_bound")

    def sample(self, n: int | None = None, *, fraction: float | None = None,
               with_replacement: bool = False, shuffle: bool = False, seed: int | None = None) -> Expr:
        return self._fn("sample", n=n, fraction=fraction,
                        with_replacement=with_replacement, shuffle=shuffle, seed=seed)

    def shuffle(self, seed: int | None = None) -> Expr:
        return self._fn("shuffle", seed=seed)

    def rle(self) -> Expr:
        return self._fn("rle")

    # -- namespaces --------------------------------------------------------------------------------------

    @property
    def str(self):
        from polars_tpu.expr.string import ExprStringNamespace

        return ExprStringNamespace(self)

    @property
    def dt(self):
        from polars_tpu.expr.datetime import ExprDateTimeNamespace

        return ExprDateTimeNamespace(self)

    @property
    def cat(self):
        from polars_tpu.expr.categorical import ExprCatNamespace

        return ExprCatNamespace(self)

    @property
    def list(self):
        from polars_tpu.expr.list import ExprListNamespace

        return ExprListNamespace(self)

    @property
    def arr(self):
        from polars_tpu.expr.list import ExprListNamespace

        return ExprListNamespace(self)

    @property
    def bin(self):
        from polars_tpu.expr.binary import ExprBinaryNamespace

        return ExprBinaryNamespace(self)

    @property
    def struct(self):
        from polars_tpu.expr.struct import ExprStructNamespace

        return ExprStructNamespace(self)


class ExprNameNamespace:
    __slots__ = ("_expr",)

    def __init__(self, expr: Expr) -> None:
        self._expr = expr

    def keep(self) -> Expr:
        return Expr(E.EKeepName(self._expr._node))

    def prefix(self, prefix: str) -> Expr:
        return Expr(E.ERenameFn(self._expr._node, "prefix", prefix))

    def suffix(self, suffix: str) -> Expr:
        return Expr(E.ERenameFn(self._expr._node, "suffix", suffix))

    def to_lowercase(self) -> Expr:
        return Expr(E.ERenameFn(self._expr._node, "to_lowercase"))

    def to_uppercase(self) -> Expr:
        return Expr(E.ERenameFn(self._expr._node, "to_uppercase"))

    def map(self, function: Callable) -> Expr:
        return Expr(E.ERenameFn(self._expr._node, "map", function))

    def replace(self, pattern: str, value: str, *, literal: bool = False) -> Expr:
        return Expr(E.ERenameFn(self._expr._node, "replace", (pattern, value, literal)))

    def map_fields(self, function: Callable) -> Expr:
        return Expr(
            E.EFunction(
                "struct.map_field_names", (self._expr._node,),
                (("kind", "map"), ("arg", function)),
            )
        )

    def prefix_fields(self, prefix: str) -> Expr:
        return Expr(
            E.EFunction(
                "struct.map_field_names", (self._expr._node,),
                (("kind", "prefix"), ("arg", prefix)),
            )
        )

    def suffix_fields(self, suffix: str) -> Expr:
        return Expr(
            E.EFunction(
                "struct.map_field_names", (self._expr._node,),
                (("kind", "suffix"), ("arg", suffix)),
            )
        )


class _ExtNamespaceShim:
    """Placeholder for registered extension-expression namespaces: any access
    raises, since no extension dtypes register expression namespaces here."""

    def __getattr__(self, name: str):
        raise InvalidOperationError(
            f"extension expression namespace {name!r} is not registered in this build"
        )


class ExprMetaNamespace:
    __slots__ = ("_expr",)

    def __init__(self, expr: Expr) -> None:
        self._expr = expr

    def output_name(self, *, raise_if_undetermined: bool = True) -> str | None:
        name = E.output_name(self._expr._node)
        if name is None and raise_if_undetermined:
            raise InvalidOperationError("cannot determine output name")
        return name

    def root_names(self) -> list[str]:
        return E.root_column_names(self._expr._node)

    def has_multiple_outputs(self) -> bool:
        return any(
            isinstance(n, (E.EColumns, E.EDtypeColumns, E.ESelector))
            for n in E.walk(self._expr._node)
        )

    def is_column(self) -> bool:
        return isinstance(self._expr._node, E.EColumn)

    def eq(self, other: Expr) -> bool:
        return self._expr._node == other._node

    def ne(self, other: Expr) -> bool:
        return self._expr._node != other._node

    def tree_format(self) -> str:
        return repr(self._expr._node)

    def serialize(self, file: Any = None, *, format: str = "json") -> str | None:
        from polars_tpu.plan.serialize import serialize_expr

        data = serialize_expr(self._expr._node)
        if file is None:
            return data
        if hasattr(file, "write"):
            file.write(data)
        else:
            with open(file, "w") as f:
                f.write(data)
        return None

    def write_json(self, file: Any = None) -> str | None:
        """Deprecated alias of serialize(format='json')."""
        return self.serialize(file)

    def is_literal(self, *, allow_aliasing: bool = False) -> bool:
        n = self._expr._node
        while allow_aliasing and isinstance(n, (E.EAlias, E.EKeepName)):
            n = n.input
        return isinstance(n, (E.ELiteral, E.ESeriesLit))

    def is_column_selection(self, *, allow_aliasing: bool = False) -> bool:
        n = self._expr._node
        while allow_aliasing and isinstance(n, (E.EAlias, E.EKeepName)):
            n = n.input
        return isinstance(n, (E.EColumn, E.EColumns, E.EDtypeColumns, E.ESelector))

    def is_regex_projection(self) -> bool:
        n = self._expr._node
        return isinstance(n, E.EColumns) and any(
            isinstance(x, str) and x.startswith("^") for x in (n.names or ())
        )

    def pop(self, *, schema: Any = None) -> list[Expr]:
        """The root node's direct input expressions."""
        return [Expr(c) for c in self._expr._node.children()]

    def undo_aliases(self) -> Expr:
        def strip(n: E.ENode) -> E.ENode:
            while isinstance(n, (E.EAlias, E.EKeepName)):
                n = n.input
            kids = n.children()
            if not kids:
                return n
            new = tuple(strip(k) for k in kids)
            if new == kids:
                return n
            from polars_tpu.plan.schema_resolve import _rebuild_expr

            return _rebuild_expr(n, new)

        return Expr(strip(self._expr._node))

    def as_selector(self):
        import polars_tpu.selectors as cs

        n = self._expr._node
        if isinstance(n, E.EColumn):
            return cs.by_name(n.name)
        if isinstance(n, E.EColumns) and n.names:
            return cs.by_name(*n.names)
        if isinstance(n, E.ESelector):
            from polars_tpu.selectors import Selector

            return Selector(n) if not isinstance(self._expr, Selector) else self._expr
        raise InvalidOperationError("expression is not a column selection")

    def as_expression(self) -> Expr:
        return Expr(self._expr._node)

    def show_graph(self, *, show: bool = True, output_path: Any = None,
                   raw_output: bool = False, figsize: Any = None) -> str | None:
        """Render the expression tree (text form — no graphviz in this build)."""
        out = self.tree_format()
        if output_path is not None:
            with open(output_path, "w") as f:
                f.write(out)
        return out


def _flat(items: Any) -> list[Any]:
    out: list[Any] = []
    for it in items:
        if isinstance(it, (list, tuple)):
            out.extend(_flat(it))
        else:
            out.append(it)
    return out


def _as_selector(node: E.ENode) -> E.ENode:
    if isinstance(node, E.EColumns) and not node.names:
        return E.ESelector("all")
    return node
