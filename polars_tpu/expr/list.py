"""List expression namespace — minimal round-1 surface.

List columns are stored exploded + offsets on device; most list ops are gated
until the nested layout lands (reference: py-polars expr/list.py).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any

if TYPE_CHECKING:
    from polars_tpu.expr.expr import Expr


class ExprListNamespace:
    __slots__ = ("_expr",)

    def __init__(self, expr: Expr) -> None:
        self._expr = expr

    def _fn(self, name: str, *inputs: Any, **options: Any) -> Expr:
        return self._expr._fn(f"list.{name}", *inputs, **options)

    def len(self) -> Expr:
        return self._fn("len")

    def sum(self) -> Expr:
        return self._fn("sum")

    def mean(self) -> Expr:
        return self._fn("mean")

    def min(self) -> Expr:
        return self._fn("min")

    def max(self) -> Expr:
        return self._fn("max")

    def first(self) -> Expr:
        return self._fn("get", index=0, null_on_oob=True)

    def last(self) -> Expr:
        return self._fn("get", index=-1, null_on_oob=True)

    def get(self, index: int, *, null_on_oob: bool = False) -> Expr:
        # reference default RAISES on out-of-bounds (py-polars expr/list.py
        # get, null_on_oob=False)
        return self._fn("get", index=index, null_on_oob=null_on_oob)

    def reverse(self) -> Expr:
        return self._fn("reverse")

    def item(self, *, allow_empty: bool = False) -> Expr:
        return self._fn("item", allow_empty=allow_empty)

    def to_list(self) -> Expr:
        # Array -> List cast (reference: expr/array.py to_list); the packed
        # layout is shared, so this is a dtype-level change
        from polars_tpu import datatypes as dt

        return self._expr.cast(dt.DataTypeExpr("self_to_list"))

    def sort(self, *, descending: bool = False, nulls_last: bool = False) -> Expr:
        return self._fn("sort", descending=descending, nulls_last=nulls_last)

    def unique(self, *, maintain_order: bool = False) -> Expr:
        return self._fn("unique", maintain_order=maintain_order)

    def contains(self, item: Any) -> Expr:
        return self._fn("contains", item)

    def join(self, separator: str, *, ignore_nulls: bool = True) -> Expr:
        return self._fn("join", separator=separator, ignore_nulls=ignore_nulls)

    def explode(self) -> Expr:
        return self._expr._fn("explode")

    # --- round-3 long tail (verdict #4; reference: py-polars expr/list.py) ---

    def slice(self, offset: int, length: int | None = None) -> Expr:
        return self._fn("slice", offset=offset, length=length)

    def head(self, n: int = 5) -> Expr:
        return self._fn("head", n=n)

    def tail(self, n: int = 5) -> Expr:
        return self._fn("tail", n=n)

    def shift(self, n: int = 1) -> Expr:
        return self._fn("shift", n=n)

    def diff(self, n: int = 1, null_behavior: str = "ignore") -> Expr:
        return self._fn("diff", n=n, null_behavior=null_behavior)

    def drop_nulls(self) -> Expr:
        return self._fn("drop_nulls")

    def arg_min(self) -> Expr:
        return self._fn("arg_min")

    def arg_max(self) -> Expr:
        return self._fn("arg_max")

    def any(self) -> Expr:
        return self._fn("any")

    def all(self) -> Expr:
        return self._fn("all")

    def n_unique(self) -> Expr:
        return self._fn("n_unique")

    def count_matches(self, element: Any) -> Expr:
        return self._fn("count_matches", element)

    def var(self, ddof: int = 1) -> Expr:
        return self._fn("var", ddof=ddof)

    def std(self, ddof: int = 1) -> Expr:
        return self._fn("std", ddof=ddof)

    def median(self) -> Expr:
        return self._fn("median")

    def _set_other(self, other: Any) -> Any:
        """A str names a column; a plain collection is a literal list
        (reference py-polars expr/list.py set_union arg handling)."""
        from polars_tpu.expr.expr import Expr as _Expr
        from polars_tpu.functions.lazy import col, lit

        if isinstance(other, str):
            return col(other)
        if isinstance(other, _Expr):
            return other
        if isinstance(other, (set, frozenset)):
            other = list(other)
        if isinstance(other, (list, tuple)):
            # one-row List literal, broadcast over rows by list_set_op
            from polars_tpu.core.series import Series as _Series

            return lit(_Series("literal", [list(other)]))
        return other

    def set_union(self, other: Any) -> Expr:
        return self._fn("set_union", self._set_other(other))

    def set_intersection(self, other: Any) -> Expr:
        return self._fn("set_intersection", self._set_other(other))

    def set_difference(self, other: Any) -> Expr:
        return self._fn("set_difference", self._set_other(other))

    def set_symmetric_difference(self, other: Any) -> Expr:
        return self._fn("set_symmetric_difference", self._set_other(other))

    def union(self, other: Any) -> Expr:
        return self.set_union(other)

    def gather(self, indices: Any, *, null_on_oob: bool = False) -> Expr:
        if isinstance(indices, (list, tuple, range)):
            return self._fn("gather", indices=tuple(indices), null_on_oob=null_on_oob)
        return self._fn("gather", indices, null_on_oob=null_on_oob)

    def gather_every(self, n: int, offset: int = 0) -> Expr:
        return self._fn("gather_every", n=n, offset=offset)

    def concat(self, other: Any) -> Expr:
        others = other if isinstance(other, (list, tuple)) else [other]
        return self._fn("concat", *others)

    def to_struct(
        self,
        n_field_strategy: str = "first_non_null",
        fields: Any = None,
        upper_bound: int = 0,
    ) -> Expr:
        f = tuple(fields) if isinstance(fields, (list, tuple)) else fields
        return self._fn(
            "to_struct", n_field_strategy=n_field_strategy, fields=f,
            upper_bound=upper_bound,
        )

    def to_array(self, width: int) -> Expr:
        return self._fn("to_array", width=width)

    def sample(
        self,
        n: Any = None,
        *,
        fraction: Any = None,
        with_replacement: bool = False,
        shuffle: bool = False,
        seed: int | None = None,
    ) -> Expr:
        return self._fn(
            "sample", n=n, fraction=fraction, with_replacement=with_replacement,
            shuffle=shuffle, seed=seed,
        )

    def eval(self, expr: Any, *, parallel: bool = False) -> Expr:
        """Run ``expr`` (over ``pl.element()``) against every list's elements
        (reference: py-polars expr/list.py eval; the element expr routes
        through the engine over the exploded child — ops/list_ops.list_eval)."""
        return self._fn("eval", expr=expr._node)

    def filter(self, predicate: Any) -> Expr:
        """Keep elements where ``predicate`` (over ``pl.element()``) holds."""
        return self._fn("filter", expr=predicate._node)

    def agg(self, expr: Any) -> Expr:
        # alias used by some callers: aggregate each list with an element expr
        return self.eval(expr)
