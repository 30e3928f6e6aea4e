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
        return self._fn("get", index=0)

    def last(self) -> Expr:
        return self._fn("get", index=-1)

    def get(self, index: int, *, null_on_oob: bool = True) -> Expr:
        return self._fn("get", index=index)

    def reverse(self) -> Expr:
        return self._fn("reverse")

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
