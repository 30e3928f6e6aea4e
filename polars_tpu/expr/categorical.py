"""Categorical expression namespace (reference: py-polars expr/categorical.py)."""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from polars_tpu.expr.expr import Expr


class ExprCatNamespace:
    __slots__ = ("_expr",)

    def __init__(self, expr: Expr) -> None:
        self._expr = expr

    def get_categories(self) -> Expr:
        return self._expr._fn("cat.get_categories")

    def to_local(self) -> Expr:
        return self._expr

    def set_ordering(self, ordering: str) -> Expr:
        return self._expr
