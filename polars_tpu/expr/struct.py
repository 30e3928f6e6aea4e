"""Struct expression namespace — minimal round-1 surface."""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from polars_tpu.expr.expr import Expr


class ExprStructNamespace:
    __slots__ = ("_expr",)

    def __init__(self, expr: Expr) -> None:
        self._expr = expr

    def field(self, name: str) -> Expr:
        from polars_tpu.plan import exprs as E
        from polars_tpu.expr.expr import Expr as _Expr

        return _Expr(
            E.EFunction("struct.field", (self._expr._node,), (("name", name),))
        ).alias(name)

    def rename_fields(self, names: list[str]) -> Expr:
        return self._expr._fn("struct.rename_fields", names=tuple(names))
