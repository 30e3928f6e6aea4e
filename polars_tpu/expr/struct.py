"""Struct expression namespace — minimal round-1 surface."""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:
    from polars_tpu.expr.expr import Expr


class ExprStructNamespace:
    __slots__ = ("_expr",)

    def __init__(self, expr: Expr) -> None:
        self._expr = expr

    def field(self, name: str | list[str], *more_names: str) -> Expr:
        from polars_tpu.plan import exprs as E
        from polars_tpu.expr.expr import Expr as _Expr

        names = list(name) if isinstance(name, (list, tuple)) else [name]
        names.extend(more_names)
        if len(names) > 1 or "*" in names:
            # multi-name / wildcard form expands at schema resolution (like
            # py-polars' field("*") — one output column per matched field)
            return _Expr(
                E.EFunction(
                    "struct.multifield", (self._expr._node,),
                    (("names", tuple(names)),),
                )
            )
        return _Expr(
            E.EFunction("struct.field", (self._expr._node,), (("name", names[0]),))
        ).alias(names[0])

    def rename_fields(self, names: list[str]) -> Expr:
        return self._expr._fn("struct.rename_fields", names=tuple(names))

    def drop(self, names: Any, *, strict: bool = True) -> Expr:
        if isinstance(names, str):
            names = (names,)
        return self._expr._fn("struct.drop", names=tuple(names), strict=strict)

    def with_fields(self, *exprs: Any, **named_exprs: Any) -> Expr:
        """Add/overwrite struct fields; expressions reference existing fields
        via pl.field(...) (reference: py-polars expr/struct.py with_fields)."""
        from polars_tpu.expr.expr import parse_into_expr

        nodes = [parse_into_expr(e) for e in exprs]
        from polars_tpu.plan import exprs as E

        all_nodes = [n._node if hasattr(n, "_node") else n for n in nodes]
        for name, e in named_exprs.items():
            n = parse_into_expr(e)
            all_nodes.append(E.EAlias(n._node if hasattr(n, "_node") else n, name))
        return self._expr._fn("struct.with_fields", exprs=tuple(all_nodes))

    def json_encode(self) -> Expr:
        return self._expr._fn("struct.json_encode")

    def unnest(self) -> Expr:
        """Expand the struct into one column per field (expr expansion at
        schema-resolve time, like selectors)."""
        return self._expr._fn("struct.unnest")
