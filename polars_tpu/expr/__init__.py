"""User-facing expression API (reference: py-polars expr/)."""

from polars_tpu.expr.expr import Expr, parse_into_expr, parse_into_expr_list

__all__ = ["Expr", "parse_into_expr", "parse_into_expr_list"]
