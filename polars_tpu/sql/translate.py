"""Minimal SQL -> LazyFrame translation (full translator is a later
milestone; reference: polars-sql/src/{context.rs,sql_expr.rs,functions.rs})."""

from __future__ import annotations

from typing import Any

from polars_tpu.errors import SQLInterfaceError


def translate(query: str, tables: dict[str, Any]):
    raise SQLInterfaceError(
        "the SQL translator is not implemented yet in this build"
    )
