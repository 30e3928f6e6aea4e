"""Series namespaces (str/dt/cat) delegating to the expression engine."""

from __future__ import annotations

from typing import Any


class _SeriesNamespace:
    _expr_ns: str = ""

    def __init__(self, series) -> None:
        self._s = series

    def __getattr__(self, name: str):
        if name.startswith("_"):
            raise AttributeError(name)

        def method(*args: Any, **kwargs: Any):
            e = self._s._expr()
            ns = getattr(e, self._expr_ns)
            out_expr = getattr(ns, name)(*args, **kwargs)
            return self._s._select(out_expr)

        return method


class SeriesStringNamespace(_SeriesNamespace):
    _expr_ns = "str"


class SeriesDateTimeNamespace(_SeriesNamespace):
    _expr_ns = "dt"


class SeriesListNamespace(_SeriesNamespace):
    _expr_ns = "list"


class SeriesStructNamespace(_SeriesNamespace):
    _expr_ns = "struct"

    @property
    def fields(self):
        return [c.name for c in (self._s._column.child or [])]

    @property
    def schema(self):
        """{field name: dtype} (reference series/struct.py schema property)."""
        from polars_tpu.core.schema import Schema

        return Schema({c.name: c.dtype for c in (self._s._column.child or [])})

    def unnest(self):
        """One column per field, as a DataFrame (reference series/struct.py)."""
        return self._s.to_frame().select(self._s._expr().struct.unnest())


class SeriesArrayNamespace(_SeriesNamespace):
    _expr_ns = "arr"


class SeriesBinaryNamespace(_SeriesNamespace):
    _expr_ns = "bin"


class SeriesCatNamespace(_SeriesNamespace):
    _expr_ns = "cat"

    def is_local(self) -> bool:
        """Always False (reference series/categorical.py: local
        representations are deprecated)."""
        return False

    def to_local(self):
        return self._s

    def uses_lexical_ordering(self) -> bool:
        """Always True (reference series/categorical.py)."""
        return True

    def physical(self):
        return self._s.to_physical()

    def get_categories(self):
        from polars_tpu.core.series import Series

        return Series("", [str(v) for v in self._s._column.table.values])
