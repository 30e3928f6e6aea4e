"""SQLContext: table registry + query execution (reference:
polars-sql/src/context.rs:37-245). The SELECT translator lives in
sql/translate.py."""

from __future__ import annotations

from typing import Any

from polars_tpu.errors import SQLInterfaceError


class SQLContext:
    def __init__(
        self,
        frames: dict | None = None,
        *,
        register_globals: bool | int = False,
        eager: bool = False,
        **named_frames: Any,
    ) -> None:
        self._tables: dict[str, Any] = {}
        self._eager = eager
        if register_globals:
            import inspect

            from polars_tpu.core.frame import DataFrame
            from polars_tpu.lazyframe import LazyFrame

            frame = inspect.currentframe()
            caller = frame.f_back if frame is not None else None
            if caller is not None:
                candidates = {**caller.f_globals, **caller.f_locals}
                for name, obj in candidates.items():
                    if isinstance(obj, (DataFrame, LazyFrame)):
                        self.register(name, obj)
        for name, f in {**(frames or {}), **named_frames}.items():
            self.register(name, f)

    def register(self, name: str, frame: Any) -> SQLContext:
        from polars_tpu.core.frame import DataFrame

        if isinstance(frame, DataFrame):
            frame = frame.lazy()
        self._tables[name] = frame
        return self

    def register_many(self, frames: dict | None = None, **named: Any) -> SQLContext:
        for name, f in {**(frames or {}), **named}.items():
            self.register(name, f)
        return self

    def unregister(self, names: Any) -> SQLContext:
        if isinstance(names, str):
            names = [names]
        for n in names:
            self._tables.pop(n, None)
        return self

    def tables(self) -> list[str]:
        return sorted(self._tables)

    def execute(self, query: str, *, eager: bool | None = None):
        """Execute a SQL statement. SELECT/UNION/EXCEPT/INTERSECT queries
        return a LazyFrame (or DataFrame when eager); CREATE TABLE / DROP /
        SHOW TABLES / TRUNCATE / DELETE mutate the registry (reference:
        polars-sql context.rs execute:309-322)."""
        from polars_tpu.sql.translate import translate

        lf = translate(query, self._tables)
        if eager if eager is not None else self._eager:
            return lf.collect()
        return lf

    def execute_global(self, query: str, *, eager: bool | None = None):
        return self.execute(query, eager=eager)

    def __enter__(self) -> SQLContext:
        return self

    def __exit__(self, *exc: Any) -> None:
        self._tables.clear()

    def __repr__(self) -> str:
        return f"<SQLContext [tables:{len(self._tables)}] at 0x{id(self):x}>"
