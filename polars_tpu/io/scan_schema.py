"""Schema resolution for LScan nodes (cached per source list)."""

from __future__ import annotations

import functools

from polars_tpu.core.schema import Schema
from polars_tpu.errors import ComputeError
from polars_tpu.plan import logical as L


def _fingerprint(sources: tuple[str, ...]) -> tuple:
    """(mtime_ns, size) of the first local source — makes the schema cache
    observe file overwrites instead of serving a stale schema."""
    import os

    if not sources:
        return ()
    try:
        st = os.stat(sources[0])
        return (st.st_mtime_ns, st.st_size)
    except OSError:
        return ()


@functools.lru_cache(maxsize=512)
def _schema_for(sources: tuple[str, ...], fmt: str, options, _fp: tuple = ()) -> Schema:
    if not sources:
        return Schema()
    path = sources[0]
    from polars_tpu.io.cloud import is_remote_path, open_remote

    so = dict(dict(options or ()).get("storage_options") or ())
    remote = fmt in ("parquet", "csv", "ipc", "ndjson") and is_remote_path(path)
    if fmt == "parquet":
        import pyarrow.parquet as pq

        from polars_tpu.io._arrow import arrow_schema_to_schema

        src = open_remote(path, "rb", so) if remote else path
        return arrow_schema_to_schema(pq.read_schema(src))
    if fmt == "ipc":
        import pyarrow.feather as feather
        import pyarrow.ipc as ipc

        from polars_tpu.io._arrow import arrow_schema_to_schema

        with (open_remote(path, "rb", so) if remote else open(path, "rb")) as f:
            try:
                reader = ipc.open_file(f)
                return arrow_schema_to_schema(reader.schema)
            except Exception:
                f.seek(0)
                reader = ipc.open_stream(f)
                return arrow_schema_to_schema(reader.schema)
    if fmt == "csv":
        from polars_tpu.io.scan_exec import _read_csv_arrow

        src = open_remote(path, "rb", so) if remote else path
        table = _read_csv_arrow(src, dict(options), n_rows=100)
        from polars_tpu.io._arrow import arrow_schema_to_schema

        sch = arrow_schema_to_schema(table.schema)
        for name, d in dict(options).get("schema_overrides", ()):
            if name in sch:
                sch[name] = d
        return sch
    if fmt == "ndjson":
        import pyarrow.json as pj

        from polars_tpu.io._arrow import arrow_schema_to_schema

        src = open_remote(path, "rb", so) if remote else path
        return arrow_schema_to_schema(pj.read_json(src).schema)
    if fmt == "pyarrow_dataset":
        from polars_tpu.io._arrow import arrow_schema_to_schema
        from polars_tpu.io.extra import get_dataset

        return arrow_schema_to_schema(get_dataset(path).schema)
    raise ComputeError(f"unknown scan format {fmt!r}")


def scan_schema(node: L.LScan) -> Schema:
    sch = _schema_for(
        node.sources, node.fmt, node.options, _fingerprint(node.sources)
    ).copy()
    if node.opt("hive") and node.sources:
        from polars_tpu import datatypes as dt
        from polars_tpu.io.scan_exec import hive_parts

        hs = node.opt("hive_schema")
        hs = dict(hs) if hs else None
        parts = hive_parts(node.sources[0], hs)
        for k, v in parts.items():
            if k in sch:
                continue
            if hs and k in hs:
                sch[k] = dt.parse_into_dtype(hs[k])
            elif isinstance(v, bool) or isinstance(v, int):
                sch[k] = dt.Int64()
            elif isinstance(v, float):
                sch[k] = dt.Float64()
            else:
                sch[k] = dt.String()
    return sch
