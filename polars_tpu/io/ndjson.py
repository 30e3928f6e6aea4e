"""NDJSON / JSON read/scan/write (reference: polars-json)."""

from __future__ import annotations

import json as _json
from typing import Any

from polars_tpu.plan import logical as L


def scan_ndjson(source: Any, *, n_rows: int | None = None, storage_options: Any = None, **kwargs: Any):
    from polars_tpu.io.csv import _materialize_filelike
    from polars_tpu.io.parquet import _expand_paths
    from polars_tpu.lazyframe import LazyFrame

    source = _materialize_filelike(source)
    node = L.LScan(
        sources=_expand_paths(source, storage_options=storage_options),
        fmt="ndjson",
        options=(("storage_options", tuple(sorted(dict(storage_options).items())) if storage_options else ()),),
        n_rows=n_rows,
    )
    return LazyFrame._from_node(node)


def read_ndjson(source: Any, **kwargs: Any):
    return scan_ndjson(source, **kwargs).collect()


def read_json(source: Any, **kwargs: Any):
    from polars_tpu.core.frame import DataFrame

    if hasattr(source, "read"):
        data = _json.load(source)
    elif isinstance(source, (bytes, bytearray)):
        data = _json.loads(source)
    else:
        with open(source) as f:
            data = _json.load(f)
    return DataFrame(data)


def write_ndjson(df, file: Any = None, **kwargs: Any):
    rows = df.to_dicts()
    out = "".join(_json.dumps(r, default=str) + "\n" for r in rows)
    if file is None:
        return out
    if isinstance(file, str) or hasattr(file, "__fspath__"):
        with open(file, "w") as f:
            f.write(out)
        return None
    file.write(out)
    return None


def write_json(df, file: Any = None, **kwargs: Any):
    rows = df.to_dicts()
    out = _json.dumps(rows, default=str)
    if file is None:
        return out
    if isinstance(file, str) or hasattr(file, "__fspath__"):
        with open(file, "w") as f:
            f.write(out)
        return None
    file.write(out)
    return None
