"""Sink writers for LSink nodes (reference: polars-stream/src/nodes/io_sinks/)."""

from __future__ import annotations

from typing import Any


def write_sink(df, path: str, fmt: str, options: dict[str, Any]) -> None:
    pb = options.pop("_partition_by", None)
    if pb is not None:
        from polars_tpu.io.partition import write_partitioned

        return write_partitioned(df, pb, fmt, options)
    if fmt == "parquet":
        from polars_tpu.io.parquet import write_parquet

        write_parquet(df, path, **options)
    elif fmt == "csv":
        from polars_tpu.io.csv import write_csv

        write_csv(df, path, **options)
    elif fmt == "ipc":
        from polars_tpu.io.ipc import write_ipc

        write_ipc(df, path, **options)
    elif fmt == "ndjson":
        from polars_tpu.io.ndjson import write_ndjson

        write_ndjson(df, path, **options)
    else:
        from polars_tpu.errors import ComputeError

        raise ComputeError(f"unknown sink format {fmt!r}")
