"""Partitioned sinks (reference: py-polars io/partition.py PartitionBy +
polars-stream/src/nodes/io_sinks partitioned pipelines).

A `PartitionBy` passed to `sink_parquet`/`sink_csv`/... splits the output
into hive-style `key=value/` directories (readable back by this library's
hive scan), with optional per-file row caps. The write itself happens at the
sink barrier after the plan executes — partitioning is a host-side gather
per partition over the materialized frame.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Callable


@dataclasses.dataclass
class FileProviderArgs:
    """Arguments handed to a custom file_path_provider callback."""

    index: int
    part: int
    in_part_index: int
    keys: dict[str, Any]


class PartitionBy:
    """Configuration for writing one query result to multiple files."""

    def __init__(
        self,
        base_path: str | Path,
        *,
        file_path_provider: Callable[[FileProviderArgs], Any] | None = None,
        key: Any = None,
        include_key: bool = True,
        max_rows_per_file: int | None = None,
        approximate_bytes_per_file: int | None = None,
    ) -> None:
        self.base_path = Path(base_path)
        self.file_path_provider = file_path_provider
        self.key = key
        self.include_key = include_key
        self.max_rows_per_file = max_rows_per_file
        self.approximate_bytes_per_file = approximate_bytes_per_file


def write_partitioned(df, pb: PartitionBy, fmt: str, options: dict[str, Any]) -> None:
    import polars_tpu as pl
    from polars_tpu.io.sink import write_sink

    ext = {"parquet": "parquet", "csv": "csv", "ipc": "arrow", "ndjson": "ndjson"}[fmt]
    keys = pb.key
    if keys is not None and not isinstance(keys, (list, tuple)):
        keys = [keys]

    def chunks(frame):
        cap = pb.max_rows_per_file
        if pb.approximate_bytes_per_file and not cap:
            per_row = max(frame.estimated_size() // max(frame.height, 1), 1)
            cap = max(pb.approximate_bytes_per_file // per_row, 1)
        if not cap or frame.height <= cap:
            return [frame]
        return [frame.slice(i, cap) for i in range(0, frame.height, cap)]

    index = 0
    if keys is None:
        parts = [({}, df)]
    else:
        key_exprs = [pl.col(k) if isinstance(k, str) else k for k in keys]
        keyed = df.with_columns(*[e.alias(f"__pk{i}") for i, e in enumerate(key_exprs)])
        knames = [f"__pk{i}" for i in range(len(key_exprs))]
        outnames = [
            (k if isinstance(k, str) else (k.output_name() or f"key_{i}"))
            for i, k in enumerate(keys)
        ]
        parts = []
        for row in keyed.select(knames).unique(maintain_order=True).rows():
            sub = keyed
            for kn, v in zip(knames, row):
                sub = sub.filter(
                    pl.col(kn).is_null() if v is None else (pl.col(kn) == v)
                )
            sub = sub.drop(knames)
            if not pb.include_key:
                sub = sub.drop([n for n in outnames if n in sub.columns])
            parts.append((dict(zip(outnames, row)), sub))

    for part_no, (keyvals, frame) in enumerate(parts):
        if pb.file_path_provider is None:
            reldir = pb.base_path
            for k, v in keyvals.items():
                reldir = reldir / f"{k}={'__HIVE_DEFAULT_PARTITION__' if v is None else v}"
            reldir.mkdir(parents=True, exist_ok=True)
        for in_part, chunk in enumerate(chunks(frame)):
            if pb.file_path_provider is not None:
                target = Path(
                    pb.file_path_provider(FileProviderArgs(index, part_no, in_part, keyvals))
                )
                target.parent.mkdir(parents=True, exist_ok=True)
            else:
                target = reldir / f"{in_part:08d}.{ext}"
            write_sink(chunk, str(target), fmt, options)
            index += 1
