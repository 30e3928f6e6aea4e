"""Streaming sinks: write a query result to disk batch-by-batch with bounded
memory (reference: polars-stream/src/nodes/io_sinks/mod.rs:27-49 — FileSink /
PartitionedSink morsel pipelines with per-format writers io_sinks/writers/).

The morsel stream is :func:`polars_tpu.engine.streaming.stream_batches`; each
batch appends through an incremental per-format writer, so a
larger-than-memory scan->filter->select sunk to disk never materializes the
whole result. ``PartitionBy`` composes: batches split by key and append to
per-partition rolling writers (hive-style ``key=value/`` dirs, per-file row
caps)."""

from __future__ import annotations

from pathlib import Path
from typing import Any

from polars_tpu.errors import ComputeError

_EXT = {"parquet": "parquet", "csv": "csv", "ipc": "arrow", "ndjson": "ndjson"}


class IncrementalWriter:
    """One open output file accepting DataFrame batches (the analogue of one
    io_sinks/writers/ format writer). Opened lazily on the first batch (the
    arrow schema comes from it); every later batch is cast to that schema."""

    def __init__(self, path: str, fmt: str, options: dict[str, Any]) -> None:
        self.path = str(path)
        self.fmt = fmt
        self.options = dict(options)
        self.rows = 0
        self._w: Any = None
        self._f: Any = None
        self._schema = None

    def write(self, df) -> None:
        if df.height == 0 and self.rows > 0:
            return
        if self.fmt == "parquet":
            import pyarrow.parquet as pq

            table = df.to_arrow()
            if self._w is None:
                comp = self.options.get("compression", "zstd")
                self._schema = table.schema
                self._w = pq.ParquetWriter(
                    self.path,
                    table.schema,
                    compression="none" if comp == "uncompressed" else comp,
                    compression_level=self.options.get("compression_level"),
                )
            else:
                table = table.cast(self._schema)
            self._w.write_table(
                table, row_group_size=self.options.get("row_group_size")
            )
        elif self.fmt == "ipc":
            import pyarrow as pa

            table = df.to_arrow()
            if self._w is None:
                comp = self.options.get("compression", "zstd")
                opts = pa.ipc.IpcWriteOptions(
                    compression=None if comp in (None, "uncompressed") else comp
                )
                self._schema = table.schema
                self._w = pa.ipc.new_file(self.path, table.schema, options=opts)
            else:
                table = table.cast(self._schema)
            self._w.write_table(table)
        elif self.fmt == "csv":
            from polars_tpu.io.csv import write_csv

            if self._f is None:
                self._f = open(self.path, "w")
                header = self.options.get("include_header", True)
            else:
                header = False
            opts = {k: v for k, v in self.options.items() if k != "include_header"}
            write_csv(df, self._f, include_header=header, **opts)
        elif self.fmt == "ndjson":
            from polars_tpu.io.ndjson import write_ndjson

            if self._f is None:
                self._f = open(self.path, "w")
            write_ndjson(df, self._f)
        else:
            raise ComputeError(f"unknown sink format {self.fmt!r}")
        self.rows += df.height

    def close(self) -> None:
        if self._w is not None:
            self._w.close()
            self._w = None
        if self._f is not None:
            self._f.close()
            self._f = None


class _PartitionedSink:
    """Streaming PartitionBy pipeline: split each batch by key, append to
    per-partition rolling writers (reference: io_sinks partitioned pipelines —
    keyed partitioner + file-size partitioner composed)."""

    def __init__(self, pb, fmt: str, options: dict[str, Any]) -> None:
        self.pb = pb
        self.fmt = fmt
        self.options = options
        keys = pb.key
        if keys is not None and not isinstance(keys, (list, tuple)):
            keys = [keys]
        self.keys = keys
        self.row_cap = pb.max_rows_per_file
        # (keyvals tuple) -> [writer, part_no, in_part_counter]
        self._parts: dict[tuple, list] = {}
        self._index = 0  # global file counter (FileProviderArgs.index)
        self._ext = _EXT[fmt]

    def _key_split(self, df):
        import polars_tpu as pl

        if self.keys is None:
            return [((), {}, df)]
        key_exprs = [pl.col(k) if isinstance(k, str) else k for k in self.keys]
        outnames = [
            (k if isinstance(k, str) else (k.output_name() or f"key_{i}"))
            for i, k in enumerate(self.keys)
        ]
        keyed = df.with_columns(*[e.alias(f"__pk{i}") for i, e in enumerate(key_exprs)])
        knames = [f"__pk{i}" for i in range(len(key_exprs))]
        out = []
        for row in keyed.select(knames).unique(maintain_order=True).rows():
            import polars_tpu as _pl

            sub = keyed
            for kn, v in zip(knames, row):
                sub = sub.filter(
                    _pl.col(kn).is_null() if v is None else (_pl.col(kn) == v)
                )
            sub = sub.drop(knames)
            if not self.pb.include_key:
                sub = sub.drop([n for n in outnames if n in sub.columns])
            out.append((tuple(row), dict(zip(outnames, row)), sub))
        return out

    def _target(self, part_no: int, in_part: int, keyvals: dict) -> Path:
        from polars_tpu.io.partition import FileProviderArgs

        if self.pb.file_path_provider is not None:
            target = Path(
                self.pb.file_path_provider(
                    FileProviderArgs(self._index, part_no, in_part, keyvals)
                )
            )
        else:
            reldir = Path(self.pb.base_path)
            for k, v in keyvals.items():
                reldir = reldir / (
                    f"{k}={'__HIVE_DEFAULT_PARTITION__' if v is None else v}"
                )
            target = reldir / f"{in_part:08d}.{self._ext}"
        target.parent.mkdir(parents=True, exist_ok=True)
        return target

    def write(self, df) -> None:
        if self.row_cap is None and self.pb.approximate_bytes_per_file and df.height:
            per_row = max(df.estimated_size() // max(df.height, 1), 1)
            self.row_cap = max(self.pb.approximate_bytes_per_file // per_row, 1)
        for keytuple, keyvals, sub in self._key_split(df):
            state = self._parts.get(keytuple)
            if state is None:
                part_no = len(self._parts)
                w = IncrementalWriter(
                    self._target(part_no, 0, keyvals), self.fmt, self.options
                )
                self._index += 1
                state = self._parts[keytuple] = [w, part_no, 0, keyvals]
            if self.row_cap is None:
                state[0].write(sub)
                continue
            while sub.height:
                w, part_no, in_part, kv = state
                room = self.row_cap - w.rows
                if room <= 0:
                    # roll to the next file in this partition
                    w.close()
                    state[2] = in_part = in_part + 1
                    state[0] = w = IncrementalWriter(
                        self._target(part_no, in_part, kv), self.fmt, self.options
                    )
                    self._index += 1
                    continue
                chunk = sub.slice(0, room)
                sub = sub.slice(room)
                w.write(chunk)

    def close(self) -> None:
        for w, *_ in self._parts.values():
            w.close()


def sink_stream(
    node,
    path: str,
    fmt: str,
    options: dict[str, Any],
    *,
    partition_by=None,
    batch_rows: int | None = None,
) -> None:
    """Stream the (already optimized) plan ``node`` into an incremental
    writer. One batch is in flight at a time; peak memory is bounded by the
    batch size for per-batch-safe plans (blocking terminals stream their scan
    and spill through the OOC store before re-chunking)."""
    from polars_tpu.engine.run import plan_cache_scope
    from polars_tpu.engine.streaming import stream_batches

    sink: Any
    if partition_by is not None:
        sink = _PartitionedSink(partition_by, fmt, options)
    else:
        sink = IncrementalWriter(path, fmt, options)
    try:
        with plan_cache_scope():
            for batch in stream_batches(node, batch_rows=batch_rows):
                sink.write(batch)
    finally:
        sink.close()
