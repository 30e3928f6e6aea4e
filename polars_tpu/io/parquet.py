"""Parquet read/scan/write.

Reference: polars-parquet (33k LoC) + polars-io parquet module. The host path
rides Arrow C++'s parquet reader; scan-level projection/predicate/slice
pushdown maps onto row-group pruning via parquet statistics, mirroring the
reference's scan-statistics predicate pruning
(polars-plan/src/plans/optimizer/predicate_pushdown/join/predicate_pruning.rs).
"""

from __future__ import annotations

import glob as _glob
from typing import Any

from polars_tpu.plan import logical as L


def _expand_paths(source: Any, suffix: str = "", storage_options: Any = None) -> tuple[str, ...]:
    import os

    if isinstance(source, (list, tuple)):
        out: list[str] = []
        for s in source:
            out.extend(_expand_paths(s, suffix, storage_options))
        return tuple(out)
    s = str(source)
    from polars_tpu.io.cloud import expand_remote_paths, is_remote_path

    if is_remote_path(s) and not s.startswith("pyarrow-dataset://"):
        return expand_remote_paths(s, suffix, storage_options)
    if suffix and os.path.isdir(s):
        # directory dataset (hive layout): every matching file underneath
        return tuple(sorted(_glob.glob(os.path.join(s, "**", f"*{suffix}"), recursive=True)))
    if any(ch in s for ch in "*?["):
        return tuple(sorted(_glob.glob(s, recursive=True)))
    return (s,)


def scan_parquet(
    source: Any,
    *,
    n_rows: int | None = None,
    row_index_name: str | None = None,
    row_index_offset: int = 0,
    parallel: str = "auto",
    rechunk: bool = False,
    low_memory: bool = False,
    cache: bool = True,
    storage_options: Any = None,
    hive_partitioning: bool | None = None,
    hive_schema: Any = None,
    **kwargs: Any,
):
    import os

    from polars_tpu.lazyframe import LazyFrame

    is_dir = not isinstance(source, (list, tuple)) and os.path.isdir(str(source))
    sources = _expand_paths(source, suffix=".parquet", storage_options=storage_options)
    # polars semantics: hive partitioning defaults ON for directory datasets
    hive = bool(hive_partitioning) if hive_partitioning is not None else is_dir
    options: tuple = ()
    if hive:
        options += (("hive", True),)
        if hive_schema is not None:
            options += (("hive_schema", tuple((k, v) for k, v in dict(hive_schema).items())),)
    if storage_options:
        options += (("storage_options", tuple(sorted(dict(storage_options).items()))),)
    node = L.LScan(
        sources=sources,
        fmt="parquet",
        options=options,
        n_rows=n_rows,
        row_index=(row_index_name, row_index_offset) if row_index_name else None,
    )
    return LazyFrame._from_node(node)


def read_parquet(source: Any, *, columns: Any = None, n_rows: int | None = None, **kwargs: Any):
    lf = scan_parquet(source, n_rows=n_rows, **kwargs)
    if columns is not None:
        lf = lf.select(list(columns))
    return lf.collect()


def read_parquet_schema(source: Any):
    import pyarrow.parquet as pq

    from polars_tpu.io._arrow import arrow_schema_to_schema

    return arrow_schema_to_schema(pq.read_schema(_expand_paths(source)[0]))


def write_parquet(
    df,
    file: Any,
    *,
    compression: str = "zstd",
    compression_level: int | None = None,
    statistics: bool | str = True,
    row_group_size: int | None = None,
    **kwargs: Any,
) -> None:
    import pyarrow.parquet as pq

    from polars_tpu.io.cloud import is_remote_path, open_remote

    partition_by = kwargs.pop("partition_by", None)
    if partition_by is not None:
        # hive-style partitioned dataset (reference: py-polars write_parquet
        # partition_by -> io_sinks partitioned pipelines)
        from polars_tpu.io.partition import PartitionBy, write_partitioned

        pb = PartitionBy(file, key=partition_by)
        write_partitioned(
            df, pb, "parquet",
            {"compression": compression, "compression_level": compression_level,
             "statistics": statistics, "row_group_size": row_group_size},
        )
        return
    if isinstance(file, (str, bytes)) or hasattr(file, "__fspath__"):
        if is_remote_path(file):
            file = open_remote(file, "wb", kwargs.get("storage_options"))
    table = df.to_arrow()
    comp = compression if compression != "uncompressed" else "none"
    extra = {
        k: v
        for k, v in kwargs.items()
        if k in ("write_page_index", "bloom_filter_options", "data_page_size",
                 "use_dictionary", "sorting_columns")
    }
    pq.write_table(
        table,
        file,
        compression=comp,
        compression_level=compression_level,
        row_group_size=row_group_size,
        write_statistics=bool(statistics),
        **extra,
    )
