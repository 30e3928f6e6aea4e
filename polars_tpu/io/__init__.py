"""I/O: host-side readers/writers feeding device ingest.

Reference: polars-io + polars-parquet (62k LoC of Rust format code). Here the
host boundary rides Arrow C++ (via pyarrow) — the same columnar substrate the
reference mirrors — and ingest converts to padded device buffers with
dictionary-encoded strings (io/_arrow.py). Scan nodes push projection,
predicate, and slice into the reader (parquet row-group pruning included).
"""

from polars_tpu.io.csv import read_csv, scan_csv
from polars_tpu.io.database import read_database, read_database_uri
from polars_tpu.io.delta import read_delta, scan_delta
from polars_tpu.io.ipc import read_ipc, scan_ipc
from polars_tpu.io.ndjson import read_ndjson, scan_ndjson
from polars_tpu.io.parquet import read_parquet, read_parquet_schema, scan_parquet

__all__ = [
    "read_csv", "scan_csv", "read_database", "read_database_uri",
    "read_delta", "scan_delta", "read_ipc", "scan_ipc", "read_ndjson",
    "scan_ndjson", "read_parquet", "read_parquet_schema", "scan_parquet",
]


def scan_iceberg(source, *, snapshot_id=None, **kwargs):
    """Scan an Apache Iceberg table (requires `pyiceberg` for the avro
    manifest layer; reference py-polars/src/polars/io/iceberg/)."""
    try:
        from pyiceberg.table import StaticTable
    except ImportError:
        raise ImportError(
            "scan_iceberg requires the `pyiceberg` package (iceberg manifests "
            "are avro; no native decoder is bundled)"
        ) from None
    tbl = StaticTable.from_metadata(str(source)) if isinstance(source, str) else source
    scan = tbl.scan(snapshot_id=snapshot_id) if snapshot_id else tbl.scan()
    from polars_tpu.io._arrow import arrow_to_df

    return arrow_to_df(scan.to_arrow()).lazy()
from polars_tpu.io.extra import (  # noqa: E402,F401
    read_avro,
    read_clipboard,
    read_csv_batched,
    read_excel,
    read_ipc_schema,
    read_ipc_stream,
    read_lines,
    read_ods,
    read_parquet_metadata,
    scan_arrow_c_stream,
    scan_lines,
    scan_pyarrow_dataset,
)
