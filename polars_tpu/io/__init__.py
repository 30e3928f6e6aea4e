"""I/O: host-side readers/writers feeding device ingest.

Reference: polars-io + polars-parquet (62k LoC of Rust format code). Here the
host boundary rides Arrow C++ (via pyarrow) — the same columnar substrate the
reference mirrors — and ingest converts to padded device buffers with
dictionary-encoded strings (io/_arrow.py). Scan nodes push projection,
predicate, and slice into the reader (parquet row-group pruning included).
"""

from polars_tpu.io.csv import read_csv, scan_csv
from polars_tpu.io.ipc import read_ipc, scan_ipc
from polars_tpu.io.ndjson import read_ndjson, scan_ndjson
from polars_tpu.io.parquet import read_parquet, read_parquet_schema, scan_parquet

__all__ = [
    "read_csv", "scan_csv", "read_ipc", "scan_ipc", "read_ndjson",
    "scan_ndjson", "read_parquet", "read_parquet_schema", "scan_parquet",
]
