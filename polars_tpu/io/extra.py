"""Long-tail IO entry points (reference: py-polars/src/polars/io/*).

Formats pyarrow handles natively (ipc stream, parquet metadata, pyarrow
datasets, Arrow C-stream producers) are implemented; formats needing
libraries this image lacks (avro/excel/ods/clipboard) raise the same
ImportError shape py-polars raises without its optional deps.
"""

from __future__ import annotations

from typing import Any, Iterator

from polars_tpu.errors import ComputeError


def read_ipc_schema(source: Any) -> dict:
    """Schema of an IPC file without reading data (io/ipc/functions.py)."""
    import pyarrow.ipc as paipc

    from polars_tpu.io._arrow import arrow_schema_to_schema

    with paipc.open_file(source) as r:
        return dict(arrow_schema_to_schema(r.schema))


def read_parquet_metadata(source: Any) -> dict:
    """File-level parquet key/value metadata (io/parquet/functions.py)."""
    import pyarrow.parquet as pq

    md = pq.read_metadata(source).metadata or {}
    return {
        (k.decode() if isinstance(k, bytes) else k):
        (v.decode() if isinstance(v, bytes) else v)
        for k, v in md.items()
        if k != b"ARROW:schema"
    }


def read_ipc_stream(source: Any, *, columns: Any = None, **kwargs: Any):
    """Read the Arrow IPC STREAM format (no footer; io/ipc/functions.py)."""
    import pyarrow.ipc as paipc

    from polars_tpu.core.frame import DataFrame

    with paipc.open_stream(source) as r:
        tbl = r.read_all()
    df = DataFrame(tbl)
    return df.select(list(columns)) if columns is not None else df


# live pyarrow Dataset objects keyed by their scan token (the LScan "source"
# string); tokens keep the logical plan hashable/serializable-by-shape
_DATASETS: dict[str, Any] = {}


def get_dataset(token: str) -> Any:
    try:
        return _DATASETS[token]
    except KeyError:
        raise ComputeError(f"pyarrow dataset {token!r} is no longer registered") from None


def scan_pyarrow_dataset(source: Any, *, allow_pyarrow_filter: bool = True, **kwargs: Any):
    """LazyFrame over a pyarrow.dataset.Dataset (reference:
    py-polars io/pyarrow_dataset/functions.py).

    A true lazy scan: projection pushdown populates ``LScan.projection`` and
    pushed predicates translate into a ``pyarrow.dataset`` filter expression,
    both passed to ``dataset.to_table(columns=, filter=)`` at collect time
    (scan_exec._read_one_source). Residual predicate parts the translator
    doesn't understand still apply in-engine after the scan."""
    from polars_tpu.lazyframe import LazyFrame
    from polars_tpu.plan import logical as L

    token = f"pyarrow-dataset://{id(source)}"
    _DATASETS[token] = source
    return LazyFrame._from_node(
        L.LScan(
            sources=(token,),
            fmt="pyarrow_dataset",
            options=(("allow_pyarrow_filter", bool(allow_pyarrow_filter)),),
        )
    )


def scan_arrow_c_stream(source: Any, **kwargs: Any):
    """LazyFrame over any Arrow C-stream (__arrow_c_stream__) producer."""
    import pyarrow as pa

    from polars_tpu.core.frame import DataFrame

    return DataFrame(pa.table(source)).lazy()


def read_lines(source: Any) -> Any:
    """One String column named 'lines' (io/lines.py read_lines)."""
    from polars_tpu.core.frame import DataFrame

    with open(source, "rb") as f:
        data = f.read().decode("utf8")
    lines = data.split("\n")
    if lines and lines[-1] == "":
        lines.pop()
    return DataFrame({"lines": lines})


def scan_lines(source: Any) -> Any:
    return read_lines(source).lazy()


def read_csv_batched(source: Any, *, batch_size: int = 50_000, **kwargs: Any):
    """BatchedCsvReader analogue: next_batches(n) yields DataFrames."""
    import pyarrow.csv as pacsv

    from polars_tpu.core.frame import DataFrame

    reader = pacsv.open_csv(
        source, read_options=pacsv.ReadOptions(block_size=max(batch_size * 64, 1 << 16))
    )

    class BatchedCsvReader:
        def __init__(self) -> None:
            self._done = False

        def next_batches(self, n: int) -> list | None:
            if self._done:
                return None
            out = []
            import pyarrow as pa

            for _ in range(n):
                try:
                    batch = reader.read_next_batch()
                except StopIteration:
                    self._done = True
                    break
                out.append(DataFrame(pa.Table.from_batches([batch])))
            return out or None

    return BatchedCsvReader()


def _missing_dep(fn: str, dep: str):
    raise ImportError(
        f"{fn} requires the {dep!r} package, which is not installed in this "
        f"environment (matches py-polars' optional-dependency behavior)"
    )


def read_avro(source: Any, **kwargs: Any):
    try:
        import fastavro  # noqa: F401
    except ImportError:
        _missing_dep("read_avro", "fastavro")
    from polars_tpu.core.frame import DataFrame

    with open(source, "rb") as f:
        records = list(fastavro.reader(f))
    return DataFrame(records)


def read_excel(source: Any, **kwargs: Any):
    try:
        import openpyxl  # noqa: F401
    except ImportError:
        _missing_dep("read_excel", "openpyxl")
    import pandas as pd

    from polars_tpu.core.frame import DataFrame

    return DataFrame(pd.read_excel(source, **kwargs))


def read_ods(source: Any, **kwargs: Any):
    try:
        import odf  # noqa: F401
    except ImportError:
        _missing_dep("read_ods", "odfpy")
    import pandas as pd

    from polars_tpu.core.frame import DataFrame

    return DataFrame(pd.read_excel(source, engine="odf", **kwargs))


def read_clipboard(separator: str = "\t", **kwargs: Any):
    _missing_dep("read_clipboard", "a clipboard backend (headless environment)")
