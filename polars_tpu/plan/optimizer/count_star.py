"""COUNT(*) fast path (reference: polars-plan/src/plans/optimizer/count_star.rs).

``scan(...).select(pl.len())`` answers from file METADATA — parquet footers
(and in-memory frame heights) carry the row count, so the data pages are
never read, decoded, or shipped to the device. Sound only when nothing
row-filtering sits between the count and the source: the scan must carry no
predicate and no n_rows slice.
"""

from __future__ import annotations

from polars_tpu.plan import exprs as E
from polars_tpu.plan import logical as L


def _len_name(e: E.ENode) -> str | None:
    name = "len"
    while isinstance(e, E.EAlias):
        name = e.name
        e = e.input
    return name if isinstance(e, E.ELen) else None


def _fast_count(scan: L.LNode) -> int | None:
    if isinstance(scan, L.LDataFrameScan):
        return scan.df.height
    if not isinstance(scan, L.LScan):
        return None
    if scan.predicate is not None or scan.n_rows is not None:
        return None
    from polars_tpu.io.cloud import is_remote_path

    total = 0
    try:
        for path in scan.sources:
            if not isinstance(path, str) or is_remote_path(path):
                return None
            if scan.fmt == "parquet":
                import pyarrow.parquet as pq

                total += pq.ParquetFile(path).metadata.num_rows
            elif scan.fmt == "ipc":
                import pyarrow as pa

                with pa.memory_map(path) as src:
                    total += pa.ipc.open_file(src).read_all().num_rows
            else:
                return None
    except Exception:  # noqa: BLE001 — fall back to the real scan
        return None
    return total


def count_star(node: L.LNode) -> L.LNode:
    inputs = node.inputs()
    new_inputs = tuple(count_star(i) for i in inputs)
    if any(a is not b for a, b in zip(new_inputs, inputs)):
        node = L.rebuild(node, new_inputs)
    if not (isinstance(node, L.LSelect) and len(node.expressions) == 1):
        return node
    name = _len_name(node.expressions[0])
    if name is None:
        return node
    n = _fast_count(node.input)
    if n is None:
        return node
    import numpy as np

    from polars_tpu import datatypes as dt
    from polars_tpu.core.column import Column
    from polars_tpu.core.frame import DataFrame
    from polars_tpu.utils.tokens import obj_token

    col = Column.from_values(name, np.asarray([n], np.uint32), dt.UInt32())
    df = DataFrame._from_columns([col], 1)
    return L.LDataFrameScan(df=df, ident=obj_token(df))
