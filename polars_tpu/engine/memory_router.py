"""engine="auto" memory routing (SURVEY 2.12 — the in-memory spill story).

The in-memory engine pads every column to pow2 and keeps whole-plan
intermediates device-resident; a plan whose working set exceeds HBM would
fail allocation mid-segment. The reference streams such plans through its
OOC machinery (polars-stream + polars-ooc spill files); the TPU analogue is
the batch streaming engine (engine/streaming.py) with its native spill pool.
``route()`` decides per-plan from a cheap host-side size estimate: parquet
footers give leaf row counts without reading data, schemas give row widths,
and a fixed expansion factor covers segment intermediates (input + output +
sort scratch words). Over budget -> streaming; otherwise in-memory.

Deliberately conservative-but-simple: the estimate exists to keep 60M-row
joins from OOMing a 16 GB chip, not to be a cost model. CPU processes
default to budget 0 (disabled) so the test matrix pins engines explicitly.
"""

from __future__ import annotations

import os

from polars_tpu import datatypes as dt
from polars_tpu.plan import logical as L

_EXPANSION = 4  # input + compacted output + argsort key/perm scratch


def effective_budget() -> int:
    from polars_tpu.config import config

    b = config().memory_budget
    if b:
        return b
    try:
        import jax

        plat = jax.devices()[0].platform
    except Exception:  # noqa: BLE001
        return 0
    if plat == "cpu":
        return 0  # tests / host runs: engines are pinned explicitly
    return 12 << 30  # v5e HBM 16 GB minus fusion/transfer headroom


def _col_bytes(d) -> int:
    if isinstance(d, (dt.List, dt.Array)):
        return 8 + 2 * _col_bytes(getattr(d, "inner", dt.Int64()))
    if isinstance(d, dt.Struct):
        return sum(_col_bytes(f[1]) for f in d.fields) or 8
    name = type(d).__name__
    if name in ("String", "Categorical", "Enum", "Binary"):
        return 4  # dict codes (int32); table lives on host
    try:
        return max(dt.dtype_to_numpy(d)().itemsize, 1)
    except Exception:  # noqa: BLE001
        return 8


def _pow2(n: int) -> int:
    n = max(int(n), 128)
    return 1 << (n - 1).bit_length()


def _leaf_rows(node: L.LNode) -> int | None:
    if isinstance(node, L.LDataFrameScan):
        return node.df.height
    if isinstance(node, L.LScan):
        if node.n_rows is not None:
            return node.n_rows
        total = 0
        for src in node.sources:
            if node.fmt == "parquet" and os.path.exists(src):
                try:
                    import pyarrow.parquet as pq

                    total += pq.ParquetFile(src).metadata.num_rows
                    continue
                except Exception:  # noqa: BLE001
                    pass
            try:  # non-parquet / unreadable: rough bytes -> rows guess
                total += max(os.path.getsize(src) // 32, 1)
            except OSError:
                return None
        return total
    return None


def estimate_plan_bytes(node: L.LNode) -> int | None:
    """Padded device bytes of every distinct leaf x expansion factor, or
    None when any leaf is unsizeable (unknown source)."""
    from polars_tpu.plan.schema_resolve import node_schema

    seen: set[int] = set()
    total = 0
    explodes = 0
    stack = [node]
    while stack:
        n = stack.pop()
        if id(n) in seen:
            continue
        seen.add(id(n))
        if isinstance(n, L.LExplode):
            explodes += 1
        rows = _leaf_rows(n)
        if rows is not None:
            try:
                schema = node_schema(n)
            except Exception:  # noqa: BLE001
                return None
            proj = getattr(n, "projection", None)
            width = sum(
                _col_bytes(d) + 1  # +1: validity plane
                for c, d in schema.items()
                if proj is None or c in proj
            )
            total += _pow2(rows) * max(width, 1)
            continue
        stack.extend(n.inputs())
    return total * _EXPANSION * (2 ** min(explodes, 2))


def route(node: L.LNode) -> str:
    """'streaming' when the estimate exceeds the budget, else 'in-memory'."""
    budget = effective_budget()
    if budget <= 0:
        return "in-memory"
    est = estimate_plan_bytes(node)
    if est is None or est <= budget:
        return "in-memory"
    from polars_tpu.config import verbose

    if verbose():
        print(
            f"[polars_tpu] engine=auto: estimated working set "
            f"{est/2**30:.1f} GiB > budget {budget/2**30:.1f} GiB — "
            "routing through the streaming engine (OOC spill)"
        )
    return "streaming"
