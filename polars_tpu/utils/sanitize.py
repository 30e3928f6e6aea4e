"""Debug invariant checks (sanitizer mode).

The reference leans on the Rust type system, miri, and debug_assert! guards
(SURVEY §5: group-overlap checks, polars-core position.rs:283-285; CI miri,
lint-rust.yml:92-112). The analogous hazards here are buffer-layout
violations that XLA cannot catch: mis-padded arrays, validity on padding
rows, dict codes outside the table, packed list words pointing past the
child. ``POLARS_TPU_DEBUG=1`` enables host-metadata checks on every frame
construction (no device readback, safe on TPU); ``POLARS_TPU_DEBUG=2`` adds
device-data checks (readbacks — CPU/test use only; the first readback
permanently degrades the axon TPU runtime, CLAUDE.md §1).
"""

from __future__ import annotations

import numpy as np

from polars_tpu import datatypes as dt
from polars_tpu.errors import ShapeError


def _fail(col, msg: str):
    raise ShapeError(f"sanitizer: column {col.name!r} ({col.dtype!r}): {msg}")


def check_column(col, height: int, deep: bool) -> None:
    buf = col.buffer
    n = buf.values.shape[0]
    if buf.values.ndim != 1:
        _fail(col, f"values must be 1-D, got shape {buf.values.shape}")
    if n < 128 or (n & (n - 1)) != 0:
        _fail(col, f"padded size {n} is not a pow2 >= 128")
    if buf.length > n:
        _fail(col, f"logical length {buf.length} exceeds padded size {n}")
    if buf.length != height:
        _fail(col, f"length {buf.length} != frame height {height}")
    if buf.validity is not None:
        if buf.validity.shape != (n,):
            _fail(col, f"validity shape {buf.validity.shape} != ({n},)")
        if buf.validity.dtype != np.bool_:
            _fail(col, f"validity dtype {buf.validity.dtype} is not bool")
    if col.table is not None and buf.values.dtype not in (np.int32, np.dtype(np.int32)):
        _fail(col, f"dict-coded column has non-int32 codes ({buf.values.dtype})")
    if isinstance(col.dtype, dt.List) and col.child is None:
        _fail(col, "List column without child storage")
    if not deep:
        return

    # ---- deep (device readback) checks -------------------------------------
    vals = np.asarray(buf.values)
    valid = (
        np.asarray(buf.validity)
        if buf.validity is not None
        else np.ones(n, bool)
    )
    rowmask = np.arange(n) < buf.length
    live = rowmask & valid
    if buf.validity is not None and bool(valid[~rowmask].any()):
        _fail(col, "validity True on padding rows")
    if col.table is not None:
        codes = vals[live]
        if codes.size and (codes.min() < 0 or codes.max() >= max(len(col.table), 1)):
            _fail(
                col,
                f"dict code out of range [0, {len(col.table)}): "
                f"[{codes.min()}, {codes.max()}]",
            )
    if isinstance(col.dtype, dt.List) and col.child is not None:
        packed = vals[live].astype(np.int64)
        starts = packed >> 32
        lens = packed & 0xFFFFFFFF
        child_n = col.child.buffer.values.shape[0]
        if packed.size and (
            starts.min() < 0 or lens.min() < 0 or (starts + lens).max() > child_n
        ):
            _fail(
                col,
                f"packed list word out of child bounds (child padded {child_n})",
            )
        check_column(col.child, col.child.buffer.length, deep)


def check_frame(columns, height: int, level: int) -> None:
    seen: set[str] = set()
    for c in columns:
        if c.name in seen:
            raise ShapeError(f"sanitizer: duplicate column name {c.name!r}")
        seen.add(c.name)
        check_column(c, height, deep=level >= 2)
