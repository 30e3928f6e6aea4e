"""Deferred (flip-free) result counts and error flags.

On the axon TPU backend the FIRST device->host readback permanently flips the
runtime into slow synchronous dispatch (CLAUDE.md §1). The single-chip
pipeline's discipline is enqueue-only execution with ONE batched readback at
materialization; this module gives the distributed engine the same property
(VERDICT r4 #6): every segment's (row count, error code, shuffle-overflow
flag) scalars are REGISTERED here instead of read back, intermediate frames
carry their true count as a device scalar (`DataFrame._device_count`) that
downstream segments consume as their traced height argument, and
``finalize`` resolves everything in one ``jax.device_get`` at the end.

Reference analogue: the streaming engine checks per-task errors only when
joining handles at phase end (polars-stream/src/execute.rs:290-296), not
per-morsel.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Any

# context-local (r5 review): concurrent collect calls on different threads /
# asyncio tasks must not cross-register deferred checks into each other's
# scope — each context sees its own stack
_SCOPES: contextvars.ContextVar[tuple] = contextvars.ContextVar(
    "polars_tpu_pending_scopes", default=()
)


def active() -> bool:
    return bool(_SCOPES.get())


@contextlib.contextmanager
def scope():
    """Collect deferred checks for one query; flushed by :func:`finalize`."""
    pend: list = []
    token = _SCOPES.set(_SCOPES.get() + (pend,))
    try:
        yield pend
    finally:
        _SCOPES.reset(token)


def defer(count: Any, *, msgs: dict | None = None, ofl: Any = None,
          label: str = "segment") -> None:
    """Register a segment's raw count (negative = encoded error) and optional
    shuffle-overflow flag for the batched end-of-query readback."""
    stack = _SCOPES.get()
    if stack:
        stack[-1].append((count, ofl, msgs or {}, label))


def _check(n: int, ofl: int | None, msgs: dict, label: str) -> None:
    from polars_tpu.errors import ComputeError, InvalidOperationError

    if n < 0:
        decoded = -n - 1
        idx = decoded >> 32
        msg = msgs.get(idx)
        if msg is not None:
            raise InvalidOperationError(msg)
        raise ComputeError(
            f"in-trace validation failed in deferred {label}: join keys do "
            "not satisfy the declared m:1/1:1/1:m cardinality, or exploded "
            "columns have mismatched list lengths"
        )
    if ofl is not None and ofl > 1:
        raise ComputeError(
            f"deferred {label}: distributed shuffle overflowed its proven "
            "capacity — the host-side capacity bound was violated (bug: "
            "report the plan shape)"
        )


def finalize(df):
    """ONE batched readback: resolve every deferred check plus ``df``'s own
    device count, then return ``df`` sliced to its true height."""
    import jax

    from polars_tpu.core.buffer import padded_size

    stack = _SCOPES.get()
    pend = stack[-1] if stack else []
    arrays: list = []
    for count, ofl, _msgs, _label in pend:
        arrays.append(count)
        if ofl is not None:
            arrays.append(ofl)
    own = getattr(df, "_device_count", None)
    if own is not None:
        arrays.append(own)
    if not arrays:
        return df
    vals = [int(v) for v in jax.device_get(arrays)]
    it = iter(vals)
    for count, ofl, msgs, label in pend:
        n = next(it)
        o = next(it) if ofl is not None else None
        _check(n, o, msgs, label)
    pend.clear()
    if own is None:
        return df
    n = vals[-1]
    from polars_tpu.core.buffer import Buffer
    from polars_tpu.core.column import Column
    from polars_tpu.core.frame import DataFrame

    size = padded_size(n)
    cols = []
    for c in df._columns:
        values = c.buffer.values
        validity = c.buffer.validity
        if values.shape[0] > size:
            values = values[:size]
            validity = validity[:size] if validity is not None else None
        cols.append(
            Column(c.name, c.dtype, Buffer(values, validity, n), c.table,
                   c.sorted_flag, c.child)
        )
    return DataFrame._from_columns(cols, n)
