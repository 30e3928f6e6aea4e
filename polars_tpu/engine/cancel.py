"""Cooperative query cancellation and timeouts.

Reference: py-polars InProcessQuery.cancel()
(py-polars/src/polars/lazyframe/in_process.py:24-26). Plans execute as a
sequence of fused device segments separated by host barriers (engine/run.py);
a :class:`CancelToken` is checked at every barrier — the natural preemption
points, since a dispatched XLA program itself always runs to completion.

Usage::

    tok = pl.CancelToken()
    # another thread may call tok.cancel() at any time
    lf.collect(cancel_token=tok)
    lf.collect(timeout=5.0)   # seconds; raises QueryCancelledError on expiry
"""

from __future__ import annotations

import contextlib
import threading
import time

from polars_tpu.errors import QueryCancelledError


class CancelToken:
    """Thread-safe cooperative cancellation flag with an optional deadline."""

    __slots__ = ("_flag", "_deadline")

    def __init__(self, timeout: float | None = None):
        self._flag = threading.Event()
        self._deadline = None if timeout is None else time.monotonic() + timeout

    def cancel(self) -> None:
        self._flag.set()

    @property
    def cancelled(self) -> bool:
        if self._flag.is_set():
            return True
        return self._deadline is not None and time.monotonic() > self._deadline

    def raise_if_cancelled(self) -> None:
        if self._flag.is_set():
            raise QueryCancelledError("query cancelled")
        if self._deadline is not None and time.monotonic() > self._deadline:
            raise QueryCancelledError("query timed out")


_ACTIVE: list[CancelToken] = []


@contextlib.contextmanager
def cancel_scope(token: CancelToken | None):
    if token is None:
        yield
        return
    _ACTIVE.append(token)
    try:
        yield
    finally:
        _ACTIVE.remove(token)


def check_cancel() -> None:
    """Called at every plan barrier (engine/run._execute_node)."""
    for tok in _ACTIVE:
        tok.raise_if_cancelled()
