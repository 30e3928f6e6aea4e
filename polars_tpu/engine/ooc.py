"""Out-of-core host run storage for the streaming engine.

The polars-ooc analogue (reference: polars-ooc/src/lib.rs:20-34 Spillable,
memory_manager budget + spill policies): device batches that must outlive the
current streaming step are copied to HOST memory through the native C++
BufferPool (native/polars_tpu_native.cpp), which enforces a byte budget and
transparently spills least-recently-used buffers to disk, reloading them on
access. Device HBM stays bounded by one batch; host memory stays bounded by
``POLARS_TPU_OOC_BUDGET`` bytes (0 = unlimited, no spill).

Falls back to plain in-process numpy arrays when the native library is
unavailable.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np

from polars_tpu import datatypes as dt
from polars_tpu.core.buffer import Buffer, pad_to, padded_size
from polars_tpu.core.column import Column
from polars_tpu.core.frame import DataFrame
from polars_tpu.utils import strtable


def _budget() -> int:
    try:
        return int(os.environ.get("POLARS_TPU_OOC_BUDGET", "0"))
    except ValueError:
        return 0


class _PoolArray:
    """One numpy array stored in (and reloadable from) the native pool."""

    __slots__ = ("pool", "bid", "dtype", "shape", "nbytes")

    def __init__(self, pool, arr: np.ndarray):
        arr = np.ascontiguousarray(arr)
        self.pool = pool
        self.dtype = arr.dtype
        self.shape = arr.shape
        self.nbytes = max(arr.nbytes, 1)
        self.bid = pool.alloc(self.nbytes)
        view = pool.view(self.bid, self.nbytes)
        view[: arr.nbytes] = arr.view(np.uint8).reshape(-1)

    def get(self) -> np.ndarray:
        view = self.pool.view(self.bid, self.nbytes)
        return view[: int(np.prod(self.shape)) * self.dtype.itemsize].view(self.dtype).reshape(self.shape)

    def free(self) -> None:
        self.pool.free(self.bid)


class HostRunStore:
    """Accumulates DataFrame batches as host-side column runs.

    ``add`` copies one device batch to host storage (through the spill pool
    when available); ``to_frame`` rebuilds a single DataFrame. String columns
    travel as dictionary codes + per-run tables, re-unified at rebuild (no
    re-encoding pass)."""

    def __init__(self, budget_bytes: int | None = None):
        self.runs: list[list[tuple]] = []  # per run: [(name, dtype, store, valid_store, table, child)]
        self.heights: list[int] = []
        self.schema_cols: list[tuple] | None = None
        self.pool = None
        budget = _budget() if budget_bytes is None else budget_bytes
        if budget:
            try:
                from polars_tpu.utils.native import BufferPool

                self.pool = BufferPool(budget_bytes=budget)
            except Exception:  # noqa: BLE001 — native unavailable: plain numpy
                self.pool = None

    def _store(self, arr: np.ndarray):
        if self.pool is not None:
            return _PoolArray(self.pool, arr)
        return np.ascontiguousarray(arr)

    @staticmethod
    def _load(stored) -> np.ndarray:
        return stored.get() if isinstance(stored, _PoolArray) else stored

    def add(self, df: DataFrame) -> None:
        h = df.height
        run = []
        for c in df._columns:
            vals = np.asarray(c.buffer.values)[:h]
            valid = None if c.buffer.validity is None else np.asarray(c.buffer.validity)[:h]
            run.append(
                (
                    c.name,
                    c.dtype,
                    self._store(vals),
                    None if valid is None else self._store(valid),
                    c.table,
                    getattr(c, "child", None),
                )
            )
        if self.schema_cols is None:
            self.schema_cols = [(r[0], r[1]) for r in run]
        self.runs.append(run)
        self.heights.append(h)

    @property
    def total_rows(self) -> int:
        return sum(self.heights)

    def to_frame(self) -> DataFrame:
        import jax.numpy as jnp

        if not self.runs:
            return DataFrame()
        n = self.total_rows
        size = padded_size(n)
        cols: list[Column] = []
        n_cols = len(self.runs[0])
        for ci in range(n_cols):
            name, dtype = self.runs[0][ci][0], self.runs[0][ci][1]
            tables = [r[ci][4] for r in self.runs]
            child = self.runs[0][ci][5]
            if tables[0] is not None:
                # unify dictionary tables across runs, remap codes
                unified = tables[0]
                remaps = [np.arange(len(unified), dtype=np.int32)]
                for t in tables[1:]:
                    unified, lmap, rmap = strtable.unify(unified, t)
                    remaps = [lmap[m] if len(lmap) else m for m in remaps]
                    remaps.append(rmap)
                parts = []
                for r, m in zip(self.runs, remaps):
                    codes = self._load(r[ci][2])
                    parts.append(m[codes] if len(m) else codes)
                values = np.concatenate(parts) if parts else np.zeros(0, np.int32)
                table = unified
            else:
                values = np.concatenate([self._load(r[ci][2]) for r in self.runs])
                table = None
            has_valid = any(r[ci][3] is not None for r in self.runs)
            validity = None
            if has_valid:
                vparts = [
                    self._load(r[ci][3]) if r[ci][3] is not None else np.ones(h, bool)
                    for r, h in zip(self.runs, self.heights)
                ]
                validity = pad_to(jnp.asarray(np.concatenate(vparts)), size)
            cols.append(
                Column(
                    name, dtype,
                    Buffer(pad_to(jnp.asarray(values), size), validity, n),
                    table, 0, child,
                )
            )
        return DataFrame._from_columns(cols, n)

    def close(self) -> None:
        if self.pool is not None:
            for run in self.runs:
                for r in run:
                    if isinstance(r[2], _PoolArray):
                        r[2].free()
                    if isinstance(r[3], _PoolArray):
                        r[3].free()
        self.runs = []
