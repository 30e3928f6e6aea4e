"""ctypes bindings for the C++ native runtime (native/polars_tpu_native.cpp).

Builds on first use with g++ (cached in native/build/). Provides:
- BufferPool: host memory pool with spill-to-disk (polars-ooc analogue)
- dict_encode_utf8: fast dictionary interning over Arrow string buffers
- row encoding + host row-sort (polars-row analogue)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_LIB = None
_REPO = Path(__file__).resolve().parent.parent.parent


def _build() -> Path:
    src = _REPO / "native" / "polars_tpu_native.cpp"
    out_dir = _REPO / "native" / "build"
    out_dir.mkdir(exist_ok=True)
    # key the artifact on the source CONTENT hash, not mtime: -march=native
    # binaries must never be loaded on a machine they weren't built on
    # (git checkout mtimes are arbitrary; build/ is gitignored)
    import hashlib

    digest = hashlib.sha256(src.read_bytes()).hexdigest()[:16]
    so = out_dir / f"libpolars_tpu_native-{digest}.so"
    if so.exists():
        return so
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        str(src), "-o", str(so),
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return so


def get_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    so = _build()
    lib = ctypes.CDLL(str(so))
    lib.pool_alloc.restype = ctypes.c_int64
    lib.pool_alloc.argtypes = [ctypes.c_int64]
    lib.pool_ptr.restype = ctypes.c_void_p
    lib.pool_ptr.argtypes = [ctypes.c_int64]
    lib.pool_free.argtypes = [ctypes.c_int64]
    lib.pool_set_budget.argtypes = [ctypes.c_int64]
    lib.pool_set_spill_dir.argtypes = [ctypes.c_char_p]
    lib.pool_in_memory_bytes.restype = ctypes.c_int64
    lib.pool_spilled_bytes.restype = ctypes.c_int64
    lib.dict_encode_utf8.restype = ctypes.c_int64
    lib.dict_encode_utf8.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.rowenc_i64.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
    ]
    lib.rowenc_f64.argtypes = lib.rowenc_i64.argtypes
    lib.rowsort.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
    ]
    os.makedirs("/tmp/polars_tpu_spill", exist_ok=True)
    lib.pool_set_spill_dir(b"/tmp/polars_tpu_spill")
    _LIB = lib
    return lib


def native_available() -> bool:
    try:
        get_lib()
        return True
    except Exception:  # noqa: BLE001
        return False


class BufferPool:
    """Spill-capable host buffer pool (singleton usage)."""

    def __init__(self, budget_bytes: int | None = None) -> None:
        self.lib = get_lib()
        if budget_bytes is not None:
            self.lib.pool_set_budget(budget_bytes)

    def alloc(self, nbytes: int) -> int:
        bid = self.lib.pool_alloc(nbytes)
        if bid < 0:
            raise MemoryError(f"pool_alloc({nbytes}) failed")
        return bid

    def view(self, bid: int, nbytes: int, dtype=np.uint8) -> np.ndarray:
        ptr = self.lib.pool_ptr(bid)
        if not ptr:
            raise MemoryError(f"buffer {bid} unavailable")
        buf = (ctypes.c_uint8 * nbytes).from_address(ptr)
        return np.frombuffer(buf, dtype=dtype)

    def free(self, bid: int) -> None:
        self.lib.pool_free(bid)

    def in_memory_bytes(self) -> int:
        return self.lib.pool_in_memory_bytes()

    def spilled_bytes(self) -> int:
        return self.lib.pool_spilled_bytes()

    def spill_all(self) -> None:
        self.lib.pool_spill_all()


def dict_encode_arrow(arr) -> tuple[np.ndarray, list[str]]:
    """Dictionary-encode a pyarrow large_string/string array via the native
    interner. Returns (codes int32, unique values)."""
    import pyarrow as pa

    lib = get_lib()
    if arr.type != pa.large_string():
        arr = arr.cast(pa.large_string())
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64, count=len(arr) + 1)
    data_buf = arr.buffers()[2]
    data = (
        np.frombuffer(data_buf, dtype=np.uint8)
        if data_buf is not None
        else np.zeros(1, np.uint8)
    )
    n = len(arr)
    codes = np.empty(n, np.int32)
    uoff = np.empty(n + 1, np.int64)
    udata = np.empty(max(len(data), 1), np.uint8)
    n_unique = lib.dict_encode_utf8(
        offsets.ctypes.data, data.ctypes.data, n,
        codes.ctypes.data, uoff.ctypes.data, udata.ctypes.data,
    )
    uniques = [
        bytes(udata[uoff[i] : uoff[i + 1]]).decode() for i in range(n_unique)
    ]
    return codes, uniques


def rowsort_host(keys: list[tuple[np.ndarray, np.ndarray | None]]) -> np.ndarray:
    """Multi-key stable argsort on the host via the native row encoder."""
    lib = get_lib()
    n = len(keys[0][0])
    stride = 9 * len(keys)
    rows = np.zeros((n, stride), np.uint8)
    off = 0
    for vals, validity in keys:
        vptr = validity.ctypes.data if validity is not None else None
        if vals.dtype == np.float64:
            lib.rowenc_f64(vals.ctypes.data, vptr, n, rows.ctypes.data, stride, off, 0)
        else:
            v64 = np.ascontiguousarray(vals, np.int64)
            lib.rowenc_i64(v64.ctypes.data, vptr, n, rows.ctypes.data, stride, off, 0)
        off += 9
    out = np.empty(n, np.int64)
    lib.rowsort(rows.ctypes.data, stride, n, out.ctypes.data)
    return out
