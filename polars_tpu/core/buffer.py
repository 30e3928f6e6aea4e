"""Device-resident columnar buffers.

The TPU-native answer to the reference's buffer + array layers
(polars-buffer/src/buffer.rs, polars-arrow/src/array/mod.rs:77): instead of
refcounted chunked heap buffers, a column is ONE dense device array padded to a
power-of-two tile multiple, plus an optional validity mask and a host-known
logical length. Static padded shapes keep every operator XLA-compilable; the
logical length is threaded into kernels as a traced scalar so queries do not
recompile when only the row count changes within a padding bucket.

Invariants:
- ``values.shape[0] == padded`` where ``padded = padded_size(length)`` or any
  larger bucket produced upstream.
- rows >= length are PADDING: their values are unspecified; ``validity`` (when
  present) is False there. Every consumer must mask with :func:`row_mask`.
- ``validity is None`` means "all logical rows valid".
"""

from __future__ import annotations

import functools
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

# Lane width of the TPU VPU; the last dim of every tile is 128.
PAD_UNIT = 128

# ---------------------------------------------------------------------------
# packed ingest: host->device transfer compression (device-side decode)
#
# The axon tunnel moves ~15 MB/s (measured 2026-08-19), so wide columns make
# ingest the end-to-end bottleneck at scale. When a column's values admit an
# EXACT narrow encoding — integral f64 in an int8/16/32 range, fixed-point
# decimals (PDS-H prices/discounts), f32-exact doubles, or narrow-range i64 —
# ship the narrow array and widen ON DEVICE inside a jit. The reference
# decodes parquet's packed encodings on the CPU that owns the data
# (polars-parquet's decoders); the TPU-native move is to keep the compact
# form across the wire and let the VPU do the widening at HBM bandwidth.
# Exactness is verified host-side per column before the path is taken.
# ---------------------------------------------------------------------------

_PACK_STATS = {"cols": 0, "raw_bytes": 0, "packed_bytes": 0}


def pack_stats() -> dict:
    return dict(_PACK_STATS)


def _pack_enabled() -> bool:
    return os.environ.get("POLARS_TPU_PACKED_INGEST", "1") != "0"


def _pack_min() -> int:
    try:
        return int(os.environ.get("POLARS_TPU_PACK_INGEST_MIN", str(1 << 19)))
    except ValueError:
        return 1 << 19


@functools.lru_cache(maxsize=None)
def _decode_jit(kind: str, out_dtype: str):
    """Module-level jits (keyed statically) so decode programs hit the global
    jit cache; narrow data arrives as an ARGUMENT (closing over an eager
    device array counts as a readback at lowering — CLAUDE.md)."""

    if kind == "scale":

        @jax.jit
        def f(x, p):
            # IEEE division is correctly rounded: c / scale reproduces the
            # exact source double (host-verified before choosing this path)
            return x.astype(jnp.float64) / p

    elif kind == "shift":

        @jax.jit
        def f(x, p):
            # widen in i64 then cast: narrow + i64 offset must not promote
            # through the narrow (or an unsigned) dtype
            return (x.astype(jnp.int64) + p).astype(jnp.dtype(out_dtype))

    elif kind == "delta":

        @jax.jit
        def f(x, p):
            # packed[0] == 0, so cumsum + base reproduces the sequence; the
            # padding tail decodes to the last value (padding is unspecified)
            return (jnp.cumsum(x.astype(jnp.int64)) + p).astype(jnp.dtype(out_dtype))

    else:  # cast

        @jax.jit
        def f(x, p):  # noqa: ARG001
            return x.astype(jnp.dtype(out_dtype))

    return f


def _narrow_int(c: np.ndarray):
    """Smallest int dtype holding ``c`` exactly (c is int64/float64 integral)."""
    lo, hi = (c.min(), c.max()) if c.size else (0, 0)
    for d in (np.int8, np.int16, np.int32):
        info = np.iinfo(d)
        if info.min <= lo and hi <= info.max:
            return d
    return None


def _pack_plan(values: np.ndarray):
    """(packed ndarray, kind, param, out_dtype_str) or None. Host-side
    analysis; every plan is verified exact on the host before use."""
    if values.ndim != 1 or values.size < _pack_min():
        return None
    d = values.dtype
    if d == np.float64:
        if not np.isfinite(values).all():
            return None
        if np.any((values == 0.0) & np.signbit(values)):
            return None  # -0.0 would decode as +0.0
        for scale in (1.0, 100.0, 10000.0):
            c = np.rint(values * scale)
            if np.abs(c).max(initial=0.0) < 2**31 and np.array_equal(c / scale, values):
                ci = c.astype(np.int64)
                nd = _narrow_int(ci)
                if nd is None or np.dtype(nd).itemsize >= 8:
                    return None
                return ci.astype(nd), "scale", np.float64(scale), "float64"
        f32 = values.astype(np.float32)
        if np.array_equal(f32.astype(np.float64), values):
            return f32, "cast", None, "float64"
        return None
    if d in (np.int64, np.int32, np.uint32, np.int16):
        if values.size == 0:
            return None
        v64 = values.astype(np.int64)
        lo, hi = v64.min(), v64.max()
        c = v64 - lo if lo != 0 else v64
        nd = _narrow_int(c)
        # delta encoding beats shift-narrowing on sorted-ish columns (an
        # ordered key's deltas are tiny even when its range is not); the
        # first slot holds 0 and the base rides as the decode param
        ndd = None
        if values.size > 1 and -(2**62) < lo and hi < 2**62:
            dd = np.diff(v64)
            ndd = _narrow_int(dd)
        if ndd is not None and (nd is None or np.dtype(ndd).itemsize < np.dtype(nd).itemsize):
            packed = np.empty(values.size, ndd)
            packed[0] = 0
            packed[1:] = dd
            return packed, "delta", np.int64(v64[0]), str(np.dtype(d))
        if nd is None or np.dtype(nd).itemsize >= d.itemsize:
            return None
        if lo != 0:
            return c.astype(nd), "shift", np.int64(lo), str(np.dtype(d))
        return c.astype(nd), "cast", None, str(np.dtype(d))
    return None


def _packed_ingest(values: np.ndarray, size: int):
    """Try the packed transfer; returns the decoded device array or None."""
    if not _pack_enabled():
        return None
    plan = _pack_plan(values)
    if plan is None:
        return None
    packed, kind, param, out_dtype = plan
    if packed.shape[0] != size:
        packed = np.pad(packed, (0, size - packed.shape[0]))
    dev = jnp.asarray(packed)
    out = _decode_jit(kind, out_dtype)(
        dev, param if param is not None else np.float64(0)
    )
    _PACK_STATS["cols"] += 1
    _PACK_STATS["raw_bytes"] += size * values.dtype.itemsize
    _PACK_STATS["packed_bytes"] += size * packed.dtype.itemsize
    return out


def padded_size(n: int) -> int:
    """Power-of-two padding bucket (>= 128) for a logical length.

    Power-of-two buckets bound the number of distinct compiled shapes per query
    to O(log n) — the TPU analogue of the reference's fixed 100k-row morsels
    (polars-config/src/lib.rs:34-36).
    """
    if n <= PAD_UNIT:
        return PAD_UNIT
    return 1 << (int(n - 1).bit_length())


def pad_to(arr: jax.Array, size: int) -> jax.Array:
    """Zero-pad (or truncate) a 1-D array to ``size`` rows."""
    n = arr.shape[0]
    if n == size:
        return arr
    if n > size:
        return arr[:size]
    return jnp.pad(arr, (0, size - n))


class Buffer:
    """A padded device array + validity + logical length.

    The analogue of ``PrimitiveArray`` + ``Bitmap`` (polars-arrow/src/array/
    primitive, bitmap/immutable.rs) collapsed into the only layout the MXU/VPU
    care about: dense, fixed-width, tile-aligned.
    """

    __slots__ = ("values", "validity", "length", "_pt_token", "__weakref__")

    def __init__(
        self,
        values: jax.Array,
        validity: jax.Array | None,
        length: int,
    ) -> None:
        self.values = values
        self.validity = validity
        self.length = int(length)

    # -- constructors -------------------------------------------------------

    @staticmethod
    def from_numpy(
        values: np.ndarray,
        validity: np.ndarray | None = None,
        *,
        dtype: Any = None,
    ) -> Buffer:
        values = np.asarray(values)
        n = values.shape[0]
        size = padded_size(n)
        dev_values = None
        if dtype is None or np.dtype(dtype) == values.dtype:
            dev_values = _packed_ingest(values, size)
        if dev_values is None:
            if values.shape[0] != size:
                pad_width = [(0, size - n)] + [(0, 0)] * (values.ndim - 1)
                values = np.pad(values, pad_width)
            dev_values = jnp.asarray(values, dtype=dtype)
        dev_validity = None
        if validity is not None:
            v = np.zeros(size, dtype=bool)
            v[:n] = np.asarray(validity, dtype=bool)[:n]
            if v[:n].all():
                dev_validity = None
            else:
                dev_validity = jnp.asarray(v)
        return Buffer(dev_values, dev_validity, n)

    @staticmethod
    def full(length: int, fill_value: Any, dtype: Any) -> Buffer:
        size = padded_size(length)
        return Buffer(jnp.full((size,), fill_value, dtype=dtype), None, length)

    # -- properties ----------------------------------------------------------

    @property
    def padded(self) -> int:
        return self.values.shape[0]

    @property
    def dtype(self):
        return self.values.dtype

    def __len__(self) -> int:
        return self.length

    def __repr__(self) -> str:
        return (
            f"Buffer(len={self.length}, padded={self.padded}, "
            f"dtype={self.values.dtype}, has_validity={self.validity is not None})"
        )

    # -- masks ----------------------------------------------------------------

    def row_mask(self) -> jax.Array:
        """Bool array marking logical (in-bounds) rows."""
        return row_mask(self.padded, self.length)

    def valid_mask(self) -> jax.Array:
        """Bool array: in-bounds AND valid (non-null)."""
        m = self.row_mask()
        if self.validity is not None:
            m = m & self.validity
        return m

    def null_count(self) -> int:
        if self.validity is None:
            return 0
        return int(self.length - jnp.count_nonzero(self.valid_mask()))

    # -- host transfer ---------------------------------------------------------

    def to_numpy(self) -> tuple[np.ndarray, np.ndarray | None]:
        """Return (values[:length], validity[:length] or None) on host."""
        vals = np.asarray(self.values)[: self.length]
        if self.validity is None:
            return vals, None
        val = np.asarray(self.validity)[: self.length]
        if val.all():
            return vals, None
        return vals, val

    # -- slicing / reshaping -----------------------------------------------------

    def slice(self, offset: int, length: int) -> Buffer:
        offset = max(0, min(offset, self.length))
        length = max(0, min(length, self.length - offset))
        size = padded_size(length)
        if offset == 0:
            values = pad_to(self.values, size)
            validity = None if self.validity is None else pad_to(self.validity, size)
        else:
            src = max(self.padded, offset + size)
            values = pad_to(jnp.roll(pad_to(self.values, src), -offset)[:size], size)
            validity = (
                None
                if self.validity is None
                else pad_to(jnp.roll(pad_to(self.validity, src), -offset)[:size], size)
            )
        if validity is not None:
            validity = validity & row_mask(size, length)
        return Buffer(values, validity, length)

    def with_length(self, length: int) -> Buffer:
        """Reinterpret the leading ``length`` rows as the logical extent."""
        size = padded_size(length)
        values = pad_to(self.values, size)
        validity = None if self.validity is None else pad_to(self.validity, size)
        return Buffer(values, validity, length)


def row_mask(padded: int, length) -> jax.Array:
    """Mask of in-bounds rows; ``length`` may be a Python int or traced scalar."""
    return jax.lax.broadcasted_iota(jnp.int32, (padded, 1), 0).squeeze(-1) < length


def concat_buffers(bufs: list[Buffer]) -> Buffer:
    """Vertical concatenation with re-padding (the rechunk analogue)."""
    total = sum(b.length for b in bufs)
    size = padded_size(total)
    parts = []
    val_parts = []
    any_validity = any(b.validity is not None for b in bufs)
    for b in bufs:
        parts.append(b.values[: b.length] if b.padded != b.length else b.values)
        if any_validity:
            if b.validity is None:
                val_parts.append(jnp.ones((b.length,), dtype=bool))
            else:
                val_parts.append(b.validity[: b.length])
    values = pad_to(jnp.concatenate(parts) if len(parts) > 1 else parts[0], size)
    validity = None
    if any_validity:
        validity = pad_to(
            jnp.concatenate(val_parts) if len(val_parts) > 1 else val_parts[0], size
        )
    return Buffer(values, validity, total)
