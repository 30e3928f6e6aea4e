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

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

# Lane width of the TPU VPU; the last dim of every tile is 128.
PAD_UNIT = 128


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

    __slots__ = ("values", "validity", "length")

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
