"""Order-preserving key encoding (the polars-row analogue).

Reference: polars-row/src/lib.rs:1-70 — multi-column keys become byte rows whose
memcmp order equals lexicographic column order (sign-flip ints, IEEE total-order
floats, null sentinels). On TPU we keep keys as integer *words* in registers
instead of byte rows in memory: each column maps to one int array whose natural
``<`` order equals the column's logical order; multi-key ops feed the word list
to ``lax.sort(num_keys=m)`` or pack words into fewer int64s when the combined
bit-width allows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from polars_tpu import datatypes as dt


def total_order_key(values: jax.Array, dtype: dt.DataType) -> jax.Array:
    """Map values to SIGNED ints whose ``<`` order equals the logical order.

    Floats use the IEEE total-order transform (sign bit flip / full flip for
    negatives, matching polars-row's encoding); NaNs canonicalize to the largest
    key, matching the reference's NaN-greatest total order
    (polars-utils/src/total_ord.rs).
    """
    if values.dtype == jnp.float64:
        bits = jax.lax.bitcast_convert_type(values, jnp.int64)
        nan = jnp.isnan(values)
        bits = jnp.where(nan, jnp.int64(0x7FF8000000000000), bits)
        # sign-set bit patterns (negative floats) map to [int64_min, 0),
        # order-reversed; non-negatives keep their (already ascending) bits
        neg_key = jnp.bitwise_not(bits) + jnp.int64(-0x8000000000000000)
        return jnp.where(bits < 0, neg_key, bits)
    if values.dtype == jnp.float32:
        bits = jax.lax.bitcast_convert_type(values, jnp.int32)
        nan = jnp.isnan(values)
        bits = jnp.where(nan, jnp.int32(0x7FC00000), bits)
        neg_key = jnp.bitwise_not(bits) + jnp.int32(-0x80000000)
        return jnp.where(bits < 0, neg_key, bits)
    if values.dtype == jnp.bool_:
        return values.astype(jnp.int32)
    if values.dtype in (jnp.uint8, jnp.uint16, jnp.uint32):
        return values.astype(jnp.int64)
    if values.dtype == jnp.uint64:
        # shift into signed order-preserving range
        return (values - jnp.uint64(0x8000000000000000)).astype(jnp.int64)
    return values  # signed ints already totally ordered


def key_bit_width(dtype: dt.DataType, table_size: int | None = None) -> int | None:
    """Upper bound on the encoded key width in bits, or None if 64 needed."""
    name = type(dtype).__name__
    if name in ("String", "Categorical", "Enum", "Binary"):
        n = max(table_size or 0, 1)
        return max(int(n + 1).bit_length(), 1) + 1  # +1 for null sentinel headroom
    widths = {
        "Boolean": 2, "Int8": 9, "UInt8": 9, "Int16": 17, "UInt16": 17,
        "Int32": 33, "UInt32": 33, "Date": 33, "Float32": 33,
    }
    return widths.get(name)


def pack_keys_64(
    keys: list[jax.Array],
    validities: list[jax.Array | None],
    widths: list[int],
) -> jax.Array:
    """Pack several small order-encoded keys (+null sentinels) into one int64.

    Caller guarantees sum(widths)+len(keys) <= 63. Null sorts first (the
    reference's default null_last=false ordering for keys).
    """
    out = jnp.zeros(keys[0].shape, jnp.int64)
    for k, v, w in zip(keys, validities, widths):
        k64 = k.astype(jnp.int64)
        # bias signed value into unsigned range of width w
        k64 = k64 + (jnp.int64(1) << (w - 1))
        slot = jnp.where(v, k64 + 1, 0) if v is not None else k64 + 1
        out = (out << (w + 1)) | slot
    return out
