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
    """Map values to ONE comparable word whose ``<`` order equals the logical
    order, with NaN canonicalized greatest.

    Floats stay floats (XLA's sort comparator is already a total order with
    NaN greatest after canonicalization) — the IEEE bit transform is avoided
    because 64-bit ``bitcast_convert`` is unimplemented on this TPU backend's
    x64 rewriter. NaN-vs-value ordering is handled by the rank word callers
    add (see sort_words); for pure key-equality uses (grouping boundaries),
    canonicalized NaNs compare equal to each other via the float '==' only if
    callers also compare the NaN rank word — which they do.
    """
    if values.dtype in (jnp.float64, jnp.float32):
        nan = jnp.isnan(values)
        # canonicalize NaN payloads/sign and collapse -0.0 to +0.0
        v = jnp.where(nan, jnp.asarray(jnp.inf, values.dtype), values)
        v = jnp.where(v == 0, jnp.zeros((), values.dtype), v)
        return v
    if values.dtype == jnp.bool_:
        return values.astype(jnp.int32)
    if values.dtype in (jnp.uint8, jnp.uint16, jnp.uint32):
        return values.astype(jnp.int64)
    if values.dtype == jnp.uint64:
        # shift into signed order-preserving range
        return (values - (1 << 62) - (1 << 62)).astype(jnp.int64)
    return values  # signed ints already totally ordered


def nan_rank(values: jax.Array) -> jax.Array | None:
    """Extra rank word separating NaN (greatest value) from real numbers.
    None for non-float dtypes (no extra word needed)."""
    if values.dtype in (jnp.float64, jnp.float32):
        return jnp.isnan(values).astype(jnp.int8)
    return None


def order_words(
    values: jax.Array, dtype: dt.DataType, *, descending: bool = False
) -> list[jax.Array]:
    """The canonical multi-word sort/equality encoding of one key column.

    Ascending ``lexicographic <`` over the returned words == the column's
    logical total order (NaN greatest); word-wise ``==`` == logical key
    equality. This replaces the reference's byte-row encoding (polars-row)
    with register-resident words for ``lax.sort(num_keys=...)``.
    """
    key = total_order_key(values, dtype)
    words: list[jax.Array] = []
    nr = nan_rank(values)
    if nr is not None:
        words.append((1 - nr).astype(jnp.int8) if descending else nr)
        words.append(jnp.negative(key) if descending else key)
        return words
    if descending:
        key = ~key if key.dtype != jnp.bool_ else ~key
    words.append(key)
    return words


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
        k64 = k64 + (1 << (w - 1))
        slot = jnp.where(v, k64 + 1, 0) if v is not None else k64 + 1
        out = (out << (w + 1)) | slot
    return out
