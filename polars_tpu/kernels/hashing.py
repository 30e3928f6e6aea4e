"""Vectorized 64-bit row hashing.

Reference: polars' vectorized row hashing for join/group-by
(polars-core/src/hashing/, polars-expr/src/hash_keys.rs) and the seeded
``HashPartitioner`` (polars-utils/src/hashing.rs:72-99) whose partition
assignment is consistent across independent instances — the property the
distributed shuffle relies on.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# splitmix64 constants as SIGNED int64 two's-complement python ints. Two
# reasons: (a) captured 0-d jnp scalar constants become device-buffer args and
# permanently degrade this backend's dispatch path (measured; see CLAUDE.md);
# (b) python ints above 2^63-1 overflow JAX's weak-int parsing. add/mul/xor
# wrap identically in int64 and uint64, so the mix runs in the int64 domain.
_C1 = 0x9E3779B97F4A7C15 - (1 << 64)
_C2 = 0xBF58476D1CE4E5B9 - (1 << 64)
_C3 = 0x94D049BB133111EB - (1 << 64)


def _shr(x: jax.Array, k: int) -> jax.Array:
    """Logical (zero-fill) right shift on int64 bit patterns."""
    return (x >> k) & ((1 << (64 - k)) - 1)


def splitmix64(x: jax.Array) -> jax.Array:
    """splitmix64 finalizer — cheap, high-quality 64-bit mixing (VPU-friendly:
    only mul/xor/shift), on int64 bit patterns."""
    x = x.astype(jnp.int64) + _C1
    x = (x ^ _shr(x, 30)) * _C2
    x = (x ^ _shr(x, 27)) * _C3
    return x ^ _shr(x, 31)


def hash_column(values: jax.Array, validity: jax.Array | None, seed: int = 0) -> jax.Array:
    """Hash one column to int64 bit patterns (nulls hash to a fixed sentinel)."""
    if values.dtype in (jnp.float32, jnp.float64):
        # canonicalize NaN / -0.0 so equal keys hash equal; 64-bit bitcasts are
        # unimplemented on this backend, so f64 splits into an f32 hi/lo pair
        # (equal f64s give identical pairs; callers verify candidates anyway)
        v = jnp.where(jnp.isnan(values), jnp.asarray(jnp.nan, values.dtype), values)
        v = jnp.where(v == 0, jnp.zeros((), values.dtype), v)
        if values.dtype == jnp.float64:
            hi = v.astype(jnp.float32)
            lo = (v - hi.astype(jnp.float64)).astype(jnp.float32)
            hi = jnp.where(jnp.isnan(hi), jnp.asarray(jnp.nan, jnp.float32), hi)
            lo = jnp.where(jnp.isnan(lo) | jnp.isinf(v.astype(jnp.float32)), jnp.zeros((), jnp.float32), lo)
            bhi = jax.lax.bitcast_convert_type(hi, jnp.int32).astype(jnp.int64)
            blo = jax.lax.bitcast_convert_type(lo, jnp.int32).astype(jnp.int64)
            x = (bhi << 32) | (blo & 0xFFFFFFFF)
        else:
            bits = jax.lax.bitcast_convert_type(v, jnp.int32)
            x = bits.astype(jnp.int64)
    elif values.dtype == jnp.bool_:
        x = values.astype(jnp.int64)
    else:
        x = values.astype(jnp.int64)
    h = splitmix64(x + seed)
    if validity is not None:
        h = jnp.where(validity, h, 0xC0FFEE_DEAD_BEEF)
    return h


def combine_hashes(a: jax.Array, b: jax.Array) -> jax.Array:
    """Order-dependent hash combination (boost::hash_combine style, 64-bit)."""
    return splitmix64(a ^ (b + _C1 + (a << 6) + _shr(a, 2)))


def hash_columns(
    cols: list[tuple[jax.Array, jax.Array | None]], seed: int = 0
) -> jax.Array:
    """Hash several key columns into one uint64 per row (HashKeys analogue)."""
    h = hash_column(cols[0][0], cols[0][1], seed)
    for values, validity in cols[1:]:
        h = combine_hashes(h, hash_column(values, validity, seed))
    return h


def partition_of(h: jax.Array, num_partitions: int) -> jax.Array:
    """Hash -> partition id, consistent across callers (HashPartitioner
    analogue). Uses the high bits (multiply-shift) like the reference."""
    wide = _shr(h, 32) * num_partitions
    return _shr(wide, 32).astype(jnp.int32)
