"""Stable multi-key argsort via packed single-array radix passes.

THE sort primitive of the engine (the radix-sort north-star op). Rationale:
multi-operand ``lax.sort`` (variadic comparator) permanently degrades this TPU
backend's dispatch path (~25ms added to EVERY subsequent program launch —
measured, see round-1 notes), while single-array sorts are clean and fast. So
multi-key stable ordering is built the radix way, LSD-first:

    for word w from least- to most-significant:
        packed = (w[perm] << 32) | position     # position keeps stability
        perm   = perm[ unpack(sort_single(packed)) ]

Each pass is ONE single-operand 64-bit sort; ties propagate by position, so
the composition is a stable lexicographic argsort — the in-register equivalent
of polars-row's memcmp byte rows (polars-row/src/lib.rs:1-70).

Word encodings avoid 64-bit bitcasts (also unimplemented on this backend):
f64 keys decompose into three order-preserving f32 residual words (exact: the
words carry >= 72 mantissa bits).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from polars_tpu import datatypes as dt

_I32_MIN = -0x80000000


def _f32_word(x: jax.Array) -> jax.Array:
    """f32 -> order-preserving i32 (32-bit bitcast is supported)."""
    bits = jax.lax.bitcast_convert_type(x, jnp.int32)
    neg_key = jnp.bitwise_not(bits) + _I32_MIN
    return jnp.where(bits < 0, neg_key, bits)


def key_words(values: jax.Array, dtype: dt.DataType, *, descending: bool = False) -> list[jax.Array]:
    """Order-preserving i32 word list for one key column (most-significant
    first). Lexicographic word order == logical total order, NaN greatest."""
    d = values.dtype
    words: list[jax.Array]
    if d in (jnp.float64,):
        # exact full-range decomposition WITHOUT 64-bit bitcasts: frexp gives
        # (mantissa in [0.5,1), exponent) exactly; mantissa scales to a 52-bit
        # integer split into two i32 words. Sign/exponent/nan/inf collapse into
        # one small class word; negative rows flip their magnitude words.
        nan = jnp.isnan(values)
        inf = jnp.isinf(values)
        v = jnp.where(nan | inf, jnp.zeros((), d), values)
        neg = values < 0
        is_zero = (v == 0) & ~inf & ~nan
        m, e = _frexp_ladder(jnp.abs(v))
        e = jnp.where(is_zero, -4000, e)
        e = jnp.where(inf, 4000, e)
        # class: 0 = negatives, 1 = zero, 2 = positives, 3 = NaN (greatest)
        cls = jnp.where(nan, 3, jnp.where(neg, 0, 2)).astype(jnp.int32)
        cls = jnp.where(is_zero, 1, cls)
        e_adj = jnp.where(neg, -e, e) + 4096  # [0, 8192)
        cls_exp = (cls * 8192 + jnp.where(cls == 1, 0, e_adj)).astype(jnp.uint16)
        mm = m * float(1 << 52)  # m in [1,2): exact integer in [2^52, 2^53)
        mm = jnp.where(nan | inf | is_zero, 0.0, mm)
        m_hi_f = jnp.floor(mm * 2.0**-32)  # exact pow2 scaling
        m_hi = m_hi_f.astype(jnp.int32)  # 21 bits
        m_lo = (mm - m_hi_f * float(1 << 32) - float(1 << 31)).astype(jnp.int32)
        m_hi = jnp.where(neg, jnp.bitwise_not(m_hi), m_hi)
        m_lo = jnp.where(neg, jnp.bitwise_not(m_lo), m_lo)
        words = [cls_exp, m_hi, m_lo]
    elif d == jnp.float32:
        nan = jnp.isnan(values)
        v = jnp.where(nan, jnp.zeros((), d), values)
        v = jnp.where(v == 0, jnp.zeros((), d), v)
        words = [nan.astype(jnp.int32), _f32_word(v)]
    elif d == jnp.bool_:
        words = [values.astype(jnp.int32)]
    elif d in (jnp.int8, jnp.int16, jnp.int32):
        words = [values.astype(jnp.int32)]
    elif d in (jnp.uint8, jnp.uint16):
        words = [values.astype(jnp.int32)]
    elif d == jnp.uint32:
        words = [(values.astype(jnp.int64) + _I32_MIN).astype(jnp.int32)]
    elif d == jnp.uint64:
        s = (values - (1 << 62) - (1 << 62)).astype(jnp.int64)  # -2^63 mod 2^64 (literal split: weak ints cap at 2^63-1)
        words = _i64_words(s)
    else:  # int64 family
        words = _i64_words(values.astype(jnp.int64))
    if descending:
        words = [jnp.bitwise_not(w) for w in words]
    return words


def _frexp_ladder(a: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(mantissa in [1,2), exponent) for positive finite f64, via exact
    power-of-two rescaling — ``jnp.frexp`` is unusable here (its lowering
    bitcasts through s64, unimplemented on this backend's x64 rewriter).
    Zero returns (0, 0). All multiplies are by powers of two: exact."""
    m = a
    e = jnp.zeros(a.shape, jnp.int32)
    # pre-scale subnormals: the greedy ladder shifts at most 1023 exponents
    sub = (m > 0) & (m < 2.0**-1000)
    m = jnp.where(sub, m * 2.0**64, m)
    e = jnp.where(sub, e - 64, e)
    for k in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
        up = 2.0**k
        down = 2.0 ** (-k)
        hi = m >= up
        m = jnp.where(hi, m * down, m)
        e = jnp.where(hi, e + k, e)
        lo = (m < 2.0 ** (1 - k)) & (m > 0)
        m = jnp.where(lo, m * up, m)
        e = jnp.where(lo, e - k, e)
    return m, e


def _i64_words(x: jax.Array) -> list[jax.Array]:
    hi = (x >> 32).astype(jnp.int32)
    lo = ((x & 0xFFFFFFFF) + _I32_MIN).astype(jnp.int32)
    return [hi, lo]


def pack_rank_words(ranks: list[jax.Array]) -> jax.Array:
    """Pack several tiny rank words (values in [0, 7]) into one i32 word."""
    out = jnp.zeros(ranks[0].shape, jnp.int32)
    for r in ranks:
        out = (out << 3) | r.astype(jnp.int32)
    return out


import os

_FORCE_RADIX = bool(os.environ.get("POLARS_TPU_RADIX_SORT"))


def stable_argsort_words(words: list[jax.Array]) -> jax.Array:
    """Stable argsort by lexicographic word order (most-significant first).

    Default: ONE variadic ``lax.sort`` over all words plus an iota tiebreak
    (num_keys covers every operand, so the result is a stable lexicographic
    argsort — the in-register analogue of polars-row's memcmp rows). Round-1
    probing initially blamed variadic sorts for a permanent ~25ms dispatch
    degradation; deeper probing showed the real trigger is device->host
    readback (see CLAUDE.md), and variadic sorts are clean — so the
    radix-pass fallback below (POLARS_TPU_RADIX_SORT=1) is kept only as an
    escape hatch.
    """
    flat0: list[jax.Array] = [w[0] if isinstance(w, tuple) else w for w in words]
    n = flat0[0].shape[0]
    if not _FORCE_RADIX:
        iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
        ops = [w.astype(jnp.int32) if w.dtype != jnp.int32 else w for w in flat0]
        out = jax.lax.sort([*ops, iota], dimension=0, num_keys=len(ops) + 1)
        return out[-1]
    if jax.default_backend() != "tpu":
        iota64 = jax.lax.broadcasted_iota(jnp.int64, (n, 1), 0).squeeze(-1)
        perm = None
        for w in reversed(flat0):
            w32 = w.astype(jnp.int32)
            wp = w32 if perm is None else w32[perm]
            packed = (wp.astype(jnp.int64) << 32) | iota64
            sp = jax.lax.sort(packed, dimension=0)
            pos = (sp & 0xFFFFFFFF).astype(jnp.int32)
            perm = pos if perm is None else perm[pos]
        return perm if perm is not None else iota64.astype(jnp.int32)

    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    pos_f = iota.astype(jnp.float64)
    perm = None
    _SHIFT = float(1 << 36)

    # rank words (small nonnegative ranges) take one pass; general i32 words
    # split into two 16-bit digit passes
    flat: list[tuple[jax.Array, bool]] = []
    for w in words:
        small = isinstance(w, tuple)
        arr = w[0] if small else w
        flat.append((arr, small or _is_small_dtype(arr)))

    for arr, small in reversed(flat):
        w32 = arr.astype(jnp.int32)
        if small:
            digits = [jnp.maximum(w32, 0)]
        else:
            u = w32.astype(jnp.float64) - float(_I32_MIN)  # [0, 2^32)
            hi16 = jnp.floor(u * 2.0**-16)  # exact pow2 scaling
            lo16 = u - hi16 * 65536.0
            digits = [lo16, hi16]
        for digit in digits:
            d = digit if perm is None else digit[perm]
            packed = d.astype(jnp.float64) * _SHIFT + pos_f
            sp = jax.lax.sort(packed, dimension=0)
            hi = jnp.floor(sp * 2.0**-36)  # exact pow2 scaling
            pos = (sp - hi * _SHIFT).astype(jnp.int32)
            perm = pos if perm is None else perm[pos]
    return perm if perm is not None else iota


def _is_small_dtype(arr: jax.Array) -> bool:
    """int8/uint8/bool rank words always fit one nonneg 16-bit digit (callers
    keep rank values >= 0)."""
    return arr.dtype in (jnp.int8, jnp.uint8, jnp.bool_, jnp.uint16)


def boundaries_from_words(words: list[jax.Array], perm: jax.Array) -> jax.Array:
    """After sorting by ``perm``, True where the key differs from the previous
    row (row 0 always True)."""
    n = perm.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    diff = iota == 0
    for w in words:
        arr = w[0] if isinstance(w, tuple) else w
        ws = arr[perm]
        diff = diff | (ws != jnp.roll(ws, 1))
    return diff
