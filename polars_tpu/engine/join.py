"""Equi/asof/cross joins.

TPU-native replacement for the reference's hash-join stack (polars-ops/src/
frame/join/hash_join/, polars-stream/src/nodes/joins/equi_join.rs): the build
side is sorted by a 64-bit key word (``lax.sort``), probes binary-search the
sorted run (vectorized ``searchsorted``), and one-to-many expansion uses
offset arithmetic over static-capacity outputs. Multi-key joins hash to 64
bits (HashKeys analogue) and verify candidates during expansion; single
integer/dictionary keys skip hashing entirely. Output sizing needs exactly one
host sync (the count pass), mirroring the reference's build/probe barrier.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from polars_tpu import datatypes as dt
from polars_tpu.core.buffer import Buffer, pad_to, padded_size, row_mask
from polars_tpu.core.column import Column
from polars_tpu.core.frame import DataFrame
from polars_tpu.engine.common import Val
from polars_tpu.errors import InvalidOperationError
from polars_tpu.kernels.fastmath import floordiv_const, mod_const
from polars_tpu.kernels.hashing import combine_hashes, hash_column
from polars_tpu.kernels.rowencode import pack_keys_64, total_order_key
from polars_tpu.utils import strtable


def _key_word(col: Column, other: Column | None) -> tuple[jax.Array, jax.Array | None, bool]:
    """(int64 key word, validity, needs_verify) for one key column."""
    buf = col.buffer
    if isinstance(col.dtype, dt.Null):
        # all-null key column (e.g. from empty-list inference): nothing matches
        # unless nulls_equal folds nulls into keys upstream
        return (
            jnp.zeros((buf.padded,), jnp.int64),
            jnp.zeros((buf.padded,), bool),
            False,
        )
    if col.table is not None:
        c_hashed = getattr(col.table, "hashed", False)
        o_hashed = (
            other is not None
            and other.table is not None
            and getattr(other.table, "hashed", False)
        )
        if c_hashed:
            # hashed-key column: hashes ARE the key word (utils/hashstore.py)
            return buf.values.astype(jnp.int64), buf.validity, False
        if o_hashed:
            from polars_tpu.utils import hashstore

            harr = (
                hashstore.hash_values(col.table.values)
                if len(col.table) else np.zeros(1, np.int64)
            )
            lut = jnp.asarray(harr)
            return lut[jnp.clip(buf.values, 0, len(harr) - 1)], buf.validity, False
        if other is not None and other.table is not col.table:
            merged, lmap, _ = strtable.unify(col.table, other.table)
            if len(lmap) == 0:  # identity remap (insertion-order merge)
                return buf.values.astype(jnp.int64), buf.validity, False
            lut = jnp.asarray(lmap)
            codes = lut[jnp.clip(buf.values, 0, len(lmap) - 1)]
            return codes.astype(jnp.int64), buf.validity, False
        return buf.values.astype(jnp.int64), buf.validity, False
    if col.dtype.is_float():
        # float keys: 64-bit bitcast is unavailable on this backend, so route
        # through the hash-and-verify path (equal floats hash equal after
        # canonicalization in hash_column)
        h = hash_column(buf.values, buf.validity, 13)
        return h.astype(jnp.int64), buf.validity, True
    if isinstance(col.dtype, dt.Boolean):
        return buf.values.astype(jnp.int64), buf.validity, False
    if col.dtype.is_integer() or col.dtype.is_temporal() or isinstance(col.dtype, dt.Decimal):
        if type(col.dtype).__name__ == "UInt64":
            return total_order_key(buf.values, col.dtype), buf.validity, False
        return buf.values.astype(jnp.int64), buf.validity, False
    raise InvalidOperationError(f"cannot join on dtype {col.dtype!r}")


def _pair_bit_width(c: Column, o: Column | None) -> int | None:
    """Bit width of one key pair's common word domain, or None if it needs
    the full 64 bits. MUST be symmetric in (c, o): _side_keys is called once
    per side with the columns swapped and both sides must pack identically."""
    if c.table is not None:
        if getattr(c.table, "hashed", False) or (
            o is not None and o.table is not None
            and getattr(o.table, "hashed", False)
        ):
            return None  # hash space IS the 64-bit word
        osize = len(o.table) if (o is not None and o.table is not None) else 0
        size = len(c.table) + osize  # >= merged-table size, symmetric
        return max(int(size + 1).bit_length(), 1) + 1
    if o is not None and type(o.dtype).__name__ != type(c.dtype).__name__:
        return None  # mixed-width primitive pair: widths would differ per side
    from polars_tpu.kernels.rowencode import key_bit_width

    return key_bit_width(c.dtype)


def _side_keys(
    cols: list[Column], other_cols: list[Column], nulls_equal: bool
) -> tuple[jax.Array, jax.Array, bool]:
    """(key64, usable_mask, needs_verify) for one side's key columns."""
    n_padded = cols[0].buffer.padded
    length = cols[0].buffer.length
    rmask = row_mask(n_padded, length)
    if len(cols) == 1:
        word, validity, _ = _key_word(cols[0], other_cols[0])
        if validity is None:
            return word, rmask, False
        if nulls_equal:
            # fold null into a distinct key via the hash path
            h = hash_column(word, validity, 7)
            return h.astype(jnp.int64), rmask, True
        return word, rmask & validity, False
    # multi-key: EXACT single-word pack when the encoded keys fit 63 bits
    # (polars-row fixed-width row encoding analogue,
    # /root/reference/crates/polars-row/src/fixed/: no hash, no candidate
    # verification — PDS-H-style small-dict/narrow-int key tuples all fit).
    # Widths must come out identical on both sides: dict pairs use the
    # symmetric merged-size bound, primitives require matching dtypes.
    words, valids, widths = [], [], []
    packable = True
    for c, o in zip(cols, other_cols):
        word, validity, nv = _key_word(c, o)
        words.append(word)
        valids.append(validity)
        if nv:
            packable = False
            widths.append(None)
            continue
        widths.append(_pair_bit_width(c, o))
    if (packable and all(w is not None for w in widths)
            and sum(w + 1 for w in widths) <= 63):
        packed = pack_keys_64(words, valids, widths)
        all_valid = None
        for v in valids:
            if v is not None:
                all_valid = v if all_valid is None else (all_valid & v)
        mask = rmask
        if not nulls_equal and all_valid is not None:
            mask = mask & all_valid
        # nulls_equal: the pack's null sentinel (slot 0) is itself exact
        return packed, mask, False

    # fallback: 64-bit hash + verification
    h = None
    all_valid = None
    for word, validity in zip(words, valids):
        hc = hash_column(word, validity, 7)
        h = hc if h is None else combine_hashes(h, hc)
        if validity is not None:
            all_valid = validity if all_valid is None else (all_valid & validity)
    mask = rmask
    if not nulls_equal and all_valid is not None:
        mask = mask & all_valid
    return h.astype(jnp.int64), mask, True


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6))
def _gather_side_jit(idx, arrays, extra_valid, has_validity, size, use_extra, out_len):
    """Gather ALL of one side's output columns in a single dispatch.

    Per-column eager gathers cost one ~25ms dispatch each once the process has
    done any device->host readback (see CLAUDE.md poison note); batching the
    whole side into one program makes join assembly 2 dispatches total.
    ``arrays`` = value arrays then validity arrays (for cols where
    ``has_validity``); statics: the validity layout, output size, and whether
    ``extra_valid`` applies."""
    nv = len(has_validity)
    vals = arrays[:nv]
    vlds = arrays[nv:]
    rm = jax.lax.broadcasted_iota(jnp.int32, (size, 1), 0).squeeze(-1) < out_len
    outs = []
    vi = 0
    for i, hv in enumerate(has_validity):
        a = vals[i]
        safe = jnp.clip(idx, 0, a.shape[0] - 1)
        g = a[safe]
        g = g[:size] if g.shape[0] >= size else pad_to(g, size)
        v = None
        if hv:
            v = vlds[vi][safe]
            v = v[:size] if v.shape[0] >= size else pad_to(v, size)
            vi += 1
        if use_extra:
            ev = extra_valid[:size] if extra_valid.shape[0] >= size else pad_to(extra_valid, size)
            v = ev if v is None else (v & ev)
        if v is not None:
            v = v & rm
        outs.append((g, v))
    return tuple(outs)


def _gather_side(cols, idx, extra_valid, out_len):
    """Columns for one join side via one batched dispatch."""
    size = padded_size(out_len)
    arrays = [c.buffer.values for c in cols]
    has_validity = tuple(c.buffer.validity is not None for c in cols)
    arrays += [c.buffer.validity for c in cols if c.buffer.validity is not None]
    use_extra = extra_valid is not None
    dummy = idx if extra_valid is None else extra_valid
    outs = _gather_side_jit(idx, tuple(arrays), dummy, has_validity, size, use_extra, out_len)
    return [
        Column(c.name, c.dtype, Buffer(g, v, out_len), c.table, 0, getattr(c, "child", None))
        for c, (g, v) in zip(cols, outs)
    ]


def _gather_col(col: Column, idx: jax.Array, valid: jax.Array | None, out_len: int) -> Column:
    size = padded_size(out_len)
    buf = col.buffer
    safe = jnp.clip(idx, 0, buf.padded - 1)
    values = buf.values[safe]
    validity = None if buf.validity is None else buf.validity[safe]
    if valid is not None:
        validity = valid if validity is None else (validity & valid)
    values = values[:size] if values.shape[0] >= size else pad_to(values, size)
    if validity is not None:
        validity = validity[:size] if validity.shape[0] >= size else pad_to(validity, size)
        validity = validity & row_mask(size, out_len)
    return Column(col.name, col.dtype, Buffer(values, validity, out_len), col.table, 0, getattr(col, "child", None))




def _sort_i64_single(x: jax.Array) -> jax.Array:
    """Sorted copy of an i64 array without the poisonous variadic/emulated
    sort path: radix argsort then gather."""
    from polars_tpu.kernels.argsort import key_words, stable_argsort_words

    return x[stable_argsort_words(key_words(x, dt.Int64()))]

def _build_probe(lk, lmask, rk, rmask, lrowmask, emit_unmatched_left):
    """Sort build side by key word, binary-search probes, count matches.

    Shared trace for the count and expand passes; ``emit_unmatched_left`` is a
    static (left/full joins emit one output row per unmatched probe row)."""
    from polars_tpu.kernels.argsort import key_words, stable_argsort_words

    big = 0x7FFFFFFFFFFFFFFF
    rk_m = jnp.where(rmask, rk.astype(jnp.int64), big)
    sperm = stable_argsort_words(key_words(rk_m, dt.Int64()))
    sk = rk_m[sperm]
    lk_m = jnp.where(lmask, lk.astype(jnp.int64), big - 1)
    lo = jnp.searchsorted(sk, lk_m, side="left")
    hi = jnp.searchsorted(sk, lk_m, side="right")
    matches = jnp.where(lmask, hi - lo, 0)
    if emit_unmatched_left:
        counts = jnp.where(lrowmask, jnp.maximum(matches, 1), 0)
    else:
        counts = matches
    return sk, sperm, lo, matches, counts


@functools.lru_cache(maxsize=None)
def _count_jit(emit_unmatched_left: bool):
    """Module-level cached jit: re-traced only per (flag, shape) combination,
    NOT per join call (per-call ``@jax.jit`` closures defeated jit caching and
    re-traced every ``collect``)."""

    def fn(lk, lmask, rk, rmask, lrowmask):
        _, _, _, matches, counts = _build_probe(lk, lmask, rk, rmask, lrowmask, emit_unmatched_left)
        return jnp.sum(counts), matches

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _expand_jit(emit_unmatched_left: bool, size: int):
    def fn(lk, lmask, rk, rmask, lrowmask):
        nl = lk.shape[0]
        nr = rk.shape[0]
        sk, sperm, lo, matches, counts = _build_probe(lk, lmask, rk, rmask, lrowmask, emit_unmatched_left)
        offsets = jnp.cumsum(counts)  # inclusive
        k = jax.lax.broadcasted_iota(jnp.int64, (size, 1), 0).squeeze(-1)
        probe_row = jnp.searchsorted(offsets, k, side="right").astype(jnp.int32)
        probe_row_c = jnp.clip(probe_row, 0, nl - 1)
        start = offsets[probe_row_c] - counts[probe_row_c]
        j = k - start
        matched = matches[probe_row_c] > 0
        build_pos = jnp.clip(lo[probe_row_c] + j, 0, nr - 1).astype(jnp.int32)
        build_row = sperm[build_pos]
        in_range = k < offsets[nl - 1]
        right_valid = matched & in_range
        out_left = probe_row_c
        out_right = jnp.where(right_valid, build_row, 0)
        pair_ok = in_range
        return out_left, out_right, right_valid, pair_ok, sk

    return jax.jit(fn)


@jax.jit
def _right_unmatched_jit(lk, lmask, rk, rmask, rrowmask):
    big = 0x7FFFFFFFFFFFFFFF
    lk_m = jnp.where(lmask, lk.astype(jnp.int64), big)
    slk = _sort_i64_single(lk_m)
    rk64 = rk.astype(jnp.int64)
    lo = jnp.searchsorted(slk, rk64, side="left")
    hi = jnp.searchsorted(slk, rk64, side="right")
    return rmask & ((hi - lo) == 0), rrowmask & ~rmask


# ---------------------------------------------------------------------------
# inequality (range) join — the iejoin analogue
# ---------------------------------------------------------------------------


def _range_values(col: Column, other: Column):
    """(order-comparable device array, valid mask) for a range-join key, or
    None when the dtype pair can't be ordered on device (caller falls back to
    cross+filter). Dict-coded strings compare by code (code order ==
    lexicographic after table unification)."""
    buf = col.buffer
    d = col.dtype
    rmask = row_mask(buf.padded, buf.length)
    ok = rmask if buf.validity is None else (rmask & buf.validity)
    if col.table is not None:
        if other.table is None:
            return None
        if other.table is col.table:
            if not col.table.sorted_order:
                _, ranks = col.table.ordinal()
                lut = jnp.asarray(ranks)
                return lut[jnp.clip(buf.values, 0, len(ranks) - 1)].astype(jnp.int64), ok
            return buf.values.astype(jnp.int64), ok
        # unify(require_ordinal) merges into a canonical SORTED code space
        # (range predicates compare codes), so the two sides' independent
        # unify calls agree; first returned remap belongs to `col`
        _, mapping, _ = strtable.unify(col.table, other.table, require_ordinal=True)
        if len(mapping) == 0:
            return buf.values.astype(jnp.int64), ok
        lut = jnp.asarray(mapping)
        codes = lut[jnp.clip(buf.values, 0, len(mapping) - 1)]
        return codes.astype(jnp.int64), ok
    if other.table is not None or isinstance(d, (dt.Null, dt.String, dt.Binary)):
        return None
    if isinstance(d, (dt.List, dt.Array, dt.Struct, dt.Object)):
        return None
    if d.is_float():
        v = buf.values.astype(jnp.float64)
        return v, ok & ~jnp.isnan(v)
    if type(d).__name__ == "UInt64":
        if type(other.dtype).__name__ != "UInt64":
            return None
        return total_order_key(buf.values, d), ok
    if d.is_temporal():
        if d != other.dtype:
            return None  # mixed units need upstream coercion
        return buf.values.astype(jnp.int64), ok
    if isinstance(d, dt.Decimal):
        if not isinstance(other.dtype, dt.Decimal) or d.scale != other.dtype.scale:
            return None
        return buf.values.astype(jnp.int64), ok
    if d.is_integer() or isinstance(d, dt.Boolean):
        return buf.values.astype(jnp.int64), ok
    return None


def _range_bounds(lv, lok, rv, rok, op: str):
    """Sort right values (invalid rows last), then binary-search each left
    row's matching [start, end) range in the sorted domain for ``lv <op> rv``
    (reference: the iejoin L1 sort, polars-ops/src/frame/join/iejoin/mod.rs:52)."""
    n = rv.shape[0]
    inv = (~rok).astype(jnp.int32)
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    _, rv_sorted, idx_sorted = jax.lax.sort((inv, rv, idx), num_keys=2)
    n_valid = jnp.sum(rok.astype(jnp.int32))
    if jnp.issubdtype(rv.dtype, jnp.floating):
        sent = jnp.asarray(jnp.inf, rv.dtype)
    else:
        sent = jnp.asarray(0x7FFFFFFFFFFFFFFF, rv.dtype)
    pos = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    rv_mono = jnp.where(pos < n_valid, rv_sorted, sent)  # globally non-decreasing
    if op == "<":      # matches: rv > lv
        start = jnp.searchsorted(rv_mono, lv, side="right").astype(jnp.int32)
        end = jnp.broadcast_to(n_valid, start.shape)
    elif op == "<=":   # rv >= lv
        start = jnp.searchsorted(rv_mono, lv, side="left").astype(jnp.int32)
        end = jnp.broadcast_to(n_valid, start.shape)
    elif op == ">":    # rv < lv
        start = jnp.zeros(lv.shape, jnp.int32)
        end = jnp.minimum(
            jnp.searchsorted(rv_mono, lv, side="left").astype(jnp.int32), n_valid
        )
    elif op == ">=":   # rv <= lv
        start = jnp.zeros(lv.shape, jnp.int32)
        end = jnp.minimum(
            jnp.searchsorted(rv_mono, lv, side="right").astype(jnp.int32), n_valid
        )
    else:  # pragma: no cover
        raise InvalidOperationError(f"range join op {op!r}")
    counts = jnp.where(lok, jnp.maximum(end - start, 0), 0)
    return idx_sorted, start, counts


@functools.lru_cache(maxsize=None)
def _range_count_jit(op: str):
    def fn(lv, lok, rv, rok):
        _, _, counts = _range_bounds(lv, lok, rv, rok, op)
        return jnp.sum(counts.astype(jnp.int64))

    return jax.jit(fn)


@functools.lru_cache(maxsize=None)
def _range_expand_jit(op: str, size: int):
    def fn(lv, lok, rv, rok):
        nl = lv.shape[0]
        idx_sorted, start, counts = _range_bounds(lv, lok, rv, rok, op)
        offs = jnp.cumsum(counts.astype(jnp.int64))
        k = jax.lax.broadcasted_iota(jnp.int64, (size, 1), 0).squeeze(-1)
        li = jnp.clip(
            jnp.searchsorted(offs, k, side="right").astype(jnp.int32), 0, nl - 1
        )
        within = (k - (offs[li] - counts[li])).astype(jnp.int32)
        rpos = jnp.clip(start[li] + within, 0, rv.shape[0] - 1)
        ri = idx_sorted[rpos]
        return li, ri

    return jax.jit(fn)


def range_join_frames(
    left: DataFrame, right: DataFrame, l_key: Column, r_key: Column,
    op: str, suffix: str,
) -> DataFrame | None:
    """Pure-inequality join driven by ONE sorted predicate (iejoin analogue,
    reference polars-ops/src/frame/join/iejoin/mod.rs:52,207): sort the right
    key, binary-search each left row's matching range, prefix-sum the counts,
    and materialize exactly ``total`` pairs — memory bounded by the
    predicate's selectivity instead of |L|x|R|. Remaining predicates filter
    the output. Returns None when the key dtypes can't be ordered on device."""
    lk = _range_values(l_key, r_key)
    rk = _range_values(r_key, l_key)
    if lk is None or rk is None:
        return None
    (lv, lok), (rv, rok) = lk, rk
    if lv.dtype != rv.dtype:
        # mixed int/float: promote to f64 (the polars supertype for the pair)
        lv = lv.astype(jnp.float64)
        rv = rv.astype(jnp.float64)
    total = int(_range_count_jit(op)(lv, lok, rv, rok))
    size = padded_size(max(total, 1))
    li, ri = _range_expand_jit(op, size)(lv, lok, rv, rok)
    left_names = set(left.columns)
    cols = list(_gather_side(left._columns, li, None, total))
    for c in _gather_side(right._columns, ri, None, total):
        name = c.name + suffix if c.name in left_names else c.name
        cols.append(c.rename(name))
    return DataFrame._from_columns(cols, total)


def join_frames(
    left: DataFrame,
    right: DataFrame,
    left_key_names: list[str],
    right_key_names: list[str],
    how: str,
    suffix: str,
    nulls_equal: bool,
    coalesce: bool | None,
    out_schema,
) -> DataFrame:
    if how == "cross":
        return _cross_join(left, right, suffix, out_schema)
    if how == "right":
        flipped = join_frames(
            right, left, right_key_names, left_key_names, "left", suffix,
            nulls_equal, coalesce, None,
        )
        return _reorder_right(flipped, left, right, left_key_names, right_key_names, suffix, coalesce, out_schema)

    lkey_cols = [left._get(n) for n in left_key_names]
    rkey_cols = [right._get(n) for n in right_key_names]

    lk, lmask, lverify = _side_keys(lkey_cols, rkey_cols, nulls_equal)
    rk, rmask, rverify = _side_keys(rkey_cols, lkey_cols, nulls_equal)
    needs_verify = lverify or rverify

    nl, nr = left._columns[0].buffer.padded if left._columns else 128, (
        right._columns[0].buffer.padded if right._columns else 128
    )

    emit_unmatched_left = how in ("left", "full")

    lrowmask = row_mask(nl, left.height)
    rrowmask = row_mask(nr, right.height)

    count_fn = _count_jit(emit_unmatched_left)

    total, matches_arr = count_fn(lk, lmask, rk, rmask, lrowmask)

    if how in ("semi", "anti"):
        keep = (matches_arr > 0) if how == "semi" else ((matches_arr == 0) & lrowmask)
        keep_np = np.asarray(keep)[: left.height]
        idx = np.nonzero(keep_np)[0]
        return left.gather(idx)

    cap = int(total)
    if how == "full":
        cap_full = cap + right.height  # upper bound incl. unmatched right
    size = padded_size(max(cap if how != "full" else cap + right.height, 1))

    expand_fn = _expand_jit(emit_unmatched_left, size)
    out_left, out_right, right_valid, pair_ok, _ = expand_fn(lk, lmask, rk, rmask, lrowmask)

    if needs_verify and cap > 0:
        # verify candidate pairs on actual key columns (hash collisions);
        # batch every readback into one device_get (one tunnel round trip)
        fetch = [pair_ok, right_valid, out_left, out_right]
        for lc, rc in zip(lkey_cols, rkey_cols):
            for b in (lc.buffer, rc.buffer):
                fetch.append(b.values)
                if b.validity is not None:
                    fetch.append(b.validity)
        jax.device_get(fetch)
        ok = np.asarray(pair_ok).copy()
        lv = np.asarray(right_valid)
        ol = np.asarray(out_left)
        orr = np.asarray(out_right)
        for lc, rc in zip(lkey_cols, rkey_cols):
            la, lval = lc.buffer.to_numpy()
            ra, rval = rc.buffer.to_numpy()
            if lc.table is not None and rc.table is not None and lc.table is not rc.table:
                _, lmap2, rmap2 = strtable.unify(lc.table, rc.table)
                la = lmap2[la] if len(lmap2) else la
                ra = rmap2[ra] if len(rmap2) else ra
            li = np.clip(ol, 0, len(la) - 1) if len(la) else ol * 0
            ri = np.clip(orr, 0, len(ra) - 1) if len(ra) else orr * 0
            same = la[li] == ra[ri]
            if la.dtype.kind == "f":
                # polars joins use total equality: NaN matches NaN
                # (hash_column canonicalizes NaN, so candidates reach here)
                same = same | (np.isnan(la[li]) & np.isnan(ra[ri]))
            if lval is not None:
                lnull = ~lval[li]
            else:
                lnull = np.zeros(len(li), bool)
            if rval is not None:
                rnull = ~rval[ri]
            else:
                rnull = np.zeros(len(ri), bool)
            if nulls_equal:
                same = np.where(lnull | rnull, lnull & rnull, same)
            else:
                same = same & ~lnull & ~rnull
            ok = ok & np.where(lv, same, True)
        if not ok.all():
            # drop collided pairs (recount)
            keep_idx = np.nonzero(ok[: max(cap, 1)])[0]
            out_left = jnp.asarray(np.asarray(out_left)[keep_idx])
            out_right = jnp.asarray(np.asarray(out_right)[keep_idx])
            right_valid = jnp.asarray(np.asarray(right_valid)[keep_idx])
            cap = len(keep_idx)
            size2 = padded_size(max(cap, 1))
            out_left = pad_to(out_left, size2)
            out_right = pad_to(out_right, size2)
            right_valid = pad_to(right_valid, size2)

    out_len = cap

    # full join: append unmatched right rows
    extra_right_idx = None
    if how == "full":
        unmatched, nullkey_right = _right_unmatched_jit(lk, lmask, rk, rmask, rrowmask)
        un_np = np.nonzero(np.asarray(unmatched | nullkey_right)[: right.height])[0]
        extra_right_idx = un_np
        out_len = cap + len(un_np)

    # assemble output columns
    left_names = set(left.columns)
    do_coalesce = coalesce
    if do_coalesce is None:
        do_coalesce = how in ("inner", "left", "right")
    right_keys = list(right_key_names)

    cols: list[Column] = list(_gather_side(left._columns, out_left, None, cap))
    r_todo = [c for c in right._columns if not (do_coalesce and c.name in right_keys and how != "full")]
    r_gathered = _gather_side(r_todo, out_right, right_valid, cap) if r_todo else []
    for c, col in zip(r_todo, r_gathered):
        name = c.name + suffix if c.name in left_names else c.name
        if do_coalesce and c.name in right_keys and how == "full":
            # coalesce keys: fill from left where right null
            li = right_keys.index(c.name)
            lcol = next(cc for cc in cols if cc.name == left_key_names[li])
            col = _coalesce_cols(lcol, col)
            cols = [col if cc.name == left_key_names[li] else cc for cc in cols]
            continue
        cols.append(col.rename(name))

    out = DataFrame._from_columns(cols, cap)
    if extra_right_idx is not None and len(extra_right_idx) > 0:
        extra_cols = []
        for c in out._columns:
            src = None
            rc_name = c.name[: -len(suffix)] if suffix and c.name.endswith(suffix) and c.name not in right.columns else c.name
            if rc_name in right.columns and (c.name not in left_names or c.name.endswith(suffix) or (do_coalesce and rc_name in right_keys)):
                src = right._get(rc_name)
            if do_coalesce and c.name in [ln for ln in left_key_names]:
                src = right._get(right_keys[left_key_names.index(c.name)])
            if src is not None:
                from polars_tpu.engine.gather import gather_column

                extra_cols.append(gather_column(src, extra_right_idx).rename(c.name))
            else:
                null_col = Column.from_values(c.name, [None] * len(extra_right_idx), c.dtype)
                extra_cols.append(null_col)
        extra = DataFrame._from_columns(extra_cols, len(extra_right_idx))
        from polars_tpu.functions.eager import concat

        out = concat([out, extra], how="vertical_relaxed")
    return out


def _coalesce_cols(a: Column, b: Column) -> Column:
    table = a.table
    if a.table is not None and b.table is not None and a.table is not b.table:
        # both sides' codes must live in ONE code space before mixing
        table, lmap, rmap = strtable.unify(a.table, b.table)

        def _remapped(col: Column, m: np.ndarray) -> Column:
            if len(m) == 0:
                return col
            lut = jnp.asarray(m)
            vals = lut[jnp.clip(col.buffer.values, 0, len(m) - 1)]
            return Column(col.name, col.dtype, Buffer(vals, col.buffer.validity, col.buffer.length), table)

        a, b = _remapped(a, lmap), _remapped(b, rmap)
    av, bv = a.buffer, b.buffer
    if av.validity is None:
        return Column(a.name, a.dtype, av, table, a.sorted_flag, a.child)
    values = jnp.where(av.validity, av.values, bv.values)
    validity = av.validity if bv.validity is None else (av.validity | bv.validity)
    return Column(a.name, a.dtype, Buffer(values, validity, av.length), table)


def _cross_join(left: DataFrame, right: DataFrame, suffix: str, out_schema) -> DataFrame:
    nl, nr = left.height, right.height
    total = nl * nr
    size = padded_size(max(total, 1))
    k = jnp.arange(size, dtype=jnp.int64)
    li = floordiv_const(k, max(nr, 1)).astype(jnp.int32)
    ri = mod_const(k, max(nr, 1)).astype(jnp.int32)
    left_names = set(left.columns)
    cols = []
    for c in left._columns:
        cols.append(_gather_col(c, li, None, total))
    for c in right._columns:
        name = c.name + suffix if c.name in left_names else c.name
        cols.append(_gather_col(c, ri, None, total).rename(name))
    return DataFrame._from_columns(cols, total)


def _reorder_right(
    flipped: DataFrame, left: DataFrame, right: DataFrame,
    left_key_names, right_key_names, suffix, coalesce, out_schema,
) -> DataFrame:
    """Map the flipped left-join output back to right-join column layout."""
    do_coalesce = coalesce if coalesce is not None else True
    out_cols = []
    lnames = set(left.columns)
    for name in out_schema.names():
        # right-join schema: left cols minus coalesced keys, then right cols
        if name in flipped.columns:
            out_cols.append(flipped._get(name))
        elif name.endswith(suffix) and name[: -len(suffix)] in flipped.columns:
            out_cols.append(flipped._get(name[: -len(suffix)]).rename(name))
        else:
            raise InvalidOperationError(f"right-join column mapping failed for {name!r}")
    return DataFrame._from_columns(out_cols, flipped.height)


def asof_match(lk, rk, rmask, strategy: str, tolerance: float | None):
    """Traceable asof matcher (also inlined by the SPMD engine's distributed
    asof, engine/spmd._dist_asof). Returns (right row index, matched mask).
    The sentinel for masked build rows is computed inside the trace from
    python literals — closing over an eagerly created device array would
    poison dispatch."""
    return _asof_match_inner(lk, rk, rmask, strategy, tolerance)


@functools.lru_cache(maxsize=None)
def _asof_match_jit(strategy: str, tolerance: float | None):
    """Cached jit wrapper over :func:`asof_match` (statics closed over)."""

    def match(lk, rk, rmask):
        return _asof_match_inner(lk, rk, rmask, strategy, tolerance)

    return jax.jit(match)


def _asof_match_inner(lk, rk, rmask, strategy, tolerance):
        from polars_tpu.kernels.argsort import key_words, stable_argsort_words

        nr = rk.shape[0]
        if rk.dtype == jnp.int64:
            rk_m = jnp.where(rmask, rk, 0x7FFFFFFFFFFFFFFF)
            kw = key_words(rk_m, dt.Int64())
        else:
            rk_m = jnp.where(rmask, rk, jnp.inf)
            kw = key_words(rk_m, dt.Float64())
        sperm = stable_argsort_words(kw)
        sk = rk_m[sperm]
        pos_right = jnp.searchsorted(sk, lk, side="right")
        pos_left = jnp.searchsorted(sk, lk, side="left")
        n_valid = jnp.sum(rmask.astype(jnp.int32))
        if strategy == "backward":
            idx = pos_right - 1
            ok = idx >= 0
        elif strategy == "forward":
            idx = pos_left
            ok = idx < n_valid
        else:  # nearest
            prev_i = jnp.clip(pos_right - 1, 0, nr - 1)
            next_i = jnp.clip(pos_left, 0, nr - 1)
            d_prev = jnp.abs(lk - sk[prev_i])
            d_next = jnp.abs(sk[next_i] - lk)
            use_prev = (pos_right - 1 >= 0) & ((pos_left >= n_valid) | (d_prev <= d_next))
            idx = jnp.where(use_prev, pos_right - 1, pos_left)
            ok = (pos_right - 1 >= 0) | (pos_left < n_valid)
        idxc = jnp.clip(idx, 0, nr - 1)
        if tolerance is not None:
            ok = ok & (jnp.abs(lk - sk[idxc]) <= tolerance)
        return sperm[idxc], ok


def _tolerance_ticks(tol: str, key_dtype) -> int:
    """Duration-string asof tolerance -> ticks of the key column's unit
    (reference join_asof tolerance; calendar units mo/q/y are rejected there
    too because they are not constant durations)."""
    import re as _re

    from polars_tpu.errors import InvalidOperationError

    parts = _re.findall(r"(\d+)(ns|us|ms|s|m|h|d|w)", tol)
    if not parts or "".join(n + u for n, u in parts) != tol.replace(" ", ""):
        raise InvalidOperationError(
            f"cannot parse tolerance {tol!r} (calendar units mo/q/y are not "
            "fixed durations and are unsupported)"
        )
    us_per = {
        "ns": 0.001, "us": 1, "ms": 1_000, "s": 1_000_000, "m": 60_000_000,
        "h": 3_600_000_000, "d": 86_400_000_000, "w": 604_800_000_000,
    }
    total_us = sum(int(n) * us_per[u] for n, u in parts)
    name = type(key_dtype).__name__
    if name == "Datetime":
        per_us = {"ns": 1_000, "us": 1, "ms": 1e-3}[key_dtype.time_unit]
        return int(total_us * per_us)
    if name == "Date":
        ticks = total_us / 86_400_000_000
        if ticks != int(ticks):
            raise InvalidOperationError(
                f"tolerance {tol!r} is not a whole number of days for Date keys"
            )
        return int(ticks)
    if name == "Time" or name == "Duration":
        per_us = {"ns": 1_000, "us": 1, "ms": 1e-3}[getattr(key_dtype, "time_unit", "ns" if name == "Time" else "us")]
        return int(total_us * per_us)
    raise InvalidOperationError(
        f"duration-string tolerance requires a temporal asof key, got {key_dtype!r}"
    )


def asof_join_frames(
    left: DataFrame, right: DataFrame, left_on: str, right_on: str,
    strategy: str, suffix: str, tolerance, out_schema,
    by_left: list[str] | None = None, by_right: list[str] | None = None,
) -> DataFrame:
    lcol = left._get(left_on)
    rcol = right._get(right_on)
    if isinstance(tolerance, str):
        tolerance = _tolerance_ticks(tolerance, lcol.dtype)
    elif tolerance is not None and hasattr(tolerance, "total_seconds"):
        # datetime.timedelta
        us = int(round(tolerance.total_seconds() * 1e6))
        tolerance = _tolerance_ticks(f"{us}us", lcol.dtype)
    lk = lcol.buffer.values.astype(jnp.int64) if not lcol.dtype.is_float() else lcol.buffer.values
    rk = rcol.buffer.values.astype(jnp.int64) if not rcol.dtype.is_float() else rcol.buffer.values
    nl = lcol.buffer.padded
    nr = rcol.buffer.padded
    lmask = row_mask(nl, left.height)
    rmask = row_mask(nr, right.height)

    gl = gr = None
    if by_left:
        # grouped asof: fold the group key into a composite sort key
        # gid * K + (t - tmin); within-group time deltas are preserved, so the
        # tolerance check still measures time (cross-group deltas >= K > tol).
        lkey_cols = [left._get(n) for n in by_left]
        rkey_cols = [right._get(n) for n in by_right]
        gl_h, lmask2, _ = _side_keys(lkey_cols, rkey_cols, False)
        gr_h, rmask2, _ = _side_keys(rkey_cols, lkey_cols, False)
        lmask = lmask & lmask2
        rmask = rmask & rmask2
        # rank-compress hashes against the sorted right-side key set
        sorted_gr = _sort_i64_single(jnp.where(rmask, gr_h, 0x7FFFFFFFFFFFFFFF))
        gl = jnp.searchsorted(sorted_gr, gl_h).astype(jnp.int64)
        gr = jnp.searchsorted(sorted_gr, gr_h).astype(jnp.int64)
        # ONE host sync for the time span (barrier-level; sizes the composite)
        lk64 = lk.astype(jnp.int64)
        rk64 = rk.astype(jnp.int64)
        stats = jax.device_get([
            jnp.min(jnp.where(lmask, lk64, jnp.iinfo(jnp.int64).max)),
            jnp.max(jnp.where(lmask, lk64, jnp.iinfo(jnp.int64).min)),
            jnp.min(jnp.where(rmask, rk64, jnp.iinfo(jnp.int64).max)),
            jnp.max(jnp.where(rmask, rk64, jnp.iinfo(jnp.int64).min)),
        ])
        tmin = min(int(stats[0]), int(stats[2]))
        tmax = max(int(stats[1]), int(stats[3]))
        span = max(tmax - tmin, 0)
        tol_i = int(tolerance) if tolerance is not None else 0
        K = span + 2 * abs(tol_i) + 4
        n_groups = nr + 2
        if K and n_groups * K >= (1 << 62):
            raise InvalidOperationError(
                "asof join `by`: time span times group count exceeds the "
                "composite key range; pre-partition the frames instead"
            )
        lk = jnp.where(lmask, gl * K + (lk64 - tmin), jnp.int64(0))
        rk = jnp.where(rmask, gr * K + (rk64 - tmin), jnp.int64(0))

    ridx, ok = _asof_match_jit(strategy, None if tolerance is None else float(tolerance))(lk, rk, rmask)
    if by_left:
        # reject matches that crossed a group boundary (window endpoints)
        ok = ok & (gr[ridx] == gl) & lmask
    if lcol.buffer.validity is not None:
        ok = ok & lcol.buffer.validity
    cols = list(left._columns)
    lnames = set(left.columns)
    skip = {right_on, *(by_right or [])}
    for c in right._columns:
        if c.name in skip:
            continue
        name = c.name + suffix if c.name in lnames else c.name
        cols.append(_gather_col(c, ridx, ok, left.height).rename(name))
    return DataFrame._from_columns(cols, left.height)
