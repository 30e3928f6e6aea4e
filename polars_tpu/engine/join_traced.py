"""Fused (in-segment) m:1 / 1:1 equi-joins.

When the user declares ``validate="m:1"`` (or 1:1) the join output has at
most one build row per probe row, so the whole join is a row-wise op: sort
the build side by key word, one vectorized ``searchsorted`` per probe row,
gather build columns, fold the match mask into the segment row mask. No
host sizing barrier, no synchronization — the join fuses into the same XLA
program as everything around it (the TPU-native answer to the reference's
streaming equi-join node, polars-stream/src/nodes/joins/equi_join.rs).

The m:1 claim is verified IN-TRACE (run length per matched key > 1) and the
violation flag travels back through the segment's count channel (negated
count), so bad hints fail loudly at the next materialization instead of
silently mis-joining.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from polars_tpu import datatypes as dt
from polars_tpu.engine.common import Val
from polars_tpu.errors import InvalidOperationError
from polars_tpu.kernels.hashing import combine_hashes, hash_column
from polars_tpu.utils import strtable

_BIG = 0x7FFFFFFFFFFFFFFF


def _key_word_traced(v: Val, other: Val) -> tuple[jax.Array, jax.Array | None, bool]:
    """(int64 key word, validity, exact) for one traced key column.

    ``exact`` means equal words imply equal keys (no verification needed).
    Mirrors engine/join._key_word but on traced values.
    """
    if isinstance(v.dtype, dt.Null):
        return jnp.zeros(v.values.shape, jnp.int64), jnp.zeros(v.values.shape, bool), True
    if v.table is not None:
        v_hashed = getattr(v.table, "hashed", False)
        o_hashed = other.table is not None and getattr(other.table, "hashed", False)
        if v_hashed:
            # hashed-key column: the int64 hashes ARE the join key word, and
            # equal bytes hash equally across independent columns (fixed
            # hash key, utils/hashstore.py) — no table unification needed.
            # exact=False: equality is 64-bit-hash equality (collisions are
            # detected when the keys materialize, hashstore.resolve)
            return v.values.astype(jnp.int64), v.validity, False
        if o_hashed:
            # dictionary side joining a hashed side: map this side's codes
            # into hash space by hashing the (small) dictionary
            from polars_tpu.utils import hashstore

            harr = hashstore.hash_values(v.table.values) if len(v.table) else np.zeros(1, np.int64)
            lut = jnp.asarray(harr)
            return lut[jnp.clip(v.values, 0, len(harr) - 1)], v.validity, False
        if other.table is not None and other.table is not v.table:
            _, lmap, _ = strtable.unify(v.table, other.table)
            if len(lmap) == 0:  # empty remap = identity (strtable convention)
                return v.values.astype(jnp.int64), v.validity, True
            lut = jnp.asarray(lmap)
            codes = lut[jnp.clip(v.values, 0, len(lmap) - 1)]
            return codes.astype(jnp.int64), v.validity, True
        return v.values.astype(jnp.int64), v.validity, True
    if v.dtype.is_float():
        h = hash_column(v.values, v.validity, 13)
        return h.astype(jnp.int64), v.validity, False
    if isinstance(v.dtype, dt.Boolean):
        return v.values.astype(jnp.int64), v.validity, True
    if v.dtype.is_integer() or v.dtype.is_temporal() or isinstance(v.dtype, dt.Decimal):
        if type(v.dtype).__name__ == "UInt64":
            from polars_tpu.kernels.rowencode import total_order_key

            return total_order_key(v.values, v.dtype), v.validity, True
        return v.values.astype(jnp.int64), v.validity, True
    raise InvalidOperationError(f"cannot join on dtype {v.dtype!r}")


def _values_equal(lv: Val, rv_g: jax.Array, rvalid_g, lvalid, nulls_equal: bool):
    """Per-row equality of a probe key against the gathered build key
    (polars total equality: NaN == NaN)."""
    if lv.dtype.is_float():
        both_nan = jnp.isnan(lv.values) & jnp.isnan(rv_g)
        same = (lv.values == rv_g) | both_nan
    else:
        same = lv.values == rv_g
    lnull = jnp.zeros(same.shape, bool) if lvalid is None else ~lvalid
    rnull = jnp.zeros(same.shape, bool) if rvalid_g is None else ~rvalid_g
    if nulls_equal:
        return jnp.where(lnull | rnull, lnull & rnull, same)
    return same & ~lnull & ~rnull


def trace_join(node, tt_l, tt_r, eval_key):
    """Trace an m:1 / 1:1 / (inner) 1:m equi-join.

    Returns (cols dict, rowmask, bad_flag). ``eval_key(expr, tt)`` evaluates
    one key expression against one side. For 1:m the roles flip (probe = the
    right side, build = the unique left side); inner-join row order is
    unspecified, matching polars' maintain_order="none" default.
    """
    from polars_tpu.kernels.argsort import key_words, stable_argsort_words

    nulls_equal = node.nulls_equal
    flip = node.validate == "1:m"
    if flip:
        tt_probe, tt_build = tt_r, tt_l
        probe_on, build_on = node.right_on, node.left_on
    else:
        tt_probe, tt_build = tt_l, tt_r
        probe_on, build_on = node.left_on, node.right_on
    lkeys = [eval_key(e, tt_probe) for e in probe_on]
    rkeys = [eval_key(e, tt_build) for e in build_on]
    # pair up for table unification
    lwords, rwords, exact_all = [], [], True
    for lv, rv in zip(lkeys, rkeys):
        lw, lval, lex = _key_word_traced(lv, rv)
        rw, rval, rex = _key_word_traced(rv, lv)
        lwords.append((lw, lval))
        rwords.append((rw, rval))
        exact_all = exact_all and lex and rex

    def side_key(words, rowmask):
        if len(words) == 1:
            w, valid = words[0]
            if valid is None:
                return w, rowmask, True
            if nulls_equal:
                h = hash_column(w, valid, 7)
                return h.astype(jnp.int64), rowmask, False
            return w, rowmask & valid, True
        h = None
        all_valid = None
        for w, valid in words:
            hc = hash_column(w, valid, 7)
            h = hc if h is None else combine_hashes(h, hc)
            if valid is not None:
                all_valid = valid if all_valid is None else (all_valid & valid)
        mask = rowmask
        if not nulls_equal and all_valid is not None:
            mask = mask & all_valid
        return h.astype(jnp.int64), mask, False

    lk, lmask, l_exact = side_key(lwords, tt_probe.rowmask)
    rk, rmask, r_exact = side_key(rwords, tt_build.rowmask)
    needs_verify = not (exact_all and l_exact and r_exact)

    nr = rk.shape[0]
    rk_m = jnp.where(rmask, rk, _BIG)
    sperm = stable_argsort_words(key_words(rk_m, dt.Int64()))
    sk = rk_m[sperm]
    lk_m = jnp.where(lmask, lk, _BIG - 1)
    lo = jnp.searchsorted(sk, lk_m, side="left")
    hi = jnp.searchsorted(sk, lk_m, side="right")
    cand_pos = jnp.clip(lo, 0, nr - 1)
    cand = sperm[cand_pos]
    matched = (sk[cand_pos] == lk_m) & lmask & (lo < nr)

    if needs_verify:
        # hash candidates verified on the ACTUAL key values, row-wise; table
        # columns verify on their unified/hash-space KEY WORDS instead (raw
        # codes of different dictionaries — or a dictionary vs a hashed
        # column — live in incompatible code spaces)
        for i, (lv, rv) in enumerate(zip(lkeys, rkeys)):
            if lv.table is not None or rv.table is not None:
                lw, lval = lwords[i]
                rw, rval = rwords[i]
                lv_cmp = Val(lw, lval, dt.Int64(), None, lv.domain)
                rv_g = rw[cand]
                rvalid_g = None if rval is None else rval[cand]
                matched = matched & _values_equal(
                    lv_cmp, rv_g, rvalid_g, lval, nulls_equal
                )
                continue
            rv_g = rv.values[cand]
            rvalid_g = None if rv.validity is None else rv.validity[cand]
            matched = matched & _values_equal(lv, rv_g, rvalid_g, lv.validity, nulls_equal)

    # m:1 validation: any matched probe key whose build run is longer than 1
    # (skipped for unvalidated semi/anti fusion, where multiplicity is fine)
    if node.validate in ("m:1", "1:1", "1:m"):
        bad = jnp.any(matched & ((hi - lo) > 1))
    else:
        bad = jnp.zeros((), bool)
    if node.validate == "1:1" and node.how in ("inner", "left"):
        # also no two probe rows may share a matched build row
        hitcount = jnp.zeros((nr,), jnp.int32).at[jnp.where(matched, cand, nr - 1)].add(
            matched.astype(jnp.int32), mode="drop"
        )
        bad = bad | jnp.any(hitcount > 1)

    from polars_tpu.plan import exprs as E

    how = node.how
    left_names = set(tt_l.cols.keys())
    if how == "semi":
        return dict(tt_l.cols), tt_l.rowmask & matched, bad
    if how == "anti":
        return dict(tt_l.cols), tt_l.rowmask & ~matched, bad

    coalesce = node.coalesce
    if coalesce is None:
        coalesce = True  # inner/left default
    right_key_names = {E.output_name(e) for e in node.right_on}

    def gather_val(v):
        # List packed words are position-independent (start<<32|len into the
        # child), so the TracedChild rides along untouched; zero unmatched
        # packed words so garbage candidates can't address past the child.
        values = v.values[cand]
        if v.child is not None and getattr(v.child, "values", True) is not None:
            values = jnp.where(matched, values, jnp.zeros((), values.dtype))
        validity = None if v.validity is None else v.validity[cand]
        return values, validity

    cols: dict[str, Val] = {}
    if flip:
        # probe = right rows; left columns come from the (unique) build side
        for name, v in tt_l.cols.items():
            values, validity = gather_val(v)
            cols[name] = Val(values, validity, v.dtype, v.table, v.domain, v.child)
        for name, v in tt_r.cols.items():
            if coalesce and name in right_key_names:
                continue
            out_name = name + node.suffix if name in left_names else name
            cols[out_name] = v
        rowmask = tt_r.rowmask & matched
        return cols, rowmask, bad

    cols = dict(tt_l.cols)
    for name, v in tt_r.cols.items():
        if coalesce and name in right_key_names:
            continue
        out_name = name + node.suffix if name in left_names else name
        values, validity = gather_val(v)
        if how == "left":
            validity = matched if validity is None else (validity & matched)
        cols[out_name] = Val(values, validity, v.dtype, v.table, v.domain, v.child)

    rowmask = tt_l.rowmask & matched if how == "inner" else tt_l.rowmask
    return cols, rowmask, bad
