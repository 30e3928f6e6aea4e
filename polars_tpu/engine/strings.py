"""Device-side helpers for dictionary-coded string columns."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from polars_tpu.core.column import Column
from polars_tpu.engine.common import Val
from polars_tpu.utils import strtable


def remap_column_codes(col: Column, remap: np.ndarray, table: strtable.StringTable) -> Column:
    from polars_tpu.core.buffer import Buffer

    if len(remap) == 0:  # empty remap = identity (strtable.unify convention)
        return Column(col.name, col.dtype, col.buffer, table, col.sorted_flag, col.child)
    lut = jnp.asarray(remap)
    codes = jnp.clip(col.buffer.values, 0, len(remap) - 1)
    values = lut[codes]
    return Column(col.name, col.dtype, Buffer(values, col.buffer.validity, col.buffer.length), table)


def unify_vals(a: Val, b: Val, *, require_ordinal: bool = False) -> tuple[Val, Val]:
    """Remap two dictionary-coded Vals onto one merged table (ordinal iff the
    inputs are small/sorted or ``require_ordinal``; see strtable.unify)."""
    if a.table is b.table:
        if require_ordinal and not a.table.sorted_order:
            return ensure_ordinal_val(a), ensure_ordinal_val(b)
        return a, b
    merged, lmap, rmap = strtable.unify(a.table, b.table, require_ordinal=require_ordinal)
    a2 = a.with_(values=_remap(a.values, lmap), table=merged)
    b2 = b.with_(values=_remap(b.values, rmap), table=merged)
    return a2, b2


def needs_ordinal(v: Val) -> bool:
    """True when an ORDER-sensitive op must remap this Val's codes: the table
    is insertion-ordered AND the dtype's order semantics are lexicographic
    (String/Binary/lexical-Categorical). Enum and physical Categorical order
    BY CODE by definition — never ordinalize them."""
    from polars_tpu import datatypes as dt

    if v.table is None or v.table.sorted_order:
        return False
    # Enum orders BY CODE (category order) by definition. Categorical sorts
    # lexically (modern polars semantics; conformance test_conf_sort).
    return not isinstance(v.dtype, dt.Enum)


def ensure_ordinal_val(v: Val) -> Val:
    """Lazily ordinalize an unordered dictionary Val (cached on the table)."""
    if not needs_ordinal(v):
        return v
    tbl, remap = v.table.ordinal()
    return v.with_(values=_remap(v.values, remap), table=tbl)


def _remap(codes: jax.Array, remap: np.ndarray) -> jax.Array:
    if len(remap) == 0:
        return codes
    lut = jnp.asarray(remap)
    return lut[jnp.clip(codes, 0, len(remap) - 1)]


def map_over_table(v: Val, fn, *, out_is_string: bool) -> Val:
    """Apply a host function over the dictionary values (trace-time constants),
    producing either a remapped string Val or a gathered non-string Val.

    ``fn(values: np.ndarray[object]) -> np.ndarray`` runs once per unique value
    — the payoff of dictionary encoding: O(|dict|) host work, O(n) device
    gathers.
    """
    uniques = v.table.values
    out = fn(uniques)
    if out_is_string:
        new_vals = np.asarray(out, dtype=object)
        from polars_tpu.config import config

        if len(new_vals) > config().ordinal_dict_max:
            # high-cardinality: dedupe by hash (pyarrow), keep insertion order
            uniq = new_vals[
                np.sort(np.unique(strtable.index_in(new_vals, new_vals)))
            ]
            remap = strtable.index_in(new_vals, uniq).astype(np.int32)
            table = strtable.StringTable(uniq, sorted_order=False)
        else:
            # renormalize to sorted-unique (ordinal codes)
            sort_u, inv = np.unique(new_vals.astype(str), return_inverse=True)
            table = strtable.StringTable(sort_u.astype(object), sorted_order=True)
            remap = inv.astype(np.int32)
        return v.with_(values=_remap(v.values, remap), table=table)
    lut = jnp.asarray(np.asarray(out))
    codes = jnp.clip(v.values, 0, max(len(uniques) - 1, 0))
    return Val(lut[codes], v.validity, v.dtype, None, v.domain)
