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

    lut = jnp.asarray(remap if len(remap) else np.zeros(1, np.int32))
    codes = jnp.clip(col.buffer.values, 0, max(len(remap) - 1, 0))
    values = lut[codes]
    return Column(col.name, col.dtype, Buffer(values, col.buffer.validity, col.buffer.length), table)


def unify_vals(a: Val, b: Val) -> tuple[Val, Val]:
    """Remap two dictionary-coded Vals onto one merged (ordinal) table."""
    if a.table is b.table:
        return a, b
    merged, lmap, rmap = strtable.unify(a.table, b.table)
    a2 = a.with_(values=_remap(a.values, lmap), table=merged)
    b2 = b.with_(values=_remap(b.values, rmap), table=merged)
    return a2, b2


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
        # renormalize to sorted-unique (ordinal codes)
        sort_u, inv = np.unique(new_vals.astype(str), return_inverse=True)
        table = strtable.StringTable(sort_u.astype(object), sorted_order=True)
        remap = inv.astype(np.int32)
        return v.with_(values=_remap(v.values, remap), table=table)
    lut = jnp.asarray(np.asarray(out))
    codes = jnp.clip(v.values, 0, max(len(uniques) - 1, 0))
    return Val(lut[codes], v.validity, v.dtype, None, v.domain)
