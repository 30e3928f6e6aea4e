"""Eager list-column operations (reference: polars-ops chunked_array/list/).

Layout (core/column.py): a List column's buffer holds int64 packed
(start << 32) | length into a flat ``child`` column; ops below are
prefix-sum / sparse-table range queries over the child — O(1) work per row
on the VPU regardless of list lengths, the TPU-native replacement for the
reference's per-list iterators.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from polars_tpu import datatypes as dt
from polars_tpu.core.buffer import Buffer, row_mask
from polars_tpu.core.column import Column
from polars_tpu.errors import InvalidOperationError


def _unpack(packed):
    return (packed >> 32).astype(jnp.int32), (packed & 0xFFFFFFFF).astype(jnp.int32)


@functools.partial(jax.jit, static_argnums=(4,))
def _seg_sum_mean(packed, child_vals, child_ok, n_child, want_mean):
    starts, lens = _unpack(packed)
    x = jnp.where(child_ok, child_vals.astype(jnp.float64), 0.0)
    c = child_ok.astype(jnp.float64)
    csx = jnp.concatenate([jnp.zeros((1,), jnp.float64), jnp.cumsum(x)])
    csc = jnp.concatenate([jnp.zeros((1,), jnp.float64), jnp.cumsum(c)])
    e = jnp.clip(starts + lens, 0, n_child)
    b = jnp.clip(starts, 0, n_child)
    s = csx[e] - csx[b]
    cnt = csc[e] - csc[b]
    if want_mean:
        return s / jnp.maximum(cnt, 1.0), cnt > 0
    return s, cnt > 0


@functools.partial(jax.jit, static_argnums=(4,))
def _seg_minmax(packed, child_vals, child_ok, n_child, kind):
    starts, lens = _unpack(packed)
    fill = jnp.inf if kind == "min" else -jnp.inf
    base = jnp.where(child_ok, child_vals.astype(jnp.float64), fill)
    n = base.shape[0]
    tables = [base]
    shift = 1
    levels = int(np.ceil(np.log2(max(n, 2))))
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    for _ in range(levels):
        prev = tables[-1]
        nxt = jnp.where(iota < n - shift, jnp.roll(prev, -shift), fill)
        tables.append(jnp.minimum(prev, nxt) if kind == "min" else jnp.maximum(prev, nxt))
        shift *= 2
    stacked = jnp.stack(tables)
    width = jnp.maximum(lens, 1)
    k = jnp.clip(jnp.floor(jnp.log2(width.astype(jnp.float64))).astype(jnp.int32), 0, levels)
    b = jnp.clip(starts, 0, n - 1)
    e = jnp.clip(starts + lens - (1 << k.astype(jnp.int64)).astype(jnp.int32), 0, n - 1)
    left = stacked[k, b]
    right = stacked[k, e]
    out = jnp.minimum(left, right) if kind == "min" else jnp.maximum(left, right)
    # count valid elements in range for the has-value mask
    csc = jnp.concatenate([jnp.zeros((1,), jnp.float64), jnp.cumsum(child_ok.astype(jnp.float64))])
    cnt = csc[jnp.clip(starts + lens, 0, n)] - csc[jnp.clip(starts, 0, n)]
    return out, cnt > 0


@jax.jit
def _seg_get(packed, child_vals, child_ok, index):
    starts, lens = _unpack(packed)
    i = jnp.where(index >= 0, index, lens + index)
    ok = (i >= 0) & (i < lens)
    idx = jnp.clip(starts + i, 0, child_vals.shape[0] - 1)
    v = child_vals[idx]
    valid = ok & child_ok[idx]
    return v, valid


@jax.jit
def _seg_contains(packed, hit, n_child):
    starts, lens = _unpack(packed)
    cs = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(hit.astype(jnp.int32))])
    return (cs[jnp.clip(starts + lens, 0, n_child)] - cs[jnp.clip(starts, 0, n_child)]) > 0


def _child_arrays(col: Column):
    ch = col.child
    cv = ch.buffer.values
    ok = row_mask(ch.buffer.padded, ch.buffer.length)
    if ch.buffer.validity is not None:
        ok = ok & ch.buffer.validity
    return ch, cv, ok


def list_len(col: Column) -> Column:
    _, lens = None, (col.buffer.values & 0xFFFFFFFF)
    vals = jax.jit(lambda p: (p & 0xFFFFFFFF).astype(jnp.uint32))(col.buffer.values)
    return Column(col.name, dt.UInt32(), Buffer(vals, col.buffer.validity, col.buffer.length))


def list_agg(col: Column, kind: str) -> Column:
    ch, cv, ok = _child_arrays(col)
    inner = col.dtype.inner
    if not (inner.is_numeric() or isinstance(inner, dt.Boolean)):
        raise InvalidOperationError(f"list.{kind} needs numeric inner dtype, got {inner!r}")
    n_child = ch.buffer.padded
    if kind in ("sum", "mean"):
        out, has = _seg_sum_mean(col.buffer.values, cv, ok, n_child, kind == "mean")
    else:
        out, has = _seg_minmax(col.buffer.values, cv, ok, n_child, kind)
    if kind == "mean":
        out_dt = dt.Float64()
    elif kind == "sum":
        out_dt = inner if inner.is_float() else dt.Int64()
    else:
        out_dt = inner
    np_dt = jnp.dtype(dt.dtype_to_numpy(out_dt))
    validity = has
    if col.buffer.validity is not None:
        validity = validity & col.buffer.validity
    if kind == "sum":
        # polars: sum of an all-null/empty list is 0, not null
        validity = col.buffer.validity
    conv = jax.jit(lambda o: o.astype(np_dt))(out)
    return Column(col.name, out_dt, Buffer(conv, validity, col.buffer.length))


def list_get(col: Column, index: int) -> Column:
    ch, cv, ok = _child_arrays(col)
    v, valid = _seg_get(col.buffer.values, cv, ok, jnp.int32(index))
    if col.buffer.validity is not None:
        valid = valid & col.buffer.validity
    return Column(col.name, col.dtype.inner, Buffer(v, valid, col.buffer.length), ch.table)


def list_contains(col: Column, item) -> Column:
    ch, cv, ok = _child_arrays(col)
    if ch.table is not None:
        code = ch.table.find(str(item))
        hit = jax.jit(lambda c, o: (c == code) & o)(cv, ok)
    else:
        hit = jax.jit(lambda c, o, it: (c == it) & o)(cv, ok, item)
    out = _seg_contains(col.buffer.values, hit, ch.buffer.padded)
    return Column(col.name, dt.Boolean(), Buffer(out, col.buffer.validity, col.buffer.length))


def list_join(col: Column, separator: str, ignore_nulls: bool = True) -> Column:
    vals = col.to_pylist()
    out = []
    for v in vals:
        if v is None:
            out.append(None)
            continue
        items = [x for x in v if x is not None] if ignore_nulls else v
        if not ignore_nulls and any(x is None for x in v):
            out.append(None)
            continue
        out.append(separator.join(str(x) for x in items))
    return Column.from_values(col.name, out, dt.String())


def _host_rebuild(col: Column, fn) -> Column:
    """Per-list host transform (sort/unique/reverse) — rebuilds the column."""
    vals = col.to_pylist()
    return Column.from_values(col.name, [None if v is None else fn(v) for v in vals], col.dtype)


def _total_key(x):
    # NaN-total-order: NaN sorts greatest (after every real value)
    return (isinstance(x, float) and x != x, x)


def list_sort(col: Column, descending: bool = False, nulls_last: bool = False) -> Column:
    def srt(v):
        vals = sorted((x for x in v if x is not None), key=_total_key, reverse=descending)
        nulls = [None] * (len(v) - len(vals))
        return vals + nulls if nulls_last else nulls + vals

    return _host_rebuild(col, srt)


def list_reverse(col: Column) -> Column:
    return _host_rebuild(col, lambda v: list(reversed(v)))


def list_unique(col: Column, maintain_order: bool = False) -> Column:
    def uniq(v):
        seen = []
        for x in v:
            if x not in seen:
                seen.append(x)
        if maintain_order:
            return seen
        vals = sorted((x for x in seen if x is not None), key=_total_key)
        return [None] * (len(seen) - len(vals)) + vals

    return _host_rebuild(col, uniq)


def explode_column(col: Column) -> tuple[Column, np.ndarray]:
    """(flat child column in row order, parent-row index per output row).

    Empty/null lists emit one null row (polars explode semantics)."""
    if not isinstance(col.dtype, dt.List):
        raise InvalidOperationError(f"explode needs a List column, got {col.dtype!r}")
    packed, validity = col.buffer.to_numpy()
    starts = (packed >> 32).astype(np.int64)
    lens = (packed & 0xFFFFFFFF).astype(np.int64)
    if validity is not None:
        lens = np.where(validity, lens, 0)
    emit = np.maximum(lens, 1)  # empty/null lists -> one null row
    parent = np.repeat(np.arange(len(lens)), emit)
    total = int(emit.sum())
    # child index per output row; -1 marks the null placeholder rows
    offs = np.concatenate([[0], np.cumsum(emit)])[:-1]
    within = np.arange(total) - np.repeat(offs, emit)
    child_idx = np.repeat(starts, emit) + within
    is_placeholder = np.repeat(lens == 0, emit)
    child_idx = np.where(is_placeholder, 0, child_idx)
    ch = col.child
    from polars_tpu.engine.gather import gather_column

    flat = gather_column(ch, child_idx).rename(col.name)
    if is_placeholder.any():
        v = flat.buffer.validity
        mask = jnp.asarray(~is_placeholder)
        from polars_tpu.core.buffer import pad_to, padded_size

        size = padded_size(total)
        mask = pad_to(mask, size)
        v = mask if v is None else (v & mask)
        flat = Column(flat.name, flat.dtype, Buffer(flat.buffer.values, v, total), flat.table)
    return flat, parent
