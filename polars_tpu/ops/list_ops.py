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
from polars_tpu.errors import ComputeError, InvalidOperationError


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


def list_get(col: Column, index: int, null_on_oob: bool = True) -> Column:
    if not null_on_oob:
        import numpy as np

        packed, pvalid = col.buffer.to_numpy()
        n = col.buffer.length
        lens = (np.asarray(packed[:n]).astype(np.int64) & 0xFFFFFFFF)
        i = index if index >= 0 else lens + index
        in_range = (i >= 0) & (i < lens)
        alive = np.ones(n, bool) if pvalid is None else np.asarray(pvalid[:n], bool)
        if bool((alive & ~in_range).any()):
            raise ComputeError(f"get index {index} is out of bounds")
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


# --- round-3 list namespace long tail (verdict #4) ---------------------------
# Host rebuilds for the mechanical ops; list.eval/filter route the element
# expression through the ENGINE over the exploded child (reference:
# py-polars expr/list.py, crates/polars-plan/src/plans/aexpr/function_expr/list.rs).


def _slice_one(v, offset, length):
    n = len(v)
    off = offset if offset >= 0 else max(n + offset, 0)
    if length is None:
        return v[off:]
    return v[off : off + max(length, 0)]


def list_slice(col: Column, offset: int, length: int | None) -> Column:
    return _host_rebuild(col, lambda v: _slice_one(v, offset, length))


def list_head(col: Column, n: int) -> Column:
    return _host_rebuild(col, lambda v: v[: max(n, 0)])


def list_tail(col: Column, n: int) -> Column:
    return _host_rebuild(col, lambda v: v[len(v) - min(max(n, 0), len(v)):])


def list_shift(col: Column, n: int) -> Column:
    def sh(v):
        k = len(v)
        if n >= 0:
            m = min(n, k)
            return [None] * m + v[: k - m]
        m = min(-n, k)
        return v[m:] + [None] * m

    return _host_rebuild(col, sh)


def list_diff(col: Column, n: int = 1, null_behavior: str = "ignore") -> Column:
    def df(v):
        out = []
        for i in range(len(v)):
            j = i - n
            if 0 <= j < len(v) and v[i] is not None and v[j] is not None:
                out.append(v[i] - v[j])
            else:
                out.append(None)
        if null_behavior == "drop":
            # clamp at empty: len(out)+n < 0 must not wrap around as a
            # python negative slice (r5 fuzz finding)
            return out[n:] if n >= 0 else out[: max(len(out) + n, 0)]
        return out

    out = _host_rebuild(col, df)
    inner = col.dtype.inner
    # Date - Date = Duration; ints stay ints
    if isinstance(inner, dt.Date):
        return Column.from_values(col.name, out.to_pylist(), dt.List(dt.Duration("ms")))
    return out


def list_drop_nulls(col: Column) -> Column:
    return _host_rebuild(col, lambda v: [x for x in v if x is not None])


def list_arg_minmax(col: Column, kind: str) -> Column:
    def am(v):
        best_i = None
        best = None
        for i, x in enumerate(v):
            if x is None:
                continue
            k = _total_key(x)
            if best is None or (k < best if kind == "min" else k > best):
                best, best_i = k, i
        return best_i

    packed, validity = col.buffer.to_numpy()
    vals = col.to_pylist()
    out = [None if v is None else am(v) for v in vals]
    return Column.from_values(col.name, out, dt.UInt32())


def list_any_all(col: Column, kind: str) -> Column:
    fn = (lambda v: any(x for x in v if x is not None)) if kind == "any" else (
        lambda v: all(x for x in v if x is not None)
    )
    vals = col.to_pylist()
    return Column.from_values(
        col.name, [None if v is None else fn(v) for v in vals], dt.Boolean()
    )


def list_n_unique(col: Column) -> Column:
    def nu(v):
        seen = set()
        has_null = False
        for x in v:
            if x is None:
                has_null = True
            else:
                seen.add(x)
        return len(seen) + (1 if has_null else 0)

    vals = col.to_pylist()
    return Column.from_values(
        col.name, [None if v is None else nu(v) for v in vals], dt.UInt32()
    )


def list_count_matches(col: Column, item) -> Column:
    vals = col.to_pylist()
    return Column.from_values(
        col.name,
        [None if v is None else sum(1 for x in v if x == item) for v in vals],
        dt.UInt32(),
    )


def _moments(v, kind, ddof=1):
    xs = [float(x) for x in v if x is not None]
    n = len(xs)
    if kind == "median":
        if not n:
            return None
        s = sorted(xs)
        mid = n // 2
        return s[mid] if n % 2 else (s[mid - 1] + s[mid]) / 2.0
    if n <= ddof:
        return None
    m = sum(xs) / n
    var = sum((x - m) ** 2 for x in xs) / (n - ddof)
    return var if kind == "var" else var ** 0.5


def list_moment(col: Column, kind: str, ddof: int = 1) -> Column:
    vals = col.to_pylist()
    return Column.from_values(
        col.name,
        [None if v is None else _moments(v, kind, ddof) for v in vals],
        dt.Float64(),
    )


def list_set_op(col: Column, other: Column, kind: str) -> Column:
    """Element set ops with null-as-a-value semantics (first-occurrence order,
    each value at most once — polars list set-op behavior)."""
    _MISSING = object()

    def dedup_where(xs, pred):
        out, seen = [], set()
        for x in xs:
            k = _MISSING if x is None else x
            if k not in seen and pred(x):
                out.append(x)
                seen.add(k)
        return out

    def op(a, b):
        if a is None or b is None:
            return None
        aset = {(_MISSING if x is None else x) for x in a}
        bset = {(_MISSING if x is None else x) for x in b}
        if kind == "union":
            return dedup_where(a + b, lambda x: True)
        if kind == "intersection":
            return dedup_where(a, lambda x: (_MISSING if x is None else x) in bset)
        if kind == "difference":
            return dedup_where(a, lambda x: (_MISSING if x is None else x) not in bset)
        # symmetric_difference
        return dedup_where(
            a + b,
            lambda x: ((_MISSING if x is None else x) in aset)
            != ((_MISSING if x is None else x) in bset),
        )

    avals = col.to_pylist()
    bvals = other.to_pylist()
    if len(bvals) == 1 and len(avals) != 1:
        bvals = bvals * len(avals)  # broadcast a literal list rhs
    out = [op(a, b) for a, b in zip(avals, bvals)]
    return Column.from_values(col.name, out, col.dtype)


def list_gather(col: Column, indices, null_on_oob: bool = False) -> Column:
    idx_lists = indices.to_pylist() if isinstance(indices, Column) else None

    def one(v, idxs):
        out = []
        for i in idxs:
            j = i if i >= 0 else len(v) + i
            if 0 <= j < len(v):
                out.append(v[j])
            elif null_on_oob:
                out.append(None)
            else:
                raise InvalidOperationError(f"gather index {i} out of bounds for list of length {len(v)}")
        return out

    vals = col.to_pylist()
    if idx_lists is None:
        fixed = list(indices)
        out = [None if v is None else one(v, fixed) for v in vals]
    else:
        out = [
            None if (v is None or ix is None) else one(v, ix if isinstance(ix, list) else [ix])
            for v, ix in zip(vals, idx_lists)
        ]
    return Column.from_values(col.name, out, col.dtype)


def list_gather_every(col: Column, n: int, offset: int = 0) -> Column:
    return _host_rebuild(col, lambda v: v[offset::n])


def list_concat_cols(cols: list[Column]) -> Column:
    all_vals = [c.to_pylist() for c in cols]

    def cat(parts):
        if any(p is None for p in parts):
            return None
        out = []
        for p in parts:
            out.extend(p if isinstance(p, list) else [p])
        return out

    out = [cat(parts) for parts in zip(*all_vals)]
    return Column.from_values(cols[0].name, out, cols[0].dtype)


def list_to_struct(col: Column, n_field_strategy: str = "first_non_null",
                   fields=None, upper_bound: int = 0) -> Column:
    vals = col.to_pylist()
    lens = [len(v) for v in vals if v is not None]
    if fields is not None and not callable(fields):
        names = list(fields)
        width = len(names)
    else:
        if n_field_strategy == "max_width":
            width = max(lens, default=0)
        else:
            width = lens[0] if lens else 0
        width = max(width, upper_bound)
        namer = fields if callable(fields) else (lambda i: f"field_{i}")
        names = [namer(i) for i in range(width)]
    rows = [
        None if v is None else {names[i]: (v[i] if i < len(v) else None) for i in range(width)}
        for v in vals
    ]
    inner = col.dtype.inner
    return Column.from_values(
        col.name, rows, dt.Struct([(n, inner) for n in names])
    )


def list_sample(col: Column, n=None, fraction=None, with_replacement=False,
                shuffle=False, seed=None) -> Column:
    import random

    rng = random.Random(seed)

    def samp(v):
        k = n if n is not None else max(int(round((fraction or 1.0) * len(v))), 0)
        if with_replacement:
            return [v[rng.randrange(len(v))] for _ in range(k)] if v else []
        k = min(k, len(v))
        return rng.sample(v, k)

    return _host_rebuild(col, samp)


def list_to_array(col: Column, width: int) -> Column:
    vals = col.to_pylist()
    for v in vals:
        if v is not None and len(v) != width:
            raise InvalidOperationError(
                f"cannot convert list of length {len(v)} to array of width {width}"
            )
    return Column(
        col.name, dt.Array(col.dtype.inner, width), col.buffer,
        None, 0, col.child,
    )


def _flat_elements(col: Column):
    """(element Column, parent-id array, eff_lens, validity) — exploded WITHOUT
    placeholder rows for empty/null lists (unlike explode_column)."""
    from polars_tpu.engine.gather import gather_column

    packed, validity = col.buffer.to_numpy()
    starts = (packed >> 32).astype(np.int64)
    lens = (packed & 0xFFFFFFFF).astype(np.int64)
    eff = np.where(validity, lens, 0) if validity is not None else lens
    pid = np.repeat(np.arange(len(eff)), eff)
    total = int(eff.sum())
    offs = np.concatenate([[0], np.cumsum(eff)])[:-1]
    within = np.arange(total) - np.repeat(offs, eff)
    cidx = np.repeat(starts, eff) + within
    flat = gather_column(col.child, cidx).rename("")
    return flat, pid, eff, validity


def _expr_on_empty(expr_node, inner_col: Column):
    """Result (pylist) of the element expr over an EMPTY elements frame —
    polars semantics for empty lists (sum -> [0], mean -> [None],
    elementwise -> [])."""
    import polars_tpu as pl
    from polars_tpu.core.frame import DataFrame

    empty = Column(
        "", inner_col.dtype,
        Buffer(jnp.zeros((128,), inner_col.buffer.values.dtype), None, 0),
        inner_col.table, 0, None,
    )
    sub = DataFrame._from_columns([empty], 0)
    out = sub.select(pl.Expr(expr_node).alias("__out"))
    return out._columns[0].to_pylist(), out._columns[0]


def list_eval(col: Column, expr_node) -> Column:
    """list.eval(expr): evaluate ``expr`` (over pl.element() == col("")) per
    list. Elementwise exprs evaluate ONCE over the flat exploded child (no
    per-list loop — the packed layout keeps repacking free); everything else
    routes through the engine's group machinery with parent-id groups
    (reference: py-polars expr/list.py eval; AggregationContext analogue)."""
    import polars_tpu as pl
    from polars_tpu.core.frame import DataFrame
    from polars_tpu.plan import exprs as E

    flat, pid, eff, validity = _flat_elements(col)
    n_parent = len(eff)
    empty_vals, empty_col = _expr_on_empty(expr_node, flat)

    if E.is_elementwise(expr_node):
        sub = DataFrame._from_columns([flat], len(pid))
        out_col = sub.select(pl.Expr(expr_node).alias("__out"))._columns[0]
        out_flat = out_col.to_pylist()
        res = []
        pos = 0
        for i in range(n_parent):
            if validity is not None and not validity[i]:
                res.append(None)
            elif eff[i] == 0:
                res.append(list(empty_vals))
            else:
                res.append(out_flat[pos : pos + int(eff[i])])
            pos += int(eff[i])
        return Column.from_values(col.name, res, dt.List(out_col.dtype))

    # group path: one engine group-by over parent ids; length-changing
    # results implode to List, aggregations come back scalar
    pid_col = Column.from_values("__pid", pid.astype(np.int64), dt.Int64())
    sub = DataFrame._from_columns([pid_col, flat], len(pid))
    grouped = (
        sub.lazy()
        .group_by("__pid", maintain_order=True)
        .agg(pl.Expr(expr_node).alias("__out"))
        .collect()
    )
    out_c = grouped._columns[1]
    by_pid = dict(zip(grouped._columns[0].to_pylist(), out_c.to_pylist()))
    is_list = isinstance(out_c.dtype, dt.List)
    res = []
    for i in range(n_parent):
        if validity is not None and not validity[i]:
            res.append(None)
        elif eff[i] == 0:
            res.append(list(empty_vals))
        else:
            v = by_pid.get(i)
            res.append(v if is_list else [v])
    inner_dt = out_c.dtype.inner if is_list else out_c.dtype
    return Column.from_values(col.name, res, dt.List(inner_dt))


def list_filter(col: Column, pred_node) -> Column:
    """list.filter(pred): keep elements where the (elementwise) predicate
    holds; non-elementwise predicates go through the eval group path."""
    import polars_tpu as pl
    from polars_tpu.core.frame import DataFrame
    from polars_tpu.plan import exprs as E

    if E.is_elementwise(pred_node):
        flat, pid, eff, validity = _flat_elements(col)
        sub = DataFrame._from_columns([flat], len(pid))
        keep = sub.select(pl.Expr(pred_node).alias("__k"))._columns[0].to_pylist()
        vals = col.to_pylist()
        res = []
        pos = 0
        for i, v in enumerate(vals):
            if v is None:
                res.append(None)
            else:
                res.append([x for x, k in zip(v, keep[pos : pos + len(v)]) if k])
                pos += len(v)
        return Column.from_values(col.name, res, col.dtype)
    return list_eval(col, E.EFilter(E.EColumn(""), pred_node))
