"""Registry specs for nested-type (List/Struct) function ops.

These ops are HOST ops (lists/structs cannot be built inside a trace — the
child layout is data-dependent); engine/run.py's special-select path
intercepts them before tracing. The registrations here provide the dtype
rules schema resolution needs.
"""

from __future__ import annotations

from polars_tpu import datatypes as dt
from polars_tpu.engine.registry import register
from polars_tpu.errors import InvalidOperationError


def _host(name):
    def impl(ctx, args, opts):
        raise InvalidOperationError(f"{name} is a host op (routed via special select)")

    return impl


def _inner(dts, opts):
    d = dts[0]
    return d.inner if isinstance(d, (dt.List, dt.Array)) else dt.Unknown()


def _same(dts, opts):
    return dts[0]


def _sum_dt(dts, opts):
    inner = _inner(dts, opts)
    if isinstance(inner, dt.FloatType):
        return inner
    return dt.Int64()


# --- TRACED list aggregations (round-2, verdict #6) -------------------------
# The packed (start<<32|len) layout (core/column.py) makes these prefix-sum /
# sparse-table RANGE QUERIES over the flat child, which rides into the jit as
# arguments (engine/common.TracedChild) — O(1) VPU work per row, fused into
# the segment. Reference: polars-ops/src/chunked_array/list/.


def _traced_child(v, name):
    import jax.numpy as jnp

    from polars_tpu.core.buffer import row_mask
    from polars_tpu.engine.common import TracedChild

    ch = v.child
    if not isinstance(ch, TracedChild) or ch.values is None:
        raise InvalidOperationError(
            f"{name}: list child data unavailable in this context (series "
            "literal or distributed trace) — use the eager Series API"
        )
    ok = row_mask(ch.values.shape[0], ch.length)
    if ch.validity is not None:
        ok = ok & ch.validity
    return ch, ok


def _unpack(packed):
    import jax.numpy as jnp

    return (packed >> 32).astype(jnp.int32), (packed & 0xFFFFFFFF).astype(jnp.int32)


@register("list.len", dt.UInt32(), elementwise=False)
def _list_len(ctx, args, opts):
    import jax.numpy as jnp

    from polars_tpu.engine.common import Val

    v = args[0]
    return Val((v.values & 0xFFFFFFFF).astype(jnp.uint32), v.validity, dt.UInt32(), None, v.domain)


def _range_sum(packed, x, n_child):
    """Per-row sum of x over the row's [start, start+len) child range."""
    import jax.numpy as jnp

    starts, lens = _unpack(packed)
    cs = jnp.concatenate([jnp.zeros((1,), x.dtype), jnp.cumsum(x)])
    return cs[jnp.clip(starts + lens, 0, n_child)] - cs[jnp.clip(starts, 0, n_child)]


def _list_sum_mean(kind):
    @register(f"list.{kind}", _sum_dt if kind == "sum" else dt.Float64(), elementwise=False)
    def _(ctx, args, opts):
        import jax.numpy as jnp

        from polars_tpu.engine.common import Val

        v = args[0]
        ch, ok = _traced_child(v, f"list.{kind}")
        inner = v.dtype.inner
        if not (inner.is_numeric() or isinstance(inner, dt.Boolean)):
            raise InvalidOperationError(f"list.{kind} needs numeric inner dtype, got {inner!r}")
        n_child = ch.values.shape[0]
        acc_t = jnp.int64 if (inner.is_integer() or isinstance(inner, dt.Boolean)) and kind == "sum" else jnp.float64
        x = jnp.where(ok, ch.values.astype(acc_t), jnp.zeros((), acc_t))
        s = _range_sum(v.values, x, n_child)
        cnt = _range_sum(v.values, ok.astype(jnp.float64), n_child)
        if kind == "mean":
            out = s / jnp.maximum(cnt, 1.0)
            validity = (cnt > 0)
            validity = validity & v.validity if v.validity is not None else validity
            return Val(out, validity, dt.Float64(), None, v.domain)
        out_dt = inner if inner.is_float() else dt.Int64()
        out = s.astype(jnp.dtype(dt.dtype_to_numpy(out_dt)))
        # polars: sum of an all-null/empty list is 0, not null
        return Val(out, v.validity, out_dt, None, v.domain)


_list_sum_mean("sum")
_list_sum_mean("mean")


def _list_minmax(kind):
    @register(f"list.{kind}", _inner, elementwise=False)
    def _(ctx, args, opts):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from polars_tpu.engine.common import Val

        v = args[0]
        ch, ok = _traced_child(v, f"list.{kind}")
        inner = v.dtype.inner
        starts, lens = _unpack(v.values)
        cv = ch.values
        out_table = ch.table
        if out_table is not None and not out_table.sorted_order and not isinstance(inner, dt.Enum):
            # unordered dictionary: lex min/max needs ordinal codes
            out_table, _rk = out_table.ordinal()
            cv = jnp.asarray(_rk)[jnp.clip(cv, 0, len(_rk) - 1)]
        # exact fills per accumulator class: int64 keeps temporal ns exact
        # (an f64 cast would round ticks above 2^53); string codes are
        # ordinal so min/max code == lexicographic min/max
        if cv.dtype in (jnp.float32, jnp.float64):
            work = cv.astype(jnp.float64)
            fill = jnp.float64(np.inf if kind == "min" else -np.inf)
            if kind == "min":
                # NaN-total-order: NaN is GREATEST, so min skips NaN (matching
                # seg_min/_batch_aggs); all-NaN lists are restored to NaN below
                work = jnp.where(jnp.isnan(work), fill, work)
        else:
            work = cv.astype(jnp.int64)
            info = jnp.iinfo(jnp.int64)
            fill = jnp.int64(info.max if kind == "min" else info.min)
        base = jnp.where(ok, work, fill)
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
        out = (jnp.minimum if kind == "min" else jnp.maximum)(stacked[k, b], stacked[k, e])
        cnt = _range_sum(v.values, ok.astype(jnp.int32), n)
        if kind == "min" and cv.dtype in (jnp.float32, jnp.float64):
            # all-NaN (valid) lists: every element was remapped to +inf — the
            # true total-order min is NaN
            non_nan = _range_sum(v.values, (ok & ~jnp.isnan(cv)).astype(jnp.int32), n)
            out = jnp.where((cnt > 0) & (non_nan == 0), jnp.float64(np.nan), out)
        validity = cnt > 0
        if v.validity is not None:
            validity = validity & v.validity
        np_dt = jnp.dtype(dt.dtype_to_numpy(inner))
        return Val(out.astype(np_dt), validity, inner, out_table, v.domain)


_list_minmax("min")
_list_minmax("max")


@register("list.get", _inner, elementwise=False)
def _list_get(ctx, args, opts):
    import jax.numpy as jnp

    from polars_tpu.engine.common import Val

    v = args[0]
    ch, ok = _traced_child(v, "list.get")
    starts, lens = _unpack(v.values)
    index = int(opts.get("index", 0))
    i = jnp.where(index >= 0, jnp.int32(index), lens + index)
    in_range = (i >= 0) & (i < lens)
    if not opts.get("null_on_oob", True):
        pm = ctx.rowmask
        if v.validity is not None:
            pm = pm & v.validity
        ctx.add_flag(
            jnp.any(pm & ~in_range),
            f"get index {index} is out of bounds",
        )
    idx = jnp.clip(starts + i, 0, ch.values.shape[0] - 1)
    out = ch.values[idx]
    validity = in_range & ok[idx]
    if v.validity is not None:
        validity = validity & v.validity
    return Val(out, validity, v.dtype.inner, ch.table, v.domain, ch.child)


@register("list.contains", dt.Boolean(), elementwise=False)
def _list_contains(ctx, args, opts):
    import jax
    import jax.numpy as jnp

    from polars_tpu.engine.common import Val

    v = args[0]
    item = args[1]
    nulls_equal = opts.get("nulls_equal", False)
    scalar_item = item.domain == "scalar" or getattr(item.values, "ndim", 1) == 0
    if scalar_item:
        ch, ok = _traced_child(v, "list.contains")
        hit = (ch.values == item.values.astype(ch.values.dtype)) & ok
        cnt = _range_sum(v.values, hit.astype(jnp.int32), ch.values.shape[0])
        return Val(cnt > 0, v.validity, dt.Boolean(), None, v.domain)
    # per-row item (Expr.is_in against a List column routes here): gather the
    # child contiguous in parent order, compare each slot against ITS parent's
    # item, scatter-count matches per parent
    # (reference: is_in with list rhs, polars-ops/src/series/ops/is_in.rs)
    if item.table is not None:
        ch0, _ = _traced_child(v, "list.contains")
        if ch0.table is None or ch0.table.ident != item.table.ident:
            raise InvalidOperationError(
                "per-row list.contains on strings requires a shared dictionary"
            )
    ch, ok, _new_packed, pc, _within, src, in_data, _lens = _contiguize(
        ctx, v, "list.contains"
    )
    n = v.values.shape[0]
    g = ch.values[src]
    gok = ok[src] & in_data
    it = item.values[pc]
    hit = (g == it.astype(g.dtype)) & gok
    if item.validity is not None:
        hit = hit & item.validity[pc]
    tgt = jnp.where(in_data, pc, n)
    out = jnp.zeros((n,), jnp.int32).at[tgt].add(hit.astype(jnp.int32), mode="drop") > 0
    validity = v.validity
    if item.validity is not None:
        if nulls_equal:
            # null item: membership of null among the row's list elements
            hitn = (~gok) & in_data
            out_null = (
                jnp.zeros((n,), jnp.int32).at[tgt].add(hitn.astype(jnp.int32), mode="drop") > 0
            )
            out = jnp.where(item.validity, out, out_null)
        else:
            validity = item.validity if validity is None else (validity & item.validity)
    return Val(out, validity, dt.Boolean(), None, v.domain)


register("list.join", dt.String(), elementwise=False)(_host("list.join"))
register("explode", _inner, elementwise=False)(_host("explode"))


# --- TRACED list transforms (round-2): sort/reverse/unique -------------------
# These REBUILD the child inside the trace: the output Val carries a
# TracedChild with src=None, which run_segment emits as extra jit outputs
# (executors.run_segment child_outs protocol). Strategy: contiguize the child
# in parent-row order via the explode-style searchsorted gather, then permute
# within segments (reference: polars-ops/src/chunked_array/list/).


def _contiguize(ctx, v, name):
    """Gather the child CONTIGUOUS in parent-row order (masked/null parents
    contribute zero length). Returns (ch, ok, new_packed i64, parent idx pc,
    within, src idx, in_data mask, lens). Capacity bound: the child's padded
    extent — duplicated parents sharing child ranges (post-join fan-out) can
    exceed it; those inputs are routed host by _fn_conditionally_host."""
    import jax
    import jax.numpy as jnp

    ch, ok = _traced_child(v, name)
    starts, lens = _unpack(v.values)
    pm = ctx.rowmask
    if v.validity is not None:
        pm = pm & v.validity
    lens = jnp.where(pm, lens, 0)
    offs = jnp.cumsum(lens)
    n_child = ch.values.shape[0]
    if getattr(ctx, "flags", None) is not None:
        # post-join fan-out can duplicate parents SHARING child ranges; the
        # contiguous rebuild then exceeds the child's padded extent — flag it
        # (rides the count channel; run_segment raises ComputeError)
        ctx.flags.append(offs[-1] > jnp.int32(n_child))
    j = jax.lax.broadcasted_iota(jnp.int32, (n_child, 1), 0).squeeze(-1)
    in_data = j < offs[-1]
    pc = jnp.clip(
        jnp.searchsorted(offs, j, side="right").astype(jnp.int32),
        0, v.values.shape[0] - 1,
    )
    within = j - (offs[pc] - lens[pc])
    src = jnp.clip(starts[pc] + within, 0, n_child - 1)
    new_packed = ((offs - lens).astype(jnp.int64) << 32) | lens.astype(jnp.int64)
    return ch, ok, new_packed, pc, within, src, in_data, lens


def _list_out(v, ch, new_packed, g, gok, total):
    from polars_tpu.engine.common import TracedChild, Val

    child = TracedChild(g, gok, v.dtype.inner, ch.table, total, None, None)
    return Val(new_packed, v.validity, v.dtype, None, v.domain, child)


@register("list.reverse", _same, elementwise=False)
def _list_reverse(ctx, args, opts):
    import jax.numpy as jnp

    v = args[0]
    ch, ok, new_packed, pc, within, _src, in_data, lens = _contiguize(ctx, v, "list.reverse")
    n_child = ch.values.shape[0]
    starts, _ = _unpack(v.values)
    src = jnp.clip(starts[pc] + lens[pc] - 1 - within, 0, n_child - 1)
    g = ch.values[src]
    gok = ok[src] & in_data
    return _list_out(v, ch, new_packed, g, gok, jnp.sum(lens))


def _sorted_gather(ctx, v, name, descending, nulls_last=False):
    """Contiguize then stable-sort within segments by (null-rank, value).
    Null placement follows ``nulls_last`` only (polars semantics: nulls_last
    is independent of ``descending``, which flips just the value words).
    Returns (ch, new_packed, g0/gok0/seg0 in the CONTIGUOUS ORIGINAL domain,
    sort perm, words0, in_data0, lens)."""
    import jax.numpy as jnp

    from polars_tpu.kernels.argsort import key_words, stable_argsort_words

    v_inner = v.dtype.inner
    ch, ok, new_packed, pc, _within, src, in_data, lens = _contiguize(ctx, v, name)
    g0 = ch.values[src]
    gok0 = ok[src] & in_data
    seg0 = jnp.where(in_data, pc, jnp.int32(2**31 - 1))
    null_rank = (~gok0).astype(jnp.int32)
    null_word = null_rank if nulls_last else -null_rank  # -1 sorts first
    gk = g0
    if ch.table is not None and not ch.table.sorted_order and not isinstance(v_inner, dt.Enum):
        # unordered dictionary: sort KEYS by lex rank; the payload (g0) keeps
        # the original codes so the gathered output decodes unchanged
        _, _rk = ch.table.ordinal()
        gk = jnp.asarray(_rk)[jnp.clip(g0, 0, len(_rk) - 1)]
    vwords = key_words(gk, v_inner)
    if descending:
        vwords = [jnp.bitwise_not(w) for w in vwords]
    words0 = [null_word, *vwords]
    perm = stable_argsort_words([seg0, *words0])
    return ch, new_packed, g0, gok0, seg0, perm, words0, in_data, lens


@register("list.sort", _same, elementwise=False)
def _list_sort(ctx, args, opts):
    import jax.numpy as jnp

    v = args[0]
    ch, new_packed, g0, gok0, _seg0, perm, _w, _ind, lens = _sorted_gather(
        ctx, v, "list.sort", bool(opts.get("descending", False)),
        bool(opts.get("nulls_last", False)),
    )
    return _list_out(v, ch, new_packed, g0[perm], gok0[perm], jnp.sum(lens))


@register("list.unique", _same, elementwise=False)
def _list_unique(ctx, args, opts):
    import jax.numpy as jnp

    v = args[0]
    maintain_order = bool(opts.get("maintain_order", False))
    ch, _packed, g0, gok0, seg0, perm, words0, in_data, _lens = _sorted_gather(
        ctx, v, "list.unique", False
    )
    n_child = ch.values.shape[0]
    n_parent = v.values.shape[0]
    seg = seg0[perm]
    # first-of-run detection in the sorted domain: equal iff same segment and
    # equal total-order words (the null word is words0[0], so a run of nulls
    # also collapses; NaNs compare equal, unlike an elementwise != that would
    # keep every NaN)
    same_seg = jnp.concatenate([jnp.zeros((1,), bool), seg[1:] == seg[:-1]])
    weq = same_seg
    for w0 in words0:
        w = w0[perm]
        weq = weq & jnp.concatenate([jnp.zeros((1,), bool), w[1:] == w[:-1]])
    keep_sorted = in_data[perm] & ~weq
    if maintain_order:
        # scatter run-head flags back to original contiguous positions (the
        # stable sort makes each run's head the FIRST occurrence), compact in
        # appearance order
        keep = jnp.zeros((n_child,), bool).at[perm].set(keep_sorted, unique_indices=True)
        g, gok, segc = g0, gok0, seg0
    else:
        keep, g, gok, segc = keep_sorted, g0[perm], gok0[perm], seg
    lens2 = jnp.zeros((n_parent,), jnp.int32).at[
        jnp.where(keep, segc, n_parent)
    ].add(1, mode="drop")
    offs2 = jnp.cumsum(lens2)
    new_packed2 = ((offs2 - lens2).astype(jnp.int64) << 32) | lens2.astype(jnp.int64)
    pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    _iota = jnp.arange(n_child, dtype=jnp.int32)
    # dropped rows target DISTINCT out-of-range slots so unique_indices is
    # honest (TPU scatter with possibly-colliding indices serializes)
    tgt = jnp.where(keep, pos, n_child + _iota)
    out_g = jnp.zeros_like(g).at[tgt].set(g, mode="drop", unique_indices=True)
    out_ok = jnp.zeros((n_child,), bool).at[tgt].set(gok, mode="drop", unique_indices=True)
    return _list_out(v, ch, new_packed2, out_g, out_ok, jnp.sum(lens2))


def _uint32(dts, opts):
    return dt.UInt32()


def _f64(dts, opts):
    return dt.Float64()


def _bool(dts, opts):
    return dt.Boolean()


def _diff_dt(dts, opts):
    d = dts[0]
    inner = d.inner if isinstance(d, (dt.List, dt.Array)) else dt.Unknown()
    if isinstance(inner, dt.Date):
        return dt.List(dt.Duration("ms"))
    if isinstance(inner, dt.Datetime):
        return dt.List(dt.Duration(inner.time_unit))
    return dt.List(inner) if not isinstance(d, dt.Unknown) else d


# --- TRACED list long tail (round-5, verdict r4 #8) --------------------------
# Range-query ops (any/all/count_matches) read the ORIGINAL packed ranges —
# safe for shared/fan-out ranges and split-derived children. Moment/rank ops
# (var/std/median/n_unique/arg_min/arg_max) and shape rewrites (slice/head/
# tail/shift/diff/drop_nulls/gather_every) contiguize first, so they carry
# the same column-ref gate as sort/reverse/unique.
# Reference semantics: polars-ops/src/chunked_array/list/namespace.rs
# (lst_slice :299, lst_shift :255, lst_diff :250, lst_arg_min :235,
# lst_drop_nulls :538, dispersion.rs for var/std/median).


def _list_any_all(kind):
    @register(f"list.{kind}", _bool, elementwise=False)
    def _(ctx, args, opts):
        import jax.numpy as jnp

        from polars_tpu.engine.common import Val

        v = args[0]
        ch, ok = _traced_child(v, f"list.{kind}")
        n_child = ch.values.shape[0]
        x = ch.values.astype(bool)
        if kind == "any":
            cnt = _range_sum(v.values, (x & ok).astype(jnp.int32), n_child)
            out = cnt > 0
        else:
            cnt = _range_sum(v.values, ((~x) & ok).astype(jnp.int32), n_child)
            out = cnt == 0
        return Val(out, v.validity, dt.Boolean(), None, v.domain)


_list_any_all("any")
_list_any_all("all")


@register("list.count_matches", _uint32, elementwise=False)
def _list_count_matches(ctx, args, opts):
    import jax.numpy as jnp

    from polars_tpu.engine.common import Val

    v = args[0]
    item = args[1]
    ch, ok = _traced_child(v, "list.count_matches")
    hit = (ch.values == item.values.astype(ch.values.dtype)) & ok
    cnt = _range_sum(v.values, hit.astype(jnp.int32), ch.values.shape[0])
    return Val(cnt.astype(jnp.uint32), v.validity, dt.UInt32(), None, v.domain)


def _list_moment(kind):
    @register(f"list.{kind}", _f64, elementwise=False)
    def _(ctx, args, opts):
        import jax.numpy as jnp

        from polars_tpu.engine.common import Val

        v = args[0]
        n_parent = v.values.shape[0]
        if kind == "median":
            # rank query: sort within segments (nulls last), read the middle
            ch, new_packed, g0, gok0, seg0, perm, _w, _ind, lens = _sorted_gather(
                ctx, v, "list.median", False, nulls_last=True
            )
            n_child = ch.values.shape[0]
            starts2, _l2 = _unpack(new_packed)
            cnt = jnp.zeros((n_parent,), jnp.int32).at[seg0].add(
                gok0.astype(jnp.int32), mode="drop"
            )
            vals = g0[perm].astype(jnp.float64)
            a = jnp.clip(starts2 + jnp.maximum(cnt - 1, 0) // 2, 0, n_child - 1)
            b = jnp.clip(starts2 + cnt // 2, 0, n_child - 1)
            out = (vals[a] + vals[b]) * 0.5
            validity = cnt > 0
            if v.validity is not None:
                validity = validity & v.validity
            return Val(out, validity, dt.Float64(), None, v.domain)
        # var/std: exact two-pass (host oracle computes sum of squared
        # deviations; a one-pass s2-s1^2/n loses precision at large means)
        ddof = int(opts.get("ddof", 1))
        ch, ok, _np_, pc, _wi, src, in_data, _lens = _contiguize(ctx, v, f"list.{kind}")
        g = ch.values[src].astype(jnp.float64)
        gok = ok[src] & in_data
        xm = jnp.where(gok, g, 0.0)
        cnt = jnp.zeros((n_parent,), jnp.float64).at[pc].add(
            gok.astype(jnp.float64), mode="drop"
        )
        s1 = jnp.zeros((n_parent,), jnp.float64).at[pc].add(xm, mode="drop")
        mean = s1 / jnp.maximum(cnt, 1.0)
        dev = jnp.where(gok, g - mean[pc], 0.0)
        ss = jnp.zeros((n_parent,), jnp.float64).at[pc].add(dev * dev, mode="drop")
        out = ss / jnp.maximum(cnt - ddof, 1.0)
        if kind == "std":
            out = jnp.sqrt(out)
        validity = cnt > jnp.float64(ddof)
        if v.validity is not None:
            validity = validity & v.validity
        return Val(out, validity, dt.Float64(), None, v.domain)


_list_moment("var")
_list_moment("std")
_list_moment("median")


@register("list.n_unique", _uint32, elementwise=False)
def _list_n_unique(ctx, args, opts):
    import jax.numpy as jnp

    from polars_tpu.engine.common import Val

    v = args[0]
    n_parent = v.values.shape[0]
    ch, _packed, _g0, _gok0, seg0, perm, words0, in_data, _lens = _sorted_gather(
        ctx, v, "list.n_unique", False
    )
    seg = seg0[perm]
    same_seg = jnp.concatenate([jnp.zeros((1,), bool), seg[1:] == seg[:-1]])
    weq = same_seg
    for w0 in words0:
        w = w0[perm]
        weq = weq & jnp.concatenate([jnp.zeros((1,), bool), w[1:] == w[:-1]])
    keep = in_data[perm] & ~weq  # run heads; a null run counts once (null is
    # a distinct value, host oracle list_n_unique)
    out = jnp.zeros((n_parent,), jnp.uint32).at[seg].add(
        keep.astype(jnp.uint32), mode="drop"
    )
    return Val(out, v.validity, dt.UInt32(), None, v.domain)


def _list_arg_minmax(kind):
    @register(f"list.arg_{kind}", _uint32, elementwise=False)
    def _(ctx, args, opts):
        import jax.numpy as jnp

        from polars_tpu.engine.common import Val

        v = args[0]
        n_parent = v.values.shape[0]
        # nulls sort LAST; the stable sort makes rank 0 of each segment the
        # FIRST occurrence of the extreme (host oracle keeps the first)
        ch, new_packed, _g0, gok0, seg0, perm, _w, _ind, _lens = _sorted_gather(
            ctx, v, f"list.arg_{kind}", kind == "max", nulls_last=True
        )
        n_child = ch.values.shape[0]
        starts2, _l2 = _unpack(new_packed)
        first_pos = perm[jnp.clip(starts2, 0, n_child - 1)]
        within = (first_pos - starts2).astype(jnp.uint32)
        valid_cnt = jnp.zeros((n_parent,), jnp.int32).at[seg0].add(
            gok0.astype(jnp.int32), mode="drop"
        )
        validity = valid_cnt > 0
        if v.validity is not None:
            validity = validity & v.validity
        return Val(within, validity, dt.UInt32(), None, v.domain)


_list_arg_minmax("min")
_list_arg_minmax("max")


def _rebuild(ctx, v, name, new_lens, src_of):
    """Shape-rewrite skeleton: output row r has ``new_lens[r]`` elements,
    element (r, i) gathered from the ORIGINAL child at ``src_of(pc, i)``
    (which returns (src index, extra-validity)). Capacity bound = the child's
    padded extent, flagged like _contiguize."""
    import jax
    import jax.numpy as jnp

    ch, ok = _traced_child(v, name)
    _starts, _lens = _unpack(v.values)
    pm = ctx.rowmask
    if v.validity is not None:
        pm = pm & v.validity
    nl = jnp.where(pm, jnp.maximum(new_lens, 0), 0).astype(jnp.int32)
    offs2 = jnp.cumsum(nl)
    n_child = ch.values.shape[0]
    n_parent = v.values.shape[0]
    if getattr(ctx, "flags", None) is not None:
        ctx.flags.append(offs2[-1] > jnp.int32(n_child))
    j = jax.lax.broadcasted_iota(jnp.int32, (n_child, 1), 0).squeeze(-1)
    in_data = j < offs2[-1]
    pc = jnp.clip(
        jnp.searchsorted(offs2, j, side="right").astype(jnp.int32), 0, n_parent - 1
    )
    within = j - (offs2[pc] - nl[pc])
    src, sok = src_of(pc, within)
    src = jnp.clip(src, 0, n_child - 1)
    g = ch.values[src]
    gok = ok[src] & sok & in_data
    new_packed = ((offs2 - nl).astype(jnp.int64) << 32) | nl.astype(jnp.int64)
    return _list_out(v, ch, new_packed, g, gok, jnp.sum(nl))


def _list_slice_impl(ctx, v, name, off_of, len_of):
    """Shared head/tail/slice: per-parent (offset, new_len) over the original
    ranges; subranges stay contiguous so src = start + off + within."""
    import jax.numpy as jnp

    starts, lens = _unpack(v.values)
    o = off_of(lens)
    nl = len_of(lens, o)

    def src_of(pc, within):
        return starts[pc] + o[pc] + within, jnp.bool_(True)

    return _rebuild(ctx, v, name, nl, src_of)


@register("list.head", _same, elementwise=False)
def _list_head(ctx, args, opts):
    import jax.numpy as jnp

    n = int(opts.get("n", 5))
    return _list_slice_impl(
        ctx, args[0], "list.head",
        lambda lens: jnp.zeros_like(lens),
        lambda lens, o: jnp.minimum(jnp.int32(max(n, 0)), lens),
    )


@register("list.tail", _same, elementwise=False)
def _list_tail(ctx, args, opts):
    import jax.numpy as jnp

    n = int(opts.get("n", 5))
    return _list_slice_impl(
        ctx, args[0], "list.tail",
        lambda lens: lens - jnp.minimum(jnp.int32(max(n, 0)), lens),
        lambda lens, o: lens - o,
    )


@register("list.slice", _same, elementwise=False)
def _list_slice(ctx, args, opts):
    import jax.numpy as jnp

    offset = int(opts.get("offset", 0))
    length = opts.get("length")

    def off_of(lens):
        if offset >= 0:
            return jnp.minimum(jnp.int32(offset), lens)
        return jnp.maximum(lens + jnp.int32(offset), 0)

    def len_of(lens, o):
        avail = lens - o
        if length is None:
            return avail
        return jnp.minimum(jnp.int32(max(int(length), 0)), avail)

    return _list_slice_impl(ctx, args[0], "list.slice", off_of, len_of)


@register("list.gather_every", _same, elementwise=False)
def _list_gather_every(ctx, args, opts):
    import jax.numpy as jnp

    v = args[0]
    n = max(int(opts.get("n", 1)), 1)
    offset = max(int(opts.get("offset", 0)), 0)
    starts, lens = _unpack(v.values)
    avail = jnp.maximum(lens - jnp.int32(offset), 0)
    nl = (avail + jnp.int32(n - 1)) // jnp.int32(n)

    def src_of(pc, within):
        return starts[pc] + jnp.int32(offset) + within * jnp.int32(n), jnp.bool_(True)

    return _rebuild(ctx, v, "list.gather_every", nl, src_of)


@register("list.shift", _same, elementwise=False)
def _list_shift(ctx, args, opts):
    import jax.numpy as jnp

    v = args[0]
    n = int(opts.get("n", 1))
    starts, lens = _unpack(v.values)

    def src_of(pc, within):
        k = within - jnp.int32(n)
        return starts[pc] + k, (k >= 0) & (k < lens[pc])

    return _rebuild(ctx, v, "list.shift", lens, src_of)


@register("list.diff", _diff_dt, elementwise=False)
def _list_diff(ctx, args, opts):
    import jax.numpy as jnp

    from polars_tpu.engine.common import TracedChild, Val

    v = args[0]
    n = int(opts.get("n", 1))
    drop = opts.get("null_behavior", "ignore") == "drop"
    ch, ok = _traced_child(v, "list.diff")
    starts, lens = _unpack(v.values)
    if drop:
        nl = jnp.maximum(lens - jnp.int32(abs(n)), 0)
        base = jnp.int32(n if n > 0 else 0)
    else:
        nl = lens
        base = jnp.int32(0)
    pm = ctx.rowmask
    if v.validity is not None:
        pm = pm & v.validity
    nl = jnp.where(pm, nl, 0)
    offs2 = jnp.cumsum(nl)
    n_child = ch.values.shape[0]
    n_parent = v.values.shape[0]
    if getattr(ctx, "flags", None) is not None:
        ctx.flags.append(offs2[-1] > jnp.int32(n_child))
    import jax

    j = jax.lax.broadcasted_iota(jnp.int32, (n_child, 1), 0).squeeze(-1)
    in_data = j < offs2[-1]
    pc = jnp.clip(
        jnp.searchsorted(offs2, j, side="right").astype(jnp.int32), 0, n_parent - 1
    )
    within = j - (offs2[pc] - nl[pc])
    a = within + base  # index into the ORIGINAL list
    b = a - jnp.int32(n)
    sa = jnp.clip(starts[pc] + a, 0, n_child - 1)
    sb = jnp.clip(starts[pc] + b, 0, n_child - 1)
    pair_ok = (
        (a >= 0) & (a < lens[pc]) & (b >= 0) & (b < lens[pc]) & ok[sa] & ok[sb]
    )
    g = ch.values[sa] - ch.values[sb]
    gok = pair_ok & in_data
    new_packed = ((offs2 - nl).astype(jnp.int64) << 32) | nl.astype(jnp.int64)
    child = TracedChild(g, gok, v.dtype.inner, None, jnp.sum(nl), None, None)
    return Val(new_packed, v.validity, dt.List(v.dtype.inner), None, v.domain, child)


@register("list.drop_nulls", _same, elementwise=False)
def _list_drop_nulls(ctx, args, opts):
    import jax.numpy as jnp

    v = args[0]
    ch, ok, _np_, pc, _wi, src, in_data, _lens = _contiguize(ctx, v, "list.drop_nulls")
    n_child = ch.values.shape[0]
    n_parent = v.values.shape[0]
    g0 = ch.values[src]
    keep = ok[src] & in_data
    lens2 = jnp.zeros((n_parent,), jnp.int32).at[
        jnp.where(keep, pc, n_parent)
    ].add(1, mode="drop")
    offs2 = jnp.cumsum(lens2)
    new_packed2 = ((offs2 - lens2).astype(jnp.int64) << 32) | lens2.astype(jnp.int64)
    pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    _iota = jnp.arange(n_child, dtype=jnp.int32)
    tgt = jnp.where(keep, pos, n_child + _iota)
    out_g = jnp.zeros_like(g0).at[tgt].set(g0, mode="drop", unique_indices=True)
    out_ok = jnp.zeros((n_child,), bool).at[tgt].set(keep, mode="drop", unique_indices=True)
    return _list_out(v, ch, new_packed2, out_g, out_ok, jnp.sum(lens2))


def _eval_dt(dts, opts):
    from polars_tpu.core.schema import Schema
    from polars_tpu.plan.schema_resolve import expr_dtype

    d = dts[0]
    inner = d.inner if isinstance(d, (dt.List, dt.Array)) else dt.Unknown()
    node = opts.get("expr")
    if node is None:
        return dt.List(inner)
    try:
        out = expr_dtype(node, Schema({"": inner}))
    except Exception:  # noqa: BLE001 — unresolvable exprs stay Unknown
        return dt.List(dt.Unknown())
    if isinstance(out, dt.List):
        out = out.inner  # aggregation implode: eval flattens one level
    return dt.List(out)


def _filter_dt(dts, opts):
    return dts[0]


def _child_eval(ctx, v, ch, ok, node):
    """Evaluate an elementwise expr (over pl.element() == col("")) across the
    flat child as its own ROW-domain EvalCtx. Literals bake from host values
    (fine inside the trace); memo is fresh (different domain than the
    parent's)."""
    import jax.numpy as jnp

    from polars_tpu.core.buffer import row_mask
    from polars_tpu.core.schema import Schema
    from polars_tpu.engine.common import ROW, EvalCtx, Val
    from polars_tpu.engine.compiler import eval_expr

    n_child = ch.values.shape[0]
    inner = v.dtype.inner
    elem = Val(ch.values, ch.validity, inner, ch.table, ROW, ch.child)
    cctx = EvalCtx(
        cols={"": elem},
        rowmask=row_mask(n_child, ch.length),
        length=ch.length,
        padded=n_child,
        schema=Schema({"": inner}),
        literals=ctx.literals,
        groups=None,
        precomputed=None,
        memo={},
        flags=ctx.flags,
        flag_msgs=ctx.flag_msgs,
    )
    out = eval_expr(node, cctx)
    vals = out.values
    if vals.ndim == 0 or vals.shape[0] != n_child:
        vals = jnp.broadcast_to(vals.reshape(-1)[:1], (n_child,))
    validity = out.validity
    if validity is not None and (validity.ndim == 0 or validity.shape[0] != n_child):
        validity = jnp.broadcast_to(validity.reshape(-1)[:1], (n_child,))
    return vals, validity, out.dtype, out.table


@register("list.eval", _eval_dt, elementwise=False)
def _list_eval(ctx, args, opts):
    from polars_tpu.engine.common import TracedChild, Val

    v = args[0]
    node = opts.get("expr")
    ch, ok = _traced_child(v, "list.eval")
    vals, validity, out_dt, out_table = _child_eval(ctx, v, ch, ok, node)
    # packed words are unchanged (elementwise = length-preserving); only the
    # child payload is rewritten
    child = TracedChild(vals, validity, out_dt, out_table, ch.length, None, None)
    return Val(v.values, v.validity, dt.List(out_dt), None, v.domain, child)


@register("list.filter", _filter_dt, elementwise=False)
def _list_filter(ctx, args, opts):
    import jax.numpy as jnp

    v = args[0]
    node = opts.get("expr")
    ch, ok = _traced_child(v, "list.filter")
    kvals, kvalidity, _kdt, _kt = _child_eval(ctx, v, ch, ok, node)
    keep_elem = kvals.astype(bool)
    if kvalidity is not None:
        keep_elem = keep_elem & kvalidity  # null predicate drops the element
    # compact within lists (the drop_nulls skeleton, keep = predicate)
    _ch, okc, _np_, pc, _wi, src, in_data, _lens = _contiguize(ctx, v, "list.filter")
    n_child = ch.values.shape[0]
    n_parent = v.values.shape[0]
    g0 = ch.values[src]
    gok0 = okc[src]
    # an element is kept iff the predicate is TRUE for it (null predicate
    # drops); kept elements retain their own validity, so an is_null-style
    # predicate keeps nulls as nulls (host oracle zip semantics)
    row_alive = keep_elem[src] & in_data
    lens2 = jnp.zeros((n_parent,), jnp.int32).at[
        jnp.where(row_alive, pc, n_parent)
    ].add(1, mode="drop")
    offs2 = jnp.cumsum(lens2)
    new_packed2 = ((offs2 - lens2).astype(jnp.int64) << 32) | lens2.astype(jnp.int64)
    pos = jnp.cumsum(row_alive.astype(jnp.int32)) - 1
    _iota = jnp.arange(n_child, dtype=jnp.int32)
    tgt = jnp.where(row_alive, pos, n_child + _iota)
    out_g = jnp.zeros_like(g0).at[tgt].set(g0, mode="drop", unique_indices=True)
    out_ok = jnp.zeros((n_child,), bool).at[tgt].set(gok0, mode="drop", unique_indices=True)
    return _list_out(v, ch, new_packed2, out_g, out_ok, jnp.sum(lens2))


def _unify_child_codes(parts_ch):
    """Fold the children's dictionaries into one table and remap codes (the
    trace-time analogue of _concat_list_impl's scalar-column unification)."""
    import jax.numpy as jnp

    from polars_tpu.utils import strtable

    if all(ch.table is None for ch in parts_ch):
        return [ch.values for ch in parts_ch], None
    merged = None
    for ch in parts_ch:
        t = ch.table or strtable.empty_table()
        merged = t if merged is None else strtable.unify(merged, t)[0]
    outs = []
    for ch in parts_ch:
        src = ch.table or strtable.empty_table()
        if src is merged:
            outs.append(ch.values)
            continue
        _, m, _ = strtable.unify(src, merged)
        if len(m) == 0:
            outs.append(ch.values)
            continue
        lut = jnp.asarray(m)
        outs.append(lut[jnp.clip(ch.values, 0, len(m) - 1)])
    return outs, merged


def _list_concat_val(ctx, args, name, want_side=False):
    """Row-wise concat of k List vals -> one Val with a fresh contiguous
    child (the traced analogue of ops/list_ops.list_concat_cols: any null
    part nulls the row). ``want_side`` additionally returns the part index
    per output child slot (the set ops need a/b provenance)."""
    import jax
    import jax.numpy as jnp

    from polars_tpu.engine.common import TracedChild, Val

    parts = []
    for p in args:
        ch, ok = _traced_child(p, name)
        parts.append((p, ch, ok))
    codes, table = _unify_child_codes([ch for _, ch, _ in parts])
    inner = parts[0][0].dtype.inner
    validity = None
    for p, _, _ in parts:
        if p.validity is not None:
            validity = p.validity if validity is None else (validity & p.validity)
    n_parent = parts[0][0].values.shape[0]
    pm = ctx.rowmask
    if validity is not None:
        pm = pm & validity
    starts_k, lens_k = zip(*[_unpack(p.values) for p, _, _ in parts])
    nl = jnp.zeros((n_parent,), jnp.int32)
    for lk in lens_k:
        nl = nl + lk
    nl = jnp.where(pm, nl, 0)
    offs2 = jnp.cumsum(nl)
    N = sum(ch.values.shape[0] for _, ch, _ in parts)
    if getattr(ctx, "flags", None) is not None:
        ctx.flags.append(offs2[-1] > jnp.int32(N))
    j = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0).squeeze(-1)
    in_data = j < offs2[-1]
    pc = jnp.clip(
        jnp.searchsorted(offs2, j, side="right").astype(jnp.int32), 0, n_parent - 1
    )
    within = j - (offs2[pc] - nl[pc])
    out_dt = jnp.result_type(*[c.dtype for c in codes])
    g = jnp.zeros((N,), out_dt)
    gok = jnp.zeros((N,), bool)
    side = jnp.zeros((N,), jnp.int32)
    acc = jnp.zeros((n_parent,), jnp.int32)
    for k_idx, ((p, ch, ok), codes_k, st_k, ln_k) in enumerate(
        zip(parts, codes, starts_k, lens_k)
    ):
        local = within - acc[pc]
        sel = (local >= 0) & (local < ln_k[pc])
        src = jnp.clip(st_k[pc] + local, 0, ch.values.shape[0] - 1)
        g = jnp.where(sel, codes_k.astype(out_dt)[src], g)
        gok = jnp.where(sel, ok[src], gok)
        side = jnp.where(sel, jnp.int32(k_idx), side)
        acc = acc + ln_k
    gok = gok & in_data
    child = TracedChild(g, gok, inner, table, jnp.sum(nl), None, None)
    out = Val(
        ((offs2 - nl).astype(jnp.int64) << 32) | nl.astype(jnp.int64),
        validity, dt.List(inner), None, parts[0][0].domain, child,
    )
    if want_side:
        return out, side
    return out


@register("list.concat", _same, elementwise=False)
def _list_concat_ns(ctx, args, opts):
    return _list_concat_val(ctx, args, "list.concat")


@register("list.set_union", _same, elementwise=False)
def _list_set_union(ctx, args, opts):
    # union = first-occurrence dedup of the row-wise concat (host oracle
    # dedup_where semantics, null counted as a value) — compose the traced
    # concat with the traced unique(maintain_order)
    cat = _list_concat_val(ctx, args, "list.set_union")
    return _list_unique(ctx, [cat], {"maintain_order": True})


def _list_set_op(kind):
    @register(f"list.set_{kind}", _same, elementwise=False)
    def _(ctx, args, opts):
        import jax.numpy as jnp

        # concat with a/b provenance, sort by (segment, value), mark each
        # value-run with which sides contributed, keep run heads passing the
        # side predicate, compact in first-occurrence order (host oracle
        # dedup_where semantics; kept values of intersection/difference all
        # come from ``a``, whose elements sort first within equal keys, so
        # order matches the host's "first occurrence in a")
        cat, side = _list_concat_val(ctx, args, f"list.set_{kind}", want_side=True)
        n_parent = cat.values.shape[0]
        ch, _np2, g0, gok0, seg0, perm, words0, in_data, _lens = _sorted_gather(
            ctx, cat, f"list.set_{kind}", False
        )
        N = ch.values.shape[0]
        seg = seg0[perm]
        ind_s = in_data[perm]
        side_s = side[perm]  # cat's child IS contiguous, so positions align
        same_seg = jnp.concatenate([jnp.zeros((1,), bool), seg[1:] == seg[:-1]])
        weq = same_seg
        for w0 in words0:
            w = w0[perm]
            weq = weq & jnp.concatenate([jnp.zeros((1,), bool), w[1:] == w[:-1]])
        head = ind_s & ~weq
        rid = jnp.cumsum(head.astype(jnp.int32)) - 1
        rid = jnp.where(ind_s, rid, N)
        cnt0 = jnp.zeros((N,), jnp.int32).at[rid].add(
            (side_s == 0).astype(jnp.int32), mode="drop"
        )
        cnt1 = jnp.zeros((N,), jnp.int32).at[rid].add(
            (side_s > 0).astype(jnp.int32), mode="drop"
        )
        has0 = cnt0 > 0
        has1 = cnt1 > 0
        pred = {
            "intersection": has0 & has1,
            "difference": has0 & ~has1,
            "symmetric_difference": has0 ^ has1,
        }[kind]
        keep_sorted = head & pred[jnp.clip(rid, 0, N - 1)]
        keep = jnp.zeros((N,), bool).at[perm].set(keep_sorted, unique_indices=True)
        lens2 = jnp.zeros((n_parent,), jnp.int32).at[
            jnp.where(keep, seg0, n_parent)
        ].add(1, mode="drop")
        offs2 = jnp.cumsum(lens2)
        new_packed2 = ((offs2 - lens2).astype(jnp.int64) << 32) | lens2.astype(jnp.int64)
        pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
        _iota = jnp.arange(N, dtype=jnp.int32)
        tgt = jnp.where(keep, pos, N + _iota)
        out_g = jnp.zeros_like(g0).at[tgt].set(g0, mode="drop", unique_indices=True)
        out_ok = jnp.zeros((N,), bool).at[tgt].set(gok0, mode="drop", unique_indices=True)
        return _list_out(cat, ch, new_packed2, out_g, out_ok, jnp.sum(lens2))


_list_set_op("intersection")
_list_set_op("difference")
_list_set_op("symmetric_difference")


def _item_dt(dts, opts):
    d = dts[0]
    return d.inner if isinstance(d, (dt.List, dt.Array)) else dt.Unknown()


@register("list.item", _item_dt, elementwise=False)
def _list_item(ctx, args, opts):
    import jax.numpy as jnp

    from polars_tpu.engine.common import Val

    v = args[0]
    allow_empty = bool(opts.get("allow_empty", False))
    ch, ok = _traced_child(v, "list.item")
    starts, lens = _unpack(v.values)
    pm = ctx.rowmask
    if v.validity is not None:
        pm = pm & v.validity
    bad = lens > 1
    if not allow_empty:
        bad = bad | (lens == 0)
    ctx.add_flag(
        jnp.any(bad & pm),
        "can only call `.list.item()` on lists of length 1",
    )
    idx = jnp.clip(starts, 0, ch.values.shape[0] - 1)
    out = ch.values[idx]
    validity = ok[idx] & (lens > 0)
    if v.validity is not None:
        validity = validity & v.validity
    return Val(out, validity, v.dtype.inner, ch.table, v.domain, ch.child)


@register("list.gather", _same, elementwise=False)
def _list_gather(ctx, args, opts):
    import jax
    import jax.numpy as jnp

    v = args[0]
    ch, ok = _traced_child(v, "list.gather")
    null_on_oob = bool(opts.get("null_on_oob", False))
    starts_v, lens_v = _unpack(v.values)
    fixed = opts.get("indices")
    pm = ctx.rowmask
    if v.validity is not None:
        pm = pm & v.validity
    n_parent = v.values.shape[0]
    n_child = ch.values.shape[0]
    if fixed is not None:
        # literal index list: static output width per row
        import numpy as np

        fix = np.asarray(list(fixed), np.int32)
        k = len(fix)
        nl = jnp.where(pm, jnp.int32(k), 0)
        idx_of = lambda pc, within: jnp.asarray(fix)[jnp.clip(within, 0, max(k - 1, 0))]
        idx_ok = lambda pc, within: jnp.ones_like(within, bool)
    else:
        iv = args[1]
        ich, iok = _traced_child(iv, "list.gather")
        starts_i, lens_i = _unpack(iv.values)
        if iv.validity is not None:
            pm = pm & iv.validity
        nl = jnp.where(pm, lens_i, 0)

        def idx_of(pc, within):
            src = jnp.clip(starts_i[pc] + within, 0, ich.values.shape[0] - 1)
            return ich.values[src].astype(jnp.int32)

        def idx_ok(pc, within):
            src = jnp.clip(starts_i[pc] + within, 0, ich.values.shape[0] - 1)
            return iok[src]

    offs2 = jnp.cumsum(nl)
    if getattr(ctx, "flags", None) is not None:
        ctx.flags.append(offs2[-1] > jnp.int32(n_child))
    j = jax.lax.broadcasted_iota(jnp.int32, (n_child, 1), 0).squeeze(-1)
    in_data = j < offs2[-1]
    pc = jnp.clip(
        jnp.searchsorted(offs2, j, side="right").astype(jnp.int32), 0, n_parent - 1
    )
    within = j - (offs2[pc] - nl[pc])
    i = idx_of(pc, within)
    jj = jnp.where(i >= 0, i, lens_v[pc] + i)
    in_range = (jj >= 0) & (jj < lens_v[pc])
    src = jnp.clip(starts_v[pc] + jj, 0, n_child - 1)
    g = ch.values[src]
    iok_here = idx_ok(pc, within)
    gok = ok[src] & in_range & iok_here & in_data
    if not null_on_oob:
        ctx.add_flag(
            jnp.any(~in_range & iok_here & in_data),
            "gather index out of bounds for list",
        )
    new_packed = ((offs2 - nl).astype(jnp.int64) << 32) | nl.astype(jnp.int64)
    return _list_out(v, ch, new_packed, g, gok, jnp.sum(nl))


def _to_array_dt_early(dts, opts):
    d = dts[0]
    inner = d.inner if isinstance(d, (dt.List, dt.Array)) else dt.Unknown()
    return dt.Array(inner, int(opts.get("width", 0)))


@register("list.to_array", _to_array_dt_early, elementwise=False)
def _list_to_array(ctx, args, opts):
    import jax.numpy as jnp

    from polars_tpu.engine.common import Val

    v = args[0]
    width = int(opts.get("width", 0))
    _ch, _ok = _traced_child(v, "list.to_array")
    _starts, lens = _unpack(v.values)
    pm = ctx.rowmask
    if v.validity is not None:
        pm = pm & v.validity
    ctx.add_flag(
        jnp.any((lens != width) & pm),
        f"cannot convert list to array of width {width} (length mismatch)",
    )
    return Val(
        v.values, v.validity, dt.Array(v.dtype.inner, width), None, v.domain, v.child
    )


# --- TRACED list constructors: concat_list / concat_arr ----------------------
# Every row's list has the same length k, so the child layout is STATIC:
# child[i*k + j] = inputs[j][i]; packed word = (i*k)<<32 | k. Emitted via the
# run_segment child_outs protocol (reference: concat_list,
# polars-ops/src/chunked_array/list/ + horizontal_flatten).


def _concat_pack_dt(dts, opts):
    from polars_tpu.plan.schema_resolve import supertype

    st = dts[0].inner if isinstance(dts[0], dt.List) else dts[0]
    for d in dts[1:]:
        st = supertype(st, d.inner if isinstance(d, dt.List) else d)
    if opts.get("as_array"):
        return dt.Array(st, len(dts))
    return dt.List(st)


def _concat_list_impl(ctx, args, opts, as_array: bool):
    import jax.numpy as jnp

    from polars_tpu.engine.cast import cast_val
    from polars_tpu.engine.common import ROW, TracedChild, Val
    from polars_tpu.plan.schema_resolve import supertype

    if any(isinstance(a.dtype, (dt.List, dt.Array, dt.Struct)) for a in args):
        raise InvalidOperationError("concat_list of nested inputs is not supported yet")
    st = args[0].dtype
    for a in args[1:]:
        st = supertype(st, a.dtype)
    vals = [cast_val(a, st, strict=False) if a.dtype != st else a for a in args]
    if any(v.table is not None for v in vals):
        import numpy as np

        from polars_tpu.utils import strtable

        # fold all dictionaries into one canonical (sorted) table, then remap
        # every input's codes against it
        merged = vals[0].table or strtable.empty_table()
        for v in vals[1:]:
            merged, _, _ = strtable.unify(merged, v.table or strtable.empty_table())
        remapped = []
        for v in vals:
            src = v.table or strtable.empty_table()
            if src is merged:
                remapped.append(v)
                continue
            _, m, _ = strtable.unify(src, merged)
            if len(m) == 0:  # empty remap = identity (strtable convention)
                remapped.append(v.with_(table=merged))
                continue
            lut = jnp.asarray(m)
            codes = lut[jnp.clip(v.values, 0, len(m) - 1)]
            remapped.append(v.with_(values=codes, table=merged))
        vals = remapped
        table = merged
    else:
        table = None
    k = len(vals)
    n = ctx.padded
    stacked = jnp.stack(
        [jnp.broadcast_to(v.values, (n,)) for v in vals], axis=1
    ).reshape(n * k)
    ones = jnp.ones((n,), bool)
    cvalid = jnp.stack(
        [jnp.broadcast_to(v.validity, (n,)) if v.validity is not None else ones for v in vals],
        axis=1,
    ).reshape(n * k)
    import jax

    row = jax.lax.broadcasted_iota(jnp.int64, (n, 1), 0).squeeze(-1)
    packed = ((row * k) << 32) | jnp.int64(k)
    out_dt = dt.Array(st, k) if as_array else dt.List(st)
    child = TracedChild(stacked, cvalid, st, table, jnp.int32(n * k), None, None)
    return Val(packed, None, out_dt, None, ROW, child)


@register("concat_list", _concat_pack_dt, elementwise=False)
def _concat_list(ctx, args, opts):
    return _concat_list_impl(ctx, args, opts, as_array=bool(opts.get("as_array")))


def _struct_dt(dts, opts):
    names = opts.get("names") or [f"field_{i}" for i in range(len(dts))]
    return dt.Struct([(n, d) for n, d in zip(names, dts)])


def _field_dt(dts, opts):
    d = dts[0]
    if isinstance(d, dt.Struct):
        want = opts.get("name")
        for f in d.fields:
            if f.name == want:
                return f.dtype
    return dt.Unknown()


def _list_inner_dt(dts, opts):
    d = dts[0]
    return d.inner if isinstance(d, (dt.List, dt.Array)) else dt.Unknown()


def _struct_drop_dt(dts, opts):
    d = dts[0]
    if not isinstance(d, dt.Struct):
        return dt.Unknown()
    drop = set(opts.get("names", ()))
    return dt.Struct([(f.name, f.dtype) for f in d.fields if f.name not in drop])


def _rename_fields_dt(dts, opts):
    d = dts[0]
    if not isinstance(d, dt.Struct):
        return dt.Unknown()
    names = list(opts.get("names", ()))
    return dt.Struct(
        [(names[i] if i < len(names) else f.name, f.dtype) for i, f in enumerate(d.fields)]
    )


def _map_field_names_dt(dts, opts):
    d = dts[0]
    if not isinstance(d, dt.Struct):
        return dt.Unknown()
    kind = opts.get("kind")
    arg = opts.get("arg")
    ren = {
        "prefix": lambda n: f"{arg}{n}",
        "suffix": lambda n: f"{n}{arg}",
        "map": arg,
    }[kind]
    return dt.Struct([(ren(f.name), f.dtype) for f in d.fields])


register("struct.drop", _struct_drop_dt, elementwise=False)(_host("struct.drop"))
register("as_struct", _struct_dt, elementwise=False)(_host("as_struct"))
register("struct.field", _field_dt, elementwise=False)(_host("struct.field"))
register("struct.rename_fields", _rename_fields_dt, elementwise=False)(_host("struct.rename_fields"))
register("struct.map_field_names", _map_field_names_dt, elementwise=False)(
    _host("struct.map_field_names")
)


register("sample", _same, elementwise=False)(_host("sample"))
register("shuffle", _same, elementwise=False)(_host("shuffle"))
register("arg_where_self", dt.UInt32(), elementwise=False)(_host("arg_where_self"))


def _rle_dt(dts, opts):
    return dt.Struct([("len", dt.UInt32()), ("value", dts[0])])


register("rle", _rle_dt, elementwise=False)(_host("rle"))


# rolling_*_by are TRACED ops (engine/fn_position.py) since round 2 — the
# searchsorted-window core runs inside the fused segment, no host barrier.


# --- round-3 list namespace long tail (verdict #4): host ops + dtype rules ---
# Implementations live in ops/list_ops.py (run.py special-select dispatch);
# registrations here provide schema resolution. Reference:
# py-polars expr/list.py, plans/aexpr/function_expr/list.rs.


def _to_struct_dt(dts, opts):
    d = dts[0]
    inner = d.inner if isinstance(d, (dt.List, dt.Array)) else dt.Unknown()
    fields = opts.get("fields")
    if fields is not None and not callable(fields):
        return dt.Struct([(n, inner) for n in fields])
    ub = int(opts.get("upper_bound") or 0)
    if ub:
        return dt.Struct([(f"field_{i}", inner) for i in range(ub)])
    return dt.Struct([])


def _to_array_dt(dts, opts):
    d = dts[0]
    inner = d.inner if isinstance(d, (dt.List, dt.Array)) else dt.Unknown()
    return dt.Array(inner, int(opts.get("width", 0)))


for _name, _rule in (
    ("list.sample", _same),
    ("list.to_struct", _to_struct_dt),
):
    register(_name, _rule, elementwise=False)(_host(_name))


def _with_fields_dt(dts, opts):
    from polars_tpu.core.schema import Schema
    from polars_tpu.plan.schema_resolve import expr_dtype

    d = dts[0]
    if not isinstance(d, dt.Struct):
        return dt.Unknown()
    fields = {f.name: f.dtype for f in d.fields}
    fschema = Schema(fields)
    from polars_tpu.plan import exprs as E

    for node in opts.get("exprs", ()):
        try:
            fields[E.output_name(node) or "literal"] = expr_dtype(node, fschema)
        except Exception:  # noqa: BLE001
            fields[E.output_name(node) or "literal"] = dt.Unknown()
    return dt.Struct(list(fields.items()))


register("struct.with_fields", _with_fields_dt, elementwise=False)(_host("struct.with_fields"))
register("struct.json_encode", dt.String(), elementwise=False)(_host("struct.json_encode"))
