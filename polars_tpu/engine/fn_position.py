"""Position-dependent ops: shift, diff, cumulative, rolling, rank, fills.

Reference kernels: polars-ops/src/series/ops/{cum_agg,diff,pct_change,rank}.rs,
polars-compute/src/rolling/. All implementations are segment-aware: in window
(`over()`) context they respect group boundaries by operating on rows sorted by
(gid, original position) and masking cross-group leakage.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from polars_tpu.kernels.fastmath import div_any, floordiv_const, mod_const

from polars_tpu import datatypes as dt
from polars_tpu.engine.common import GROUP, ROW, Val, combine_validity
from polars_tpu.engine.cast import cast_val
from polars_tpu.engine.registry import BOOL, FLOAT, SAME, register
from polars_tpu.errors import InvalidOperationError


def _group_order(ctx):
    """(sort_to_row perm, gid_sorted) when in window context, else None."""
    g = ctx.groups
    if g is None:
        return None
    from polars_tpu.kernels.argsort import stable_argsort_words

    n = g.gids.shape[0]
    # masked rows sort last via a sentinel gid (capacity <= n < 2^31 - 1)
    key = jnp.where(ctx.rowmask, g.gids, 2**31 - 1)
    words = [key] + (g.order_words or [])
    perm = stable_argsort_words(words)
    return perm, g.gids[perm]


def _row_domain(ctx, v: Val) -> Val:
    if v.domain == "scalar":
        return Val(
            jnp.broadcast_to(v.values, (ctx.padded,)),
            None if v.validity is None else jnp.broadcast_to(v.validity, (ctx.padded,)),
            v.dtype, v.table, ROW,
        )
    if v.domain != ROW:
        raise InvalidOperationError("positional ops need a row-domain input")
    return v


def _apply_in_group_order(ctx, v: Val, fn):
    """Run fn(values, validity, seg_ids) over rows arranged in group order.

    Outside window context, all rows form one segment in original order.
    """
    n = v.values.shape[0]
    order = _group_order(ctx)
    if order is None:
        seg = jnp.zeros((n,), jnp.int32)
        out_vals, out_valid = fn(v.values, v.validity, seg, ctx.rowmask)
        return v.with_(values=out_vals, validity=out_valid)
    perm, gs = order
    vals = v.values[perm]
    valid = None if v.validity is None else v.validity[perm]
    mask = ctx.rowmask[perm]
    out_vals, out_valid = fn(vals, valid, gs, mask)
    inv_vals = jnp.zeros_like(out_vals).at[perm].set(out_vals, unique_indices=True)
    inv_valid = None
    if out_valid is not None:
        inv_valid = jnp.zeros(out_valid.shape, bool).at[perm].set(out_valid, unique_indices=True)
    return Val(inv_vals, inv_valid, v.dtype, v.table, ROW)


def _seg_boundary(seg: jax.Array) -> jax.Array:
    n = seg.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    return (iota == 0) | (seg != jnp.roll(seg, 1))


@register("shift", SAME, elementwise=False)
def _shift(ctx, args, opts):
    v = _row_domain(ctx, args[0])
    n_sh = opts.get("n", 1)

    def fn(vals, valid, seg, mask):
        n = vals.shape[0]
        iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
        shifted = jnp.roll(vals, n_sh)
        valid_arr = mask if valid is None else (valid & mask)
        sh_valid = jnp.roll(valid_arr, n_sh)
        seg_src = jnp.roll(seg, n_sh)
        in_bounds = (iota >= n_sh) if n_sh >= 0 else (iota < n + n_sh)
        ok = in_bounds & (seg_src == seg)
        return jnp.where(ok, shifted, jnp.zeros((), vals.dtype)), ok & sh_valid

    return _apply_in_group_order(ctx, v, fn)


@register("shift_fill", SAME, elementwise=False)
def _shift_fill(ctx, args, opts):
    v = _row_domain(ctx, args[0])
    fill = args[1]
    n_sh = opts.get("n", 1)

    def fn(vals, valid, seg, mask):
        n = vals.shape[0]
        iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
        shifted = jnp.roll(vals, n_sh)
        valid_arr = mask if valid is None else (valid & mask)
        sh_valid = jnp.roll(valid_arr, n_sh)
        seg_src = jnp.roll(seg, n_sh)
        in_bounds = (iota >= n_sh) if n_sh >= 0 else (iota < n + n_sh)
        # a masked-out source row (padding / other segment) vacates the slot
        # -> fill; a genuine null source shifts through as null
        ok = in_bounds & (seg_src == seg) & jnp.roll(mask, n_sh)
        fv = jnp.broadcast_to(fill.values.astype(vals.dtype), vals.shape)
        out = jnp.where(ok, shifted, fv)
        out_valid = jnp.where(ok, sh_valid, True)
        return out, out_valid if valid is not None else None

    return _apply_in_group_order(ctx, v, fn)


def _diff_dtype(dts, opts):
    """Reference: function_expr/schema.rs Diff — unsigned widens to signed,
    temporal becomes Duration."""
    d = dts[0]
    name = type(d).__name__
    if name == "Datetime":
        return dt.Duration(d.time_unit)
    if name == "Date":
        return dt.Duration("us")
    if name == "Time":
        return dt.Duration("ns")
    if name == "UInt8":
        return dt.Int16()
    if name == "UInt16":
        return dt.Int32()
    if name in ("UInt32", "UInt64"):
        return dt.Int64()
    return d


@register("diff", _diff_dtype, elementwise=False)
def _diff(ctx, args, opts):
    v = _row_domain(ctx, args[0])
    n_sh = opts.get("n", 1)
    out_dt = _diff_dtype([v.dtype], opts)
    scale = 1
    if v.dtype.is_temporal():
        # physical int64 difference; Date diffs (days) scale to us
        scale = 86_400_000_000 if type(v.dtype).__name__ == "Date" else 1
        v = v.with_(values=v.values.astype(jnp.int64), dtype=dt.Int64())
    elif out_dt != v.dtype:
        v = cast_val(v, out_dt, strict=False)

    def fn(vals, valid, seg, mask):
        n = vals.shape[0]
        iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
        prev = jnp.roll(vals, n_sh)
        valid_arr = mask if valid is None else (valid & mask)
        prev_valid = jnp.roll(valid_arr, n_sh)
        seg_src = jnp.roll(seg, n_sh)
        in_bounds = (iota >= n_sh) if n_sh >= 0 else (iota < n + n_sh)
        ok = in_bounds & (seg_src == seg) & prev_valid & valid_arr
        return jnp.where(ok, vals - prev, jnp.zeros((), vals.dtype)), ok

    res = _apply_in_group_order(ctx, v, fn)
    if scale != 1:
        res = res.with_(values=res.values * jnp.int64(scale))
    return res.with_(dtype=out_dt)


@register("pct_change", FLOAT, elementwise=False)
def _pct_change(ctx, args, opts):
    v = _row_domain(ctx, args[0])
    n_sh = opts.get("n", 1)
    acc = jnp.float32 if isinstance(v.dtype, dt.Float32) else jnp.float64

    def fn(vals, valid, seg, mask):
        n = vals.shape[0]
        x = vals.astype(acc)
        iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
        prev = jnp.roll(x, n_sh)
        valid_arr = mask if valid is None else (valid & mask)
        prev_valid = jnp.roll(valid_arr, n_sh)
        seg_src = jnp.roll(seg, n_sh)
        ok = (iota >= n_sh) & (seg_src == seg) & prev_valid & valid_arr & (prev != 0)
        return jnp.where(ok, div_any(x, prev) - 1.0, 0.0), ok

    out = _apply_in_group_order(ctx, v, fn)
    return out.with_(dtype=dt.Float32() if acc == jnp.float32 else dt.Float64())


def _cum(kind: str, dtype_rule):
    @register(f"cum_{kind}", dtype_rule, elementwise=False)
    def _(ctx, args, opts):
        v = _row_domain(ctx, args[0])
        reverse = opts.get("reverse", False)
        out_dt_pre = dtype_rule([v.dtype], opts) if callable(dtype_rule) else dtype_rule
        if kind in ("sum", "prod") and out_dt_pre != v.dtype:
            # accumulate in the widened dtype to avoid overflow
            v = v.with_(
                values=v.values.astype(jnp.dtype(dt.dtype_to_numpy(out_dt_pre))),
                dtype=out_dt_pre,
            )

        def fn(vals, valid, seg, mask):
            n = vals.shape[0]
            valid_arr = mask if valid is None else (valid & mask)
            if kind == "count":
                x = valid_arr.astype(jnp.uint32)
            else:
                ident = {
                    "sum": jnp.zeros((), vals.dtype),
                    "prod": jnp.ones((), vals.dtype),
                    "min": _pos_inf(vals.dtype),
                    "max": _neg_inf(vals.dtype),
                }[kind]
                x = jnp.where(valid_arr, vals, ident)
            if reverse:
                x = x[::-1]
                seg_ = seg[::-1]
            else:
                seg_ = seg
            scan_kind = "sum" if kind == "count" else kind
            out = _segmented_scan(x, seg_, scan_kind)
            if reverse:
                out = out[::-1]
            if kind == "count":
                return out, None
            return jnp.where(valid_arr, out, jnp.zeros((), vals.dtype)), (
                None if valid is None else valid
            )

        out_dt = dtype_rule([v.dtype], opts) if callable(dtype_rule) else dtype_rule
        res = _apply_in_group_order(ctx, v, fn)
        if kind == "count":
            res = Val(res.values, res.validity, out_dt, None, res.domain)
        elif out_dt != v.dtype:
            res = Val(
                res.values.astype(jnp.dtype(dt.dtype_to_numpy(out_dt))),
                res.validity, out_dt, None, res.domain,
            )
        return res


def _pos_inf(dtype):
    if jnp.dtype(dtype).kind == "f":
        return jnp.asarray(jnp.inf, dtype)
    return jnp.asarray(jnp.iinfo(dtype).max, dtype)


def _neg_inf(dtype):
    if jnp.dtype(dtype).kind == "f":
        return jnp.asarray(-jnp.inf, dtype)
    return jnp.asarray(jnp.iinfo(dtype).min, dtype)


def _seg_start_gather(carry: jax.Array, seg: jax.Array) -> jax.Array:
    """Value of ``carry`` at each row's segment start."""
    n = carry.shape[0]
    boundary = _seg_boundary(seg)
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    start_idx = jnp.maximum.accumulate if False else None
    starts = jnp.where(boundary, iota, 0)
    start_of_row = jax.lax.associative_scan(jnp.maximum, starts)
    return carry[start_of_row]


def _segmented_scan(x: jax.Array, seg: jax.Array, kind: str) -> jax.Array:
    """Segmented inclusive scan via associative_scan over (value, boundary)."""
    boundary = _seg_boundary(seg)

    op = {
        "sum": lambda a, b: a + b,
        "prod": lambda a, b: a * b,
        "min": jnp.minimum,
        "max": jnp.maximum,
    }[kind]

    def combine(a, b):
        av, ab = a
        bv, bb = b
        return (jnp.where(bb, bv, op(av, bv)), ab | bb)

    out, _ = jax.lax.associative_scan(combine, (x, boundary))
    return out


def _cum_dtype_sum(dts, opts):
    d = dts[0]
    if isinstance(d, dt.Boolean):
        return dt.UInt32()
    if type(d).__name__ in ("Int8", "Int16", "UInt8", "UInt16"):
        return dt.Int64()
    return d


_cum("sum", _cum_dtype_sum)
_cum("prod", lambda dts, opts: dt.Int64() if dts[0].is_integer() else dts[0])
_cum("min", SAME)
_cum("max", SAME)
_cum("count", lambda dts, opts: dt.UInt32())


@register("reverse", SAME, elementwise=False)
def _reverse(ctx, args, opts):
    # reverse the in-mask rows (per group in window context) via a compact
    # slot permutation: robust to padding and non-contiguous row masks
    v = _row_domain(ctx, args[0])
    vals, valid = v.values, v.validity
    n = vals.shape[0]
    mask = ctx.rowmask
    seg = ctx.groups.gids if ctx.groups is not None else jnp.zeros((n,), jnp.int32)
    from polars_tpu.kernels.argsort import stable_argsort_words

    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    key = jnp.where(mask, seg, 2**31 - 1)
    perm = stable_argsort_words([key])
    seg_s = seg[perm]
    mask_s = mask[perm]
    first = iota == 0
    boundary = mask_s & (first | (seg_s != jnp.roll(seg_s, 1)) | ~jnp.roll(mask_s, 1))
    starts = jnp.where(boundary, iota, 0)
    seg_start = jax.lax.associative_scan(jnp.maximum, starts)
    seg_len = jnp.zeros((n,), jnp.int32).at[seg_start].add(mask_s.astype(jnp.int32))
    seg_end = seg_start + seg_len[seg_start] - 1
    src_slot = jnp.clip(seg_end - (iota - seg_start), 0, n - 1)
    src_row = perm[src_slot]
    out_compact = vals[src_row]
    out = jnp.zeros_like(vals).at[perm].set(out_compact, unique_indices=True)
    out_valid = None
    if valid is not None:
        ov = valid[src_row]
        out_valid = jnp.zeros((n,), bool).at[perm].set(ov, unique_indices=True)
    return Val(out, out_valid, v.dtype, v.table, ROW)


@register("forward_fill", SAME, elementwise=False)
def _forward_fill(ctx, args, opts):
    v = _row_domain(ctx, args[0])
    if v.validity is None:
        return v

    def fn(vals, valid, seg, mask):
        if valid is None:
            return vals, None
        n = vals.shape[0]
        iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
        boundary = _seg_boundary(seg)
        # last valid index at or before each row, within segment
        cand = jnp.where(valid, iota, -1)
        cand = jnp.where(boundary, jnp.where(valid, iota, -1), cand)

        def combine(a, b):
            av, ab = a
            bv, bb = b
            return (jnp.where(bb, bv, jnp.maximum(av, bv)), ab | bb)

        src, _ = jax.lax.associative_scan(combine, (cand, boundary))
        ok = src >= 0
        limit = opts.get("limit")
        if limit is not None:
            ok = ok & ((iota - src) <= jnp.int32(limit))
        out = vals[jnp.maximum(src, 0)]
        return jnp.where(ok, out, jnp.zeros((), vals.dtype)), ok

    return _apply_in_group_order(ctx, v, fn)


@register("backward_fill", SAME, elementwise=False)
def _backward_fill(ctx, args, opts):
    v = _row_domain(ctx, args[0])
    if v.validity is None:
        return v

    def fn(vals, valid, seg, mask):
        if valid is None:
            return vals, None
        rvals = vals[::-1]
        rvalid = valid[::-1]
        rseg = seg[::-1]
        n = vals.shape[0]
        iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
        boundary = _seg_boundary(rseg)
        cand = jnp.where(rvalid, iota, -1)

        def combine(a, b):
            av, ab = a
            bv, bb = b
            return (jnp.where(bb, bv, jnp.maximum(av, bv)), ab | bb)

        src, _ = jax.lax.associative_scan(combine, (cand, boundary))
        ok = src >= 0
        limit = opts.get("limit")
        if limit is not None:
            ok = ok & ((iota - src) <= jnp.int32(limit))
        out = rvals[jnp.maximum(src, 0)]
        return jnp.where(ok, out, jnp.zeros((), vals.dtype))[::-1], ok[::-1]

    return _apply_in_group_order(ctx, v, fn)


def _interpolate_dt(dts, opts):
    # linear on ints -> Float64; nearest keeps the dtype (reference:
    # Expr.interpolate return types)
    d = dts[0]
    if opts.get("method", "linear") == "linear" and d.is_integer():
        return dt.Float64()
    return d


@register("interpolate", _interpolate_dt, elementwise=False)
def _interpolate(ctx, args, opts):
    v = _row_domain(ctx, args[0])
    if v.validity is None:
        if v.dtype.is_integer() and opts.get("method", "linear") == "linear":
            return v.with_(values=v.values.astype(jnp.float64), dtype=dt.Float64())
        return v
    if not v.dtype.is_numeric():
        return v

    def fn(vals, valid, seg, mask):
        n = vals.shape[0]
        x = vals.astype(jnp.float64)
        iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
        boundary = _seg_boundary(seg)

        def combine(a, b):
            av, ab = a
            bv, bb = b
            return (jnp.where(bb, bv, jnp.maximum(av, bv)), ab | bb)

        prev_i, _ = jax.lax.associative_scan(combine, (jnp.where(valid, iota, -1), boundary))
        rboundary = _seg_boundary(seg[::-1])
        next_rev, _ = jax.lax.associative_scan(
            combine, (jnp.where(valid[::-1], iota, -1), rboundary)
        )
        next_i = jnp.where(next_rev[::-1] >= 0, n - 1 - next_rev[::-1], -1)
        has_prev = prev_i >= 0
        has_next = next_i >= 0
        p = jnp.maximum(prev_i, 0)
        q = jnp.maximum(next_i, 0)
        frac = jnp.where(q > p, div_any((iota - p).astype(jnp.float64), jnp.maximum(q - p, 1).astype(jnp.float64)), 0.0)
        if opts.get("method", "linear") == "nearest":
            interp = jnp.where(frac < 0.5, x[p], x[q])
        else:
            interp = x[p] + (x[q] - x[p]) * frac
        out = jnp.where(valid, x, interp)
        ok = valid | (has_prev & has_next)
        return out.astype(vals.dtype) if vals.dtype.kind == "f" else out, ok

    out = _apply_in_group_order(ctx, v, fn)
    if v.dtype.is_integer():
        if opts.get("method", "linear") == "nearest":
            # nearest keeps the integer dtype; values are picked, not blended
            return out.with_(values=out.values.astype(v.values.dtype), dtype=v.dtype)
        return out.with_(values=out.values.astype(jnp.float64), dtype=dt.Float64())
    return out


@register("rank", lambda dts, opts: dt.Float64() if opts.get("method", "average") == "average" else dt.UInt32(), elementwise=False)
def _rank(ctx, args, opts):
    v = _row_domain(ctx, args[0])
    method = opts.get("method", "average")
    descending = opts.get("descending", False)
    from polars_tpu.kernels.argsort import (
        boundaries_from_words,
        key_words,
        stable_argsort_words,
    )

    n = v.values.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    oob = ~ctx.rowmask | (jnp.zeros((n,), bool) if v.validity is None else ~v.validity)
    grouped = ctx.groups is not None
    gid_words = []
    if grouped:
        # segmented rank: group id is the leading sort word, ranks restart at
        # each group (reference: rank inside WindowExpr partitions)
        gid_words = [jnp.where(ctx.rowmask, ctx.groups.gids, 2**31 - 1)]
    tie_words = []
    if method == "random":
        # seeded pseudorandom tie-break word, then ordinal rank (reference
        # rank method="random"); splitmix-style position hash so a seed gives
        # a deterministic permutation
        seed = opts.get("seed")
        seed = 0 if seed is None else int(seed)
        h = (iota.astype(jnp.uint32) + jnp.uint32(seed * 2654435761 & 0xFFFFFFFF)) * jnp.uint32(2654435761)
        h = h ^ (h >> 16)
        h = h * jnp.uint32(0x45D9F3B)
        h = h ^ (h >> 16)
        tie_words = [h.astype(jnp.int32)]
        method = "ordinal"
    from polars_tpu.engine.strings import ensure_ordinal_val

    v = ensure_ordinal_val(v)
    words = [oob.astype(jnp.int8), *gid_words, *key_words(v.values, v.dtype, descending=descending), *tie_words]
    perm = stable_argsort_words(words)
    pos = iota + 1  # 1-based rank in sorted order
    newval = boundaries_from_words(words, perm)
    if grouped:
        sg = gid_words[0][perm]
        grp_change = (iota == 0) | (sg != jnp.roll(sg, 1))
        grp_start = jax.lax.associative_scan(jnp.maximum, jnp.where(grp_change, pos, 0))
    else:
        grp_start = jnp.ones((n,), jnp.int32)
    local = lambda p: (p - grp_start + 1).astype(jnp.float64)  # noqa: E731
    if method == "ordinal":
        rank_sorted = local(pos)
    else:
        run_start = jax.lax.associative_scan(jnp.maximum, jnp.where(newval, pos, 0))
        if method == "min":
            rank_sorted = local(run_start)
        else:
            run_len = jnp.zeros((n,), jnp.int32).at[run_start - 1].add(1)
            run_end = run_start + run_len[run_start - 1] - 1
            if method == "max":
                rank_sorted = local(run_end)
            elif method == "dense":
                dense = jnp.cumsum(newval.astype(jnp.int32))
                if grouped:
                    dense_at_start = jax.lax.associative_scan(
                        jnp.maximum, jnp.where(grp_change, dense, 0)
                    )
                    rank_sorted = (dense - dense_at_start + 1).astype(jnp.float64)
                else:
                    rank_sorted = dense.astype(jnp.float64)
            else:  # average
                rank_sorted = (local(run_start) + local(run_end)) * 0.5
    out = jnp.zeros((n,), jnp.float64).at[perm].set(rank_sorted, unique_indices=True)
    validity = v.validity
    if method == "average":
        return Val(out, validity, dt.Float64(), None, ROW)
    return Val(out.astype(jnp.uint32), validity, dt.UInt32(), None, ROW)


@register("arg_sort", dt.UInt32(), elementwise=False)
def _arg_sort(ctx, args, opts):
    v = _row_domain(ctx, args[0])
    from polars_tpu.engine.strings import ensure_ordinal_val

    v = ensure_ordinal_val(v)
    descending = opts.get("descending", False)
    nulls_last = opts.get("nulls_last", False)
    from polars_tpu.kernels.argsort import key_words, stable_argsort_words

    n = v.values.shape[0]
    if v.validity is None:
        null_rank = jnp.ones((n,), jnp.int8)
    else:
        null_rank = jnp.where(v.validity, 1, 2 if nulls_last else 0).astype(jnp.int8)
    null_rank = jnp.where(ctx.rowmask, null_rank, 3)
    words = [null_rank, *key_words(v.values, v.dtype, descending=descending)]
    perm = stable_argsort_words(words)
    return Val(perm.astype(jnp.uint32), None, dt.UInt32(), None, ROW)


def _rolling(kind: str, dtype_rule):
    @register(f"rolling_{kind}", dtype_rule, elementwise=False)
    def _(ctx, args, opts):
        v = _row_domain(ctx, args[0])
        w = opts["window_size"]
        min_samples = opts.get("min_samples") or w
        center = opts.get("center", False)
        acc_t = jnp.float32 if isinstance(v.dtype, dt.Float32) else jnp.float64
        n = v.values.shape[0]
        valid = ctx.rowmask if v.validity is None else (ctx.rowmask & v.validity)
        vals = v.values
        order = _group_order(ctx)
        seg = None
        if order is not None:
            # window context: arrange rows in group order; windows never
            # cross a segment (group) boundary
            perm, seg = order
            vals = vals[perm]
            valid = valid[perm]
        x = jnp.where(valid, vals.astype(acc_t), 0.0)
        offs = (w - 1) // 2 if center else 0

        def window_stack():
            cols = []
            for i in range(w):
                sh = i - (w - 1) + offs
                m = jnp.roll(valid, -sh) & _inb(n, -sh)
                if seg is not None:
                    m = m & (jnp.roll(seg, -sh) == seg)
                cols.append((jnp.roll(x, -sh), m))
            return cols

        cols = window_stack()
        vs = jnp.stack([c[0] for c in cols])
        ms = jnp.stack([c[1] for c in cols])
        cnt = jnp.sum(ms, axis=0)
        wts = opts.get("weights")
        if wts is not None:
            # weighted rolling (reference: rolling_apply_weights,
            # polars-compute/src/rolling/no_nulls/mod.rs:82 — stack index i
            # maps to weights[i]; truncated start windows naturally use the
            # weights tail). Nulls are unsupported, like the reference's
            # nulls-path panic — flagged in-trace.
            if len(wts) != w:
                raise InvalidOperationError(
                    f"rolling_{kind}: weights length {len(wts)} must equal "
                    f"window_size {w}"
                )
            if v.validity is not None:
                ctx.add_flag(
                    jnp.any(ctx.rowmask & ~v.validity),
                    f"rolling_{kind}: weights are not supported on columns "
                    "with null values",
                )
            wvec = jnp.asarray([float(x) for x in wts], acc_t)[:, None]
            vsw = vs * wvec
            if kind == "sum":
                out = jnp.sum(jnp.where(ms, vsw, 0.0), axis=0)
            elif kind == "mean":
                wsum = jnp.sum(
                    jnp.where(ms, jnp.broadcast_to(wvec, ms.shape), 0.0), axis=0
                )
                out = div_any(
                    jnp.sum(jnp.where(ms, vsw, 0.0), axis=0),
                    jnp.where(wsum == 0.0, 1.0, wsum),
                )
            elif kind == "min":
                out = jnp.min(jnp.where(ms, vsw, jnp.inf), axis=0)
            elif kind == "max":
                out = jnp.max(jnp.where(ms, vsw, -jnp.inf), axis=0)
            elif kind in ("std", "var"):
                # reference compute_var_weights: single pass, ddof IGNORED
                wsum = jnp.sum(
                    jnp.where(ms, jnp.broadcast_to(wvec, ms.shape), 0.0), axis=0
                )
                safe = jnp.where(wsum == 0.0, 1.0, wsum)
                wssq = jnp.sum(jnp.where(ms, vs * vsw, 0.0), axis=0)
                wmean = div_any(jnp.sum(jnp.where(ms, vsw, 0.0), axis=0), safe)
                out = div_any(wssq, safe) - wmean * wmean
                if kind == "std":
                    out = jnp.sqrt(jnp.maximum(out, 0.0))
            else:
                raise InvalidOperationError(
                    f"rolling_{kind} does not support weights"
                )
            ok = cnt >= min_samples
            if order is not None:
                out = jnp.zeros_like(out).at[perm].set(out, unique_indices=True)
                ok = jnp.zeros(ok.shape, bool).at[perm].set(ok, unique_indices=True)
            out_dt = dt.Float32() if acc_t == jnp.float32 else dt.Float64()
            return Val(out, ok, out_dt, None, ROW)
        if kind == "sum":
            out = jnp.sum(jnp.where(ms, vs, 0.0), axis=0)
        elif kind == "mean":
            out = div_any(jnp.sum(jnp.where(ms, vs, 0.0), axis=0), jnp.maximum(cnt, 1).astype(acc_t))
        elif kind == "min":
            out = jnp.min(jnp.where(ms, vs, jnp.inf), axis=0)
        elif kind == "max":
            out = jnp.max(jnp.where(ms, vs, -jnp.inf), axis=0)
        elif kind in ("std", "var"):
            ddof = opts.get("ddof", 1)
            s = jnp.sum(jnp.where(ms, vs, 0.0), axis=0)
            mean = div_any(s, jnp.maximum(cnt, 1).astype(acc_t))
            d2 = jnp.sum(jnp.where(ms, (vs - mean) ** 2, 0.0), axis=0)
            out = div_any(d2, jnp.maximum(cnt - ddof, 1).astype(acc_t))
            if kind == "std":
                out = jnp.sqrt(out)
        elif kind in ("skew", "kurtosis"):
            c = jnp.maximum(cnt, 1).astype(acc_t)
            mean = div_any(jnp.sum(jnp.where(ms, vs, 0.0), axis=0), c)
            d = jnp.where(ms, vs - mean, 0.0)
            m2 = div_any(jnp.sum(d**2, axis=0), c)
            if kind == "skew":
                m3 = div_any(jnp.sum(d**3, axis=0), c)
                out = div_any(m3, jnp.maximum(m2, 1e-300) ** 1.5)
                if not opts.get("bias", True):
                    cc = c
                    out = out * jnp.sqrt(cc * (cc - 1)) * div_any(1.0, jnp.maximum(cc - 2, 1))
            else:
                m4 = div_any(jnp.sum(d**4, axis=0), c)
                out = div_any(m4, jnp.maximum(m2, 1e-300) ** 2) - 3.0
        ok = cnt >= min_samples
        if order is not None:
            # scatter back from group order to row order
            out = jnp.zeros_like(out).at[perm].set(out, unique_indices=True)
            ok = jnp.zeros(ok.shape, bool).at[perm].set(ok, unique_indices=True)
        if kind in ("sum",) and v.dtype.is_integer():
            return Val(out.astype(v.values.dtype), ok, v.dtype, None, ROW)
        if kind in ("min", "max") and not v.dtype.is_float():
            return Val(out.astype(v.values.dtype), ok, v.dtype, None, ROW)
        out_dt = dt.Float32() if acc_t == jnp.float32 else dt.Float64()
        return Val(out, ok, out_dt, None, ROW)


def _inb(n: int, shift: int) -> jax.Array:
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    if shift <= 0:
        return iota >= -shift
    return iota < n - shift


def _rolling_by(kind: str, dtype_rule):
    """Traced time-window rolling (``rolling_{kind}_by``): windows located by
    searchsorted over the sorted time key, prefix-sum range aggregations —
    runs INSIDE the fused segment (reference: polars-time/src/windows/; the
    round-1 host fallback cost one 26ms barrier per call on the real TPU)."""

    @register(f"rolling_{kind}_by", dtype_rule, elementwise=False)
    def _(ctx, args, opts):
        from polars_tpu.engine.rolling import rolling_window_core

        v = _row_domain(ctx, args[0])
        b = _row_domain(ctx, args[1])
        if not (b.dtype.is_temporal() or b.dtype.is_integer()):
            raise InvalidOperationError(
                f"rolling_{kind}_by needs a temporal/integer 'by' column, got {b.dtype}"
            )
        from polars_tpu.lazyframe import LazyGroupByDynamic

        ticks = LazyGroupByDynamic._ticks(opts["window_size"], b.dtype)
        valid = ctx.rowmask if b.validity is None else (ctx.rowmask & b.validity)
        n = b.values.shape[0]
        kinds = ((kind, opts.get("min_samples") or 1, opts.get("ddof", 1)),)
        if ctx.groups is not None:
            # composite-key stride computed IN-TRACE (no readback); overflow
            # goes through the count-sync error channel
            t64 = b.values.astype(jnp.int64)
            tmin = jnp.min(jnp.where(valid, t64, jnp.iinfo(jnp.int64).max))
            tmax = jnp.max(jnp.where(valid, t64, jnp.iinfo(jnp.int64).min))
            span = jnp.maximum(tmax - tmin, 0)
            k_stride = span + jnp.int64(2 * abs(int(ticks)) + 4)
            cap = ctx.groups.capacity
            ctx.add_flag(
                k_stride > (jnp.int64(1) << 62) // jnp.int64(max(cap, 1)),
                "rolling over groups: time span times group count exceeds "
                "the composite key range",
            )
            gid = ctx.groups.gids.astype(jnp.int64)
            has_gid = True
        else:
            gid = jnp.zeros((n,), jnp.int64)
            k_stride = jnp.int64(0)
            has_gid = False
        ((out, ok),) = rolling_window_core(
            b.values, gid, valid, k_stride,
            ((v.values, v.validity),),
            period=ticks, offset=-ticks, closed=opts.get("closed") or "right",
            kinds=kinds, has_gid=has_gid,
        )
        if kind == "count":
            return Val(out, ok, dt.UInt32(), None, ROW)
        if kind in ("sum", "min", "max", "first", "last"):
            return Val(out.astype(v.values.dtype), ok, v.dtype, None, ROW)
        # mean/std/var follow the FLOAT rule (f32 in -> f32 out)
        if isinstance(v.dtype, dt.Float32):
            return Val(out.astype(jnp.float32), ok, dt.Float32(), None, ROW)
        return Val(out, ok, dt.Float64(), None, ROW)


def _rolling_by_count_dt(dts, opts):
    return dt.UInt32()


for _k in ("sum", "min", "max", "first", "last"):
    _rolling_by(_k, SAME)
for _k in ("mean", "std", "var"):
    _rolling_by(_k, FLOAT)
_rolling_by("count", _rolling_by_count_dt)


_rolling("sum", SAME)
_rolling("mean", FLOAT)
_rolling("min", SAME)
_rolling("max", SAME)
_rolling("std", FLOAT)
_rolling("var", FLOAT)
_rolling("skew", FLOAT)
_rolling("kurtosis", FLOAT)


def _lin_scan(contrib, factor):
    """Inclusive scan of y_i = contrib_i + factor_i * y_{i-1}; a zero factor
    at a row cuts all history before it (the segment-reset trick)."""

    def comb(c1, c2):
        y1, f1 = c1
        y2, f2 = c2
        # a zero right-factor is a hard reset: select y2 directly instead of
        # y1*0 + y2 so NaN history cannot leak across segment boundaries
        # (0 * NaN = NaN would otherwise poison every later segment)
        return (jnp.where(f2 == 0.0, y2, y1 * f2 + y2), f1 * f2)

    y, _ = jax.lax.associative_scan(comb, (contrib, factor))
    return y


def _ewm_impl(ctx, args, opts, want):
    """EWM mean/var as the reference's EXACT state recurrences
    (polars-compute/src/ewm/{mean,cov}.rs) vectorized into linear scans:
    every update is y' = f_t*y + b_t with position-dependent coefficients,
    so the whole column is one associative scan per state variable. For
    adjust=False the weight resets to 1 and weight_sum renormalizes by
    new_weight each valid step — NOT a fixed-weights model (the pandas
    adjust=False identity breaks across null gaps)."""
    v = _row_domain(ctx, args[0])
    a = _ewm_alpha(opts, f"ewm_{want}")
    adjust = bool(opts.get("adjust", True))
    bias = bool(opts.get("bias", False))
    ignore_nulls = bool(opts.get("ignore_nulls", False))
    minp = max(int(opts.get("min_samples", 1) or 1), 1)
    ow = 1.0 if adjust else a

    def fn(vals, valid, seg, mask):
        x = vals.astype(jnp.float64)
        valid_arr = mask if valid is None else (valid & mask)
        bnd = _seg_boundary(seg)
        cnt = _segmented_scan(valid_arr.astype(jnp.int32), seg, "sum")
        first = valid_arr & (cnt == 1)
        upd = valid_arr & ~first
        # a position decays the running weights when it holds a value, or
        # unconditionally unless ignore_nulls (mean.rs:67) — but never the
        # INITIALIZING position (the init branch skips the decay)
        dec_pos = (valid_arr if ignore_nulls else mask) & ~first
        dec = jnp.where(dec_pos, 1.0 - a, 1.0)
        xc = jnp.where(valid_arr, x, 0.0)

        def scan(bias_t, factor_t):
            return _lin_scan(bias_t, jnp.where(bnd, 0.0, factor_t))

        # raw weight accumulator: += ow per valid (adjust) / reset to 1
        # (not adjust); decays at dec positions. Seeded with 1 at the first.
        if adjust:
            w_acc = scan(
                jnp.where(first, 1.0, jnp.where(upd, ow, 0.0)), dec
            )
        else:
            w_acc = scan(
                jnp.where(valid_arr, 1.0, 0.0),
                jnp.where(valid_arr, 0.0, dec),
            )
        w_prev = jnp.where(bnd, 0.0, jnp.roll(w_acc, 1))
        w_pre = jnp.where(upd, w_prev * (1.0 - a), 0.0)
        nw = w_pre + ow
        c = jnp.where(valid_arr, div_any(jnp.full_like(nw, ow), nw), 0.0)
        c = jnp.where(first, 1.0, c)
        mean = scan(
            jnp.where(valid_arr, c * xc, 0.0),
            jnp.where(valid_arr, 1.0 - c, 1.0),
        )
        ok = valid_arr & (cnt >= minp)
        if want == "mean":
            return mean, ok
        # previous valid position's mean (forward-fill shifted by one)
        ff = scan(
            jnp.where(valid_arr, mean, 0.0), jnp.where(valid_arr, 0.0, 1.0)
        )
        ffprev = jnp.where(bnd, 0.0, jnp.roll(ff, 1))
        delta = xc - ffprev
        cov_bias = jnp.where(
            upd,
            div_any((w_pre * c * c + ow * (1.0 - c) * (1.0 - c)) * delta * delta, nw),
            0.0,
        )
        cov_factor = jnp.where(upd, div_any(w_pre, nw), 1.0)
        cov_factor = jnp.where(first, 0.0, cov_factor)
        cov = scan(cov_bias, cov_factor)
        out = jnp.maximum(cov, 0.0)
        if not bias:
            # weight_sum / weight_square_sum recurrences (cov.rs:74-107):
            # decay per dec position, += ow at valid, and for adjust=False a
            # division by new_weight (new_weight^2) after each valid update
            nwdiv = jnp.where(upd & ~jnp.bool_(adjust), nw, 1.0)
            ws_bias = jnp.where(first, 1.0, jnp.where(upd, div_any(jnp.full_like(nwdiv, ow), nwdiv), 0.0))
            ws_factor = jnp.where(upd, div_any(dec, nwdiv), dec)
            ws_factor = jnp.where(first, 0.0, ws_factor)
            W = scan(ws_bias, ws_factor)
            w2_bias = jnp.where(
                first, 1.0,
                jnp.where(upd, div_any(jnp.full_like(nwdiv, ow * ow), nwdiv * nwdiv), 0.0),
            )
            w2_factor = jnp.where(upd, div_any(dec * dec, nwdiv * nwdiv), dec * dec)
            w2_factor = jnp.where(first, 0.0, w2_factor)
            W2 = scan(w2_bias, w2_factor)
            numer = W * W
            denom = numer - W2
            out = jnp.where(
                denom > 0.0, div_any(numer, jnp.maximum(denom, 1e-300)) * out, 0.0
            )
            ok = ok & (denom > 0.0)
        return out, ok

    res = _apply_in_group_order(
        ctx, v.with_(values=v.values.astype(jnp.float64), dtype=dt.Float64()), fn
    )
    return Val(res.values, res.validity, dt.Float64(), None, ROW)


@register("ewm_mean", FLOAT, elementwise=False)
def _ewm_mean(ctx, args, opts):
    return _ewm_impl(ctx, args, opts, "mean")


@register("arg_sort_by", lambda dts, opts: dt.UInt32(), elementwise=False)
def _arg_sort_by(ctx, args, opts):
    """Row indices that would sort by the key columns (reference:
    pl.arg_sort_by; polars-ops arg_sort_multiple) — one variadic word sort."""
    from polars_tpu.kernels.argsort import key_words, stable_argsort_words

    from polars_tpu.engine.strings import ensure_ordinal_val

    keys = [ensure_ordinal_val(_row_domain(ctx, a)) for a in args]
    desc = opts.get("descending", (False,) * len(keys))
    if isinstance(desc, bool):
        desc = (desc,) * len(keys)
    words: list[jax.Array] = [(~ctx.rowmask).astype(jnp.int8)]  # padding last
    for k, d_ in zip(keys, desc):
        kw = list(key_words(k.values, k.dtype, descending=bool(d_)))
        if k.validity is not None:
            # nulls first (polars sort default); zero null rows' payload words
            words.append(jnp.where(k.validity, 1, 0).astype(jnp.int8))
            kw = [jnp.where(k.validity, w, jnp.zeros((), w.dtype)) for w in kw]
        words.extend(kw)
    perm = stable_argsort_words(words)
    return Val(perm.astype(jnp.uint32), None, dt.UInt32(), None, ROW)


def _ewm_alpha(opts, fname):
    com, span, half_life, alpha = (
        opts.get("com"), opts.get("span"), opts.get("half_life"), opts.get("alpha"),
    )
    if alpha is not None:
        return float(alpha)
    if com is not None:
        return 1.0 / (1.0 + com)
    if span is not None:
        return 2.0 / (span + 1.0)
    if half_life is not None:
        return 1.0 - 2.0 ** (-1.0 / half_life)
    raise InvalidOperationError(f"{fname} requires com/span/half_life/alpha")


@register("ewm_sum", FLOAT, elementwise=False)
def _ewm_sum(ctx, args, opts):
    """y_t = x_t + (1-a) * y_{t-1} via associative scan (reference:
    Expr.ewm_sum; polars-compute ewm); segment-reset factors make the same
    scan work per group/window."""
    v = _row_domain(ctx, args[0])
    a = _ewm_alpha(opts, "ewm_sum")
    ignore_nulls = bool(opts.get("ignore_nulls", False))
    min_samples = int(opts.get("min_samples", 1) or 1)

    def fn(vals, valid, seg, mask):
        x = vals.astype(jnp.float64)
        valid_arr = mask if valid is None else (valid & mask)
        bnd = _seg_boundary(seg)
        contrib = jnp.where(valid_arr, x, 0.0)
        if ignore_nulls:
            factor = jnp.where(valid_arr, 1.0 - a, 1.0)  # nulls don't decay
        else:
            factor = jnp.where(mask, 1.0 - a, 1.0)
        factor = jnp.where(bnd, 0.0, factor)
        y = _lin_scan(contrib, factor)
        cnt = _segmented_scan(valid_arr.astype(jnp.int32), seg, "sum")
        ok = (cnt > 0) & (cnt >= min_samples)
        if valid is not None:
            ok = ok & valid_arr
        return y, ok

    res = _apply_in_group_order(ctx, v.with_(values=v.values.astype(jnp.float64), dtype=dt.Float64()), fn)
    return Val(res.values, res.validity, dt.Float64(), None, ROW)


def _ewm_by_core(ctx, args, opts, *, normalize):
    """Time-based EWM: alpha_i = 1 - exp(-ln2 * dt_i / half_life); linear
    recurrence via associative scan over rows SORTED by (group, time),
    scattered back to original order (reference: Expr.ewm_mean_by;
    polars-ops ewm_by.rs). Per-group resets ride the zero-factor trick."""
    v = _row_domain(ctx, args[0])
    b = _row_domain(ctx, args[1])
    if not (b.dtype.is_temporal() or b.dtype.is_integer()):
        raise InvalidOperationError("ewm_*_by needs a temporal/integer 'by' column")
    from polars_tpu.lazyframe import LazyGroupByDynamic

    tau = float(LazyGroupByDynamic._ticks(opts["half_life"], b.dtype))
    n = b.values.shape[0]
    valid = ctx.rowmask & v.valid_or_true() & b.valid_or_true()
    t64 = jnp.where(valid, b.values.astype(jnp.int64), jnp.iinfo(jnp.int64).max)
    gids = (
        jnp.where(valid, ctx.groups.gids, jnp.int32(2**31 - 1))
        if ctx.groups is not None
        else jnp.zeros((n,), jnp.int32)
    )
    from polars_tpu.kernels.argsort import key_words, stable_argsort_words

    perm = stable_argsort_words([gids, *key_words(t64, dt.Int64())])
    xs = v.values.astype(jnp.float64)[perm]
    ts = t64[perm]
    vs = valid[perm]
    gs = gids[perm]
    dt_prev = jnp.diff(ts, prepend=ts[:1]).astype(jnp.float64)
    alpha = 1.0 - jnp.exp2(-dt_prev / tau)
    # the first valid row of each segment seeds with full weight
    bnd = _seg_boundary(gs)
    alpha = jnp.where(bnd, 1.0, alpha)
    contrib = jnp.where(vs, alpha * xs if normalize else xs, 0.0)
    factor = jnp.where(vs, 1.0 - alpha, 1.0)
    factor = jnp.where(bnd, 0.0, factor)
    y = _lin_scan(contrib, factor)
    # scatter back to original order
    out = jnp.zeros((n,), jnp.float64).at[perm].set(y, unique_indices=True)
    ok = jnp.zeros((n,), bool).at[perm].set(vs, unique_indices=True)
    return Val(out, ok, dt.Float64(), None, ROW)


@register("ewm_mean_by", FLOAT, elementwise=False)
def _ewm_mean_by(ctx, args, opts):
    return _ewm_by_core(ctx, args, opts, normalize=True)


@register("ewm_sum_by", FLOAT, elementwise=False)
def _ewm_sum_by(ctx, args, opts):
    return _ewm_by_core(ctx, args, opts, normalize=False)


@register("interpolate_by", FLOAT, elementwise=False)
def _interpolate_by(ctx, args, opts):
    """Linear interpolation of nulls positioned by another column
    (reference: Expr.interpolate_by; polars-ops interpolate_by.rs).
    Prev/next non-null neighbors found with two cummax scans — fully traced."""
    v = _row_domain(ctx, args[0])
    b = _row_domain(ctx, args[1])
    n = v.values.shape[0]
    valid = ctx.rowmask & v.valid_or_true() & b.valid_or_true()
    x = v.values.astype(jnp.float64)
    t = b.values.astype(jnp.float64)
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    # index of the most recent valid row at-or-before i / at-or-after i
    prev = jax.lax.cummax(jnp.where(valid, iota, jnp.int32(-1)))
    nxt = -jax.lax.cummax(jnp.where(valid, -iota, -jnp.int32(n))[::-1])[::-1]
    has_prev = prev >= 0
    has_next = nxt < n
    pi = jnp.clip(prev, 0, n - 1)
    ni = jnp.clip(nxt, 0, n - 1)
    x0, x1 = x[pi], x[ni]
    t0, t1 = t[pi], t[ni]
    frac = div_any(t - t0, jnp.where(t1 == t0, 1.0, t1 - t0))
    interp = x0 + (x1 - x0) * frac
    out = jnp.where(valid, x, interp)
    ok = valid | (has_prev & has_next & ctx.rowmask)
    return Val(out, ok, dt.Float64(), None, ROW)


@register("fill_null_with_strategy", SAME, elementwise=False)
def _fill_null_with_strategy(ctx, args, opts):
    v = args[0]
    strategy = opts.get("strategy")
    if v.validity is None:
        return v
    if strategy == "forward":
        return _forward_fill(ctx, args, {"limit": opts.get("limit")})
    if strategy == "backward":
        return _backward_fill(ctx, args, {"limit": opts.get("limit")})
    if strategy in ("zero", "one"):
        fillv = jnp.asarray(1 if strategy == "one" else 0, v.values.dtype)
        return Val(
            jnp.where(v.validity, v.values, fillv), None, v.dtype, v.table, v.domain
        )
    if strategy in ("min", "max", "mean"):
        mask = ctx.rowmask & v.validity
        if ctx.groups is not None:
            # per-group fill value (over() window context)
            from polars_tpu.engine import groupby as G

            g = ctx.groups
            if strategy == "mean":
                m, has = G.seg_mean(
                    v.values.astype(jnp.float64), mask, g.gids, g.capacity
                )
                fillv = m[g.gids].astype(v.values.dtype)
            else:
                fn = G.seg_min if strategy == "min" else G.seg_max
                ext = fn(v.values, mask, g.gids, g.capacity)
                has = G.seg_count(mask, g.gids, g.capacity) > 0
                fillv = ext[g.gids]
            validity = v.validity | has[g.gids]
            return Val(
                jnp.where(v.validity, v.values, fillv),
                validity, v.dtype, v.table, v.domain,
            )
        has_any = jnp.any(mask)
        if strategy == "mean":
            x = v.values.astype(jnp.float64)
            s = jnp.sum(jnp.where(mask, x, 0.0))
            c = jnp.sum(mask.astype(jnp.float64))
            fillv = div_any(s, jnp.maximum(c, 1.0)).astype(v.values.dtype)
        elif strategy == "min":
            fillv = jnp.min(jnp.where(mask, v.values, _pos_inf(v.values.dtype)))
        else:
            fillv = jnp.max(jnp.where(mask, v.values, _neg_inf(v.values.dtype)))
        # an all-null column stays null (no fill value exists)
        validity = v.validity | jnp.broadcast_to(has_any, v.validity.shape)
        return Val(
            jnp.where(v.validity, v.values, fillv), validity, v.dtype, v.table, v.domain
        )
    raise InvalidOperationError(f"unknown fill_null strategy {strategy!r}")


def _peak_impl(ctx, v: Val, is_max: bool) -> Val:
    """Reference peak semantics (polars-ops/src/chunked_array/peaks.rs +
    polars-expr/src/dispatch/misc.rs:904-910): compare against shift-filled
    neighbors where the fill at every boundary is literal 0, null neighbors
    propagate through Kleene AND, and segment (group) edges count as
    boundaries."""

    def fn(vals, valid, seg, mask):
        n = vals.shape[0]
        iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
        # nearest preceding / following in-mask row (exclusive), clipped to seg
        incl_prev = jax.lax.cummax(jnp.where(mask, iota, jnp.int32(-1)))
        prev_idx = jnp.where(mask, jnp.roll(incl_prev, 1), incl_prev)
        prev_idx = prev_idx.at[0].set(jnp.where(mask[0], -1, prev_idx[0]))
        incl_next = -jax.lax.cummax(jnp.where(mask, -iota, -jnp.int32(n))[::-1])[::-1]
        next_idx = jnp.where(mask, jnp.roll(incl_next, -1), incl_next)
        next_idx = next_idx.at[n - 1].set(jnp.where(mask[n - 1], n, next_idx[n - 1]))
        pi = jnp.clip(prev_idx, 0, n - 1)
        ni = jnp.clip(next_idx, 0, n - 1)
        has_prev = (prev_idx >= 0) & (seg[pi] == seg)
        has_next = (next_idx < n) & (seg[ni] == seg)
        zero = jnp.zeros((), vals.dtype)
        pv = jnp.where(has_prev, vals[pi], zero)
        nv = jnp.where(has_next, vals[ni], zero)
        if valid is None:
            p_ok = jnp.ones((n,), bool)
            n_ok = jnp.ones((n,), bool)
            self_ok = jnp.ones((n,), bool)
        else:
            p_ok = jnp.where(has_prev, valid[pi], True)
            n_ok = jnp.where(has_next, valid[ni], True)
            self_ok = valid
        if is_max:
            lv, rv = pv < vals, nv < vals
        else:
            lv, rv = pv > vals, nv > vals
        l_ok = p_ok & self_ok
        r_ok = n_ok & self_ok
        # Kleene AND of (lv, l_ok) and (rv, r_ok)
        out_ok = (l_ok & r_ok) | (l_ok & ~lv) | (r_ok & ~rv)
        out = (lv | ~l_ok) & (rv | ~r_ok) & out_ok
        return out, out_ok

    return _apply_in_group_order(ctx, v, fn).with_(dtype=dt.Boolean())


@register("peak_min", BOOL, elementwise=False)
def _peak_min(ctx, args, opts):
    return _peak_impl(ctx, _row_domain(ctx, args[0]), is_max=False)


@register("peak_max", BOOL, elementwise=False)
def _peak_max(ctx, args, opts):
    return _peak_impl(ctx, _row_domain(ctx, args[0]), is_max=True)


def _rolling_order(kind: str):
    @register(f"rolling_{kind}", SAME, elementwise=False)
    def _(ctx, args, opts):
        v = _row_domain(ctx, args[0])
        w = opts["window_size"]
        min_samples = opts.get("min_samples") or w
        offs = (w - 1) // 2 if opts.get("center", False) else 0
        n = v.values.shape[0]
        valid = ctx.rowmask if v.validity is None else (ctx.rowmask & v.validity)
        vals = v.values
        order = _group_order(ctx)
        seg = None
        if order is not None:
            perm, seg = order
            vals = vals[perm]
            valid = valid[perm]
        acc = vals.astype(jnp.float64)
        cols = []
        ms = []
        for i in range(w):
            sh = i - (w - 1) + offs
            cols.append(jnp.roll(acc, -sh))
            iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
            inb = iota >= -sh if sh <= 0 else iota < n - sh
            m = jnp.roll(valid, -sh) & inb
            if seg is not None:
                m = m & (jnp.roll(seg, -sh) == seg)
            ms.append(m)
        vs = jnp.stack(cols)
        mm = jnp.stack(ms)
        cnt = jnp.sum(mm, axis=0)
        big = jnp.inf
        masked = jnp.where(mm, vs, big)
        rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
        wts = opts.get("weights")
        if wts is not None and kind in ("median", "quantile"):
            # weighted quantile (reference compute_wq, no_nulls/quantile.rs:
            # 194-235 — the Julia StatsBase definition): sort (value, weight)
            # pairs, walk cumulative weight to h = p*(wsum - w_first) +
            # w_first. median == quantile(0.5, linear).
            if len(wts) != w:
                raise InvalidOperationError(
                    f"rolling_{kind}: weights length {len(wts)} must equal "
                    f"window_size {w}"
                )
            wsum_h = float(sum(float(x) for x in wts))
            if wsum_h == 0.0:
                raise InvalidOperationError(
                    "Weighted quantile is undefined if weights sum to 0"
                )
            if v.validity is not None:
                ctx.add_flag(
                    jnp.any(ctx.rowmask & ~v.validity),
                    f"rolling_{kind}: weights are not supported on columns "
                    "with null values",
                )
            q = 0.5 if kind == "median" else float(opts.get("quantile", 0.5))
            method = (
                "linear" if kind == "median"
                else opts.get("interpolation", "nearest")
            )
            wvec = jnp.asarray([float(x) for x in wts], jnp.float64)[:, None]
            wfull = jnp.where(mm, jnp.broadcast_to(wvec, mm.shape), 0.0)
            order_idx = jnp.argsort(masked, axis=0)
            sv = jnp.take_along_axis(masked, order_idx, axis=0)
            sw = jnp.take_along_axis(wfull, order_idx, axis=0)
            S = jnp.cumsum(sw, axis=0)
            h = q * (wsum_h - sw[0]) + sw[0]
            over = S > h[None, :]
            K = jnp.where(
                jnp.any(over, axis=0),
                jnp.argmax(over, axis=0).astype(jnp.int32),
                jnp.int32(w - 1),
            )
            vk = sv[K, rows]
            km1 = jnp.maximum(K - 1, 0)
            v_old = jnp.where(K > 0, sv[km1, rows], 0.0)
            s_old = jnp.where(K > 0, S[km1, rows], 0.0)
            s = S[K, rows]
            if method == "lower":
                out = v_old
            elif method == "higher":
                out = vk
            elif method == "midpoint":
                out = (vk + v_old) * 0.5
            elif method == "linear":
                denom = s - s_old
                frac = jnp.where(denom > 0.0, (h - s_old) / jnp.where(denom > 0.0, denom, 1.0), 0.0)
                out = v_old + frac * (vk - v_old)
            elif method == "equiprobable":
                threshold = jnp.ceil(wsum_h * q) - 1.0
                out = jnp.where(s > threshold, vk, v_old)
            else:  # nearest
                out = jnp.where((s - h) > (h - s_old), v_old, vk)
            out = jnp.where(h == s_old, v_old, out)
            ok = cnt >= min_samples
            if order is not None:
                out = jnp.zeros_like(out).at[perm].set(out, unique_indices=True)
                ok = jnp.zeros(ok.shape, bool).at[perm].set(ok, unique_indices=True)
            return Val(out, ok, dt.Float64(), None, ROW)
        if wts is not None:
            raise InvalidOperationError(f"rolling_{kind} does not support weights")
        svals = jnp.sort(masked, axis=0)
        k = jnp.maximum(cnt - 1, 0)
        if kind == "median":
            lo_i = floordiv_const(jnp.maximum(cnt - 1, 0), 2)
            hi_i = floordiv_const(cnt, 2)
            lo = svals[jnp.clip(lo_i, 0, w - 1), rows]
            hi = svals[jnp.clip(hi_i, 0, w - 1), rows]
            out = (lo + hi) * 0.5
        elif kind == "quantile":
            q = float(opts.get("quantile", 0.5))
            interp = opts.get("interpolation", "nearest")
            posf = q * jnp.maximum(cnt - 1, 0).astype(jnp.float64)
            if interp == "linear":
                lo_i = jnp.floor(posf).astype(jnp.int32)
                hi_i = jnp.ceil(posf).astype(jnp.int32)
                frac = posf - jnp.floor(posf)
                lo = svals[jnp.clip(lo_i, 0, w - 1), rows]
                hi = svals[jnp.clip(hi_i, 0, w - 1), rows]
                out = lo + frac * (hi - lo)
            elif interp in ("lower",):
                out = svals[jnp.clip(jnp.floor(posf).astype(jnp.int32), 0, w - 1), rows]
            elif interp in ("higher",):
                out = svals[jnp.clip(jnp.ceil(posf).astype(jnp.int32), 0, w - 1), rows]
            elif interp == "midpoint":
                lo = svals[jnp.clip(jnp.floor(posf).astype(jnp.int32), 0, w - 1), rows]
                hi = svals[jnp.clip(jnp.ceil(posf).astype(jnp.int32), 0, w - 1), rows]
                out = (lo + hi) * 0.5
            else:  # nearest
                out = svals[jnp.clip(jnp.round(posf).astype(jnp.int32), 0, w - 1), rows]
        elif kind == "rank":
            # rank of the CURRENT value within its trailing window (1-based;
            # reference: polars-compute/src/rolling/rank.rs). ``descending``
            # flips the comparison; method="random" (seeded tie shuffles)
            # stays unsupported — loudly.
            method = opts.get("method", "average")
            desc = bool(opts.get("descending", False))
            cur = acc
            cmp_less = (vs > cur[None, :]) if desc else (vs < cur[None, :])
            less = jnp.sum(jnp.where(mm, cmp_less, False), axis=0)
            eq = jnp.sum(jnp.where(mm, (vs == cur[None, :]), False), axis=0)
            lf = less.astype(jnp.float64)
            ef = eq.astype(jnp.float64)
            if method == "average":
                out = lf + (ef + 1.0) * 0.5
            elif method == "min":
                out = lf + 1.0
            elif method == "max":
                out = lf + ef
            elif method == "ordinal":
                # ties broken by window position: count equals at EARLIER
                # positions (stack indices before the current row's w-1 slot)
                eq_before = jnp.sum(
                    jnp.where(mm[: w - 1], (vs[: w - 1] == cur[None, :]), False),
                    axis=0,
                )
                out = lf + eq_before.astype(jnp.float64) + 1.0
            elif method == "dense":
                # distinct values below cur + 1: run heads among the sorted
                # window that compare below
                sw = jnp.sort(jnp.where(mm, vs, jnp.inf), axis=0)
                rh = jnp.concatenate(
                    [jnp.ones((1, n), bool), sw[1:] != sw[:-1]], axis=0
                )
                below = (sw > cur[None, :]) if desc else (sw < cur[None, :])
                finite = jnp.isfinite(sw)
                out = jnp.sum(
                    jnp.where(rh & below & finite, 1.0, 0.0), axis=0
                ) + 1.0
            else:
                raise InvalidOperationError(
                    f"rolling_rank method {method!r} is not supported"
                )
        ok = cnt >= min_samples
        if order is not None:
            out = jnp.zeros_like(out).at[perm].set(out, unique_indices=True)
            ok = jnp.zeros(ok.shape, bool).at[perm].set(ok, unique_indices=True)
        return Val(out, ok, dt.Float64(), None, ROW)

    return _


_rolling_order("median")
_rolling_order("quantile")
_rolling_order("rank")


@register("ewm_std", FLOAT, elementwise=False)
def _ewm_std(ctx, args, opts):
    var = _ewm_impl(ctx, args, opts, "var")
    return var.with_(values=jnp.sqrt(var.values))


@register("ewm_var", FLOAT, elementwise=False)
def _ewm_var(ctx, args, opts):
    return _ewm_impl(ctx, args, opts, "var")


@register("arg_unique", dt.UInt32(), elementwise=False)
def _arg_unique(ctx, args, opts):
    raise InvalidOperationError("arg_unique changes length; handled by the executor")


# --- cumulative_eval (round-5): prefix aggregations as segmented scans -------
# ``x.cumulative_eval(pl.element().sum())`` evaluates the inner expr over the
# expanding prefix — O(n^2) on the host, ONE segmented scan in the trace for
# the recognized agg shapes. The gate (executors._fn_conditionally_host)
# routes unrecognized inner exprs to the host loop.
# Reference: polars-ops/src/series/ops/cum_agg.rs + cumulative_eval
# (py-polars expr/expr.py cumulative_eval).


def cum_eval_kind(sub) -> str | None:
    """sum|min|max|mean when ``sub`` is that aggregation of pl.element()."""
    from polars_tpu.plan import exprs as E

    e = sub
    while isinstance(e, (E.EAlias, E.EKeepName)):
        e = e.input
    if isinstance(e, E.EAgg) and e.kind in ("sum", "min", "max", "mean"):
        i = e.input
        while isinstance(i, (E.EAlias, E.EKeepName)):
            i = i.input
        if isinstance(i, E.EColumn) and i.name == "":
            return e.kind
    return None


def _cum_eval_dt(dts, opts):
    kind = cum_eval_kind(opts.get("expr"))
    d = dts[0]
    if kind == "mean":
        return dt.Float64()
    if kind == "sum":
        return _cum_dtype_sum(dts, opts)
    return d


@register("cumulative_eval", _cum_eval_dt, elementwise=False)
def _cumulative_eval(ctx, args, opts):
    kind = cum_eval_kind(opts.get("expr"))
    if kind is None:
        raise InvalidOperationError(
            "cumulative_eval with a non-prefix-agg expr is a host op"
        )
    minp = int(opts.get("min_samples", 1) or 1)
    v = _row_domain(ctx, args[0])
    out_dt = _cum_eval_dt([v.dtype], opts)
    np_out = jnp.dtype(dt.dtype_to_numpy(out_dt))
    is_float = jnp.dtype(v.values.dtype).kind == "f"

    def fn(vals, valid, seg, mask):
        n = vals.shape[0]
        valid_arr = mask if valid is None else (valid & mask)
        cnt = _segmented_scan(valid_arr.astype(jnp.int32), seg, "sum")
        iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
        pos = _segmented_scan(jnp.ones((n,), jnp.int32), seg, "sum")  # 1-based
        if kind in ("sum", "mean"):
            acc_t = jnp.float64 if (kind == "mean" or is_float) else np_out
            x = jnp.where(valid_arr, vals.astype(acc_t), jnp.zeros((), acc_t))
            s = _segmented_scan(x, seg, "sum")
            if kind == "mean":
                out = s / jnp.maximum(cnt, 1).astype(jnp.float64)
                ok_out = cnt > 0
            else:
                out = s.astype(np_out)
                ok_out = jnp.ones((n,), bool)  # prefix sum is never null
        else:
            work = vals
            if is_float:
                work = vals.astype(jnp.float64)
                fill = jnp.float64(jnp.inf if kind == "min" else -jnp.inf)
                nan = jnp.isnan(work)
                work = jnp.where(nan, fill, work)  # NaN is skipped (greatest
                # in the engine's total order); all-NaN prefixes restore below
                non_nan = _segmented_scan(
                    (valid_arr & ~nan).astype(jnp.int32), seg, "sum"
                )
            else:
                fill = _pos_inf(vals.dtype) if kind == "min" else _neg_inf(vals.dtype)
            x = jnp.where(valid_arr, work, fill)
            out = _segmented_scan(x, seg, kind)
            if is_float:
                # all-NaN valid prefix: the total-order extreme is NaN
                out = jnp.where((cnt > 0) & (non_nan == 0), jnp.float64(jnp.nan), out)
            out = out.astype(np_out)
            ok_out = cnt > 0
        if minp > 1:
            ok_out = ok_out & (pos >= jnp.int32(minp))
        return out, ok_out

    res = _apply_in_group_order(ctx, v, fn)
    if res.dtype != out_dt:
        res = Val(res.values, res.validity, out_dt, None, res.domain)
    return res
