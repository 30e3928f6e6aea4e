"""Core elementwise ops: math, null handling, membership, horizontal folds.

Reference kernels: polars-compute/src/{arithmetic,comparisons,if_then_else,
unique}/ and the boolean/horizontal function namespaces in
polars-plan/src/plans/aexpr/function_expr/.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from polars_tpu.kernels.fastmath import div_any, floordiv_const, mod_const

_div = div_any
import numpy as np

from polars_tpu import datatypes as dt
from polars_tpu.engine.cast import cast_val
from polars_tpu.engine.common import ROW, SCALAR, Val, combine_validity
from polars_tpu.engine.registry import BOOL, FLOAT, SAME, SUPER, register
from polars_tpu.errors import InvalidOperationError, ShapeError


def _float_vals(v: Val) -> tuple[jax.Array, dt.DataType]:
    if isinstance(v.dtype, dt.Float32):
        return v.values, dt.Float32()
    return v.values.astype(jnp.float64), dt.Float64()


def _unary_float(name: str, jfn):
    @register(name, FLOAT)
    def _(ctx, args, opts, _jfn=jfn):
        v = args[0]
        x, out_dt = _float_vals(v)
        return Val(_jfn(x), v.validity, out_dt, None, v.domain)


for _n, _f in [
    ("sqrt", jnp.sqrt), ("cbrt", jnp.cbrt), ("exp", jnp.exp),
    ("log10", jnp.log10), ("log1p", jnp.log1p),
    ("sin", jnp.sin), ("cos", jnp.cos), ("tan", jnp.tan),
    ("arcsin", jnp.arcsin), ("arccos", jnp.arccos), ("arctan", jnp.arctan),
    ("sinh", jnp.sinh), ("cosh", jnp.cosh), ("tanh", jnp.tanh),
    ("arcsinh", jnp.arcsinh), ("arccosh", jnp.arccosh), ("arctanh", jnp.arctanh),
    ("degrees", jnp.degrees), ("radians", jnp.radians),
    ("cot", lambda x: _div(1.0, jnp.tan(x))),
]:
    _unary_float(_n, _f)


@register("arctan2", FLOAT)
def _arctan2(ctx, args, opts):
    y, x = args
    yv, out_dt = _float_vals(y)
    xv, _ = _float_vals(x)
    out = jnp.arctan2(yv, xv)
    if opts.get("degrees"):
        out = jnp.degrees(out)
    from polars_tpu.engine.common import combine_validity

    return Val(out, combine_validity(y.validity, x.validity), out_dt, None,
               y.domain if y.domain == ROW else x.domain)


@register("log", FLOAT)
def _log(ctx, args, opts):
    v = args[0]
    x, out_dt = _float_vals(v)
    base = opts.get("base")
    out = jnp.log(x) if base is None else jnp.log(x) * float(1.0 / np.log(base))
    return Val(out, v.validity, out_dt, None, v.domain)


@register("abs", SAME)
def _abs(ctx, args, opts):
    v = args[0]
    return v.with_(values=jnp.abs(v.values) if v.values.dtype != jnp.bool_ else v.values)


@register("negate", SAME)
def _negate(ctx, args, opts):
    """Reference: FunctionExpr::Negate (polars-ops negate.rs) — same dtype;
    unsigned/bool/string unsupported."""
    v = args[0]
    d = v.dtype
    ok = (
        (d.is_integer() and not d.is_unsigned_integer())
        or d.is_float()
        or type(d).__name__ in ("Duration", "Decimal")
    )
    if not ok:
        raise InvalidOperationError(f"`neg` operation not supported for dtype `{d!r}`")
    return v.with_(values=-v.values)


@register("sign", SAME)
def _sign(ctx, args, opts):
    v = args[0]
    return v.with_(values=jnp.sign(v.values).astype(v.values.dtype))


@register("round", SAME)
def _round(ctx, args, opts):
    v = args[0]
    if v.dtype.is_integer():
        return v
    d = opts.get("decimals", 0)
    f = 10.0 ** d
    # polars rounds half away from zero
    x = v.values * f
    out = jnp.sign(x) * jnp.floor(jnp.abs(x) + 0.5) * (1.0 / f)
    return v.with_(values=out.astype(v.values.dtype))


@register("floor", SAME)
def _floor(ctx, args, opts):
    v = args[0]
    if v.dtype.is_integer():
        return v
    return v.with_(values=jnp.floor(v.values))


@register("ceil", SAME)
def _ceil(ctx, args, opts):
    v = args[0]
    if v.dtype.is_integer():
        return v
    return v.with_(values=jnp.ceil(v.values))


@register("not", BOOL)
def _not(ctx, args, opts):
    v = args[0]
    if isinstance(v.dtype, dt.Boolean):
        return v.with_(values=~v.values.astype(bool))
    if v.dtype.is_integer():
        return v.with_(values=jnp.bitwise_not(v.values))
    raise InvalidOperationError(f"cannot negate {v.dtype!r}")


@register("clip", SAME)
def _clip(ctx, args, opts):
    v = args[0]
    lo = args[1] if opts.get("has_lower") else None
    hi = args[2 if opts.get("has_lower") else 1] if opts.get("has_upper") else None
    out = v.values
    if lo is not None:
        out = jnp.maximum(out, lo.values.astype(out.dtype))
    if hi is not None:
        out = jnp.minimum(out, hi.values.astype(out.dtype))
    return v.with_(values=out)


# -- null handling ------------------------------------------------------------


@register("is_null", BOOL)
def _is_null(ctx, args, opts):
    v = args[0]
    if v.validity is None:
        return Val(jnp.zeros(v.values.shape, bool), None, dt.Boolean(), None, v.domain)
    return Val(~v.validity, None, dt.Boolean(), None, v.domain)


@register("is_not_null", BOOL)
def _is_not_null(ctx, args, opts):
    v = args[0]
    if v.validity is None:
        return Val(jnp.ones(v.values.shape, bool), None, dt.Boolean(), None, v.domain)
    return Val(v.validity, None, dt.Boolean(), None, v.domain)


@register("is_nan", BOOL)
def _is_nan(ctx, args, opts):
    v = args[0]
    out = jnp.isnan(v.values) if v.dtype.is_float() else jnp.zeros(v.values.shape, bool)
    return Val(out, v.validity, dt.Boolean(), None, v.domain)


@register("is_not_nan", BOOL)
def _is_not_nan(ctx, args, opts):
    v = args[0]
    out = ~jnp.isnan(v.values) if v.dtype.is_float() else jnp.ones(v.values.shape, bool)
    return Val(out, v.validity, dt.Boolean(), None, v.domain)


@register("is_finite", BOOL)
def _is_finite(ctx, args, opts):
    v = args[0]
    out = jnp.isfinite(v.values) if v.dtype.is_float() else jnp.ones(v.values.shape, bool)
    return Val(out, v.validity, dt.Boolean(), None, v.domain)


@register("is_infinite", BOOL)
def _is_infinite(ctx, args, opts):
    v = args[0]
    out = jnp.isinf(v.values) if v.dtype.is_float() else jnp.zeros(v.values.shape, bool)
    return Val(out, v.validity, dt.Boolean(), None, v.domain)


@register("fill_null", SUPER)
def _fill_null(ctx, args, opts):
    v, fill = args
    if v.validity is None:
        return v
    if v.table is not None or fill.table is not None:
        from polars_tpu.engine.strings import unify_vals

        if fill.table is None:
            raise InvalidOperationError("fill_null value must be a string for string columns")
        v2, f2 = unify_vals(v, fill)
        values = jnp.where(v2.validity, v2.values, f2.values)
        validity = None if f2.validity is None else jnp.where(v2.validity, True, jnp.broadcast_to(f2.validity, v2.validity.shape))
        return Val(values, validity, v.dtype, v2.table, v.domain)
    from polars_tpu.plan.schema_resolve import supertype

    st = supertype(v.dtype, fill.dtype)
    v2 = cast_val(v, st, strict=False) if v.dtype != st else v
    f2 = cast_val(fill, st, strict=False) if fill.dtype != st else fill
    values = jnp.where(v.validity, v2.values, jnp.broadcast_to(f2.values, v2.values.shape))
    validity = None
    if f2.validity is not None:
        validity = jnp.where(v.validity, True, jnp.broadcast_to(f2.validity, v.validity.shape))
    return Val(values, validity, st, None, v.domain)


@register("fill_nan", SAME)
def _fill_nan(ctx, args, opts):
    v, fill = args
    if not v.dtype.is_float():
        return v
    values = jnp.where(jnp.isnan(v.values), jnp.broadcast_to(fill.values.astype(v.values.dtype), v.values.shape), v.values)
    validity = v.validity
    if fill.validity is not None:
        nan_mask = jnp.isnan(v.values)
        base = jnp.ones(values.shape, bool) if validity is None else validity
        validity = jnp.where(nan_mask, jnp.broadcast_to(fill.validity, values.shape), base)
    return Val(values, validity, v.dtype, None, v.domain)


@register("coalesce", SUPER)
def _coalesce(ctx, args, opts):
    from polars_tpu.plan.schema_resolve import supertype

    if args[0].table is not None:
        from polars_tpu.engine.strings import unify_vals

        out = args[0]
        for nxt in args[1:]:
            out, n2 = unify_vals(out, nxt)
            ov = out.valid_or_true()
            values = jnp.where(ov, out.values, jnp.broadcast_to(n2.values, out.values.shape))
            nv = jnp.broadcast_to(n2.valid_or_true(), out.values.shape)
            validity = ov | nv
            out = Val(values, validity, out.dtype, out.table, out.domain)
        return out
    st = args[0].dtype
    for a in args[1:]:
        st = supertype(st, a.dtype)
    args = [cast_val(a, st, strict=False) if a.dtype != st else a for a in args]
    out = args[0]
    shape = None
    for a in args:
        if a.domain != SCALAR:
            shape = a.values.shape
    if shape is None:
        shape = out.values.shape
    values = jnp.broadcast_to(out.values, shape)
    validity = jnp.broadcast_to(out.valid_or_true(), shape)
    for nxt in args[1:]:
        nv = jnp.broadcast_to(nxt.valid_or_true(), shape)
        values = jnp.where(validity, values, jnp.broadcast_to(nxt.values, shape))
        validity = validity | nv
    dom = ROW if any(a.domain == ROW for a in args) else (
        "group" if any(a.domain == "group" for a in args) else SCALAR
    )
    return Val(values, validity, st, None, dom)


# -- membership ----------------------------------------------------------------


@register("is_in", BOOL)
def _is_in(ctx, args, opts):
    # membership via broadcast compare: `other` is typically a small literal
    # list, so O(n*m) elementwise beats a sort (switch to searchsorted for big m)
    v, other = args
    nulls_equal = opts.get("nulls_equal", False)
    if isinstance(other.dtype, dt.List):
        # per-row membership: v[i] in other[i] == other.list.contains(v)
        from polars_tpu.engine.fn_nested import _list_contains

        return _list_contains(ctx, [other, v], opts)
    if v.table is not None:
        if other.table is None:
            raise InvalidOperationError("is_in on strings requires string values")
        from polars_tpu.engine.strings import unify_vals

        v2, o2 = unify_vals(v, other)
        vv, ov, o_valid = v2.values, o2.values, o2.validity
    else:
        vv, ov, o_valid = v.values, other.values, other.validity
        if vv.dtype != ov.dtype:
            from polars_tpu.plan.schema_resolve import supertype

            st = supertype(v.dtype, other.dtype)
            vv = cast_val(v, st, strict=False).values
            ov = cast_val(other, st, strict=False).values
    hits = vv[:, None] == ov[None, :]
    if o_valid is not None:
        hits = hits & o_valid[None, :]
    out = jnp.any(hits, axis=1)
    validity = v.validity
    if nulls_equal and v.validity is not None:
        other_has_null = (
            jnp.any(~o_valid) if o_valid is not None else jnp.asarray(False)
        )
        out = jnp.where(v.validity, out, other_has_null)
        validity = None
    return Val(out, validity, dt.Boolean(), None, v.domain)


@register("is_between", BOOL)
def _is_between(ctx, args, opts):
    v, lo, hi = args
    closed = opts.get("closed", "both")
    from polars_tpu.plan.schema_resolve import supertype

    st = supertype(supertype(v.dtype, lo.dtype), hi.dtype)
    vv = cast_val(v, st, strict=False).values if v.dtype != st else v.values
    lv = cast_val(lo, st, strict=False).values if lo.dtype != st else lo.values
    hv = cast_val(hi, st, strict=False).values if hi.dtype != st else hi.values
    left = vv >= lv if closed in ("both", "left") else vv > lv
    right = vv <= hv if closed in ("both", "right") else vv < hv
    validity = combine_validity(v.validity, lo.validity, hi.validity)
    return Val(left & right, validity, dt.Boolean(), None, v.domain)


def _distinct_flags(ctx, v: Val, kind: str) -> Val:
    """is_duplicated / is_unique / is_first_distinct / is_last_distinct via one
    sort by (value) + neighbour compare (reference: polars-ops unique kernels)."""
    from polars_tpu.kernels.argsort import (
        boundaries_from_words,
        key_words,
        stable_argsort_words,
    )

    n = v.values.shape[0]
    invalid = jnp.zeros((n,), jnp.int8) if v.validity is None else (~v.validity).astype(jnp.int8)
    oob = (~ctx.rowmask).astype(jnp.int8)
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    # group context: distinctness is per group — the group id is a key
    gid_words = [] if ctx.groups is None else [ctx.groups.gids]
    words = [oob, *gid_words, invalid, *key_words(v.values, v.dtype)]
    perm = stable_argsort_words(words)
    s_oob = oob[perm]
    first_pos = iota == 0
    diff = boundaries_from_words(words[1:], perm)
    same_prev = (~first_pos) & ~diff & (s_oob == 0) & (jnp.roll(s_oob, 1) == 0)
    same_next = jnp.roll(same_prev, -1) & (iota != n - 1)
    if kind == "is_first_distinct":
        flag = ~same_prev
    elif kind == "is_last_distinct":
        flag = ~same_next
    elif kind == "is_duplicated":
        flag = same_prev | same_next
    else:  # is_unique
        flag = ~(same_prev | same_next)
    out = jnp.zeros((n,), bool).at[perm].set(flag, unique_indices=True)
    return Val(out, None, dt.Boolean(), None, ROW)


for _kind in ("is_duplicated", "is_unique", "is_first_distinct", "is_last_distinct"):
    def _mk(kind):
        @register(kind, BOOL, elementwise=False)
        def _(ctx, args, opts):
            return _distinct_flags(ctx, args[0], kind)

    _mk(_kind)


@register("unique", SAME, elementwise=False)
def _unique(ctx, args, opts):
    raise InvalidOperationError("expression-level unique() changes length; use frame unique()")


@register("unique_counts", dt.UInt32(), elementwise=False)
def _unique_counts(ctx, args, opts):
    raise InvalidOperationError("unique_counts changes length; use value_counts()")


# -- horizontal folds ---------------------------------------------------------------


def _horizontal(args: list[Val], fn_pair, identity_validity="and"):
    out = args[0]
    for nxt in args[1:]:
        out = fn_pair(out, nxt)
    return out


@register("all_horizontal", BOOL)
def _all_h(ctx, args, opts):
    from polars_tpu.engine.compiler import _kleene

    out = args[0]
    for nxt in args[1:]:
        out = _kleene("&", out, nxt, _dom2(out, nxt))
    return out


@register("any_horizontal", BOOL)
def _any_h(ctx, args, opts):
    from polars_tpu.engine.compiler import _kleene

    out = args[0]
    for nxt in args[1:]:
        out = _kleene("|", out, nxt, _dom2(out, nxt))
    return out


def _dom2(a: Val, b: Val) -> str:
    from polars_tpu.engine.common import broadcast_pair

    return broadcast_pair(a, b)[2]


@register("sum_horizontal", SUPER)
def _sum_h(ctx, args, opts):
    from polars_tpu.plan.schema_resolve import supertype

    st = args[0].dtype
    for a in args[1:]:
        st = supertype(st, a.dtype)
    if isinstance(st, dt.Boolean):
        st = dt.UInt32()
    acc = None
    any_row = any(a.domain == ROW for a in args)
    for a in args:
        av = cast_val(a, st, strict=False) if a.dtype != st else a
        x = jnp.where(av.valid_or_true(), av.values, jnp.zeros((), av.values.dtype)) if av.validity is not None else av.values
        acc = x if acc is None else acc + x
    return Val(acc, None, st, None, ROW if any_row else args[0].domain)


@register("mean_horizontal", FLOAT)
def _mean_h(ctx, args, opts):
    cnt = None
    acc = None
    for a in args:
        x = a.values.astype(jnp.float64)
        valid = a.valid_or_true() if a.validity is not None else jnp.ones(x.shape, bool)
        x = jnp.where(valid, x, 0.0)
        c = valid.astype(jnp.float64)
        acc = x if acc is None else acc + x
        cnt = c if cnt is None else cnt + c
    out = _div(acc, jnp.maximum(cnt, 1.0))
    validity = cnt > 0
    dom = ROW if any(a.domain == ROW for a in args) else args[0].domain
    return Val(out, validity, dt.Float64(), None, dom)


def _minmax_h(args: list[Val], is_min: bool):
    from polars_tpu.plan.schema_resolve import supertype

    st = args[0].dtype
    for a in args[1:]:
        st = supertype(st, a.dtype)
    acc_v = None
    acc_valid = None
    for a in args:
        av = cast_val(a, st, strict=False) if a.dtype != st else a
        valid = av.valid_or_true() if av.validity is not None else jnp.ones(av.values.shape, bool)
        if acc_v is None:
            acc_v, acc_valid = av.values, valid
        else:
            pick_new = valid & (
                ~acc_valid | ((av.values < acc_v) if is_min else (av.values > acc_v))
            )
            acc_v = jnp.where(pick_new, av.values, acc_v)
            acc_valid = acc_valid | valid
    dom = ROW if any(a.domain == ROW for a in args) else args[0].domain
    validity = None if all(a.validity is None for a in args) else acc_valid
    return Val(acc_v, validity, st, None, dom)


@register("min_horizontal", SUPER)
def _min_h(ctx, args, opts):
    return _minmax_h(args, True)


@register("max_horizontal", SUPER)
def _max_h(ctx, args, opts):
    return _minmax_h(args, False)


# -- misc ------------------------------------------------------------------------


@register("bitwise_count_ones", dt.UInt32())
def _bitwise_count_ones(ctx, args, opts):
    """Per-element popcount (reference: polars-ops bitwise count_ones)."""
    v = args[0]
    if not v.dtype.is_integer() and not isinstance(v.dtype, dt.Boolean):
        raise InvalidOperationError("bitwise_count_ones expects an integer column")
    ones = jax.lax.population_count(v.values).astype(jnp.uint32)
    return Val(ones, v.validity, dt.UInt32(), None, v.domain)


@register("bitwise_count_zeros", dt.UInt32())
def _bitwise_count_zeros(ctx, args, opts):
    v = args[0]
    if not v.dtype.is_integer() and not isinstance(v.dtype, dt.Boolean):
        raise InvalidOperationError("bitwise_count_zeros expects an integer column")
    width = v.values.dtype.itemsize * 8
    ones = jax.lax.population_count(v.values).astype(jnp.uint32)
    return Val(jnp.uint32(width) - ones, v.validity, dt.UInt32(), None, v.domain)


def _host_only(name):
    def _f(ctx, args, opts):
        raise InvalidOperationError(f"{name} is a host op (routed via special select)")

    return _f


def _hist_dtype(dts, opts):
    fields = []
    if opts.get("include_breakpoint"):
        fields.append(("breakpoint", dt.Float64()))
    if opts.get("include_category"):
        fields.append(("category", dt.Categorical()))
    if fields:
        fields.append(("count", dt.UInt32()))
        return dt.Struct(fields)
    return dt.UInt32()


register("hist", _hist_dtype, elementwise=False)(_host_only("hist"))
register(
    "reshape",
    lambda dts, opts: (
        dts[0]
        if len(opts.get("dimensions", ())) <= 1
        else dt.Array(dts[0], int(opts["dimensions"][1]))
    ),
    elementwise=False,
)(_host_only("reshape"))
register("rolling_median_by", lambda dts, opts: dt.Float64(), elementwise=False)(
    _host_only("rolling_median_by")
)
register("rolling_quantile_by", lambda dts, opts: dt.Float64(), elementwise=False)(
    _host_only("rolling_quantile_by")
)
register(
    "rolling_rank_by",
    lambda dts, opts: dt.Float64() if opts.get("method", "average") == "average" else dt.UInt32(),
    elementwise=False,
)(_host_only("rolling_rank_by"))
register("rolling_map", SAME, elementwise=False)(_host_only("rolling_map"))


def _value_counts_dt(dts, opts):
    cnt = dt.Float64() if opts.get("normalize") else dt.UInt32()
    return dt.Struct(
        [(opts.get("_field") or "", dts[0]), (opts.get("count_name", "count"), cnt)]
    )


register("value_counts", _value_counts_dt, elementwise=False)(_host_only("value_counts"))


@register("truncate", SAME)
def _truncate_decimals(ctx, args, opts):
    """Truncate toward zero to `decimals` places (reference: Expr.truncate;
    polars-ops round.rs truncate)."""
    v = args[0]
    if not v.dtype.is_float():
        if v.dtype.is_numeric():
            return v
        raise InvalidOperationError("truncate expects a numeric column")
    decimals = int(opts.get("decimals", 0))
    scale = 10.0 ** decimals
    out = jnp.trunc(v.values * scale) / scale
    return v.with_(values=out.astype(v.values.dtype))


_REINTERPRET_PAIRS = {
    # same-width numeric reinterpretations (reference: Expr.reinterpret)
    ("Int8", "UInt8"), ("Int16", "UInt16"), ("Int32", "UInt32"), ("Int64", "UInt64"),
    ("Int32", "Float32"), ("UInt32", "Float32"),
    ("Int64", "Float64"), ("UInt64", "Float64"),
}


def _reinterpret_dt(dts, opts):
    src = dts[0]
    if opts.get("dtype") is not None:
        return dt.parse_into_dtype(opts["dtype"])
    name = type(src).__name__
    signed = opts.get("signed")
    signed = True if signed is None else bool(signed)
    for w in ("8", "16", "32", "64"):
        if name.endswith(w):
            return getattr(dt, ("Int" if signed else "UInt") + w)()
    raise InvalidOperationError(f"cannot reinterpret {src!r}")


@register("reinterpret", _reinterpret_dt)
def _reinterpret(ctx, args, opts):
    v = args[0]
    out_dt = _reinterpret_dt([v.dtype], opts)
    a, b = type(v.dtype).__name__, type(out_dt).__name__
    if a == b:
        return v
    if (a, b) not in _REINTERPRET_PAIRS and (b, a) not in _REINTERPRET_PAIRS:
        raise InvalidOperationError(f"cannot reinterpret {v.dtype!r} as {out_dt!r}")
    np_t = jnp.dtype(dt.dtype_to_numpy(out_dt))
    if v.dtype.is_integer() and out_dt.is_integer():
        # same-width int<->uint: two's-complement astype IS the bitcast
        out = v.values.astype(np_t)
    elif v.values.dtype.itemsize == 8 or np_t.itemsize == 8:
        # 64-bit bitcast_convert_type is unimplemented on the TPU x64
        # rewriter (CLAUDE.md §2): go through a u32-pair view
        lo32 = jax.lax.bitcast_convert_type(v.values, jnp.uint32)  # (..., 2)
        out = jax.lax.bitcast_convert_type(lo32, np_t)
        out = out.reshape(v.values.shape)
    else:
        out = jax.lax.bitcast_convert_type(v.values, np_t)
    return Val(out, v.validity, out_dt, None, v.domain)


def _bitwise_unary(v, name, int_fn, set_count, unset_count):
    """Shared body for leading/trailing bit counts; Boolean has width 1
    (reference: polars-ops src/series/ops/bitwise.rs)."""
    if isinstance(v.dtype, dt.Boolean):
        out = jnp.where(v.values, jnp.uint32(set_count), jnp.uint32(unset_count))
    elif v.dtype.is_integer():
        out = int_fn(v.values).astype(jnp.uint32)
    else:
        raise InvalidOperationError(f"{name} expects an integer or boolean column")
    return Val(out, v.validity, dt.UInt32(), None, v.domain)


@register("bitwise_leading_zeros", dt.UInt32())
def _bitwise_leading_zeros(ctx, args, opts):
    return _bitwise_unary(args[0], "bitwise_leading_zeros", jax.lax.clz, 0, 1)


@register("bitwise_leading_ones", dt.UInt32())
def _bitwise_leading_ones(ctx, args, opts):
    return _bitwise_unary(
        args[0], "bitwise_leading_ones", lambda x: jax.lax.clz(~x), 1, 0
    )


@register("bitwise_trailing_zeros", dt.UInt32())
def _bitwise_trailing_zeros(ctx, args, opts):
    # ctz(x) = popcount(~x & (x-1)); yields the full width for x == 0
    return _bitwise_unary(
        args[0],
        "bitwise_trailing_zeros",
        lambda x: jax.lax.population_count(~x & (x - jnp.ones((), x.dtype))),
        0,
        1,
    )


@register("bitwise_trailing_ones", dt.UInt32())
def _bitwise_trailing_ones(ctx, args, opts):
    return _bitwise_unary(
        args[0],
        "bitwise_trailing_ones",
        lambda x: jax.lax.population_count(x & (~x - jnp.ones((), x.dtype))),
        1,
        0,
    )


@register("hash", dt.UInt64())
def _hash(ctx, args, opts):
    from polars_tpu.kernels.hashing import hash_column

    v = args[0]
    h = hash_column(v.values, v.validity, opts.get("seed", 0))
    return Val(h.astype(jnp.uint64), None, dt.UInt64(), None, v.domain)


@register("replace", lambda dts, opts: dts[0])
def _replace(ctx, args, opts):
    """Map listed values to replacements; others unchanged. The old/new lists
    are static host values (reference: polars-ops replace.rs)."""
    v = args[0]
    olds, news = list(opts["olds"]), list(opts["news"])
    if v.table is not None:
        from polars_tpu.engine.strings import map_over_table

        mapping = dict(zip(olds, news))

        def f(uniq):
            return np.asarray([mapping.get(u, u) for u in uniq], object)

        return map_over_table(v, f, out_is_string=True)
    values = v.values
    validity = v.valid_or_true() if v.validity is not None else None
    for o, nw in zip(olds, news):
        if o is None:
            if v.validity is not None:
                hit = ~v.validity
            else:
                continue
        else:
            hit = v.values == jnp.asarray(o, v.values.dtype)
            if v.validity is not None:
                hit = hit & v.validity
        if nw is None:
            if validity is None:
                validity = jnp.ones(values.shape, bool)
            validity = jnp.where(hit, False, validity)
        else:
            values = jnp.where(hit, jnp.asarray(nw, values.dtype), values)
            if validity is not None:
                validity = jnp.where(hit, True, validity)
    return Val(values, validity, v.dtype, None, v.domain)


def _replace_strict_dtype(dts, opts):
    rd = opts.get("return_dtype")
    if rd is not None:
        return rd
    news = [n for n in opts.get("news", ()) if n is not None]
    cand = news + ([opts.get("default")] if opts.get("default") is not None else [])
    if not cand:
        return dt.Null()
    from polars_tpu.core.column import _infer_pylist_dtype

    return _infer_pylist_dtype(list(cand))


@register("replace_strict", _replace_strict_dtype)
def _replace_strict(ctx, args, opts):
    v = args[0]
    olds, news = list(opts["olds"]), list(opts["news"])
    default = opts.get("default")
    out_dt = _replace_strict_dtype([v.dtype], opts)

    if type(out_dt).__name__ in ("String", "Categorical", "Enum"):
        # string outputs: build via dictionary of outputs
        from polars_tpu.utils import strtable

        out_values = sorted({str(x) for x in news if x is not None} | ({str(default)} if default is not None else set()))
        table = strtable.StringTable(np.asarray(out_values, object), sorted_order=True)
        code_of = {s: i for i, s in enumerate(out_values)}
        shape = v.values.shape
        values = jnp.zeros(shape, jnp.int32)
        matched = jnp.zeros(shape, bool)
        for o, nw in zip(olds, news):
            hit = _match_old(v, o)
            if nw is not None:
                values = jnp.where(hit, code_of[str(nw)], values)
            matched = matched | hit
        if default is not None:
            values = jnp.where(matched, values, code_of[str(default)])
            validity = v.validity
        else:
            _flag_unmatched(ctx, v, matched)
            validity = matched if v.validity is None else (matched & v.validity)
        return Val(values, validity, out_dt, table, v.domain)

    np_dt = jnp.dtype(dt.dtype_to_numpy(out_dt))
    shape = v.values.shape
    values = jnp.zeros(shape, np_dt)
    matched = jnp.zeros(shape, bool)
    for o, nw in zip(olds, news):
        hit = _match_old(v, o)
        if nw is not None:
            values = jnp.where(hit, jnp.asarray(nw, np_dt), values)
        matched = matched | hit
    if default is not None:
        values = jnp.where(matched, values, jnp.asarray(default, np_dt))
        validity = v.validity
    else:
        _flag_unmatched(ctx, v, matched)
        validity = matched if v.validity is None else (matched & v.validity)
    return Val(values, validity, out_dt, None, v.domain)


def _flag_unmatched(ctx, v, matched):
    """replace_strict without a default: any unmatched value raises at the
    segment count sync (reference: replace_strict 'value not mapped' error)."""
    from polars_tpu.engine.common import GROUP, ROW

    lost = ~matched
    if v.domain == ROW:
        lost = lost & ctx.rowmask
    elif v.domain == GROUP and ctx.groups is not None:
        lost = lost & ctx.groups.group_valid
    ctx.add_flag(
        jnp.any(lost),
        "replace_strict: value not found in the mapping and no `default` set",
    )


def _match_old(v: Val, o):
    if o is None:
        if v.validity is None:
            return jnp.zeros(v.values.shape, bool)
        return ~v.validity
    if v.table is not None:
        code = v.table.find(str(o))
        hit = v.values == code
    else:
        hit = v.values == jnp.asarray(o, v.values.dtype)
    if v.validity is not None:
        hit = hit & v.validity
    return hit


@register("set_sorted", SAME)
def _set_sorted(ctx, args, opts):
    return args[0]


register("shrink_dtype", SAME, elementwise=False)(_host_only("shrink_dtype"))
# cumulative_eval: traced for element().sum/min/max/mean shapes
# (fn_position.py); the host loop handles arbitrary inner exprs


@register("to_physical", lambda dts, opts: _physical_dtype(dts[0]))
def _to_physical(ctx, args, opts):
    v = args[0]
    return Val(v.values, v.validity, _physical_dtype(v.dtype), None, v.domain)


def _physical_dtype(d: dt.DataType) -> dt.DataType:
    name = type(d).__name__
    lut = {
        "String": dt.UInt32(), "Categorical": dt.UInt32(), "Enum": dt.UInt32(),
        "Date": dt.Int32(), "Datetime": dt.Int64(), "Duration": dt.Int64(),
        "Time": dt.Int64(), "Decimal": dt.Int64(), "Binary": dt.UInt32(),
    }
    return lut.get(name, d)


@register("int_range", lambda dts, opts: opts.get("dtype", dt.Int64()), elementwise=False)
def _int_range(ctx, args, opts):
    raise InvalidOperationError("int_range is materialized by the executor")


@register("repeat_value", lambda dts, opts: opts.get("dtype") or dts[0], elementwise=False)
def _repeat_value(ctx, args, opts):
    raise InvalidOperationError("repeat is materialized by the executor")


@register("date_range", dt.Date(), elementwise=False)
def _date_range(ctx, args, opts):
    raise InvalidOperationError("date_range is materialized by the executor")


@register("datetime_range", lambda dts, opts: dt.Datetime(opts.get("time_unit", "us")), elementwise=False)
def _datetime_range(ctx, args, opts):
    raise InvalidOperationError("datetime_range is materialized by the executor")


@register("int_ranges", lambda dts, opts: dt.List(opts.get("dtype", dt.Int64())), elementwise=False)
def _int_ranges(ctx, args, opts):
    raise InvalidOperationError("int_ranges is materialized by the executor")


@register("date_ranges", lambda dts, opts: dt.List(dt.Date()), elementwise=False)
def _date_ranges(ctx, args, opts):
    raise InvalidOperationError("date_ranges is materialized by the executor")


@register("datetime_ranges", lambda dts, opts: dt.List(dt.Datetime(opts.get("time_unit", "us"))), elementwise=False)
def _datetime_ranges(ctx, args, opts):
    raise InvalidOperationError("datetime_ranges is materialized by the executor")


@register("linear_spaces", lambda dts, opts: dt.List(dt.Float64()), elementwise=False)
def _linear_spaces(ctx, args, opts):
    raise InvalidOperationError("linear_spaces is materialized by the executor")


@register("time_ranges", lambda dts, opts: dt.List(dt.Time()), elementwise=False)
def _time_ranges(ctx, args, opts):
    raise InvalidOperationError("time_ranges is materialized by the executor")


@register("arg_where", dt.UInt32(), elementwise=False)
def _arg_where(ctx, args, opts):
    raise InvalidOperationError("arg_where changes length; handled by the executor")


@register("search_sorted", dt.UInt32(), elementwise=False)
def _search_sorted(ctx, args, opts):
    from polars_tpu.engine.groupby import _big

    v, elem = args
    if v.table is not None and elem.table is not None:
        # align both dictionaries onto one ORDINAL code space — binary search
        # compares codes, so they must share one lex-ordered mapping
        from polars_tpu.engine.strings import ensure_ordinal_val, unify_vals

        v, elem = ensure_ordinal_val(v), ensure_ordinal_val(elem)
        if v.table is not elem.table:
            v, elem = unify_vals(v, elem, require_ordinal=True)
    # padding rows (and nulls) would break the binary search: replace them
    # with the dtype's max sentinel so the padded array stays sorted, then
    # results naturally clip to the logical length
    mask = ctx.rowmask
    if v.validity is not None:
        mask = mask & v.validity
    x = jnp.where(mask, v.values, _big(v.values.dtype))
    side = opts.get("side", "any")
    idx = jnp.searchsorted(x, elem.values, side="right" if side == "right" else "left")
    return Val(idx.astype(jnp.uint32), None, dt.UInt32(), None, elem.domain)


@register("make_date", dt.Date())
def _make_date(ctx, args, opts):
    from polars_tpu.kernels.temporal import days_from_civil

    y, m, d = args
    days = days_from_civil(y.values, m.values, d.values)
    validity = combine_validity(y.validity, m.validity, d.validity)
    dom = ROW if any(a.domain == ROW for a in args) else args[0].domain
    return Val(days, validity, dt.Date(), None, dom)


@register("make_datetime", lambda dts, opts: dt.Datetime(opts.get("time_unit", "us")))
def _make_datetime(ctx, args, opts):
    from polars_tpu.kernels.temporal import days_from_civil

    tu = opts.get("time_unit", "us")
    mult = {"ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}[tu]
    y, mo, d = args[0], args[1], args[2]
    rest = args[3:]
    days = days_from_civil(y.values, mo.values, d.values).astype(jnp.int64)
    out = days * 86_400 * mult
    scales = [3600 * mult, 60 * mult, mult, mult // 1_000_000 if mult >= 1_000_000 else 0]
    for i, r in enumerate(rest):
        if i < 3:
            out = out + r.values.astype(jnp.int64) * scales[i]
        else:
            out = out + floordiv_const(r.values.astype(jnp.int64) * mult, 1_000_000)
    validity = combine_validity(*[a.validity for a in args])
    dom = ROW if any(a.domain == ROW for a in args) else args[0].domain
    return Val(out, validity, dt.Datetime(tu), None, dom)


@register("make_duration", lambda dts, opts: dt.Duration(opts.get("time_unit", "us")))
def _make_duration(ctx, args, opts):
    tu = opts.get("time_unit", "us")
    mult = {"ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}[tu]
    per = {
        "weeks": 604_800 * mult, "days": 86_400 * mult, "hours": 3_600 * mult,
        "minutes": 60 * mult, "seconds": mult,
        "milliseconds": mult // 1_000 if mult >= 1_000 else 0,
        "microseconds": mult // 1_000_000 if mult >= 1_000_000 else 0,
        "nanoseconds": mult // 1_000_000_000 if mult >= 1_000_000_000 else 0,
    }
    units = opts["units"]
    out = None
    for u, a in zip(units, args):
        term = a.values.astype(jnp.int64) * per[u]
        out = term if out is None else out + term
    validity = combine_validity(*[a.validity for a in args])
    dom = ROW if any(a.domain == ROW for a in args) else (args[0].domain if args else SCALAR)
    return Val(out, validity, dt.Duration(tu), None, dom)


@register("pack_pair", SAME)
def _pack_pair(ctx, args, opts):
    raise InvalidOperationError("corr/cov are evaluated by the aggregation engine")


@register("concat_str", dt.String())
def _concat_str(ctx, args, opts):
    raise InvalidOperationError("concat_str is a host op (hoisted by the executor)")


@register("as_struct", lambda dts, opts: dt.Struct(), elementwise=True)
def _as_struct(ctx, args, opts):
    raise InvalidOperationError("struct dtype pending nested layout")


@register("gather_every", SAME, elementwise=False)
def _gather_every(ctx, args, opts):
    raise InvalidOperationError("gather_every changes length; handled by the executor")


def _repeat_by_dt(dts, opts):
    return dt.List(dts[0])


@register("repeat_by", _repeat_by_dt, elementwise=False)
def _repeat_by(ctx, args, opts):
    raise InvalidOperationError("repeat_by is a host op (routed via special select)")


@register("explode", SAME, elementwise=False)
def _explode(ctx, args, opts):
    raise InvalidOperationError("explode is handled by the frame-level explode node")


@register("append", SAME, elementwise=False)
def _append(ctx, args, opts):
    raise InvalidOperationError("expression append changes length; use concat")


@register("extend_constant", SAME, elementwise=False)
def _extend_constant(ctx, args, opts):
    raise InvalidOperationError("extend_constant changes length; handled by the executor")


def _cut_labels(breaks, labels, left_closed: bool) -> list:
    """Interval labels in bin order (reference cut returns an Enum of these,
    py-polars tests/unit/operations/test_cut.py::test_cut)."""
    if labels is None:
        edges = ["-inf"] + [_fmt_break(float(b)) for b in breaks] + ["inf"]
        if left_closed:
            labels = [f"[{a}, {b})" for a, b in zip(edges[:-1], edges[1:])]
        else:
            labels = [f"({a}, {b}]" for a, b in zip(edges[:-1], edges[1:])]
    labels = [str(l) for l in labels]
    if len(labels) != len(list(breaks)) + 1:
        raise ShapeError(
            f"expected {len(list(breaks)) + 1} labels, got {len(labels)}"
        )
    return labels


def _cut_impl(v: Val, breaks: list, labels, left_closed: bool) -> Val:
    from polars_tpu.utils import strtable

    brks = [float(b) for b in breaks]
    labels = _cut_labels(brks, labels, left_closed)
    # bin index per row
    x = v.values.astype(jnp.float64)
    idx = jnp.zeros(x.shape, jnp.int32)
    for b in brks:
        if left_closed:
            idx = idx + (x >= b).astype(jnp.int32)
        else:
            idx = idx + (x > b).astype(jnp.int32)
    # Enum of the labels in bin order: codes are category positions
    table = strtable.StringTable(np.asarray(labels, object), sorted_order=False)
    return Val(idx, v.validity, dt.Enum(list(labels)), table, v.domain)


@register("cut_breakpoint", dt.Float64(), elementwise=True)
def _cut_breakpoint(ctx, args, opts):
    """Right bin edge per row for cut(include_breaks=True) (reference struct
    field 'breakpoint', py-polars tests test_cut_include_breaks)."""
    v = args[0]
    brks = [float(b) for b in opts["breaks"]]
    left_closed = opts.get("left_closed", False)
    x = v.values.astype(jnp.float64)
    idx = jnp.zeros(x.shape, jnp.int32)
    for b in brks:
        idx = idx + ((x >= b) if left_closed else (x > b)).astype(jnp.int32)
    edges = jnp.asarray(np.asarray(brks + [np.inf], np.float64))
    return Val(edges[idx], v.validity, dt.Float64(), None, v.domain)


@register("qcut_breakpoint", dt.Float64(), elementwise=False)
def _qcut_breakpoint(ctx, args, opts):
    v = args[0]
    qs = list(opts["quantiles"])
    left_closed = opts.get("left_closed", False)
    mask = ctx.rowmask if v.validity is None else (ctx.rowmask & v.validity)
    from polars_tpu.engine.groupby import seg_quantile

    gz = jnp.zeros((ctx.padded,), jnp.int32)
    brks = []
    for q in qs:
        bq, _ = seg_quantile(v.values, mask, gz, 1, float(q), "linear")
        brks.append(bq[0])
    x = v.values.astype(jnp.float64)
    idx = jnp.zeros(x.shape, jnp.int32)
    for b in brks:
        idx = idx + ((x >= b) if left_closed else (x > b)).astype(jnp.int32)
    edges = jnp.concatenate(
        [jnp.stack([b.astype(jnp.float64) for b in brks]) if brks else jnp.zeros((0,), jnp.float64),
         jnp.asarray([np.inf], jnp.float64)]
    )
    return Val(edges[idx], v.validity, dt.Float64(), None, v.domain)


def _fmt_break(b: float) -> str:
    if b == int(b):
        return str(int(b))
    return str(b)


def _cut_dtype(dts, opts):
    return dt.Enum(_cut_labels(
        list(opts.get("breaks", opts.get("quantiles", ()))),
        opts.get("labels"), opts.get("left_closed", False),
    ))


@register("cut", _cut_dtype, elementwise=True)
def _cut(ctx, args, opts):
    return _cut_impl(args[0], list(opts["breaks"]), opts.get("labels"), opts.get("left_closed", False))


@register("qcut", _cut_dtype, elementwise=False)
def _qcut(ctx, args, opts):
    v = args[0]
    qs = list(opts["quantiles"])
    # data-dependent break points via global quantiles (traced)
    mask = ctx.rowmask if v.validity is None else (ctx.rowmask & v.validity)
    from polars_tpu.engine.groupby import seg_quantile

    gz = jnp.zeros((ctx.padded,), jnp.int32)
    brks = []
    for q in qs:
        bq, _ = seg_quantile(v.values, mask, gz, 1, float(q), "linear")
        brks.append(bq[0])
    # breaks are traced -> compare directly; labels are static from the
    # quantile FRACTIONS (the reference labels with the data-dependent break
    # values, which cannot live in a static Enum dtype under tracing — a
    # documented divergence; explicit labels= match exactly)
    labels = _cut_labels(qs, opts.get("labels"), opts.get("left_closed", False))
    x = v.values.astype(jnp.float64)
    idx = jnp.zeros(x.shape, jnp.int32)
    for b in brks:
        if opts.get("left_closed", False):
            idx = idx + (x >= b).astype(jnp.int32)
        else:
            idx = idx + (x > b).astype(jnp.int32)
    from polars_tpu.utils import strtable

    table = strtable.StringTable(np.asarray(labels, object), sorted_order=False)
    return Val(idx, v.validity, dt.Enum(list(labels)), table, v.domain)

@register("rle_id", dt.UInt32(), elementwise=False)
def _rle_id(ctx, args, opts):
    """Run id per row (0-based, increments when value or validity changes)."""
    v = args[0]
    n = v.values.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    prev = jnp.roll(v.values, 1)
    change = (v.values != prev) | (iota == 0)
    if v.validity is not None:
        pv = jnp.roll(v.validity, 1)
        change = change | (v.validity != pv)
        change = jnp.where(~v.validity & ~pv & (iota != 0), False, change)
    # padding rows must not perturb ids of valid rows before them
    change = change & ctx.rowmask
    ids = jnp.cumsum(change.astype(jnp.uint32)) - 1
    return Val(ids.astype(jnp.uint32), None, dt.UInt32(), None, v.domain)


@register("round_sig_figs", lambda dts, opts: dts[0], elementwise=True)
def _round_sig_figs(ctx, args, opts):
    v = args[0]
    d = int(opts["digits"])
    x = v.values.astype(jnp.float64)
    mag = jnp.floor(jnp.log10(jnp.maximum(jnp.abs(x), 1e-300)))
    scale = 10.0 ** (d - 1 - mag)
    out = jnp.round(x * scale) / jnp.maximum(scale, 1e-300)
    out = jnp.where(x == 0, 0.0, out)
    np_d = jnp.dtype(dt.dtype_to_numpy(v.dtype)) if v.dtype.is_float() else jnp.float64
    return Val(out.astype(np_d), v.validity, v.dtype if v.dtype.is_float() else dt.Float64(), None, v.domain)


@register("lower_bound", lambda dts, opts: dts[0], elementwise=False)
def _lower_bound(ctx, args, opts):
    v = args[0]
    import numpy as _np

    np_d = dt.dtype_to_numpy(v.dtype)
    if v.dtype.is_float():
        val = -_np.inf
    else:
        val = _np.iinfo(np_d).min
    return Val(jnp.asarray(val, jnp.dtype(np_d)), None, v.dtype, None, "scalar")


@register("upper_bound", lambda dts, opts: dts[0], elementwise=False)
def _upper_bound(ctx, args, opts):
    v = args[0]
    import numpy as _np

    np_d = dt.dtype_to_numpy(v.dtype)
    if v.dtype.is_float():
        val = _np.inf
    else:
        val = _np.iinfo(np_d).max
    return Val(jnp.asarray(val, jnp.dtype(np_d)), None, v.dtype, None, "scalar")

