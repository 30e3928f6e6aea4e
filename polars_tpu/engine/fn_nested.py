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
        # exact fills per accumulator class: int64 keeps temporal ns exact
        # (an f64 cast would round ticks above 2^53); string codes are
        # ordinal so min/max code == lexicographic min/max
        if cv.dtype in (jnp.float32, jnp.float64):
            work = cv.astype(jnp.float64)
            fill = jnp.float64(np.inf if kind == "min" else -np.inf)
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
        validity = cnt > 0
        if v.validity is not None:
            validity = validity & v.validity
        np_dt = jnp.dtype(dt.dtype_to_numpy(inner))
        return Val(out.astype(np_dt), validity, inner, ch.table, v.domain)


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
    idx = jnp.clip(starts + i, 0, ch.values.shape[0] - 1)
    out = ch.values[idx]
    validity = in_range & ok[idx]
    if v.validity is not None:
        validity = validity & v.validity
    return Val(out, validity, v.dtype.inner, ch.table, v.domain, ch.child)


@register("list.contains", dt.Boolean(), elementwise=False)
def _list_contains(ctx, args, opts):
    import jax.numpy as jnp

    from polars_tpu.engine.common import Val

    v = args[0]
    ch, ok = _traced_child(v, "list.contains")
    item = args[1]
    hit = (ch.values == item.values.astype(ch.values.dtype)) & ok
    cnt = _range_sum(v.values, hit.astype(jnp.int32), ch.values.shape[0])
    return Val(cnt > 0, v.validity, dt.Boolean(), None, v.domain)


register("list.join", dt.String(), elementwise=False)(_host("list.join"))
register("list.sort", _same, elementwise=False)(_host("list.sort"))
register("list.reverse", _same, elementwise=False)(_host("list.reverse"))
register("list.unique", _same, elementwise=False)(_host("list.unique"))
register("explode", _inner, elementwise=False)(_host("explode"))


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


register("as_struct", _struct_dt, elementwise=False)(_host("as_struct"))
register("struct.field", _field_dt, elementwise=False)(_host("struct.field"))
register("struct.rename_fields", _same, elementwise=False)(_host("struct.rename_fields"))


register("sample", _same, elementwise=False)(_host("sample"))
register("shuffle", _same, elementwise=False)(_host("shuffle"))
register("arg_where_self", dt.UInt32(), elementwise=False)(_host("arg_where_self"))


def _rle_dt(dts, opts):
    return dt.Struct([("len", dt.UInt32()), ("value", dts[0])])


register("rle", _rle_dt, elementwise=False)(_host("rle"))


# rolling_*_by are TRACED ops (engine/fn_position.py) since round 2 — the
# searchsorted-window core runs inside the fused segment, no host barrier.
