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


register("list.len", dt.UInt32(), elementwise=False)(_host("list.len"))
register("list.sum", _sum_dt, elementwise=False)(_host("list.sum"))
register("list.mean", dt.Float64(), elementwise=False)(_host("list.mean"))
register("list.min", _inner, elementwise=False)(_host("list.min"))
register("list.max", _inner, elementwise=False)(_host("list.max"))
register("list.get", _inner, elementwise=False)(_host("list.get"))
register("list.contains", dt.Boolean(), elementwise=False)(_host("list.contains"))
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


def _float_dt(dts, opts):
    return dt.Float64()


for _kind in ("sum", "mean", "min", "max", "std", "var", "first", "last", "count"):
    rule = _same if _kind in ("sum", "min", "max", "first", "last") else _float_dt
    register(f"rolling_{_kind}_by", rule, elementwise=False)(_host(f"rolling_{_kind}_by"))
