"""Temporal ops on integer epochs (reference: polars-time, dtype-expr dt.*)."""

from __future__ import annotations

import jax.numpy as jnp

from polars_tpu.kernels.fastmath import div_any, floordiv_any, floordiv_const, mod_any, mod_const

from polars_tpu import datatypes as dt
from polars_tpu.engine.common import Val
from polars_tpu.engine.registry import BOOL, register
from polars_tpu.errors import InvalidOperationError
from polars_tpu.kernels import temporal as T

_TU = {"ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}


def _local_vals(v: Val) -> jnp.ndarray:
    """Wall-clock values: tz-aware Datetimes localize from their stored UTC
    instants via the static transition table (kernels/timezone.py)."""
    if type(v.dtype).__name__ == "Datetime" and v.dtype.time_zone:
        from polars_tpu.kernels.timezone import local_from_utc

        return local_from_utc(v.values, v.dtype.time_unit, v.dtype.time_zone)
    return v.values


def _days_of(v: Val) -> jnp.ndarray:
    name = type(v.dtype).__name__
    if name == "Date":
        return v.values.astype(jnp.int64)
    if name == "Datetime":
        per_day = _TU[v.dtype.time_unit] * 86_400
        return floordiv_any(_local_vals(v), per_day)
    raise InvalidOperationError(f"expected Date/Datetime, got {v.dtype!r}")


def _time_part(v: Val) -> tuple[jnp.ndarray, int]:
    """(nonnegative intra-day offset, ticks per second)."""
    name = type(v.dtype).__name__
    if name == "Datetime":
        per_day = _TU[v.dtype.time_unit] * 86_400
        return mod_any(_local_vals(v), per_day), _TU[v.dtype.time_unit]
    if name == "Time":
        return v.values, 1_000_000_000
    if name == "Duration":
        return v.values, _TU[v.dtype.time_unit]
    if name == "Date":
        return jnp.zeros_like(v.values, jnp.int64), 1
    raise InvalidOperationError(f"no time component in {v.dtype!r}")


def _simple(name, out_dt, fn):
    @register(f"dt.{name}", out_dt)
    def _(ctx, args, opts):
        v = args[0]
        return Val(fn(v), v.validity, out_dt if isinstance(out_dt, dt.DataType) else out_dt([v.dtype], opts), None, v.domain)


_simple("year", dt.Int32(), lambda v: T.civil_from_days(_days_of(v))[0])
_simple("month", dt.Int8(), lambda v: T.civil_from_days(_days_of(v))[1])
_simple("day", dt.Int8(), lambda v: T.civil_from_days(_days_of(v))[2])
_simple("quarter", dt.Int8(), lambda v: (floordiv_const(T.civil_from_days(_days_of(v))[1].astype(jnp.int32) - 1, 3) + 1).astype(jnp.int8))
_simple("weekday", dt.Int8(), lambda v: T.weekday_from_days(_days_of(v)))
_simple("week", dt.Int8(), lambda v: T.iso_week(_days_of(v)))
_simple("iso_year", dt.Int32(), lambda v: T.iso_year(_days_of(v)))
_simple("ordinal_day", dt.Int16(), lambda v: T.ordinal_day(_days_of(v)))
_simple("leap_year", dt.Boolean(), lambda v: T.is_leap_year(T.civil_from_days(_days_of(v))[0]))
_simple(
    "days_in_month", dt.Int8(),
    lambda v: T.days_in_month(T.civil_from_days(_days_of(v))[0], T.civil_from_days(_days_of(v))[1]),
)


@register("dt.hour", dt.Int8())
def _hour(ctx, args, opts):
    v = args[0]
    t, per_s = _time_part(v)
    return Val(floordiv_any(t, per_s * 3600).astype(jnp.int8), v.validity, dt.Int8(), None, v.domain)


@register("dt.minute", dt.Int8())
def _minute(ctx, args, opts):
    v = args[0]
    t, per_s = _time_part(v)
    return Val((floordiv_any(t, per_s * 60) % 60).astype(jnp.int8), v.validity, dt.Int8(), None, v.domain)


@register("dt.second", lambda dts, opts: dt.Float64() if opts.get("fractional") else dt.Int8())
def _second(ctx, args, opts):
    v = args[0]
    t, per_s = _time_part(v)
    if opts.get("fractional"):
        out = (mod_any(t, per_s * 60).astype(jnp.float64)) / per_s
        return Val(out, v.validity, dt.Float64(), None, v.domain)
    return Val((floordiv_any(t, per_s) % 60).astype(jnp.int8), v.validity, dt.Int8(), None, v.domain)


@register("dt.millisecond", dt.Int32())
def _millisecond(ctx, args, opts):
    v = args[0]
    t, per_s = _time_part(v)
    frac = mod_any(t, per_s)
    out = frac * 1_000 // per_s if per_s >= 1_000 else frac * (1_000 // per_s)
    return Val(out.astype(jnp.int32), v.validity, dt.Int32(), None, v.domain)


@register("dt.microsecond", dt.Int32())
def _microsecond(ctx, args, opts):
    v = args[0]
    t, per_s = _time_part(v)
    frac = mod_any(t, per_s)
    out = frac * 1_000_000 // per_s if per_s >= 1_000_000 else frac * (1_000_000 // per_s)
    return Val(out.astype(jnp.int32), v.validity, dt.Int32(), None, v.domain)


@register("dt.nanosecond", dt.Int32())
def _nanosecond(ctx, args, opts):
    v = args[0]
    t, per_s = _time_part(v)
    frac = mod_any(t, per_s)
    out = frac * (1_000_000_000 // per_s)
    return Val(out.astype(jnp.int32), v.validity, dt.Int32(), None, v.domain)


@register("dt.date", dt.Date())
def _date(ctx, args, opts):
    v = args[0]
    return Val(_days_of(v).astype(jnp.int32), v.validity, dt.Date(), None, v.domain)


@register("dt.time", dt.Time())
def _time(ctx, args, opts):
    v = args[0]
    t, per_s = _time_part(v)
    out = t * (1_000_000_000 // per_s)
    return Val(out.astype(jnp.int64), v.validity, dt.Time(), None, v.domain)


@register("dt.datetime", lambda dts, opts: dt.Datetime("us"))
def _datetime(ctx, args, opts):
    v = args[0]
    if isinstance(v.dtype, dt.Date):
        return Val(v.values.astype(jnp.int64) * 86_400_000_000, v.validity, dt.Datetime("us"), None, v.domain)
    return v.with_(dtype=dt.Datetime(v.dtype.time_unit))


@register("dt.timestamp", lambda dts, opts: dt.Int64())
def _timestamp(ctx, args, opts):
    v = args[0]
    tu = opts.get("time_unit", "us")
    per = {"s": 1, "d": 1, "ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}[tu]
    if isinstance(v.dtype, dt.Date):
        days = v.values.astype(jnp.int64)
        out = days if tu == "d" else days * 86_400 * per
    else:
        src = _TU[v.dtype.time_unit]
        x = v.values.astype(jnp.int64)
        if tu == "d":
            out = floordiv_any(x, src * 86_400)
        elif per >= src:
            out = x * (per // src)
        else:
            out = floordiv_any(x, src // per)
    return Val(out, v.validity, dt.Int64(), None, v.domain)


@register("dt.with_time_unit", lambda dts, opts: dt.Datetime(opts["time_unit"]) if type(dts[0]).__name__ == "Datetime" else dt.Duration(opts["time_unit"]))
def _with_time_unit(ctx, args, opts):
    v = args[0]
    tu = opts["time_unit"]
    new = dt.Datetime(tu) if isinstance(v.dtype, dt.Datetime) else dt.Duration(tu)
    return v.with_(dtype=new)


@register("dt.cast_time_unit", lambda dts, opts: dt.Datetime(opts["time_unit"]) if type(dts[0]).__name__ == "Datetime" else dt.Duration(opts["time_unit"]))
def _cast_time_unit(ctx, args, opts):
    v = args[0]
    tu = opts["time_unit"]
    src = _TU[v.dtype.time_unit]
    dst = _TU[tu]
    x = v.values
    out = x * (dst // src) if dst >= src else floordiv_any(x, src // dst)
    new = dt.Datetime(tu) if isinstance(v.dtype, dt.Datetime) else dt.Duration(tu)
    return Val(out, v.validity, new, None, v.domain)


@register("dt.total", lambda dts, opts: dt.Int64())
def _total(ctx, args, opts):
    v = args[0]
    unit = opts["unit"]
    per_s = _TU[v.dtype.time_unit]
    x = v.values.astype(jnp.int64)
    div = {
        "d": per_s * 86_400, "h": per_s * 3_600, "m": per_s * 60, "s": per_s,
        "ms": per_s // 1_000 if per_s >= 1_000 else 1,
        "us": per_s // 1_000_000 if per_s >= 1_000_000 else 1,
        "ns": per_s // 1_000_000_000 if per_s >= 1_000_000_000 else 1,
    }[unit]
    if unit in ("ms", "us", "ns") and _TU[v.dtype.time_unit] < {"ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}[unit]:
        mul = {"ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}[unit] // per_s
        return Val(x * mul, v.validity, dt.Int64(), None, v.domain)
    out = jnp.where(x < 0, -floordiv_any(-x, div), floordiv_any(x, div))
    return Val(out, v.validity, dt.Int64(), None, v.domain)


def _parse_every(every: str) -> tuple[int, str]:
    """Parse polars interval strings like '1d', '3mo', '2h30m' (single unit only)."""
    import re as _re

    m = _re.fullmatch(r"(\d+)(ns|us|ms|s|m|h|d|w|mo|q|y)", every)
    if not m:
        raise InvalidOperationError(f"unsupported interval {every!r}")
    return int(m.group(1)), m.group(2)


_UNIT_TICKS_US = {
    "ns": 0, "us": 1, "ms": 1_000, "s": 1_000_000, "m": 60_000_000,
    "h": 3_600_000_000, "d": 86_400_000_000, "w": 604_800_000_000,
}


def _wall_op(v: Val, fn):
    """Run a wall-clock transformation on a (possibly tz-aware) Datetime:
    localize to wall time, apply, convert back to UTC instants
    ('earliest' on DST-ambiguous results, like polars truncate)."""
    tz = getattr(v.dtype, "time_zone", None)
    if not tz:
        return fn(v)
    from polars_tpu.kernels import timezone as TZ

    tu = v.dtype.time_unit
    naive = v.with_(
        values=TZ.local_from_utc(v.values, tu, tz), dtype=dt.Datetime(tu)
    )
    out = fn(naive)
    utc, _amb, _non = TZ.utc_from_local(out.values, tu, tz, "earliest")
    return out.with_(values=utc, dtype=v.dtype)


@register("dt.truncate", lambda dts, opts: dts[0])
def _truncate(ctx, args, opts):
    return _wall_op(args[0], lambda v: _truncate_naive(ctx, v, opts))


def _truncate_naive(ctx, v, opts):
    n, unit = _parse_every(opts["every"])
    if isinstance(v.dtype, dt.Date):
        if unit in ("d", "w"):
            step = n * (7 if unit == "w" else 1)
            off = 4 if unit == "w" else 0  # 1970-01-01 is a Thursday; weeks start Monday
            x = v.values.astype(jnp.int64) + (3 if unit == "w" else 0)
            out = (floordiv_any(x, step) * step - (3 if unit == "w" else 0)).astype(jnp.int32)
            return v.with_(values=out)
        if unit in ("mo", "q", "y"):
            y, m, _ = T.civil_from_days(v.values.astype(jnp.int64))
            if unit == "y":
                m2 = jnp.ones_like(m, jnp.int64)
                y2 = floordiv_const(y.astype(jnp.int64), n) * n if n > 1 else y.astype(jnp.int64)
            else:
                months = y.astype(jnp.int64) * 12 + (m.astype(jnp.int64) - 1)
                step = n * (3 if unit == "q" else 1)
                months = floordiv_any(months, step) * step
                y2 = floordiv_const(months, 12)
                m2 = mod_const(months, 12) + 1
            out = T.days_from_civil(y2, m2, jnp.ones_like(m2))
            return v.with_(values=out)
        raise InvalidOperationError(f"cannot truncate Date by {unit!r}")
    if isinstance(v.dtype, dt.Datetime):
        per_us = _TU[v.dtype.time_unit] // 1_000_000 or 1
        if unit in _UNIT_TICKS_US and _UNIT_TICKS_US[unit] > 0:
            step = n * _UNIT_TICKS_US[unit] * per_us
            # weeks anchor on Monday; the epoch (1970-01-01) is a Thursday,
            # so shift by 3 days before flooring (reference polars-time)
            anchor = 3 * 86_400_000_000 * per_us if unit == "w" else 0
            out = floordiv_any(v.values + anchor, step) * step - anchor
            return v.with_(values=out)
        if unit in ("mo", "q", "y"):
            per_day = _TU[v.dtype.time_unit] * 86_400
            days = floordiv_any(v.values, per_day)
            y, m, _ = T.civil_from_days(days)
            if unit == "y":
                m2 = jnp.ones_like(m, jnp.int64)
                y2 = y.astype(jnp.int64)
            else:
                months = y.astype(jnp.int64) * 12 + (m.astype(jnp.int64) - 1)
                step = n * (3 if unit == "q" else 1)
                months = floordiv_any(months, step) * step
                y2 = floordiv_const(months, 12)
                m2 = mod_const(months, 12) + 1
            out_days = T.days_from_civil(y2, m2, jnp.ones_like(m2))
            return v.with_(values=out_days.astype(jnp.int64) * per_day)
    raise InvalidOperationError(f"cannot truncate {v.dtype!r}")


@register("dt.month_start", lambda dts, opts: dts[0])
def _month_start(ctx, args, opts):
    # time-of-day is preserved (reference: expr/datetime.py month_start)
    return _wall_op(args[0], lambda v: _month_day_naive(v, first=True))


@register("dt.month_end", lambda dts, opts: dts[0])
def _month_end(ctx, args, opts):
    return _wall_op(args[0], lambda v: _month_day_naive(v, first=False))


def _month_day_naive(v, *, first):
    days = _days_of(v)
    y, m, _ = T.civil_from_days(days)
    d2 = jnp.ones_like(m, jnp.int64) if first else T.days_in_month(y, m).astype(jnp.int64)
    out_days = T.days_from_civil(y.astype(jnp.int64), m.astype(jnp.int64), d2)
    if isinstance(v.dtype, dt.Date):
        return v.with_(values=out_days.astype(v.values.dtype))
    per_day = _TU[v.dtype.time_unit] * 86_400
    return v.with_(values=out_days.astype(jnp.int64) * per_day + mod_any(v.values, per_day))


@register("dt.offset_by", lambda dts, opts: dts[0])
def _offset_by(ctx, args, opts):
    n, unit = _parse_every(opts["by"].lstrip("-"))
    if unit in ("mo", "q", "y", "d", "w"):
        # calendar-unit offsets move WALL time (reference: polars-time
        # Duration::add with is_calendar_date); sub-day units are physical
        return _wall_op(args[0], lambda v: _offset_by_naive(v, opts))
    return _offset_by_naive(args[0], opts)


def _offset_by_naive(v, opts):
    n, unit = _parse_every(opts["by"].lstrip("-"))
    if opts["by"].startswith("-"):
        n = -n
    if unit in ("mo", "q", "y"):
        months_off = n * {"mo": 1, "q": 3, "y": 12}[unit]
        days = _days_of(v)
        y, m, d = T.civil_from_days(days)
        months = y.astype(jnp.int64) * 12 + (m.astype(jnp.int64) - 1) + months_off
        y2 = floordiv_any(months, 12)
        m2 = mod_any(months, 12) + 1
        dim = T.days_in_month(y2, m2)
        d2 = jnp.minimum(d.astype(jnp.int64), dim.astype(jnp.int64))
        out_days = T.days_from_civil(y2, m2, d2)
        if isinstance(v.dtype, dt.Date):
            return v.with_(values=out_days)
        per_day = _TU[v.dtype.time_unit] * 86_400
        return v.with_(values=out_days.astype(jnp.int64) * per_day + mod_any(v.values, per_day))
    if isinstance(v.dtype, dt.Date):
        step = n * (7 if unit == "w" else 1)
        if unit in ("d", "w"):
            return v.with_(values=v.values + step)
        raise InvalidOperationError("sub-day offsets on Date")
    per_us = _TU[v.dtype.time_unit] // 1_000_000 or 1
    step = n * _UNIT_TICKS_US[unit] * per_us
    return v.with_(values=v.values + step)


@register("dt.dt_round", lambda dts, opts: dts[0])
def _dt_round(ctx, args, opts):
    return _wall_op(args[0], lambda v: _dt_round_naive(v, opts))


def _dt_round_naive(v, opts):
    n, unit = _parse_every(opts["every"])
    if isinstance(v.dtype, dt.Datetime) and unit in _UNIT_TICKS_US and _UNIT_TICKS_US[unit] > 0:
        per_us = _TU[v.dtype.time_unit] // 1_000_000 or 1
        step = n * _UNIT_TICKS_US[unit] * per_us
        anchor = 3 * 86_400_000_000 * per_us if unit == "w" else 0  # Monday weeks
        out = floordiv_any(v.values + anchor + step // 2, step) * step - anchor
        return v.with_(values=out)
    if isinstance(v.dtype, dt.Date) and unit in ("d", "w"):
        step = n * (7 if unit == "w" else 1)
        anchor = 3 if unit == "w" else 0
        out = (floordiv_any(v.values.astype(jnp.int64) + anchor + step // 2, step) * step - anchor).astype(jnp.int32)
        return v.with_(values=out)
    raise InvalidOperationError(f"dt.round by {unit!r} unsupported")


@register("dt.to_string", dt.String(), elementwise=False)
def _to_string(ctx, args, opts):
    raise InvalidOperationError("dt.to_string is a host op (hoisted by the executor)")


def _dt_with_tz(dts, opts):
    d = dts[0]
    if type(d).__name__ != "Datetime":
        raise InvalidOperationError(f"expected Datetime, got {d!r}")
    return dt.Datetime(d.time_unit, opts.get("time_zone"))


@register("dt.replace_time_zone", _dt_with_tz)
def _replace_tz(ctx, args, opts):
    """Reinterpret wall-clock values in a new zone: stored UTC instants shift
    so the LOCAL reading is unchanged (reference: polars-time
    replace_time_zone; crates/polars-time/src/utils.rs localize)."""
    from polars_tpu.kernels import timezone as TZ

    v = args[0]
    tu = v.dtype.time_unit
    new_tz = opts.get("time_zone")
    ambiguous = opts.get("ambiguous", "raise")
    wall = _local_vals(v)  # old zone's wall clock (or naive values)
    if new_tz is None:
        return Val(wall, v.validity, dt.Datetime(tu, None), None, v.domain)
    utc, amb, nonex = TZ.utc_from_local(wall, tu, new_tz, ambiguous)
    if ambiguous == "raise" and ctx is not None:
        mask = v.validity if v.validity is not None else jnp.ones(wall.shape, bool)
        from polars_tpu.engine.common import ROW as _ROW

        bad = (amb | nonex) & mask
        if v.domain == _ROW:
            bad = bad & ctx.rowmask
        ctx.add_flag(
            jnp.any(bad),
            "datetime is ambiguous or non-existent in the target time zone; "
            "use `ambiguous='earliest'/'latest'`",
        )
    return Val(utc, v.validity, dt.Datetime(tu, new_tz), None, v.domain)


@register("dt.convert_time_zone", _dt_with_tz)
def _convert_tz(ctx, args, opts):
    """Same instant, new display zone: UTC storage is zone-independent so the
    values pass through; only the dtype changes (reference: polars-time
    convert_time_zone — naive input is treated as UTC)."""
    v = args[0]
    return Val(v.values, v.validity, dt.Datetime(v.dtype.time_unit, opts.get("time_zone")), None, v.domain)


@register("dt.base_utc_offset", lambda dts, opts: dt.Duration("ms"))
def _base_utc_offset(ctx, args, opts):
    from polars_tpu.kernels import timezone as TZ

    v = args[0]
    if type(v.dtype).__name__ != "Datetime" or not v.dtype.time_zone:
        raise InvalidOperationError("base_utc_offset expects a tz-aware Datetime")
    tu, tz = v.dtype.time_unit, v.dtype.time_zone
    total = TZ.utc_offset(v.values, tu, tz)
    dst = TZ.dst_offset(v.values, tu, tz)
    ms = floordiv_const(total - dst, _TU[tu] // 1_000)
    return Val(ms, v.validity, dt.Duration("ms"), None, v.domain)


@register("dt.dst_offset", lambda dts, opts: dt.Duration("ms"))
def _dst_offset(ctx, args, opts):
    from polars_tpu.kernels import timezone as TZ

    v = args[0]
    if type(v.dtype).__name__ != "Datetime" or not v.dtype.time_zone:
        raise InvalidOperationError("dst_offset expects a tz-aware Datetime")
    tu, tz = v.dtype.time_unit, v.dtype.time_zone
    dst = TZ.dst_offset(v.values, tu, tz)
    ms = floordiv_const(dst, _TU[tu] // 1_000)
    return Val(ms, v.validity, dt.Duration("ms"), None, v.domain)


_simple(
    "century", dt.Int32(),
    lambda v: _ceil_div_pos(T.civil_from_days(_days_of(v))[0].astype(jnp.int32)),
)
_simple(
    "millennium", dt.Int32(),
    lambda v: _ceil_div_pos(T.civil_from_days(_days_of(v))[0].astype(jnp.int32), 1000),
)


def _ceil_div_pos(y, div=100):
    # polars: 2000 -> 20th century, 2001 -> 21st; works for BCE years too
    return -floordiv_const(-y, div).astype(jnp.int32)


@register("dt.combine", lambda dts, opts: dt.Datetime(opts.get("time_unit", "us")))
def _combine(ctx, args, opts):
    """Date (or Datetime's date part) + Time -> Datetime
    (reference: py-polars expr/datetime.py combine)."""
    v = args[0]
    days = _days_of(v)
    tu = opts.get("time_unit", "us")
    per_day = _TU[tu] * 86_400
    if len(args) > 1:
        t = args[1]
        if type(t.dtype).__name__ != "Time":
            raise InvalidOperationError("dt.combine expects a Time column")
        tod = floordiv_const(t.values, 1_000_000_000 // _TU[tu])  # Time is ns
        from polars_tpu.engine.common import combine_validity

        validity = combine_validity(v.validity, t.validity)
    else:
        ns = int(opts.get("time_ns", 0))
        tod = jnp.int64(ns * _TU[tu] // 1_000_000_000)
        validity = v.validity
    return Val(days * per_day + tod, validity, dt.Datetime(tu), None, v.domain)


@register("dt.replace", lambda dts, opts: dts[0])
def _dt_replace(ctx, args, opts):
    """Replace date/time components with static values (reference:
    py-polars expr/datetime.py replace)."""
    v = args[0]
    name = type(v.dtype).__name__
    if name not in ("Date", "Datetime"):
        raise InvalidOperationError(f"dt.replace expects Date/Datetime, got {v.dtype!r}")
    days = _days_of(v)
    y, m, d = T.civil_from_days(days)
    y = jnp.int32(opts["year"]) if opts.get("year") is not None else y.astype(jnp.int32)
    m = jnp.int32(opts["month"]) if opts.get("month") is not None else m.astype(jnp.int32)
    d = jnp.int32(opts["day"]) if opts.get("day") is not None else d.astype(jnp.int32)
    # clamp day into the (possibly new) month's length (reference replace
    # semantics: day invalid for month -> error; we saturate like offset_by)
    d = jnp.minimum(d, T.days_in_month(y, m).astype(jnp.int32))
    new_days = T.days_from_civil(y, m, d)
    if name == "Date":
        return Val(new_days.astype(jnp.int32), v.validity, v.dtype, None, v.domain)
    tu = v.dtype.time_unit
    per_day = _TU[tu] * 86_400
    tod = mod_any(_local_vals(v), per_day)
    for part, ticks in (
        ("hour", _TU[tu] * 3_600),
        ("minute", _TU[tu] * 60),
        ("second", _TU[tu]),
        ("microsecond", _TU[tu] // 1_000_000 if _TU[tu] >= 1_000_000 else None),
    ):
        if opts.get(part) is None:
            continue
        if ticks is None:
            raise InvalidOperationError(f"cannot set {part} on {tu}-unit Datetime")
        unit_span = {"hour": 24, "minute": 60, "second": 60, "microsecond": 1_000_000}[part]
        cur = mod_const(floordiv_any(tod, ticks), unit_span)
        tod = tod + (jnp.int64(int(opts[part])) - cur) * ticks
    wall = new_days.astype(jnp.int64) * per_day + tod
    if v.dtype.time_zone:
        from polars_tpu.kernels import timezone as TZ

        out, _amb, _non = TZ.utc_from_local(
            wall, tu, v.dtype.time_zone, opts.get("ambiguous", "earliest") or "earliest"
        )
        return Val(out, v.validity, v.dtype, None, v.domain)
    return Val(wall, v.validity, v.dtype, None, v.domain)


def _bday_setup(opts):
    mask = tuple(bool(m) for m in opts.get("week_mask", (1, 1, 1, 1, 1, 0, 0)))
    if not any(mask):
        raise InvalidOperationError("week_mask must have at least one business day")
    holidays = tuple(int(h) for h in opts.get("holidays", ()))
    return mask, holidays


@register("dt.is_business_day", BOOL)
def _is_business_day(ctx, args, opts):
    v = args[0]
    days = _days_of(v)
    mask, holidays = _bday_setup(opts)
    dow = mod_any(days + 3, 7)
    out = jnp.zeros(days.shape, bool)
    for w, keep in enumerate(mask):
        if keep:
            out = out | (dow == w)
    for h in holidays:
        out = out & (days != h)
    return Val(out, v.validity, dt.Boolean(), None, v.domain)


@register("dt.add_business_days", lambda dts, opts: dts[0])
def _add_business_days(ctx, args, opts):
    """Offset by n business days (reference: py-polars expr/datetime.py
    add_business_days; polars-ops business.rs). The scan over calendar days
    unrolls statically: advancing |n| business days needs at most
    ceil(|n| * 7 / open_days) + 7 calendar days, so we iterate that bound."""
    v = args[0]
    name = type(v.dtype).__name__
    days = _days_of(v)
    mask, holidays = _bday_setup(opts)
    if len(args) > 1:
        n = args[1].values.astype(jnp.int64)
        n_max = int(opts.get("n_hint", 365))
    else:
        n = jnp.int64(int(opts.get("n", 1)))
        n_max = abs(int(opts.get("n", 1)))
    roll = opts.get("roll", "raise")
    open_per_week = sum(mask)

    def is_open(dd):
        dow = mod_any(dd + 3, 7)
        o = jnp.zeros(dd.shape if hasattr(dd, "shape") else (), bool)
        for w, keep in enumerate(mask):
            if keep:
                o = o | (dow == w)
        for h in holidays:
            o = o & (dd != h)
        return o

    start_open = is_open(days)
    if roll == "forward":
        for _ in range(8 + len(holidays)):
            days = jnp.where(is_open(days), days, days + 1)
    elif roll == "backward":
        for _ in range(8 + len(holidays)):
            days = jnp.where(is_open(days), days, days - 1)
    elif ctx is not None:
        bad = ~start_open
        if v.validity is not None:
            bad = bad & v.validity
        from polars_tpu.engine.common import ROW as _ROW

        if v.domain == _ROW:
            bad = bad & ctx.rowmask
        ctx.add_flag(
            jnp.any(bad),
            "non-business day date; use `roll='forward'/'backward'`",
        )
    step = jnp.where(n >= 0, jnp.int64(1), jnp.int64(-1))
    remaining = jnp.abs(n)
    cal_bound = (n_max * 7) // max(open_per_week, 1) + 7 * (1 + len(holidays))
    cur = days
    for _ in range(int(cal_bound)):
        move = remaining > 0
        nxt = cur + step
        advance = move & is_open(nxt)
        cur = jnp.where(move, nxt, cur)
        remaining = remaining - advance.astype(jnp.int64)
    if name == "Date":
        return Val(cur.astype(jnp.int32), v.validity, v.dtype, None, v.domain)
    per_day = _TU[v.dtype.time_unit] * 86_400
    tod = mod_any(v.values, per_day)
    return Val(cur * per_day + tod, v.validity, v.dtype, None, v.domain)


@register("business_day_count", dt.Int32())
def _business_day_count(ctx, args, opts):
    """Business days in [start, end), signed (reference:
    py-polars/src/polars/functions/business.py; polars-ops business.rs).
    week_mask and holidays are static literals, so the per-weekday counting
    loop unrolls at trace time into pure vector arithmetic (MXU-free VPU ops).
    """
    from polars_tpu.engine.common import combine_validity

    s_v, e_v = args
    s = _days_of(s_v)
    e = _days_of(e_v)
    mask = tuple(bool(m) for m in opts.get("week_mask", (1, 1, 1, 1, 1, 0, 0)))
    holidays = tuple(int(h) for h in opts.get("holidays", ()))
    # swapped ranges count (end, start] — i.e. [end+1, start+1) — then negate
    # (reference business.rs:117-122)
    neg = e < s
    lo = jnp.where(neg, e + 1, s)
    hi = jnp.where(neg, s + 1, e)
    span = hi - lo
    # dow 0=Monday..6=Sunday; epoch day 0 (1970-01-01) was a Thursday.
    dow_lo = mod_any(lo + 3, 7)
    total = jnp.zeros_like(lo)
    for w, keep in enumerate(mask):
        if not keep:
            continue
        # first day >= lo with weekday w, as an offset from lo
        off = mod_any(jnp.int64(w) - dow_lo, 7)
        cnt = jnp.maximum(floordiv_any(span - off + 6, 7), 0)
        total = total + cnt
    for h in holidays:
        hd = (h + 3) % 7
        if not mask[hd]:
            continue
        total = total - ((lo <= h) & (h < hi)).astype(jnp.int64)
    total = jnp.where(neg, -total, total)
    return Val(total.astype(jnp.int32), combine_validity(s_v.validity, e_v.validity),
               dt.Int32(), None, s_v.domain if s_v.domain == e_v.domain else max(s_v.domain, e_v.domain))
