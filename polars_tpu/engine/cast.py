"""Traced (jit-safe) casts between Vals.

Unlike ops/cast.py (eager Column casts with strict host checks), these run
inside XLA traces: strict failures become nulls (polars' non-strict semantics);
the executor re-checks strictness at materialization boundaries when asked.
Casting TO String is a host op (the output dictionary is data-dependent) and is
hoisted by the executor — see engine/hoist.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from polars_tpu.kernels.fastmath import div_any, floordiv_any, mod_any
import numpy as np

from polars_tpu import datatypes as dt
from polars_tpu.engine.common import Val
from polars_tpu.errors import InvalidOperationError

_TU_FACTOR = {"ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}


def _tu_convert(values: jax.Array, src: str, dst: str) -> jax.Array:
    if src == dst:
        return values
    a, b = _TU_FACTOR[src], _TU_FACTOR[dst]
    if b > a:
        return values * (b // a)
    return floordiv_any(values, a // b)


def cast_val(v: Val, target: dt.DataType, *, strict: bool = True) -> Val:
    if v.dtype == target:
        return v.with_(dtype=target)
    src = v.dtype
    sn, tn = type(src).__name__, type(target).__name__
    needs_table_src = v.table is not None
    needs_table_tgt = tn in ("String", "Categorical", "Enum", "Binary")

    if needs_table_src and needs_table_tgt:
        return v.with_(dtype=target)

    if needs_table_src:
        # parse unique values on host at trace time -> constant LUTs
        uniques = v.table.values
        nvals = max(len(uniques), 1)
        if target.is_numeric() or tn == "Boolean":
            np_dtype = dt.dtype_to_numpy(target)
            parsed = np.zeros(nvals, dtype=np_dtype)
            ok = np.ones(nvals, dtype=bool)
            for i, u in enumerate(uniques):
                try:
                    if tn == "Boolean":
                        s = str(u).strip().lower()
                        if s in ("true", "1"):
                            parsed[i] = True
                        elif s in ("false", "0"):
                            parsed[i] = False
                        else:
                            raise ValueError(u)
                    else:
                        parsed[i] = np_dtype.type(str(u).strip())
                except (ValueError, OverflowError, TypeError):
                    ok[i] = False
            codes = jnp.clip(v.values, 0, nvals - 1)
            out = jnp.asarray(parsed)[codes]
            okv = jnp.asarray(ok)[codes]
            from polars_tpu.engine.common import combine_validity

            return Val(out, combine_validity(v.validity, okv), target, None, v.domain)
        if tn in ("Date", "Datetime"):
            unit = "D" if tn == "Date" else target.time_unit
            parsed = np.zeros(nvals, dtype=np.int64)
            ok = np.ones(nvals, dtype=bool)
            for i, u in enumerate(uniques):
                try:
                    parsed[i] = np.datetime64(str(u), unit).astype(np.int64)
                except (ValueError, TypeError):
                    ok[i] = False
            codes = jnp.clip(v.values, 0, nvals - 1)
            out = jnp.asarray(parsed)[codes]
            if tn == "Date":
                out = out.astype(jnp.int32)
            okv = jnp.asarray(ok)[codes]
            from polars_tpu.engine.common import combine_validity

            return Val(out, combine_validity(v.validity, okv), target, None, v.domain)
        raise InvalidOperationError(f"cannot cast String to {target!r} in a trace")

    if needs_table_tgt:
        raise InvalidOperationError("cast to String is a host op (hoisted)")

    if sn == "Date" and tn == "Datetime":
        mult = _TU_FACTOR[target.time_unit] * 86_400
        return v.with_(values=v.values.astype(jnp.int64) * mult, dtype=target)
    if sn == "Datetime" and tn == "Date":
        per_day = _TU_FACTOR[src.time_unit] * 86_400
        return v.with_(values=floordiv_any(v.values, per_day).astype(jnp.int32), dtype=target)
    if sn == "Datetime" and tn == "Datetime":
        return v.with_(values=_tu_convert(v.values, src.time_unit, target.time_unit), dtype=target)
    if sn == "Datetime" and tn == "Time":
        # time-of-day in ns (reference: temporal cast Datetime->Time)
        per_day = _TU_FACTOR[src.time_unit] * 86_400
        tod = v.values - floordiv_any(v.values, per_day) * per_day
        return v.with_(values=_tu_convert(tod, src.time_unit, "ns"), dtype=target)
    if sn == "Time" and tn == "Duration":
        return v.with_(values=_tu_convert(v.values, "ns", target.time_unit), dtype=target)
    if sn == "Duration" and tn == "Duration":
        return v.with_(values=_tu_convert(v.values, src.time_unit, target.time_unit), dtype=target)
    if sn in ("Date", "Datetime", "Duration", "Time") and (target.is_numeric()):
        return v.with_(values=v.values.astype(jnp.dtype(dt.dtype_to_numpy(target))), dtype=target)
    if src.is_integer() and tn == "Date":
        return v.with_(values=v.values.astype(jnp.int32), dtype=target)
    if src.is_integer() and tn in ("Datetime", "Duration", "Time"):
        return v.with_(values=v.values.astype(jnp.int64), dtype=target)
    if sn == "Decimal" and target.is_float():
        np_dtype = jnp.dtype(dt.dtype_to_numpy(target))
        return v.with_(values=v.values.astype(np_dtype) * (10.0 ** (-src.scale)), dtype=target)
    if sn == "Decimal" and target.is_integer():
        np_dtype = jnp.dtype(dt.dtype_to_numpy(target))
        return v.with_(
            values=floordiv_any(v.values, 10 ** src.scale).astype(np_dtype), dtype=target
        )
    if src.is_numeric() and tn == "Decimal":
        scaled = v.values.astype(jnp.float64) * (10.0 ** target.scale)
        return v.with_(values=jnp.round(scaled).astype(jnp.int64), dtype=target)
    if sn == "Decimal" and tn == "Decimal":
        if target.scale >= src.scale:
            return v.with_(values=v.values * (10 ** (target.scale - src.scale)), dtype=target)
        return v.with_(values=floordiv_any(v.values, 10 ** (src.scale - target.scale)), dtype=target)
    if (src.is_numeric() or sn == "Boolean") and (target.is_numeric() or tn == "Boolean"):
        if tn == "Boolean":
            return v.with_(values=v.values != 0, dtype=target)
        np_dtype = jnp.dtype(dt.dtype_to_numpy(target))
        validity = v.validity
        if target.is_integer() and (src.is_integer() or src.is_float()):
            info = np.iinfo(dt.dtype_to_numpy(target))
            src_covers = src.is_integer() and np.iinfo(dt.dtype_to_numpy(src)).min >= info.min and np.iinfo(dt.dtype_to_numpy(src)).max <= info.max
            if not src_covers:
                in_range = (v.values >= info.min) & (v.values <= info.max)
                if src.is_float():
                    in_range = in_range & ~jnp.isnan(v.values)
                from polars_tpu.engine.common import combine_validity

                validity = combine_validity(validity, in_range)
        return Val(v.values.astype(np_dtype), validity, target, None, v.domain)
    if sn == "Null":
        np_dtype = jnp.int32 if needs_table_tgt else jnp.dtype(dt.dtype_to_numpy(target))
        return Val(
            jnp.zeros(v.values.shape, np_dtype),
            jnp.zeros(v.values.shape, bool),
            target,
            None,
            v.domain,
        )
    raise InvalidOperationError(f"cannot cast {src!r} to {target!r}")
