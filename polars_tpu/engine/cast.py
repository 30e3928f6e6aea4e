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
        if tn == "Enum":
            # membership remap onto the FIXED category set: unknown source
            # values become null (strict raise rides the cast flag channel)
            from polars_tpu.engine.common import combine_validity
            from polars_tpu.utils import strtable

            # Enum codes ARE category positions: comparisons and sorts on
            # codes follow the declared category order (reference semantics)
            cats = strtable.StringTable(
                np.asarray([str(c) for c in target.categories], dtype=object),
                sorted_order=False,
            )
            lut = np.full(max(len(v.table.values), 1), -1, np.int32)
            pos = {u: i for i, u in enumerate(cats.values)}
            for i, u in enumerate(v.table.values):
                lut[i] = pos.get(u, -1)
            codes = jnp.asarray(lut)[jnp.clip(v.values, 0, max(len(v.table.values) - 1, 0))]
            ok = codes >= 0
            return Val(
                jnp.maximum(codes, 0), combine_validity(v.validity, ok), target,
                cats, v.domain,
            )
        return v.with_(dtype=target)

    if needs_table_src:
        if sn in ("Categorical", "Enum") and target.is_integer():
            # physical codes (reference: Categorical/Enum -> int gives the
            # physical representation, not a string parse)
            np_t = jnp.dtype(dt.dtype_to_numpy(target))
            return Val(v.values.astype(np_t), v.validity, target, None, v.domain)
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
    if sn == "Decimal" and tn == "Decimal":
        if target.scale >= src.scale:
            return v.with_(values=v.values * (10 ** (target.scale - src.scale)), dtype=target)
        return v.with_(values=floordiv_any(v.values, 10 ** (src.scale - target.scale)), dtype=target)
    if src.is_numeric() and tn == "Decimal":
        if src.is_integer():
            return v.with_(
                values=v.values.astype(jnp.int64) * jnp.int64(10 ** target.scale),
                dtype=target,
            )
        scaled = v.values.astype(jnp.float64) * (10.0 ** target.scale)
        return v.with_(values=jnp.round(scaled).astype(jnp.int64), dtype=target)
    if (src.is_numeric() or sn == "Boolean") and (target.is_numeric() or tn == "Boolean"):
        if tn == "Boolean":
            return v.with_(values=v.values != 0, dtype=target)
        np_dtype = jnp.dtype(dt.dtype_to_numpy(target))
        validity = v.validity
        if target.is_integer() and (src.is_integer() or src.is_float()):
            info = np.iinfo(dt.dtype_to_numpy(target))
            if src.is_integer():
                # bounds CLAMPED into the source's own domain: comparing a
                # uint64 array against -128, or any array against 2^64-1,
                # overflows JAX's weak-int literal parsing (CLAUDE.md §5)
                s_info = np.iinfo(dt.dtype_to_numpy(src))
                lo, hi = max(info.min, s_info.min), min(info.max, s_info.max)
                if lo > int(s_info.min) or hi < int(s_info.max):
                    src_t = np.dtype(dt.dtype_to_numpy(src)).type
                    in_range = (v.values >= src_t(lo)) & (v.values <= src_t(hi))
                    from polars_tpu.engine.common import combine_validity

                    validity = combine_validity(validity, in_range)
            else:
                in_range = (
                    (v.values >= float(info.min))
                    & (v.values <= float(info.max))
                    & ~jnp.isnan(v.values)
                )
                from polars_tpu.engine.common import combine_validity

                validity = combine_validity(validity, in_range)
        out_vals = v.values
        if src.is_float() and target.is_integer():
            # guard the astype: huge/NaN floats are already invalid, but the
            # conversion itself must not trap
            out_vals = jnp.where(jnp.isnan(out_vals), 0.0, out_vals)
            out_vals = jnp.clip(
                out_vals,
                float(np.iinfo(dt.dtype_to_numpy(target)).min),
                float(np.iinfo(dt.dtype_to_numpy(target)).max),
            )
        return Val(out_vals.astype(np_dtype), validity, target, None, v.domain)
    if isinstance(src, dt.Array) and isinstance(target, dt.List):
        # Array -> List: identical packed (start,len) layout, dtype-only
        if src.inner == target.inner:
            return v.with_(dtype=target)
        src = dt.List(src.inner)  # fall through for an inner cast
    if isinstance(src, dt.List) and isinstance(target, dt.List):
        # element cast: packed words stay, the child casts in place
        from polars_tpu.engine.common import TracedChild

        ch = v.child
        if isinstance(ch, TracedChild) and ch.values is not None:
            inner = cast_val(
                Val(ch.values, ch.validity, src.inner, ch.table, v.domain),
                target.inner, strict=strict,
            )
            new_ch = TracedChild(
                inner.values, inner.validity, target.inner, inner.table,
                ch.length, None, None,
            )
            return v.with_(dtype=target, child=new_ch)
        raise InvalidOperationError(
            "List inner cast: child unavailable in this trace (host path)"
        )
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
