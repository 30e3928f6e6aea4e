"""Column casting between logical dtypes.

Reference semantics: polars-compute/src/cast/ + ChunkCast
(polars-core/src/chunked_array/ops/mod.rs). Strict casts raise on overflow /
unparsable values; non-strict produce nulls.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from polars_tpu import datatypes as dt
from polars_tpu.core.buffer import Buffer
from polars_tpu.core.column import Column, _needs_table
from polars_tpu.errors import InvalidOperationError
from polars_tpu.utils import strtable

_TU_FACTOR = {"ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}


def _tu_convert(values, src_unit: str, dst_unit: str):
    if src_unit == dst_unit:
        return values
    a, b = _TU_FACTOR[src_unit], _TU_FACTOR[dst_unit]
    if b > a:
        return values * (b // a)
    return _floor_div_int(values, a // b)


def _floor_div_int(values, d: int):
    # python-style floor division for possibly-negative timestamps
    return jnp.floor_divide(values, d)


def cast_column(col: Column, dtype: dt.DataType, *, strict: bool = True) -> Column:
    dtype = dt.parse_into_dtype(dtype)
    if col.dtype == dtype:
        return Column(col.name, dtype, col.buffer, col.table, col.sorted_flag)

    src, dst = col.dtype, dtype
    buf = col.buffer

    # ---- from dictionary-coded (String/Categorical/Enum/Binary) ----
    if _needs_table(src):
        if _needs_table(dst):
            if isinstance(dst, dt.Enum):
                # membership remap onto the fixed category set (lexicographic
                # table form per the engine invariant)
                cats = strtable.StringTable(
                    np.asarray(sorted(dst.categories), dtype=object), sorted_order=True
                )
                pos = {u: i for i, u in enumerate(cats.values)}
                lut = np.full(max(len(col.table.values), 1), -1, np.int32)
                for i, u in enumerate(col.table.values):
                    lut[i] = pos.get(u, -1)
                codes = jnp.asarray(lut)[jnp.clip(buf.values, 0, max(len(col.table.values) - 1, 0))]
                ok = codes >= 0
                mask = buf.valid_mask()
                if strict and bool(jnp.any(mask & ~ok)):
                    bad = [u for u in col.table.values if u not in pos][:3]
                    raise InvalidOperationError(
                        f"conversion to {dst!r} failed for values {bad!r} not in "
                        "the enum categories"
                    )
                validity = ok if buf.validity is None else (buf.validity & ok)
                return Column(col.name, dst, Buffer(jnp.maximum(codes, 0), validity, buf.length), cats)
            return Column(col.name, dst, buf, col.table, col.sorted_flag)
        # parse each unique value on the host, gather through codes
        uniques = col.table.values
        if isinstance(dst, (dt.IntegerType, dt.FloatType, dt.Boolean)):
            np_dtype = dt.dtype_to_numpy(dst)
            parsed = np.zeros(max(len(uniques), 1), dtype=np_dtype)
            ok = np.ones(max(len(uniques), 1), dtype=bool)
            for i, v in enumerate(uniques):
                try:
                    parsed[i] = np_dtype.type(v) if not isinstance(dst, dt.Boolean) else _parse_bool(v)
                except (ValueError, OverflowError, TypeError):
                    ok[i] = False
            if strict and not ok.all():
                bad = [u for u, o in zip(uniques, ok) if not o][:3]
                raise InvalidOperationError(
                    f"conversion from `str` to `{dst!r}` failed for values {bad!r}"
                )
            lut = jnp.asarray(parsed)
            lut_ok = jnp.asarray(ok)
            codes = jnp.clip(buf.values, 0, max(len(uniques) - 1, 0))
            values = lut[codes]
            okv = lut_ok[codes]
            validity = okv if buf.validity is None else (buf.validity & okv)
            return Column(col.name, dst, Buffer(values, validity, buf.length))
        if isinstance(dst, (dt.Date, dt.Datetime)):
            unit = "D" if isinstance(dst, dt.Date) else dst.time_unit
            parsed = np.zeros(max(len(uniques), 1), dtype=np.int64)
            ok = np.ones(max(len(uniques), 1), dtype=bool)
            for i, v in enumerate(uniques):
                try:
                    parsed[i] = np.datetime64(v, unit).astype(np.int64)
                except (ValueError, TypeError):
                    ok[i] = False
            if strict and not ok.all():
                raise InvalidOperationError(f"conversion from `str` to `{dst!r}` failed")
            codes = jnp.clip(buf.values, 0, max(len(uniques) - 1, 0))
            out_np = jnp.asarray(parsed)[codes]
            if isinstance(dst, dt.Date):
                out_np = out_np.astype(jnp.int32)
            okv = jnp.asarray(ok)[codes]
            validity = okv if buf.validity is None else (buf.validity & okv)
            return Column(col.name, dst, Buffer(out_np, validity, buf.length))
        raise InvalidOperationError(f"cannot cast String to {dst!r}")

    # ---- to dictionary-coded ----
    if _needs_table(dst):
        vals, validity_np = buf.to_numpy()
        if isinstance(src, (dt.Date, dt.Datetime, dt.Duration, dt.Time, dt.Decimal)):
            text = np.asarray([_format_scalar(col, i) for i in range(buf.length)], dtype=object)
        elif isinstance(src, dt.FloatType):
            text = np.asarray([_trim_float(x) for x in vals.tolist()], dtype=object)
        elif isinstance(src, dt.Boolean):
            # reference stringifies booleans lowercase ("true"/"false")
            text = np.where(vals, "true", "false").astype(object)
        else:
            text = vals.astype(str).astype(object)
        if validity_np is not None:
            text = text.astype(object)
            text[~validity_np] = None
        codes, validity2, table = strtable.encode_strings(text)
        return Column(col.name, dst, Buffer.from_numpy(codes, validity2), table)

    # ---- temporal conversions ----
    if isinstance(src, dt.Date) and isinstance(dst, dt.Datetime):
        mult = _TU_FACTOR[dst.time_unit] * 86_400
        values = buf.values.astype(jnp.int64) * mult
        return Column(col.name, dst, Buffer(values, buf.validity, buf.length))
    if isinstance(src, dt.Datetime) and isinstance(dst, dt.Date):
        per_day = _TU_FACTOR[src.time_unit] * 86_400
        values = _floor_div_int(buf.values, per_day).astype(jnp.int32)
        return Column(col.name, dst, Buffer(values, buf.validity, buf.length))
    if isinstance(src, dt.Datetime) and isinstance(dst, dt.Datetime):
        values = _tu_convert(buf.values, src.time_unit, dst.time_unit)
        return Column(col.name, dst, Buffer(values, buf.validity, buf.length))
    if isinstance(src, dt.Duration) and isinstance(dst, dt.Duration):
        values = _tu_convert(buf.values, src.time_unit, dst.time_unit)
        return Column(col.name, dst, Buffer(values, buf.validity, buf.length))
    if isinstance(src, (dt.Date, dt.Datetime, dt.Duration, dt.Time)) and isinstance(
        dst, (dt.IntegerType, dt.FloatType)
    ):
        values = buf.values.astype(jnp.dtype(dt.dtype_to_numpy(dst)))
        return Column(col.name, dst, Buffer(values, buf.validity, buf.length))
    if isinstance(src, (dt.IntegerType,)) and isinstance(dst, (dt.Date,)):
        values = buf.values.astype(jnp.int32)
        return Column(col.name, dst, Buffer(values, buf.validity, buf.length))
    if isinstance(src, (dt.IntegerType,)) and isinstance(dst, (dt.Datetime, dt.Duration, dt.Time)):
        values = buf.values.astype(jnp.int64)
        return Column(col.name, dst, Buffer(values, buf.validity, buf.length))

    # ---- decimal ----
    if isinstance(src, dt.Decimal) and isinstance(dst, dt.Decimal):
        if dst.scale >= src.scale:
            values = buf.values * (10 ** (dst.scale - src.scale))
        else:
            values = _floor_div_int(buf.values, 10 ** (src.scale - dst.scale))
        return Column(col.name, dst, Buffer(values, buf.validity, buf.length))
    if isinstance(src, dt.Decimal) and isinstance(dst, dt.FloatType):
        np_dtype = jnp.dtype(dt.dtype_to_numpy(dst))
        values = buf.values.astype(np_dtype) / (10.0 ** src.scale)
        return Column(col.name, dst, Buffer(values, buf.validity, buf.length))
    if isinstance(src, (dt.IntegerType, dt.FloatType)) and isinstance(dst, dt.Decimal):
        if isinstance(src, dt.IntegerType):
            values = buf.values.astype(jnp.int64) * jnp.int64(10 ** dst.scale)
        else:
            scaled = buf.values.astype(jnp.float64) * (10.0 ** dst.scale)
            values = jnp.round(scaled).astype(jnp.int64)
        return Column(col.name, dst, Buffer(values, buf.validity, buf.length))
    if isinstance(src, dt.Decimal) and isinstance(dst, dt.IntegerType):
        np_dtype = jnp.dtype(dt.dtype_to_numpy(dst))
        values = _floor_div_int(buf.values, 10 ** src.scale).astype(np_dtype)
        return Column(col.name, dst, Buffer(values, buf.validity, buf.length))

    # ---- numeric/bool ----
    if isinstance(src, (dt.NumericType, dt.Boolean)) and isinstance(
        dst, (dt.NumericType, dt.Boolean)
    ):
        np_dtype = jnp.dtype(dt.dtype_to_numpy(dst))
        values = buf.values
        validity = buf.validity
        if isinstance(dst, dt.IntegerType) and isinstance(src, (dt.IntegerType, dt.FloatType)):
            info = np.iinfo(dt.dtype_to_numpy(dst))
            if isinstance(src, dt.IntegerType):
                # bounds clamped into the SOURCE domain: comparing uint64
                # against -128 / anything against 2^64-1 overflows JAX's
                # weak-int literal parsing (CLAUDE.md §5)
                s_info = np.iinfo(dt.dtype_to_numpy(src))
                lo, hi = max(info.min, s_info.min), min(info.max, s_info.max)
                if lo > int(s_info.min) or hi < int(s_info.max):
                    src_t = np.dtype(dt.dtype_to_numpy(src)).type
                    in_range = (values >= src_t(lo)) & (values <= src_t(hi))
                else:
                    in_range = None
            else:
                in_range = (
                    (values >= float(info.min)) & (values <= float(info.max))
                    & ~jnp.isnan(values)
                )
            if in_range is not None:
                mask = buf.valid_mask()
                if strict and bool(jnp.any(mask & ~in_range)):
                    raise InvalidOperationError(
                        f"conversion from `{src!r}` to `{dst!r}` failed (out of "
                        "range); use strict=False to produce nulls"
                    )
                validity = in_range if validity is None else (validity & in_range)
        if isinstance(dst, dt.Boolean):
            out = values != 0
        else:
            if isinstance(src, dt.FloatType) and isinstance(dst, dt.IntegerType):
                info = np.iinfo(dt.dtype_to_numpy(dst))
                values = jnp.where(jnp.isnan(values), 0.0, values)
                values = jnp.clip(values, float(info.min), float(info.max))
            out = values.astype(np_dtype)
        return Column(col.name, dst, Buffer(out, validity, buf.length))

    if isinstance(src, dt.List) and isinstance(dst, dt.List):
        # element cast in place: packed words untouched, child rebuilt
        new_child = cast_column(col.child.rename(col.child.name), dst.inner, strict=strict)
        return Column(col.name, dst, buf, None, 0, new_child)

    if isinstance(src, dt.Null):
        np_dtype = jnp.dtype(dt.dtype_to_numpy(dst)) if not _needs_table(dst) else jnp.int32
        values = jnp.zeros((buf.padded,), np_dtype)
        validity = jnp.zeros((buf.padded,), bool)
        return Column(col.name, dst, Buffer(values, validity, buf.length))

    raise InvalidOperationError(f"cannot cast {src!r} to {dst!r}")


def _parse_bool(v: str) -> bool:
    s = str(v).strip().lower()
    if s in ("true", "1"):
        return True
    if s in ("false", "0"):
        return False
    raise ValueError(v)


def _trim_float(x: float) -> str:
    s = repr(float(x))
    return s


def _format_scalar(col: Column, i: int) -> str:
    arr = col.to_numpy()
    return str(arr[i])
