"""Arrow <-> device-column conversion (the FFI boundary analogue,
polars-arrow/src/ffi/)."""

from __future__ import annotations

from typing import Any

import numpy as np

from polars_tpu import datatypes as dt
from polars_tpu.core.buffer import Buffer
from polars_tpu.core.column import Column
from polars_tpu.utils import strtable


def _arrow_dtype_to_polars(t: Any) -> dt.DataType:
    import pyarrow as pa

    if pa.types.is_int8(t):
        return dt.Int8()
    if pa.types.is_int16(t):
        return dt.Int16()
    if pa.types.is_int32(t):
        return dt.Int32()
    if pa.types.is_int64(t):
        return dt.Int64()
    if pa.types.is_uint8(t):
        return dt.UInt8()
    if pa.types.is_uint16(t):
        return dt.UInt16()
    if pa.types.is_uint32(t):
        return dt.UInt32()
    if pa.types.is_uint64(t):
        return dt.UInt64()
    if pa.types.is_float32(t):
        return dt.Float32()
    if pa.types.is_float64(t) or pa.types.is_float16(t):
        return dt.Float64()
    if pa.types.is_boolean(t):
        return dt.Boolean()
    if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_string_view(t):
        return dt.String()
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return dt.Binary()
    if pa.types.is_date32(t) or pa.types.is_date64(t):
        return dt.Date()
    if pa.types.is_timestamp(t):
        return dt.Datetime(t.unit if t.unit in ("ms", "us", "ns") else "us", t.tz)
    if pa.types.is_duration(t):
        return dt.Duration(t.unit if t.unit in ("ms", "us", "ns") else "us")
    if pa.types.is_time32(t) or pa.types.is_time64(t):
        return dt.Time()
    if pa.types.is_decimal(t):
        return dt.Decimal(t.precision, t.scale)
    if pa.types.is_dictionary(t):
        return dt.Categorical()
    if pa.types.is_null(t):
        return dt.Null()
    if pa.types.is_fixed_size_list(t):
        return dt.Array(_arrow_dtype_to_polars(t.value_type), t.list_size)
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return dt.List(_arrow_dtype_to_polars(t.value_type))
    if pa.types.is_struct(t):
        return dt.Struct([(f.name, _arrow_dtype_to_polars(f.type)) for f in t])
    raise dt.InvalidOperationError if False else NotImplementedError(f"arrow type {t}")


def arrow_schema_to_schema(sch: Any):
    from polars_tpu.core.schema import Schema

    return Schema([(f.name, _arrow_dtype_to_polars(f.type)) for f in sch])


def arrow_array_to_column(name: str, arr: Any, override: dt.DataType | None = None) -> Column:
    """One arrow chunked/array -> device Column."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    logical = _arrow_dtype_to_polars(t)

    if isinstance(logical, (dt.String, dt.Binary, dt.Categorical)):
        # dictionary-encode on the host (Arrow C++), ship codes to device
        if not pa.types.is_dictionary(t):
            if isinstance(logical, (dt.String, dt.Binary)):
                # hashed-key mode for long mostly-unique columns: device
                # hash64 codes + row-ordered spill, NO host dictionary
                # (utils/hashstore.py; reference: hash_keys.rs)
                from polars_tpu.config import config as _cfg
                from polars_tpu.utils import hashstore

                if hashstore.want_hashed(arr, _cfg().hashed_strings_min_rows):
                    import weakref

                    hashes, validity, store = hashstore.SpilledStrings.from_arrow(
                        arr, is_binary=isinstance(logical, dt.Binary)
                    )
                    buf = Buffer.from_numpy(hashes, validity)
                    # densify fast path: this exact buffer still holds the
                    # ingest row order, so the spill file can rebuild a
                    # dictionary column without any device readback
                    store._ingest_buffer = weakref.ref(buf)
                    return Column(name, logical, buf, store)
            arr = pc.dictionary_encode(arr)
        codes = arr.indices
        validity = None
        if codes.null_count:
            validity = np.asarray(codes.is_valid())
        codes_np = codes.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int32)
        n_dict = len(arr.dictionary)
        from polars_tpu.config import config

        if n_dict > config().ordinal_dict_max:
            # high-cardinality path (reference: hash_keys.rs — string keys
            # are hash-probed, never globally ordered): keep Arrow's
            # insertion-order dictionary as-is — ingest is O(n) C++ hashing,
            # flat in uniqueness; lex order is recovered lazily via
            # StringTable.ordinal() only if an order-sensitive op needs it
            dict_np = arr.dictionary.to_numpy(zero_copy_only=False)
            if isinstance(logical, dt.Binary):
                dict_np = np.asarray(
                    [bytes(v) for v in dict_np.tolist()], dtype=object
                )
            table = strtable.StringTable(
                np.asarray(dict_np, dtype=object), sorted_order=False
            )
        else:
            dict_vals = arr.dictionary.to_pylist()
            # renormalize to sorted (ordinal) dictionary
            if isinstance(logical, dt.Binary):
                # bytes payloads must NOT go through numpy str coercion (non-UTF8)
                uniq_list = sorted({bytes(v) for v in dict_vals})
                lookup = {v: i for i, v in enumerate(uniq_list)}
                inv = np.fromiter(
                    (lookup[bytes(v)] for v in dict_vals), np.int32, len(dict_vals)
                )
                uniq = np.asarray(uniq_list, dtype=object)
            else:
                uniq, inv = np.unique(
                    np.asarray(dict_vals, dtype=object).astype(str), return_inverse=True
                )
            codes_np = inv.astype(np.int32)[codes_np] if len(dict_vals) else codes_np
            table = strtable.StringTable(uniq.astype(object), sorted_order=True)
        buf = Buffer.from_numpy(codes_np, validity)
        out_dt = logical if isinstance(logical, (dt.Categorical, dt.Binary)) else dt.String()
        col = Column(name, out_dt, buf, table)
        return _maybe_cast(col, override)

    if isinstance(logical, (dt.List, dt.Array, dt.Struct)):
        # nested columns rebuild through the python layout packer (packed
        # (start,len) words + child column)
        col = Column.from_values(name, arr.to_pylist(), logical)
        return _maybe_cast(col, override)

    validity = None
    if arr.null_count:
        validity = np.asarray(arr.is_valid())
        arr = arr.fill_null(_zero_for(t))
    if pa.types.is_boolean(t):
        vals = arr.to_numpy(zero_copy_only=False)
        col = Column(name, logical, Buffer.from_numpy(vals, validity))
        return _maybe_cast(col, override)
    if pa.types.is_date32(t) or pa.types.is_date64(t):
        if pa.types.is_date64(t):
            arr = arr.cast(pa.date32())
        vals = np.asarray(arr.cast(pa.int32()))
        col = Column(name, logical, Buffer.from_numpy(vals, validity))
        return _maybe_cast(col, override)
    if pa.types.is_timestamp(t) or pa.types.is_duration(t):
        # rescale non-{ms,us,ns} units (pyarrow.json infers timestamp[s]) to
        # the logical dtype's unit BEFORE taking the physical int64
        target = logical.time_unit
        if t.unit != target:
            arr = arr.cast(
                pa.timestamp(target, t.tz)
                if pa.types.is_timestamp(t)
                else pa.duration(target)
            )
        vals = np.asarray(arr.cast(pa.int64()))
        col = Column(name, logical, Buffer.from_numpy(vals, validity))
        return _maybe_cast(col, override)
    if pa.types.is_time32(t) or pa.types.is_time64(t):
        factor = {"s": 1_000_000_000, "ms": 1_000_000, "us": 1_000, "ns": 1}[t.unit]
        vals = np.asarray(arr.cast(pa.int64())) * factor
        col = Column(name, logical, Buffer.from_numpy(vals, validity))
        return _maybe_cast(col, override)
    if pa.types.is_decimal(t):
        scale = t.scale
        vals = np.asarray(
            [0 if v is None else int(v.scaleb(scale)) for v in arr.to_pylist()],
            np.int64,
        )
        col = Column(name, logical, Buffer.from_numpy(vals, validity))
        return _maybe_cast(col, override)
    if pa.types.is_float16(t):
        vals = arr.to_numpy(zero_copy_only=False).astype(np.float64)
        col = Column(name, dt.Float64(), Buffer.from_numpy(vals, validity))
        return _maybe_cast(col, override)
    if pa.types.is_null(t):
        n = len(arr)
        return Column(name, dt.Null(), Buffer.from_numpy(np.zeros(n, np.int32), np.zeros(n, bool) if n else None))
    vals = arr.to_numpy(zero_copy_only=False)
    col = Column(name, logical, Buffer.from_numpy(vals, validity))
    return _maybe_cast(col, override)


def _maybe_cast(col: Column, override: dt.DataType | None) -> Column:
    if override is None or override == col.dtype:
        return col
    from polars_tpu.ops.cast import cast_column

    return cast_column(col, override, strict=False)


def _zero_for(t: Any):
    import pyarrow as pa

    if pa.types.is_timestamp(t) or pa.types.is_duration(t) or pa.types.is_time64(t):
        return 0
    if pa.types.is_boolean(t):
        return False
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return ""
    if pa.types.is_decimal(t):
        import decimal

        return decimal.Decimal(0)
    return 0


def dtype_to_arrow(d: dt.DataType) -> Any:
    """Logical dtype -> pyarrow type (inverse of _arrow_dtype_to_polars)."""
    import pyarrow as pa

    n = type(d).__name__
    flat = {
        "Int8": pa.int8(), "Int16": pa.int16(), "Int32": pa.int32(),
        "Int64": pa.int64(), "UInt8": pa.uint8(), "UInt16": pa.uint16(),
        "UInt32": pa.uint32(), "UInt64": pa.uint64(),
        "Float32": pa.float32(), "Float64": pa.float64(),
        "Boolean": pa.bool_(), "String": pa.large_string(),
        "Binary": pa.large_binary(), "Date": pa.date32(),
        "Time": pa.time64("ns"), "Null": pa.null(),
        "Categorical": pa.large_string(), "Enum": pa.large_string(),
    }
    if n in flat:
        return flat[n]
    if n == "Datetime":
        return pa.timestamp(d.time_unit, tz=getattr(d, "time_zone", None))
    if n == "Duration":
        return pa.duration(d.time_unit)
    if n == "Decimal":
        return pa.decimal128(d.precision or 38, d.scale)
    if n == "List":
        return pa.large_list(dtype_to_arrow(d.inner))
    if n == "Array":
        return pa.list_(dtype_to_arrow(d.inner), d.size)
    if n == "Struct":
        return pa.struct([(f.name, dtype_to_arrow(f.dtype)) for f in d.fields])
    raise TypeError(f"no arrow type for {d!r}")


def column_to_arrow(c: Column) -> Any:
    """Column -> pyarrow array, preserving the logical dtype (used by
    DataFrame.to_arrow / parquet-ipc writers)."""
    import numpy as np
    import pyarrow as pa

    d = c.dtype
    if c.table is not None:
        vals, validity = c.buffer.to_numpy()
        arr = pa.array(
            c.table.take(np.where(validity, vals, -1) if validity is not None else vals)
        )
        if isinstance(d, (dt.Categorical, dt.Enum)):
            # dictionary-encode so parquet/ipc round-trips restore Categorical
            import pyarrow.compute as pc

            return pc.dictionary_encode(arr)
        return arr
    if isinstance(d, (dt.List, dt.Array, dt.Struct, dt.Decimal)):
        return pa.array(c.to_pylist(), type=dtype_to_arrow(d))
    # build from the physical buffer with an explicit null mask: from_pandas
    # would turn float NaN VALUES into nulls (polars keeps NaN distinct)
    vals, validity = c.buffer.to_numpy()
    mask = None if validity is None else ~np.asarray(validity, bool)
    at = dtype_to_arrow(d)
    name = type(d).__name__
    if name == "Date":
        return pa.array(np.asarray(vals).astype(np.int32), type=at, mask=mask)
    if name in ("Datetime", "Duration", "Time"):
        return pa.array(np.asarray(vals).astype(np.int64), type=at, mask=mask)
    return pa.array(np.asarray(vals), type=at, mask=mask)


def arrow_to_columns(table: Any, overrides: dict | None = None) -> list[Column]:
    overrides = overrides or {}
    cols = []
    for name in table.column_names:
        o = overrides.get(name)
        o = dt.parse_into_dtype(o) if o is not None else None
        cols.append(arrow_array_to_column(name, table.column(name), o))
    return cols


def arrow_to_df(table: Any, overrides: dict | None = None):
    from polars_tpu.core.frame import DataFrame

    cols = arrow_to_columns(table, overrides)
    return DataFrame._from_columns(cols, table.num_rows)
