"""Typed columns: name + logical dtype + device buffer + (optional) dictionary.

The analogue of the reference's ``ChunkedArray<T>`` + ``Series``
(polars-core/src/chunked_array/mod.rs:137, series/mod.rs:150) collapsed into one
concrete class: TPU-side storage is always a single dense padded buffer, and
type dispatch happens through the logical ``DataType`` instead of trait objects.
Sortedness flags (chunked_array/flags.rs IS_SORTED_ASC/DESC) are kept — they are
cheap metadata that unlock merge paths and O(1) min/max.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
from typing import Any

import jax.numpy as jnp
import numpy as np

from polars_tpu import datatypes as dt
from polars_tpu.core.buffer import Buffer, padded_size
from polars_tpu.errors import InvalidOperationError, ShapeError
from polars_tpu.utils import strtable

# sortedness flags
UNSORTED = 0
SORTED_ASC = 1
SORTED_DESC = 2

_EPOCH_DATE = _dt.date(1970, 1, 1)
_EPOCH_DT_UTC = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)

# time-unit multipliers to convert python datetime/timedelta to integers
_TU_PER_SECOND = {"ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}


def _jnp_dtype_for(dtype: dt.DataType):
    return jnp.dtype(dt.dtype_to_numpy(dtype))


class Column:
    """One named, typed column over a device buffer.

    For String/Categorical/Enum/Binary the buffer holds int32 dictionary codes
    and ``table`` holds the host-side unique values (ordinal order: code order
    == lexicographic order, see utils/strtable.py).
    """

    __slots__ = ("name", "dtype", "buffer", "table", "sorted_flag", "child", "_pt_token")

    def __init__(
        self,
        name: str,
        dtype: dt.DataType,
        buffer: Buffer,
        table: strtable.StringTable | None = None,
        sorted_flag: int = UNSORTED,
        child: "Column | None" = None,
    ) -> None:
        self.name = name
        self.dtype = dtype
        self.buffer = buffer
        self.table = table
        self.sorted_flag = sorted_flag
        # List columns: ``buffer`` holds int64 packed (start << 32) | length
        # into the flat ``child`` column — rows stay gather/permute-safe
        # without touching child storage (Arrow-offsets re-designed for a
        # world where rows are permuted on device constantly)
        self.child = child
        if _needs_table(dtype) and table is None:
            self.table = strtable.empty_table()

    # -- constructors ---------------------------------------------------------

    @staticmethod
    def from_values(
        name: str,
        values: Any,
        dtype: dt.DataType | None = None,
        *,
        strict: bool = True,
    ) -> Column:
        """Build a column from a python sequence / numpy array / jax array."""
        if isinstance(values, Column):
            out = values.rename(name)
            if dtype is not None and dt.parse_into_dtype(dtype) != out.dtype:
                from polars_tpu.ops.cast import cast_column

                out = cast_column(out, dt.parse_into_dtype(dtype), strict=strict)
            return out

        if dtype is not None:
            dtype = dt.parse_into_dtype(dtype)

        if hasattr(values, "__jax_array__") or type(values).__module__.startswith("jaxlib"):
            arr = np.asarray(values)
        else:
            arr = values

        if isinstance(arr, np.ndarray) and arr.dtype.kind not in ("O", "U", "S"):
            return _from_numpy(name, arr, dtype)

        # python sequence path (handles None/str/date/datetime mixes)
        seq = list(arr) if not isinstance(arr, list) else arr
        return _from_pylist(name, seq, dtype, strict=strict)

    # -- basic properties -----------------------------------------------------

    def __len__(self) -> int:
        return self.buffer.length

    @property
    def len(self) -> int:
        return self.buffer.length

    def null_count(self) -> int:
        return self.buffer.null_count()

    def rename(self, name: str) -> Column:
        return Column(name, self.dtype, self.buffer, self.table, self.sorted_flag, self.child)

    def with_buffer(self, buffer: Buffer, *, sorted_flag: int = UNSORTED) -> Column:
        return Column(self.name, self.dtype, buffer, self.table, sorted_flag, self.child)

    def densify_hashed(self) -> Column:
        """Hashed-key string column -> ordinary dictionary column (the escape
        hatch for order-sensitive ops; utils/hashstore.py). Untouched ingest
        columns re-encode straight from the spill file with zero device
        traffic; transformed columns read their hashes back (the unavoidable
        sync an order-op on such a column implies)."""
        store = self.table
        if not getattr(store, "hashed", False):
            return self
        from polars_tpu.utils import strtable as _st

        ingest = getattr(store, "_ingest_buffer", None)
        if ingest is not None and ingest() is self.buffer:
            parts, valids = [], []
            for vals, ok in store.values_for_rows():
                parts.append(np.asarray(vals, dtype=object))
                valids.append(ok)
            obj = np.concatenate(parts) if parts else np.empty(0, object)
            valid = np.concatenate(valids) if valids else np.empty(0, bool)
            obj = np.where(valid, obj, None)
        else:
            hashes, validity = self.buffer.to_numpy()
            hashes = np.asarray(hashes, np.int64)
            obj = store.take(
                np.where(validity, hashes, -1) if validity is not None else hashes
            )
        codes, val2, table = _st.encode_strings(obj)
        return Column(self.name, self.dtype, Buffer.from_numpy(codes, val2), table)

    # -- host conversion ---------------------------------------------------------

    def to_numpy(self) -> np.ndarray:
        """Materialize as numpy; nulls -> NaN for floats, object-None otherwise."""
        vals, validity = self.buffer.to_numpy()
        if _needs_table(self.dtype):
            return self.table.take(np.where(validity, vals, -1) if validity is not None else vals)
        if isinstance(self.dtype, dt.Date):
            out = vals.astype("datetime64[D]").astype(object)
            return _mask_to_object(out, validity)
        if isinstance(self.dtype, dt.Datetime):
            out = vals.astype(f"datetime64[{self.dtype.time_unit}]")
            if self.dtype.time_unit == "ns":
                # ns-unit .astype(object) yields raw ints (datetime.datetime
                # is µs-resolution); truncate to µs like py-polars does
                out = out.astype("datetime64[us]")
            out = out.astype(object)
            if self.dtype.time_zone:
                # stored as UTC instants; surface tz-aware local datetimes
                from zoneinfo import ZoneInfo

                tz = ZoneInfo(self.dtype.time_zone)
                out = np.asarray(
                    [
                        None if d is None else d.replace(tzinfo=_dt.timezone.utc).astimezone(tz)
                        for d in out
                    ],
                    dtype=object,
                )
            return _mask_to_object(out, validity)
        if isinstance(self.dtype, dt.Duration):
            out = vals.astype(f"timedelta64[{self.dtype.time_unit}]")
            if self.dtype.time_unit == "ns":
                out = out.astype("timedelta64[us]")
            out = out.astype(object)
            return _mask_to_object(out, validity)
        if isinstance(self.dtype, dt.Time):
            out = np.empty(len(vals), dtype=object)
            for i, v in enumerate(vals):
                ns = int(v)
                out[i] = _dt.time(
                    ns // 3_600_000_000_000,
                    (ns // 60_000_000_000) % 60,
                    (ns // 1_000_000_000) % 60,
                    (ns % 1_000_000_000) // 1000,
                )
            return _mask_to_object(out, validity)
        if isinstance(self.dtype, dt.Decimal):
            scale = self.dtype.scale
            out = vals.astype(np.float64) / (10.0 ** scale)
            if validity is not None:
                out = np.where(validity, out, np.nan)
            return out
        if validity is None:
            return vals
        if vals.dtype.kind == "f":
            return np.where(validity, vals, np.nan)
        out = vals.astype(object)
        out[~validity] = None
        return out

    def to_pylist(self) -> list:
        if isinstance(self.dtype, dt.Array):
            packed, validity = self.buffer.to_numpy()
            starts = (packed >> 32).tolist()
            lens = (packed & 0xFFFFFFFF).tolist()
            childl = self.child.to_pylist() if self.child is not None else []
            ok = [True] * len(starts) if validity is None else validity.tolist()
            return [
                childl[st : st + ln] if good else None
                for st, ln, good in zip(starts, lens, ok)
            ]
        if isinstance(self.dtype, dt.Struct):
            ids, validity = self.buffer.to_numpy()
            field_lists = {c.name: c.to_pylist() for c in (self.child or [])}
            ok = [True] * len(ids) if validity is None else validity.tolist()
            return [
                {k: v[i] for k, v in field_lists.items()} if good else None
                for i, good in zip(ids.tolist(), ok)
            ]
        if isinstance(self.dtype, dt.List):
            packed, validity = self.buffer.to_numpy()
            starts = (packed >> 32).tolist()
            lens = (packed & 0xFFFFFFFF).tolist()
            childl = self.child.to_pylist() if self.child is not None else []
            ok = [True] * len(starts) if validity is None else validity.tolist()
            return [
                childl[s : s + l] if good else None
                for s, l, good in zip(starts, lens, ok)
            ]
        # NaN is a VALUE for float columns (distinct from null) — use validity
        if isinstance(self.dtype, dt.FloatType):
            vals, validity = self.buffer.to_numpy()
            lst = vals.tolist()
            if validity is None:
                return lst
            return [v if ok else None for v, ok in zip(lst, validity.tolist())]
        if isinstance(self.dtype, dt.Decimal):
            # python values are decimal.Decimal (py-polars Decimal semantics)
            vals, validity = self.buffer.to_numpy()
            scale = self.dtype.scale
            ok = [True] * len(vals) if validity is None else validity.tolist()
            return [
                _decimal.Decimal(int(v)).scaleb(-scale) if good else None
                for v, good in zip(vals.tolist(), ok)
            ]
        arr = self.to_numpy()
        out = []
        for v in arr.tolist() if arr.dtype != object else arr:
            if v is None or (isinstance(v, float) and v != v):
                out.append(None)
            else:
                out.append(v)
        return out

    # -- misc --------------------------------------------------------------------

    def __repr__(self) -> str:
        return (
            f"Column(name={self.name!r}, dtype={self.dtype!r}, len={len(self)})"
        )


def _needs_table(dtype: dt.DataType) -> bool:
    return isinstance(dtype, (dt.String, dt.Categorical, dt.Enum, dt.Binary))


def _mask_to_object(out: np.ndarray, validity: np.ndarray | None) -> np.ndarray:
    if validity is not None:
        out = out.astype(object)
        out[~validity] = None
    return out


def _from_numpy(name: str, arr: np.ndarray, dtype: dt.DataType | None) -> Column:
    if arr.ndim != 1:
        raise ShapeError(f"Column values must be 1-D, got shape {arr.shape}")
    validity = None
    if arr.dtype.kind == "f":
        nulls = np.isnan(arr)
        if nulls.any():
            validity = ~nulls
    if arr.dtype.kind == "M":  # datetime64
        logical = dt.numpy_to_dtype(arr.dtype)
        nat = np.isnat(arr)
        validity = ~nat if nat.any() else None
        unit = np.datetime_data(arr.dtype)[0]
        if isinstance(logical, dt.Date):
            ints = arr.astype("datetime64[D]").astype(np.int64).astype(np.int32)
        else:
            ints = arr.astype(f"datetime64[{logical.time_unit}]").astype(np.int64)
        if validity is not None:
            ints = np.where(validity, ints, 0)
        col = Column(name, logical, Buffer.from_numpy(ints, validity))
        return _maybe_cast(col, dtype)
    if arr.dtype.kind == "m":  # timedelta64
        logical = dt.numpy_to_dtype(arr.dtype)
        nat = np.isnat(arr)
        validity = ~nat if nat.any() else None
        ints = arr.astype(f"timedelta64[{logical.time_unit}]").astype(np.int64)
        if validity is not None:
            ints = np.where(validity, ints, 0)
        col = Column(name, logical, Buffer.from_numpy(ints, validity))
        return _maybe_cast(col, dtype)
    logical = dt.numpy_to_dtype(arr.dtype)
    if validity is not None:
        arr = np.where(validity, arr, 0)
    col = Column(name, logical, Buffer.from_numpy(arr, validity))
    return _maybe_cast(col, dtype)


def _maybe_cast(col: Column, dtype: dt.DataType | None) -> Column:
    if dtype is None or dtype == col.dtype:
        return col
    from polars_tpu.ops.cast import cast_column

    return cast_column(col, dtype, strict=False)


def _infer_pylist_dtype(seq: list, *, strict: bool = True) -> dt.DataType:
    has = set()
    for v in seq:
        if v is None:
            continue
        if isinstance(v, bool):
            has.add("bool")
        elif isinstance(v, int):
            has.add("int")
        elif isinstance(v, float):
            has.add("float")
        elif isinstance(v, str):
            has.add("str")
        elif isinstance(v, _dt.datetime):
            has.add("datetime")
        elif isinstance(v, _dt.date):
            has.add("date")
        elif isinstance(v, _dt.timedelta):
            has.add("duration")
        elif isinstance(v, _dt.time):
            has.add("time")
        elif isinstance(v, bytes):
            has.add("binary")
        elif isinstance(v, dict):
            has.add("struct")
        elif isinstance(v, (list, tuple, np.ndarray)):
            has.add("list")
        elif isinstance(v, (np.integer,)):
            has.add("int")
        elif isinstance(v, (np.floating,)):
            has.add("float")
        elif isinstance(v, _decimal.Decimal):
            has.add("decimal")
        else:
            has.add("object")
    if not has:
        return dt.Null()
    if has == {"bool"}:
        return dt.Boolean()
    if has <= {"int"}:
        return dt.Int64()
    if has <= {"int", "float"}:
        return dt.Float64()
    if has == {"str"}:
        return dt.String()
    if has == {"date"}:
        return dt.Date()
    if has <= {"datetime", "date"}:
        # a consistent tzinfo across values infers a tz-aware Datetime
        zones = {
            str(v.tzinfo)
            for v in seq
            if isinstance(v, _dt.datetime) and v.tzinfo is not None
        }
        if len(zones) == 1:
            z = next(iter(zones))
            return dt.Datetime("us", "UTC" if z in ("UTC", "utc", "UTC+00:00") else z)
        return dt.Datetime("us")
    if has == {"duration"}:
        return dt.Duration("us")
    if has == {"time"}:
        return dt.Time()
    if has == {"binary"}:
        return dt.Binary()
    if has <= {"decimal", "int"}:
        # infer scale from the values (reference: decimal scale inference)
        scale = 0
        for v in seq:
            if isinstance(v, _decimal.Decimal):
                exp = v.as_tuple().exponent
                if isinstance(exp, int) and exp < 0:
                    scale = max(scale, -exp)
        return dt.Decimal(38, scale)
    if has == {"list"}:
        inner_vals = [x for v in seq if v is not None for x in v]
        return dt.List(_infer_pylist_dtype(inner_vals))
    if has == {"struct"}:
        names: list = []
        for v in seq:
            if v is not None:
                for k in v:
                    if k not in names:
                        names.append(k)
        return dt.Struct([
            (k, _infer_pylist_dtype([v.get(k) for v in seq if v is not None]))
            for k in names
        ])
    if not strict and has <= {"str", "int", "float", "bool"}:
        return dt.String()
    raise InvalidOperationError(f"cannot infer dtype from values with kinds {sorted(has)}")


def _from_pylist(
    name: str, seq: list, dtype: dt.DataType | None, *, strict: bool
) -> Column:
    logical = dtype if dtype is not None else _infer_pylist_dtype(seq, strict=strict)
    n = len(seq)
    validity = np.array([v is not None for v in seq], dtype=bool)
    has_null = not validity.all()

    if isinstance(logical, dt.Null):
        buf = Buffer.from_numpy(np.zeros(n, np.int32), np.zeros(n, bool) if n else None)
        return Column(name, logical, buf)

    if isinstance(logical, dt.Struct):
        fields = []
        for f in logical.fields:
            fields.append(
                Column.from_values(f.name, [None if v is None else v.get(f.name) for v in seq], f.dtype)
            )
        ids = np.arange(n, dtype=np.int64)
        buf = Buffer.from_numpy(ids, validity if has_null else None)
        return Column(name, logical, buf, None, UNSORTED, fields)

    if isinstance(logical, dt.Array):
        size = logical.size
        for v in seq:
            if v is not None and len(v) != size:
                raise InvalidOperationError(
                    f"Array column expects lists of length {size}, got {len(v)}"
                )
        flat = [x for v in seq if v is not None for x in v]
        child = Column.from_values("", flat, logical.inner, strict=strict)
        starts = np.zeros(n, np.int64)
        lens = np.zeros(n, np.int64)
        pos = 0
        for i, v in enumerate(seq):
            if v is None:
                continue
            starts[i] = pos
            lens[i] = size
            pos += size
        packed = (starts << 32) | lens
        buf = Buffer.from_numpy(packed, validity if has_null else None)
        return Column(name, logical, buf, None, UNSORTED, child)

    if isinstance(logical, dt.List):
        flat: list = []
        starts = np.zeros(n, np.int64)
        lens = np.zeros(n, np.int64)
        pos = 0
        for i, v in enumerate(seq):
            if v is None:
                continue
            vv = list(v)
            starts[i] = pos
            lens[i] = len(vv)
            flat.extend(vv)
            pos += len(vv)
        child = Column.from_values("", flat, logical.inner, strict=strict)
        packed = (starts << 32) | lens
        buf = Buffer.from_numpy(packed, validity if has_null else None)
        return Column(name, logical, buf, None, UNSORTED, child)

    if isinstance(logical, dt.Enum):
        # Enum codes ARE category positions (reference: polars Enum physical
        # = index into the fixed category list; comparisons/sorts follow
        # category order, not lexicographic order)
        cats = [str(c) for c in logical.categories]
        lookup = {c: i for i, c in enumerate(cats)}
        codes = np.zeros(n, np.int32)
        ok = validity.copy()
        for i, v in enumerate(seq):
            if v is None:
                continue
            j = lookup.get(str(v), -1)
            if j < 0:
                if strict:
                    raise InvalidOperationError(
                        f"value {v!r} is not in the Enum categories {cats}"
                    )
                ok[i] = False
            else:
                codes[i] = j
        table = strtable.StringTable(np.asarray(cats, dtype=object), sorted_order=False)
        buf = Buffer.from_numpy(codes, ok if not ok.all() else None)
        return Column(name, logical, buf, table)

    if _needs_table(logical):
        codes, val2, table = strtable.encode_strings(np.asarray(seq, dtype=object))
        buf = Buffer.from_numpy(codes, val2)
        return Column(name, logical, buf, table)

    if isinstance(logical, dt.Date):
        ints = np.array(
            [0 if v is None else _to_epoch_days(v) for v in seq], dtype=np.int32
        )
        buf = Buffer.from_numpy(ints, validity if has_null else None)
        return Column(name, logical, buf)

    if isinstance(logical, dt.Datetime):
        mult = _TU_PER_SECOND[logical.time_unit]
        ints = np.array(
            [0 if v is None else _to_epoch_ts(v, mult) for v in seq], dtype=np.int64
        )
        buf = Buffer.from_numpy(ints, validity if has_null else None)
        return Column(name, logical, buf)

    if isinstance(logical, dt.Duration):
        mult = _TU_PER_SECOND[logical.time_unit]
        ints = np.array(
            [
                0
                if v is None
                else int(v.total_seconds() * mult)
                if isinstance(v, _dt.timedelta)
                else int(v)
                for v in seq
            ],
            dtype=np.int64,
        )
        buf = Buffer.from_numpy(ints, validity if has_null else None)
        return Column(name, logical, buf)

    if isinstance(logical, dt.Time):
        ints = np.array(
            [
                0
                if v is None
                else (
                    v.hour * 3_600_000_000_000
                    + v.minute * 60_000_000_000
                    + v.second * 1_000_000_000
                    + v.microsecond * 1000
                )
                for v in seq
            ],
            dtype=np.int64,
        )
        buf = Buffer.from_numpy(ints, validity if has_null else None)
        return Column(name, logical, buf)

    if isinstance(logical, dt.Decimal):
        scale = logical.scale

        def _to_scaled(v) -> int:
            if isinstance(v, _decimal.Decimal):
                # exact: shift the decimal point, round half-even like the
                # reference's dec128_rescale
                return int(v.scaleb(scale).to_integral_value(_decimal.ROUND_HALF_EVEN))
            if isinstance(v, (int, np.integer)):
                return int(v) * 10 ** scale
            return round(float(v) * 10 ** scale)

        ints = np.array(
            [0 if v is None else _to_scaled(v) for v in seq], dtype=np.int64
        )
        buf = Buffer.from_numpy(ints, validity if has_null else None)
        return Column(name, logical, buf)

    np_dtype = dt.dtype_to_numpy(logical)
    filled = [0 if v is None else v for v in seq]
    try:
        arr = np.asarray(filled, dtype=np_dtype)
    except (ValueError, OverflowError, TypeError) as e:
        if strict:
            raise InvalidOperationError(
                f"could not build {logical!r} column {name!r}: {e}"
            ) from None
        arr = np.asarray(
            [0 if v is None else np_dtype.type(v) for v in seq], dtype=np_dtype
        )
    buf = Buffer.from_numpy(arr, validity if has_null else None)
    return Column(name, logical, buf)


def _to_epoch_days(v: Any) -> int:
    if isinstance(v, _dt.datetime):
        v = v.date()
    if isinstance(v, _dt.date):
        return (v - _EPOCH_DATE).days
    return int(v)


def _to_epoch_ts(v: Any, mult: int) -> int:
    if isinstance(v, _dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        # exact integer arithmetic: float .timestamp() loses the microsecond
        # for |t| beyond ~2^52/1e6 s (hypothesis-found: 1833-01-01 00:00:00
        # .000135 came back .000136)
        delta = v - _EPOCH_DT_UTC
        micros = (delta.days * 86_400 + delta.seconds) * 1_000_000 + delta.microseconds
        return micros * mult // 1_000_000
    if isinstance(v, _dt.date):
        return (v - _EPOCH_DATE).days * 86_400 * mult
    return int(v)


def full_column(name: str, value: Any, length: int, dtype: dt.DataType | None = None) -> Column:
    """Broadcast a scalar into a column (the reference's ScalarColumn analogue,
    polars-core/src/frame/column/mod.rs:41 — materialized eagerly for now)."""
    col = Column.from_values(name, [value], dtype)
    size = padded_size(length)
    buf = col.buffer
    values = jnp.broadcast_to(buf.values[:1], (size,))
    validity = None
    if buf.validity is not None:
        validity = jnp.broadcast_to(buf.validity[:1], (size,))
    return Column(name, col.dtype, Buffer(values, validity, length), col.table)
