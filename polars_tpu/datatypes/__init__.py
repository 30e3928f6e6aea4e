"""Data types for polars_tpu.

Logical type lattice mirroring the reference (polars-core/src/datatypes/dtype.rs:90-145
and py-polars/src/polars/datatypes/classes.py), mapped onto TPU-friendly physical
storage:

- integers/floats/bool -> dense jnp arrays (+ validity mask)
- String/Categorical/Enum -> dictionary-encoded int32 codes + host-side value table
  (the BASELINE.json north star: "variable-length strings are handled via ...
  dictionary-encoded i32 keys so every operator stays dense and vectorizable")
- Date -> int32 days since epoch; Datetime -> int64 (us default); Duration -> int64;
  Time -> int64 nanoseconds since midnight
- List/Array/Struct -> nested (offsets/fixed-stride/children), kept minimal for now.
"""

from __future__ import annotations

from typing import Any

import numpy as np


class DataTypeClass(type):
    """Metaclass so bare classes (``Int64``) behave like instances."""

    def __repr__(cls) -> str:
        return cls.__name__

    def __hash__(cls) -> int:
        return hash(cls.__name__)

    def __eq__(cls, other: Any) -> bool:  # noqa: ANN401
        if other is None:
            return False
        if isinstance(other, DataTypeClass):
            return cls.__name__ == other.__name__
        if isinstance(other, DataType):
            # Bare class equals any parametrization of the same type.
            return cls.__name__ == type(other).__name__
        return NotImplemented

    def __ne__(cls, other: Any) -> bool:  # noqa: ANN401
        result = cls.__eq__(other)
        return result if result is NotImplemented else not result

    # Allow e.g. ``dtype in (pl.Int64, pl.Float64)`` and classification helpers
    def is_numeric(cls) -> bool:
        return cls().is_numeric()

    def is_integer(cls) -> bool:
        return cls().is_integer()

    def is_signed_integer(cls) -> bool:
        return cls().is_signed_integer()

    def is_unsigned_integer(cls) -> bool:
        return cls().is_unsigned_integer()

    def is_float(cls) -> bool:
        return cls().is_float()

    def is_temporal(cls) -> bool:
        return cls().is_temporal()

    def is_nested(cls) -> bool:
        return cls().is_nested()

    def is_(cls, other: Any) -> bool:  # noqa: ANN401
        return cls == other and hash(cls) == hash(other)

    def base_type(cls) -> DataTypeClass:
        return cls


class DataType(metaclass=DataTypeClass):
    """Base class for all polars_tpu data types."""

    __slots__ = ()

    def __repr__(self) -> str:
        return type(self).__name__

    def __eq__(self, other: Any) -> bool:  # noqa: ANN401
        if other is None:
            return False
        if isinstance(other, DataTypeClass):
            return type(self).__name__ == other.__name__
        if isinstance(other, DataType):
            return self._key() == other._key()
        return NotImplemented

    def __ne__(self, other: Any) -> bool:  # noqa: ANN401
        result = self.__eq__(other)
        return result if result is NotImplemented else not result

    def __hash__(self) -> int:
        return hash(type(self).__name__)

    def _key(self) -> tuple:
        return (type(self).__name__,)

    def base_type(self) -> DataTypeClass:
        return type(self)

    def is_(self, other: Any) -> bool:  # noqa: ANN401
        return self == other

    def is_numeric(self) -> bool:
        return isinstance(self, NumericType)

    def is_decimal(self) -> bool:
        return isinstance(self, Decimal)

    def is_integer(self) -> bool:
        return isinstance(self, IntegerType)

    def is_signed_integer(self) -> bool:
        return isinstance(self, SignedIntegerType)

    def is_unsigned_integer(self) -> bool:
        return isinstance(self, UnsignedIntegerType)

    def is_float(self) -> bool:
        return isinstance(self, FloatType)

    def is_temporal(self) -> bool:
        return isinstance(self, TemporalType)

    def is_nested(self) -> bool:
        return isinstance(self, NestedType)

    def max(self):
        raise NotImplementedError

    def min(self):
        raise NotImplementedError


class NumericType(DataType):
    __slots__ = ()


class IntegerType(NumericType):
    __slots__ = ()

    def max(self) -> int:
        return int(np.iinfo(dtype_to_numpy(self)).max)

    def min(self) -> int:
        return int(np.iinfo(dtype_to_numpy(self)).min)


class SignedIntegerType(IntegerType):
    __slots__ = ()


class UnsignedIntegerType(IntegerType):
    __slots__ = ()


class FloatType(NumericType):
    __slots__ = ()

    def max(self) -> float:
        return float(np.finfo(dtype_to_numpy(self)).max)

    def min(self) -> float:
        return float(np.finfo(dtype_to_numpy(self)).min)


class TemporalType(DataType):
    __slots__ = ()


class NestedType(DataType):
    __slots__ = ()


class ObjectType(DataType):
    __slots__ = ()


class Int8(SignedIntegerType):
    __slots__ = ()


class Int16(SignedIntegerType):
    __slots__ = ()


class Int32(SignedIntegerType):
    __slots__ = ()


class Int64(SignedIntegerType):
    __slots__ = ()


class Int128(SignedIntegerType):
    __slots__ = ()


class UInt8(UnsignedIntegerType):
    __slots__ = ()


class UInt16(UnsignedIntegerType):
    __slots__ = ()


class UInt32(UnsignedIntegerType):
    __slots__ = ()


class UInt64(UnsignedIntegerType):
    __slots__ = ()


class UInt128(UnsignedIntegerType):
    __slots__ = ()


class Float16(FloatType):
    """Half precision; stored as f32 on device (TPU VPU has no f16 lanes for
    most elementwise paths; bf16/f32 is the native pair). Reference:
    py-polars datatypes Float16 (itself marked experimental)."""

    __slots__ = ()


class Float32(FloatType):
    __slots__ = ()


class Float64(FloatType):
    __slots__ = ()


class Decimal(NumericType):
    """Fixed-point decimal; stored as int128-emulated int64 pair or int64 scaled.

    Round-1 physical storage: int64 scaled by 10**scale (covers PDS-H monetary
    columns, which fit easily; reference: dtype.rs Decimal(38)).
    """

    __slots__ = ("precision", "scale")

    def __init__(self, precision: int | None = None, scale: int = 0) -> None:
        self.precision = precision
        self.scale = scale

    def _key(self) -> tuple:
        return ("Decimal", self.precision, self.scale)

    def __hash__(self) -> int:
        return hash("Decimal")

    def __repr__(self) -> str:
        return f"Decimal(precision={self.precision}, scale={self.scale})"


class Boolean(DataType):
    __slots__ = ()


class String(DataType):
    """UTF-8 string, dictionary-encoded (i32 codes + host value table)."""

    __slots__ = ()


# Alias kept for API parity with py-polars
Utf8 = String


class Binary(DataType):
    __slots__ = ()


class Categorical(DataType):
    __slots__ = ("ordering",)

    def __init__(self, ordering: str = "physical") -> None:
        self.ordering = ordering

    def _key(self) -> tuple:
        return ("Categorical",)

    def __hash__(self) -> int:
        return hash("Categorical")


class Enum(DataType):
    __slots__ = ("categories",)

    def __init__(self, categories: Any = None) -> None:
        if categories is None:
            self.categories = []
        else:
            self.categories = list(categories)

    def _key(self) -> tuple:
        return ("Enum", tuple(self.categories))

    def __hash__(self) -> int:
        return hash("Enum")

    def __repr__(self) -> str:
        return f"Enum(categories={self.categories!r})"


class Date(TemporalType):
    """Days since UNIX epoch, int32."""

    __slots__ = ()


class Datetime(TemporalType):
    """Microseconds (default) since UNIX epoch, int64."""

    __slots__ = ("time_unit", "time_zone")

    def __init__(self, time_unit: str = "us", time_zone: str | None = None) -> None:
        if time_unit not in ("ms", "us", "ns"):
            from polars_tpu.errors import InvalidOperationError

            raise InvalidOperationError(f"invalid time_unit: {time_unit!r}")
        self.time_unit = time_unit
        self.time_zone = time_zone

    def _key(self) -> tuple:
        return ("Datetime", self.time_unit, self.time_zone)

    def __hash__(self) -> int:
        return hash("Datetime")

    def __repr__(self) -> str:
        return f"Datetime(time_unit='{self.time_unit}', time_zone={self.time_zone!r})"


class Duration(TemporalType):
    __slots__ = ("time_unit",)

    def __init__(self, time_unit: str = "us") -> None:
        self.time_unit = time_unit

    def _key(self) -> tuple:
        return ("Duration", self.time_unit)

    def __hash__(self) -> int:
        return hash("Duration")

    def __repr__(self) -> str:
        return f"Duration(time_unit='{self.time_unit}')"


class Time(TemporalType):
    """Nanoseconds since midnight, int64."""

    __slots__ = ()


class List(NestedType):
    __slots__ = ("inner",)

    def __init__(self, inner: Any = None) -> None:
        self.inner = parse_into_dtype(inner) if inner is not None else Null()

    def _key(self) -> tuple:
        return ("List", self.inner)

    def __hash__(self) -> int:
        return hash("List")

    def __repr__(self) -> str:
        return f"List({self.inner!r})"


class Array(NestedType):
    __slots__ = ("inner", "size")

    def __init__(self, inner: Any = None, shape: Any = None, *, size: int | None = None) -> None:
        self.inner = parse_into_dtype(inner) if inner is not None else Null()
        if shape is not None:
            self.size = int(shape) if not isinstance(shape, (tuple, list)) else int(shape[0])
        else:
            self.size = int(size) if size is not None else 0

    def _key(self) -> tuple:
        return ("Array", self.inner, self.size)

    def __hash__(self) -> int:
        return hash("Array")

    def __repr__(self) -> str:
        return f"Array({self.inner!r}, shape=({self.size},))"


class Field:
    __slots__ = ("name", "dtype")

    def __init__(self, name: str, dtype: Any) -> None:
        self.name = name
        self.dtype = parse_into_dtype(dtype)

    def __eq__(self, other: Any) -> bool:  # noqa: ANN401
        return isinstance(other, Field) and self.name == other.name and self.dtype == other.dtype

    def __hash__(self) -> int:
        return hash((self.name, self.dtype))

    def __repr__(self) -> str:
        return f"Field({self.name!r}, {self.dtype!r})"


class Struct(NestedType):
    __slots__ = ("fields",)

    def __init__(self, fields: Any = None) -> None:
        if fields is None:
            self.fields = []
        elif isinstance(fields, dict):
            self.fields = [Field(n, d) for n, d in fields.items()]
        else:
            self.fields = [f if isinstance(f, Field) else Field(*f) for f in fields]

    def _key(self) -> tuple:
        return ("Struct", tuple(self.fields))

    def __hash__(self) -> int:
        return hash("Struct")

    def __repr__(self) -> str:
        return f"Struct({self.fields!r})"

    def to_schema(self) -> dict:
        return {f.name: f.dtype for f in self.fields}


class Null(DataType):
    __slots__ = ()


class Object(ObjectType):
    __slots__ = ()


class Unknown(DataType):
    __slots__ = ()


# ---------------------------------------------------------------------------
# numpy <-> dtype mapping (physical storage types)
# ---------------------------------------------------------------------------

_DTYPE_TO_NUMPY = {
    "Int8": np.int8,
    "Int16": np.int16,
    "Int32": np.int32,
    "Int64": np.int64,
    "UInt8": np.uint8,
    "UInt16": np.uint16,
    "UInt32": np.uint32,
    "UInt64": np.uint64,
    "Float16": np.float32,
    "Float32": np.float32,
    "Float64": np.float64,
    "Boolean": np.bool_,
    "Date": np.int32,
    "Datetime": np.int64,
    "Duration": np.int64,
    "Time": np.int64,
    "String": np.int32,  # dictionary codes
    "Categorical": np.int32,
    "Enum": np.int32,
    "Binary": np.int32,
    "Decimal": np.int64,
}

_NUMPY_TO_DTYPE = {
    np.dtype(np.int8): Int8,
    np.dtype(np.int16): Int16,
    np.dtype(np.int32): Int32,
    np.dtype(np.int64): Int64,
    np.dtype(np.uint8): UInt8,
    np.dtype(np.uint16): UInt16,
    np.dtype(np.uint32): UInt32,
    np.dtype(np.uint64): UInt64,
    np.dtype(np.float16): Float32,
    np.dtype(np.float32): Float32,
    np.dtype(np.float64): Float64,
    np.dtype(np.bool_): Boolean,
}


def dtype_to_numpy(dtype: Any) -> np.dtype:
    """Physical numpy storage dtype for a logical dtype."""
    dtype = parse_into_dtype(dtype)
    name = type(dtype).__name__
    try:
        return np.dtype(_DTYPE_TO_NUMPY[name])
    except KeyError:
        from polars_tpu.errors import InvalidOperationError

        raise InvalidOperationError(f"no physical storage mapping for dtype {dtype!r}") from None


def numpy_to_dtype(np_dtype: Any) -> DataType:
    np_dtype = np.dtype(np_dtype)
    try:
        return _NUMPY_TO_DTYPE[np_dtype]()
    except KeyError:
        if np_dtype.kind in ("U", "S", "O"):
            return String()
        if np_dtype.kind == "M":  # datetime64
            unit = np.datetime_data(np_dtype)[0]
            if unit == "D":
                return Date()
            return Datetime(unit if unit in ("ms", "us", "ns") else "us")
        if np_dtype.kind == "m":
            unit = np.datetime_data(np_dtype)[0]
            return Duration(unit if unit in ("ms", "us", "ns") else "us")
        from polars_tpu.errors import InvalidOperationError

        raise InvalidOperationError(f"unsupported numpy dtype {np_dtype!r}") from None


_PY_TO_DTYPE = {
    int: Int64,
    float: Float64,
    bool: Boolean,
    str: String,
}


def parse_into_dtype(obj: Any) -> DataType:
    """Convert a user dtype spec into a DataType instance."""
    if isinstance(obj, DataType):
        return obj
    if isinstance(obj, DataTypeClass):
        return obj()
    if isinstance(obj, type) and obj in _PY_TO_DTYPE:
        return _PY_TO_DTYPE[obj]()
    if isinstance(obj, (np.dtype, str)) or (isinstance(obj, type) and issubclass(obj, np.generic)):
        if isinstance(obj, str):
            # Accept polars-style lowercase names
            lut = {
                "i8": Int8, "i16": Int16, "i32": Int32, "i64": Int64,
                "u8": UInt8, "u16": UInt16, "u32": UInt32, "u64": UInt64,
                "f32": Float32, "f64": Float64, "bool": Boolean, "str": String,
                "date": Date, "datetime": Datetime, "duration": Duration,
                "time": Time, "null": Null,
            }
            if obj in lut:
                return lut[obj]()
        return numpy_to_dtype(np.dtype(obj))
    if obj is None:
        return Null()
    from polars_tpu.errors import InvalidOperationError

    raise InvalidOperationError(f"cannot parse {obj!r} into a polars_tpu dtype")


# Groups, mirroring py-polars datatypes.group
INTEGER_DTYPES = frozenset([Int8, Int16, Int32, Int64, Int128, UInt8, UInt16, UInt32, UInt64, UInt128])
SIGNED_INTEGER_DTYPES = frozenset([Int8, Int16, Int32, Int64, Int128])
UNSIGNED_INTEGER_DTYPES = frozenset([UInt8, UInt16, UInt32, UInt64])
FLOAT_DTYPES = frozenset([Float16, Float32, Float64])
NUMERIC_DTYPES = INTEGER_DTYPES | FLOAT_DTYPES
TEMPORAL_DTYPES = frozenset([Date, Datetime, Duration, Time])
NESTED_DTYPES = frozenset([List, Array, Struct])

__all__ = [
    "DataType", "DataTypeClass", "NumericType", "IntegerType", "SignedIntegerType",
    "UnsignedIntegerType", "FloatType", "TemporalType", "NestedType",
    "Int8", "Int16", "Int32", "Int64", "Int128", "UInt8", "UInt16", "UInt32", "UInt64", "UInt128", "Float16",
    "Float32", "Float64", "Decimal", "Boolean", "String", "Utf8", "Binary",
    "Categorical", "Enum", "Date", "Datetime", "Duration", "Time",
    "List", "Array", "Struct", "Field", "Null", "Object", "Unknown",
    "dtype_to_numpy", "numpy_to_dtype", "parse_into_dtype",
    "INTEGER_DTYPES", "SIGNED_INTEGER_DTYPES", "UNSIGNED_INTEGER_DTYPES",
    "FLOAT_DTYPES", "NUMERIC_DTYPES", "TEMPORAL_DTYPES", "NESTED_DTYPES",
]


class DataTypeExpr:
    """A datatype resolved lazily against a schema (reference:
    py-polars datatype_expr.py + functions/datatype.py). Kinds:
    ``lit`` (a concrete dtype), ``col`` (the dtype of a named column),
    ``self`` (the dtype of the expression being cast), ``struct`` (a Struct
    whose field dtypes may themselves be DataTypeExprs). Hashable so cast
    nodes carrying one still key the plan/jit caches structurally."""

    __slots__ = ("kind", "arg")

    def __init__(self, kind: str, arg: Any = None) -> None:
        object.__setattr__(self, "kind", kind)
        object.__setattr__(self, "arg", arg)

    def __setattr__(self, *a) -> None:
        raise AttributeError("DataTypeExpr is immutable")

    def __hash__(self) -> int:
        return hash(("DataTypeExpr", self.kind, self.arg))

    def __eq__(self, other: Any) -> bool:
        return (
            isinstance(other, DataTypeExpr)
            and self.kind == other.kind
            and self.arg == other.arg
        )

    def __repr__(self) -> str:
        return f"DataTypeExpr({self.kind}, {self.arg!r})"

    def _resolve(self, schema: Any = None, self_dtype: DataType | None = None) -> DataType:
        if self.kind == "lit":
            return self.arg
        if self.kind == "col":
            if schema is None or self.arg not in schema:
                from polars_tpu.errors import SchemaError

                raise SchemaError(f"dtype_of: column {self.arg!r} not in schema")
            return schema[self.arg]
        if self.kind == "self":
            if self_dtype is None:
                from polars_tpu.errors import InvalidOperationError

                raise InvalidOperationError("self_dtype() used outside a cast context")
            return self_dtype
        if self.kind == "struct":
            fields = []
            for name, d in self.arg:
                fields.append((name, d._resolve(schema, self_dtype)
                               if isinstance(d, DataTypeExpr) else d))
            return Struct(fields)
        if self.kind == "self_to_list":
            # Array(inner, n) -> List(inner) (arr.to_list)
            if self_dtype is None:
                from polars_tpu.errors import InvalidOperationError

                raise InvalidOperationError("self_to_list used outside a cast context")
            inner = self_dtype.inner if isinstance(self_dtype, (List, Array)) else self_dtype
            return List(inner)
        raise AssertionError(self.kind)

    def collect_dtype(self, context: Any) -> DataType:
        """Resolve against a schema / mapping (reference API)."""
        sch = dict(context) if not hasattr(context, "__getitem__") else context
        return self._resolve(sch)


def resolve_dtype(obj: Any, schema: Any = None, self_dtype: DataType | None = None) -> DataType:
    """parse_into_dtype that also accepts a DataTypeExpr."""
    if isinstance(obj, DataTypeExpr):
        return obj._resolve(schema, self_dtype)
    return parse_into_dtype(obj)


def _to_dtype_expr(self) -> DataTypeExpr:
    return DataTypeExpr("lit", self)


DataType.to_dtype_expr = _to_dtype_expr


def dtype_of(col: str) -> DataTypeExpr:
    """DataTypeExpr of a named column (functions/datatype.py dtype_of)."""
    return DataTypeExpr("col", col)


def self_dtype() -> DataTypeExpr:
    """The dtype of the expression being cast (functions/datatype.py)."""
    return DataTypeExpr("self")


def struct_with_fields(mapping: Any) -> DataTypeExpr:
    """Struct datatype expression with per-field (possibly lazy) dtypes."""
    return DataTypeExpr("struct", tuple(dict(mapping).items()))


class Categories:
    """A named collection of categories for Categorical (reference:
    py-polars datatypes/classes.py:678). In this engine strings/categoricals
    are per-column ORDINAL dictionaries (utils/strtable.py), so named
    Categories are identity handles: equal name+namespace+physical compare
    equal and may share a code space when columns unify. Index access reads
    the live table registered by the owning column (set on first use)."""

    __slots__ = ("name", "namespace", "physical", "_table")

    def __init__(self, name: str | None = None, namespace: str = "", physical: Any = None) -> None:
        if not name and namespace:
            raise ValueError("global Categories cannot have a namespace")
        self.name = name or ""
        self.namespace = namespace
        self.physical = physical if physical is not None else UInt32()
        self._table = None

    def __eq__(self, other: Any) -> bool:
        return (
            isinstance(other, Categories)
            and (self.name, self.namespace, type(self.physical).__name__)
            == (other.name, other.namespace, type(other.physical).__name__)
        )

    def __hash__(self) -> int:
        return hash(("Categories", self.name, self.namespace, type(self.physical).__name__))

    def __repr__(self) -> str:
        return f"Categories(name={self.name!r}, namespace={self.namespace!r})"

    @classmethod
    def random(cls, namespace: str = "") -> "Categories":
        import uuid

        return cls(uuid.uuid4().hex, namespace)

    def is_global(self) -> bool:
        return not self.name

    def __getitem__(self, key: Any):
        if self._table is None:
            raise KeyError("no categories registered yet for this Categories handle")
        vals = list(self._table)
        if isinstance(key, int):
            return vals[key]
        return vals.index(key)


class BaseExtension(DataType):
    """Base class for extension data types (reference:
    py-polars datatypes/classes.py:1402): a named logical wrapper over a
    STORAGE dtype. On this engine the physical column is the storage dtype's
    buffer; the extension identity is frame metadata."""

    __slots__ = ("_name", "_storage", "_metadata")

    def __init__(self, name: str, storage: Any, metadata: str | None = None) -> None:
        self._name = name
        self._storage = parse_into_dtype(storage)
        self._metadata = metadata

    @classmethod
    def ext_from_params(cls, name: str, storage: Any, metadata: str | None):
        slf = cls.__new__(cls)
        slf._name = name
        slf._storage = parse_into_dtype(storage)
        slf._metadata = metadata
        return slf

    def ext_name(self) -> str:
        return self._name

    def ext_storage(self) -> DataType:
        return self._storage

    def ext_metadata(self) -> str | None:
        return self._metadata

    def _string_repr(self) -> str:
        s = self.ext_name().lower()
        return s if len(s) <= 12 else s[:10] + ".."

    def __eq__(self, other: Any) -> bool:
        return (
            isinstance(other, BaseExtension)
            and (self._name, self._storage, self._metadata)
            == (other._name, other._storage, other._metadata)
        )

    def __hash__(self) -> int:
        return hash(("BaseExtension", self._name, repr(self._storage), self._metadata))

    def __repr__(self) -> str:
        return f"{type(self).__name__}({self._name!r}, {self._storage!r})"


class Extension(BaseExtension):
    """Generic extension type: what unregistered extension names load as."""

    __slots__ = ()


_EXT_REGISTRY: dict[str, Any] = {}


def register_extension_type(ext_name: str, ext_class: Any = None, *, as_storage: bool = False) -> None:
    """Register a BaseExtension subclass (or storage passthrough) for a name
    (reference: datatypes/extension.py:15)."""
    if ext_name in _EXT_REGISTRY:
        raise ValueError(f"extension type {ext_name!r} is already registered")
    if as_storage:
        if ext_class is not None:
            raise ValueError("cannot specify ext_class when as_storage is True")
        _EXT_REGISTRY[ext_name] = "storage"
        return
    if not (isinstance(ext_class, type) and issubclass(ext_class, BaseExtension)):
        raise TypeError("ext_class must subclass BaseExtension")
    _EXT_REGISTRY[ext_name] = ext_class


def unregister_extension_type(ext_name: str) -> None:
    _EXT_REGISTRY.pop(ext_name)


def get_extension_type(ext_name: str):
    """Registered class, 'storage' for passthrough, or None."""
    return _EXT_REGISTRY.get(ext_name)
