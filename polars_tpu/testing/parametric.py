"""Hypothesis strategies for random Series/DataFrames over the dtype lattice.

API-compatible subset of py-polars' parametric testing package (reference:
py-polars/src/polars/testing/parametric/strategies/{core,data,dtype}.py):
``series()``, ``dataframes()``, ``column``, plus ``series_strategy`` kept as
a compatibility alias for earlier rounds' tests.
"""

from __future__ import annotations

import datetime as dtm
import decimal as _decimal
from typing import Any

from hypothesis import strategies as st

import polars_tpu as pl
from polars_tpu import datatypes as dt

_ROW_LIMIT = 10
_COL_LIMIT = 8

# ---------------------------------------------------------------------------
# scalar strategies per dtype (reference: strategies/data.py)
# ---------------------------------------------------------------------------

_TEXT = st.text(alphabet="abcdeXYZ 01_", max_size=8)


def _int_strategy(bits: int, signed: bool):
    if signed:
        return st.integers(min_value=-(2 ** (bits - 1)), max_value=2 ** (bits - 1) - 1)
    return st.integers(min_value=0, max_value=2**bits - 1)


def scalar_strategy(d: dt.DataType):
    n = type(d).__name__
    if n == "Boolean":
        return st.booleans()
    if n.startswith("Int"):
        return _int_strategy(int(n[3:]), True)
    if n.startswith("UInt"):
        # stay in the int64-safe window (uint64 full range emulates, but
        # python-side oracles overflow)
        bits = min(int(n[4:]), 63)
        return _int_strategy(bits, False)
    if n == "Float32":
        return st.floats(allow_nan=False, allow_infinity=False, width=32)
    if n == "Float64":
        return st.floats(allow_nan=False, allow_infinity=False, width=64)
    if n == "String":
        return _TEXT
    if n == "Binary":
        return st.binary(max_size=8)
    if n in ("Categorical", "Enum"):
        cats = list(getattr(d, "categories", None) or ("alpha", "beta", "gamma"))
        return st.sampled_from(cats)
    if n == "Date":
        return st.dates(min_value=dtm.date(1700, 1, 1), max_value=dtm.date(2300, 1, 1))
    if n == "Datetime":
        return st.datetimes(
            min_value=dtm.datetime(1700, 1, 1), max_value=dtm.datetime(2300, 1, 1)
        )
    if n == "Duration":
        return st.timedeltas(
            min_value=dtm.timedelta(days=-999_999), max_value=dtm.timedelta(days=999_999)
        )
    if n == "Time":
        return st.times()
    if n == "Decimal":
        scale = d.scale if d.scale else 2
        return st.integers(min_value=-(10**12), max_value=10**12).map(
            lambda i, s=scale: _decimal.Decimal(i).scaleb(-s)
        )
    if n == "List":
        return st.lists(scalar_strategy(d.inner), max_size=4)
    if n == "Array":
        return st.lists(scalar_strategy(d.inner), min_size=d.size, max_size=d.size)
    if n == "Struct":
        return st.fixed_dictionaries({f.name: scalar_strategy(f.dtype) for f in d.fields})
    if n == "Null":
        return st.none()
    raise TypeError(f"no scalar strategy for {d!r}")


_FLAT_DTYPES: tuple[dt.DataType, ...] = (
    dt.Int8(), dt.Int16(), dt.Int32(), dt.Int64(),
    dt.UInt8(), dt.UInt16(), dt.UInt32(), dt.UInt64(),
    dt.Float32(), dt.Float64(), dt.Boolean(), dt.String(),
    dt.Date(), dt.Datetime("us"), dt.Duration("us"), dt.Time(),
    dt.Categorical(), dt.Decimal(38, 2),
)
_NESTED_DTYPES: tuple[dt.DataType, ...] = (
    dt.List(dt.Int64()), dt.List(dt.String()),
    dt.Struct([("a", dt.Int64()), ("b", dt.String())]),
)


def _norm_dtype_set(spec) -> list[dt.DataType] | None:
    if spec is None:
        return None
    if not isinstance(spec, (list, tuple, set, frozenset)):
        spec = [spec]
    return [dt.parse_into_dtype(s) for s in spec]


def dtypes(
    *,
    allowed_dtypes: Any = None,
    excluded_dtypes: Any = None,
    allow_nested: bool = True,
):
    """Strategy over dtype INSTANCES (reference: strategies/dtype.py)."""
    pool = list(_FLAT_DTYPES) + (list(_NESTED_DTYPES) if allow_nested else [])
    allowed = _norm_dtype_set(allowed_dtypes)
    excluded = _norm_dtype_set(excluded_dtypes) or []
    if allowed is not None:
        pool = [d for d in pool if any(type(d).__name__ == type(a).__name__ for a in allowed)]
        pool = pool or allowed
    pool = [d for d in pool if not any(type(d).__name__ == type(e).__name__ for e in excluded)]
    if not pool:
        raise ValueError("no dtypes remain after allowed/excluded filtering")
    return st.sampled_from(pool)


# ---------------------------------------------------------------------------
# series / column / dataframes (reference: strategies/core.py)
# ---------------------------------------------------------------------------


@st.composite
def series(
    draw,
    *,
    name: Any = None,
    dtype: Any = None,
    min_size: int = 0,
    max_size: int = _ROW_LIMIT,
    strategy: Any = None,
    allow_null: bool = True,
    unique: bool = False,
    allowed_dtypes: Any = None,
    excluded_dtypes: Any = None,
    **kwargs: Any,
):
    """Hypothesis strategy producing a random Series."""
    if dtype is None:
        d = draw(dtypes(
            allowed_dtypes=allowed_dtypes, excluded_dtypes=excluded_dtypes,
            allow_nested=not unique,
        ))
    else:
        d = dt.parse_into_dtype(dtype)
    if name is None:
        sname = ""
    elif isinstance(name, str):
        sname = name
    else:
        sname = draw(name)
    elem = strategy if strategy is not None else scalar_strategy(d)
    size = draw(st.integers(min_size, max_size))
    if unique:
        vals = draw(st.lists(elem, min_size=size, max_size=size, unique=True))
    else:
        e = st.one_of(st.none(), elem) if allow_null else elem
        vals = draw(st.lists(e, min_size=size, max_size=size))
    return pl.Series(sname, vals, dtype=d)


class column:
    """Column specification for :func:`dataframes` (reference: core.column)."""

    def __init__(
        self,
        name: str | None = None,
        *,
        dtype: Any = None,
        strategy: Any = None,
        allow_null: bool = True,
        unique: bool = False,
    ) -> None:
        self.name = name
        self.dtype = dtype
        self.strategy = strategy
        self.allow_null = allow_null
        self.unique = unique


@st.composite
def dataframes(
    draw,
    cols: Any = None,
    *,
    lazy: bool = False,
    min_cols: int = 1,
    max_cols: int = _COL_LIMIT,
    min_size: int = 0,
    max_size: int = _ROW_LIMIT,
    include_cols: Any = None,
    allow_null: Any = True,
    allowed_dtypes: Any = None,
    excluded_dtypes: Any = None,
    **kwargs: Any,
):
    """Hypothesis strategy producing a random DataFrame (or LazyFrame)."""
    if isinstance(cols, int):
        specs = [column(f"col{i}") for i in range(cols)]
    elif isinstance(cols, column):
        specs = [cols]
    elif cols is not None:
        specs = list(cols)
    else:
        n_cols = draw(st.integers(min_cols, max_cols))
        specs = [column(f"col{i}") for i in range(n_cols)]
    if include_cols:
        extra = [include_cols] if isinstance(include_cols, column) else list(include_cols)
        specs.extend(extra)
    height = draw(st.integers(min_size, max_size))
    data = {}
    for i, spec in enumerate(specs):
        cname = spec.name if spec.name is not None else f"col{i}"
        if spec.dtype is None:
            d = draw(dtypes(allowed_dtypes=allowed_dtypes, excluded_dtypes=excluded_dtypes))
        else:
            d = dt.parse_into_dtype(spec.dtype)
        elem = spec.strategy if spec.strategy is not None else scalar_strategy(d)
        anull = allow_null if isinstance(allow_null, bool) else allow_null.get(cname, True)
        if spec.unique:
            vals = draw(st.lists(elem, min_size=height, max_size=height, unique=True))
        else:
            e = st.one_of(st.none(), elem) if (anull and spec.allow_null) else elem
            vals = draw(st.lists(e, min_size=height, max_size=height))
        data[cname] = pl.Series(cname, vals, dtype=d)
    df = pl.DataFrame(data) if data else pl.DataFrame()
    return df.lazy() if lazy else df


# --- round-1/2 compatibility aliases ---------------------------------------

_SCALARS = {
    "Int64": _int_strategy(54, True),
    "Int32": _int_strategy(32, True),
    "Float64": st.floats(allow_nan=False, allow_infinity=False, width=64),
    "Boolean": st.booleans(),
    "String": _TEXT,
    "Date": st.dates(min_value=dtm.date(1700, 1, 1), max_value=dtm.date(2300, 1, 1)),
}

DTYPE_NAMES = list(_SCALARS)


def series_strategy(dtype_name: str, *, min_size: int = 0, max_size: int = 50, allow_null: bool = True):
    base = _SCALARS[dtype_name]
    elem = st.one_of(st.none(), base) if allow_null else base
    return st.lists(elem, min_size=min_size, max_size=max_size).map(
        lambda vals: pl.Series("x", vals, dtype=getattr(pl, dtype_name))
    )
