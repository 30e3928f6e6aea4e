"""Hypothesis strategies for random Series/DataFrames over the dtype lattice
(reference: py-polars testing/parametric/strategies/)."""

from __future__ import annotations

import datetime as dtm

from hypothesis import strategies as st

import polars_tpu as pl

_SCALARS = {
    "Int64": st.integers(min_value=-(2**53), max_value=2**53),
    "Int32": st.integers(min_value=-(2**31), max_value=2**31 - 1),
    "Float64": st.floats(allow_nan=False, allow_infinity=False, width=64),
    "Boolean": st.booleans(),
    "String": st.text(alphabet="abcdeXYZ ", max_size=8),
    "Date": st.dates(min_value=dtm.date(1700, 1, 1), max_value=dtm.date(2300, 1, 1)),
}

DTYPE_NAMES = list(_SCALARS)


def series_strategy(dtype_name: str, *, min_size: int = 0, max_size: int = 50, allow_null: bool = True):
    base = _SCALARS[dtype_name]
    elem = st.one_of(st.none(), base) if allow_null else base
    return st.lists(elem, min_size=min_size, max_size=max_size).map(
        lambda vals: pl.Series("x", vals, dtype=getattr(pl, dtype_name))
    )


@st.composite
def dataframes(draw, *, max_cols: int = 4, min_size: int = 0, max_size: int = 40):
    n_cols = draw(st.integers(1, max_cols))
    height = draw(st.integers(min_size, max_size))
    cols = {}
    for i in range(n_cols):
        dt_name = draw(st.sampled_from(DTYPE_NAMES))
        base = _SCALARS[dt_name]
        elem = st.one_of(st.none(), base)
        vals = draw(st.lists(elem, min_size=height, max_size=height))
        cols[f"c{i}"] = pl.Series(f"c{i}", vals, dtype=getattr(pl, dt_name))
    return pl.DataFrame(cols)
