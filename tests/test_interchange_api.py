"""Interchange protocol, Arrow C-stream FFI, and the namespace-registration
SDK (round-1 verdict #9 API tail; reference: py-polars interchange/ + api.py
+ pyo3-polars plugin registration)."""

import numpy as np
import pytest

import polars_tpu as pl


def test_dataframe_interchange_roundtrip():
    df = pl.DataFrame({"a": [1, 2, 3], "b": [1.5, None, 2.5], "s": ["x", "y", "z"]})
    obj = df.__dataframe__()
    assert obj.num_rows() == 3
    back = pl.from_dataframe(obj)
    assert back["a"].to_list() == [1, 2, 3]
    assert back["s"].to_list() == ["x", "y", "z"]
    # pandas consumes it too
    import pandas as pd

    pdf = pd.api.interchange.from_dataframe(df)
    assert list(pdf["a"]) == [1, 2, 3]


def test_arrow_c_stream_ffi():
    import pyarrow as pa

    df = pl.DataFrame({"a": [1, 2], "b": ["u", "v"]})
    t = pa.table(df)  # consumes __arrow_c_stream__
    assert t.column_names == ["a", "b"]
    assert t["b"].to_pylist() == ["u", "v"]
    back = pl.from_dataframe(t)
    assert back["a"].to_list() == [1, 2]


def test_register_expr_namespace():
    @pl.api.register_expr_namespace("phys")
    class Phys:
        def __init__(self, expr):
            self._expr = expr

        def fahrenheit(self):
            return self._expr * 1.8 + 32.0

    df = pl.DataFrame({"c": [0.0, 100.0]})
    out = df.lazy().select(pl.col("c").phys.fahrenheit().alias("f")).collect()
    assert out["f"].to_list() == [32.0, 212.0]


def test_register_dataframe_namespace_and_conflicts():
    @pl.api.register_dataframe_namespace("stats2")
    class Stats:
        def __init__(self, df):
            self._df = df

        def ncells(self):
            return self._df.height * self._df.width

    df = pl.DataFrame({"a": [1, 2], "b": [3, 4]})
    assert df.stats2.ncells() == 4
    with pytest.raises(pl.DuplicateError):
        @pl.api.register_expr_namespace("str")
        class Bad:
            def __init__(self, e): ...
