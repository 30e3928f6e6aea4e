"""Conformance slice: cast semantics across the dtype lattice (strict vs
non-strict overflow, float->int truncation, string parsing, temporal casts,
boolean stringification) — behaviors from the reference's
py-polars/tests/unit/operations/test_cast.py and datatypes/ suites."""

import datetime as dtm

import pytest

import polars_tpu as pl


def test_strict_overflow_raises():
    with pytest.raises(Exception):
        pl.Series([300]).cast(pl.Int8)


def test_non_strict_overflow_nulls():
    assert pl.Series([300, 5]).cast(pl.Int8, strict=False).to_list() == [None, 5]
    assert pl.Series([-1]).cast(pl.UInt8, strict=False).to_list() == [None]


def test_float_to_int_truncates_toward_zero():
    assert pl.Series([1.9, -1.9, 0.5]).cast(pl.Int32).to_list() == [1, -1, 0]


def test_nan_to_int():
    with pytest.raises(Exception):
        pl.Series([float("nan")]).cast(pl.Int32)
    assert pl.Series([float("nan")]).cast(pl.Int32, strict=False).to_list() == [None]


def test_string_to_int_parsing():
    assert pl.Series(["12", "x"]).cast(pl.Int64, strict=False).to_list() == [12, None]
    with pytest.raises(Exception):
        pl.Series(["12", "x"]).cast(pl.Int64)


def test_string_to_float_parsing():
    out = pl.Series(["1.5", "inf", "bad"]).cast(pl.Float64, strict=False).to_list()
    assert out[0] == 1.5 and out[1] == float("inf") and out[2] is None


def test_bool_stringifies_lowercase():
    assert pl.Series([True, False, None]).cast(pl.String).to_list() == ["true", "false", None]


def test_string_to_bool():
    assert pl.Series(["true", "false"]).cast(pl.Boolean).to_list() == [True, False]


def test_int_to_bool_nonzero():
    assert pl.Series([0, 2, -1]).cast(pl.Boolean).to_list() == [False, True, True]


def test_datetime_date_roundtrip():
    t = dtm.datetime(2024, 1, 2, 3, 4)
    s = pl.Series([t])
    assert s.cast(pl.Date).to_list() == [dtm.date(2024, 1, 2)]
    assert pl.Series([dtm.date(2024, 1, 2)]).cast(pl.Datetime).to_list() == [
        dtm.datetime(2024, 1, 2)
    ]


def test_datetime_unit_conversion():
    s = pl.Series([dtm.datetime(2024, 1, 1, 0, 0, 0, 123456)])
    ms = s.cast(pl.Datetime("ms"))
    assert ms.dtype == pl.Datetime("ms")
    assert ms.to_list() == [dtm.datetime(2024, 1, 1, 0, 0, 0, 123000)]


def test_date_to_int_is_days():
    assert pl.Series([dtm.date(1970, 1, 2)]).cast(pl.Int32).to_list() == [1]


def test_int_to_date_from_days():
    assert pl.Series([1]).cast(pl.Date).to_list() == [dtm.date(1970, 1, 2)]


def test_float_to_string_trims():
    assert pl.Series([1.5, 0.25]).cast(pl.String).to_list() == ["1.5", "0.25"]


def test_categorical_to_string_and_back():
    s = pl.Series(["b", "a", "b"], dtype=pl.Categorical)
    assert s.cast(pl.String).to_list() == ["b", "a", "b"]
    assert pl.Series(["b", "a"]).cast(pl.Categorical).dtype == pl.Categorical


def test_cat_to_physical_codes():
    s = pl.Series(["b", "a"], dtype=pl.Categorical)
    phys = s.to_physical()
    assert phys.dtype == pl.UInt32
    assert len(set(phys.to_list())) == 2


def test_enum_cast_unknown_value():
    e = pl.Enum(["a", "b"])
    with pytest.raises(Exception):
        pl.Series(["c"]).cast(e)
    assert pl.Series(["a", "c"]).cast(e, strict=False).to_list() == ["a", None]


def test_int_widening_preserves():
    s = pl.Series([127], dtype=pl.Int8).cast(pl.Int64)
    assert s.dtype == pl.Int64 and s.to_list() == [127]


def test_signed_unsigned_boundary():
    assert pl.Series([255]).cast(pl.UInt8).to_list() == [255]
    with pytest.raises(Exception):
        pl.Series([256]).cast(pl.UInt8)


def test_duration_unit_cast():
    d = pl.Series([dtm.timedelta(seconds=1)])
    ms = d.cast(pl.Duration("ms"))
    assert ms.dtype == pl.Duration("ms")
    assert ms.to_list() == [dtm.timedelta(seconds=1)]


def test_null_series_casts_anywhere():
    s = pl.Series([None, None])
    assert s.cast(pl.Int32).to_list() == [None, None]
    assert s.cast(pl.String).to_list() == [None, None]


def test_list_inner_cast():
    s = pl.Series([[1, 2], [3]])
    out = s.cast(pl.List(pl.Float64))
    assert out.dtype == pl.List(pl.Float64)
    assert out.to_list() == [[1.0, 2.0], [3.0]]


def test_cast_in_lazy_schema():
    lf = pl.LazyFrame({"a": [1]}).select(pl.col("a").cast(pl.Float32))
    assert lf.collect_schema()["a"] == pl.Float32
    assert lf.collect().schema["a"] == pl.Float32


def test_to_physical_temporal():
    s = pl.Series([dtm.date(1970, 1, 3)])
    assert s.to_physical().to_list() == [2]
