"""Conformance slice adapted from the reference behavioral suite
(py-polars/tests/unit/operations/test_cast.py + datatypes/) — casts across
the dtype lattice, strict vs non-strict overflow, null propagation, and
arithmetic type promotion."""

from datetime import date, datetime, time, timedelta

import pytest

import polars_tpu as pl
from polars_tpu import datatypes as dtt

INTS = [dtt.Int8(), dtt.Int16(), dtt.Int32(), dtt.Int64(),
        dtt.UInt8(), dtt.UInt16(), dtt.UInt32(), dtt.UInt64()]
FLOATS = [dtt.Float32(), dtt.Float64()]


@pytest.mark.parametrize("src", INTS)
@pytest.mark.parametrize("dst", INTS + FLOATS)
def test_int_cast_lattice(src, dst):
    s = pl.Series("a", [0, 1, 2, None], dtype=src)
    out = s.cast(dst)
    assert out.dtype == dst
    assert out.to_list() == [0, 1, 2, None]


@pytest.mark.parametrize("src", FLOATS)
@pytest.mark.parametrize("dst", INTS)
def test_float_to_int_truncates(src, dst):
    s = pl.Series("a", [1.7, -0.2 if dst.is_signed_integer() else 0.2, None], dtype=src)
    out = s.cast(dst)
    # float->int casts truncate toward zero
    assert out.to_list()[0] == 1
    assert out.to_list()[1] == 0
    assert out.to_list()[2] is None


@pytest.mark.parametrize("dst", INTS)
def test_bool_to_int(dst):
    s = pl.Series("a", [True, False, None])
    assert s.cast(dst).to_list() == [1, 0, None]


@pytest.mark.parametrize("src", INTS)
def test_int_to_bool(src):
    s = pl.Series("a", [0, 1, 2, None], dtype=src)
    assert s.cast(dtt.Boolean()).to_list() == [False, True, True, None]


def test_overflow_strict_raises():
    s = pl.Series("a", [300])
    with pytest.raises(Exception):
        s.cast(dtt.Int8())


def test_overflow_nonstrict_nulls():
    s = pl.Series("a", [300, 5])
    out = s.cast(dtt.Int8(), strict=False)
    assert out.to_list() == [None, 5]


@pytest.mark.parametrize("d", INTS + FLOATS)
def test_numeric_to_string(d):
    s = pl.Series("a", [1, 0, None], dtype=d)
    out = s.cast(dtt.String())
    assert out.dtype == dtt.String()
    assert out.to_list()[2] is None
    assert out.to_list()[0].startswith("1")


def test_string_to_numeric():
    s = pl.Series("a", ["1", "2", None])
    assert s.cast(dtt.Int64()).to_list() == [1, 2, None]
    s2 = pl.Series("a", ["1.5", "x"])
    with pytest.raises(Exception):
        s2.cast(dtt.Float64()).to_list()
    assert s2.cast(dtt.Float64(), strict=False).to_list() == [1.5, None]


def test_string_bool_cast():
    s = pl.Series("a", ["true", "false", None])
    assert s.cast(dtt.Boolean(), strict=False).to_list() == [True, False, None]


def test_date_datetime_casts():
    s = pl.Series("d", [date(2022, 1, 1), None])
    out = s.cast(dtt.Datetime("us"))
    assert out.to_list() == [datetime(2022, 1, 1), None]
    back = out.cast(dtt.Date())
    assert back.to_list() == [date(2022, 1, 1), None]


def test_date_to_int_is_days_since_epoch():
    s = pl.Series("d", [date(1970, 1, 2), date(1969, 12, 31)])
    assert s.cast(dtt.Int32()).to_list() == [1, -1]


def test_datetime_units_cast():
    s = pl.Series("t", [datetime(2022, 1, 1, 0, 0, 1)], dtype=dtt.Datetime("ms"))
    us = s.cast(dtt.Datetime("us"))
    assert us.to_list() == [datetime(2022, 1, 1, 0, 0, 1)]
    ns = s.cast(dtt.Datetime("ns"))
    assert ns.to_list() == [datetime(2022, 1, 1, 0, 0, 1)]


def test_duration_cast_units():
    s = pl.Series("d", [timedelta(seconds=1)], dtype=dtt.Duration("ms"))
    assert s.cast(dtt.Duration("us")).to_list() == [timedelta(seconds=1)]
    assert s.cast(dtt.Int64()).to_list() == [1000]


def test_cat_enum_casts():
    s = pl.Series("s", ["b", "a", "b", None])
    cat = s.cast(dtt.Categorical())
    assert cat.to_list() == ["b", "a", "b", None]
    assert cat.cast(dtt.String()).to_list() == ["b", "a", "b", None]
    en = s.cast(dtt.Enum(["a", "b"]))
    assert en.to_list() == ["b", "a", "b", None]
    with pytest.raises(Exception):
        pl.Series("s", ["z"]).cast(dtt.Enum(["a", "b"])).to_list()


def test_cast_null_column():
    s = pl.Series("n", [None, None])
    for d in (dtt.Int64(), dtt.Float64(), dtt.String(), dtt.Boolean()):
        out = s.cast(d)
        assert out.dtype == d
        assert out.to_list() == [None, None]


# -- arithmetic type promotion (reference: supertype.rs semantics) -----------


@pytest.mark.parametrize(
    ("a", "b", "expected"),
    [
        (dtt.Int8(), dtt.Int16(), dtt.Int16()),
        (dtt.Int32(), dtt.Int64(), dtt.Int64()),
        (dtt.UInt8(), dtt.UInt32(), dtt.UInt32()),
        (dtt.UInt8(), dtt.Int8(), dtt.Int16()),
        (dtt.UInt32(), dtt.Int32(), dtt.Int64()),
        (dtt.UInt64(), dtt.Int64(), dtt.Float64()),
        (dtt.Int32(), dtt.Float32(), dtt.Float64()),
        (dtt.Int8(), dtt.Float32(), dtt.Float32()),
        (dtt.Float32(), dtt.Float64(), dtt.Float64()),
        (dtt.Boolean(), dtt.Int8(), dtt.Int8()),
    ],
)
def test_arithmetic_promotion(a, b, expected):
    df = pl.DataFrame({
        "a": pl.Series([1, 2], dtype=a), "b": pl.Series([1, 2], dtype=b),
    })
    out = df.select((pl.col("a") + pl.col("b")).alias("c"))
    assert out.schema["c"] == expected


def test_int_division_semantics():
    df = pl.DataFrame({"a": [7, -7], "b": [2, 2]})
    # true division of ints gives Float64
    out = df.select((pl.col("a") / pl.col("b")).alias("d"))
    assert out.schema["d"] == dtt.Float64()
    assert out["d"].to_list() == [3.5, -3.5]
    # floor division keeps ints and floors toward -inf
    fd = df.select((pl.col("a") // pl.col("b")).alias("f"))
    assert fd.schema["f"] == dtt.Int64()
    assert fd["f"].to_list() == [3, -4]


def test_int_div_by_zero_nulls():
    df = pl.DataFrame({"a": [1, 2]})
    out = df.select((pl.col("a") // 0).alias("d"))
    assert out["d"].to_list() == [None, None]


def test_float_div_by_zero_inf():
    df = pl.DataFrame({"a": [1.0, -1.0, 0.0]})
    out = df.select((pl.col("a") / 0.0).alias("d"))["d"].to_list()
    assert out[0] == float("inf") and out[1] == float("-inf")
    assert out[2] != out[2]  # 0/0 = NaN


def test_mod_semantics():
    df = pl.DataFrame({"a": [7, -7], "b": [3, 3]})
    # polars % follows Python/floored semantics: sign of divisor
    out = df.select((pl.col("a") % pl.col("b")).alias("m"))
    assert out["m"].to_list() == [1, 2]


def test_null_propagation_arithmetic():
    df = pl.DataFrame({"a": [1, None, 3], "b": [None, 2, 4]})
    out = df.select((pl.col("a") + pl.col("b")).alias("s"))
    assert out["s"].to_list() == [None, None, 7]
    cmp = df.select((pl.col("a") > pl.col("b")).alias("c"))
    assert cmp["c"].to_list() == [None, None, False]


def test_eq_missing_semantics():
    df = pl.DataFrame({"a": [1, None, 3], "b": [1, None, 4]})
    out = df.select(pl.col("a").eq_missing(pl.col("b")).alias("e"))
    assert out["e"].to_list() == [True, True, False]
    out2 = df.select(pl.col("a").ne_missing(pl.col("b")).alias("e"))
    assert out2["e"].to_list() == [False, False, True]


def test_boolean_kleene_logic():
    df = pl.DataFrame({"a": [True, False, None], "b": [None, None, None]})
    assert df.select((pl.col("a") | pl.col("b")).alias("o"))["o"].to_list() == [
        True, None, None]
    assert df.select((pl.col("a") & pl.col("b")).alias("o"))["o"].to_list() == [
        None, False, None]


def test_unsigned_subtraction_wraps():
    # reference: a positive dynamic int literal materializes to the unsigned
    # operand's dtype (supertype.rs:522) and unsigned subtraction wraps
    # (tests/unit/operations/arithmetic/test_list.py: 2 - 3 == 255 on UInt8)
    s = pl.Series("a", [1], dtype=dtt.UInt8())
    df = pl.DataFrame({"a": s})
    out = df.select((pl.col("a") - 2).alias("d"))
    assert out.schema["d"] == dtt.UInt8()
    assert out["d"].to_list() == [255]
    # a NEGATIVE literal picks the signed ladder instead
    out2 = df.select((pl.col("a") + (-2)).alias("d"))
    assert out2.schema["d"] == dtt.Int16()
    assert out2["d"].to_list() == [-1]


def test_dynamic_literal_unification():
    df = pl.DataFrame({"i8": pl.Series("i8", [1, 2], dtype=dtt.Int8()),
                       "f32": pl.Series("f32", [1.5], dtype=dtt.Float32())})
    assert df.select((pl.col("i8") + 1).alias("r")).schema["r"] == dtt.Int8()
    assert df.select((pl.col("i8") + 300).alias("r")).schema["r"] == dtt.Int16()
    assert df.select(pl.col("i8").fill_null(0).alias("r")).schema["r"] == dtt.Int8()
    assert df.select((pl.col("f32") + 0.5).alias("r")).schema["r"] == dtt.Float32()
    assert df.select(pl.col("i8").clip(0, 1).alias("r")).schema["r"] == dtt.Int8()


def test_diff_dtype_and_negate():
    u = pl.DataFrame({"u8": pl.Series("u8", [5, 3, 10], dtype=dtt.UInt8())})
    out = u.select(pl.col("u8").diff().alias("r"))
    assert out.schema["r"] == dtt.Int16()
    assert out.to_series().to_list() == [None, -2, 7]
    from datetime import date, timedelta
    dd = pl.DataFrame({"d": pl.Series("d", [date(2021, 1, 1), date(2021, 1, 3)], dtype=dtt.Date())})
    o2 = dd.select(pl.col("d").diff().alias("r"))
    assert o2.schema["r"] == dtt.Duration("us")
    assert o2.to_series().to_list() == [None, timedelta(days=2)]
    # negate keeps dtype; unsigned unsupported (negate.rs)
    with pytest.raises(pl.exceptions.InvalidOperationError):
        u.select(-pl.col("u8"))
    i = pl.DataFrame({"i8": pl.Series("i8", [5], dtype=dtt.Int8())})
    out3 = i.select((-pl.col("i8")).alias("r"))
    assert out3.schema["r"] == dtt.Int8()
    assert out3.to_series().to_list() == [-5]


def test_pow_dtype():
    df = pl.DataFrame({"a": [2, 3]})
    out = df.select((pl.col("a") ** 2).alias("p"))
    assert out["p"].to_list() == [4, 9]
    out2 = df.select((pl.col("a") ** 0.5).alias("p"))
    assert out2.schema["p"] == dtt.Float64()


def test_time_dtype_roundtrip():
    s = pl.Series("t", [time(1, 2, 3), None])
    assert s.dtype == dtt.Time()
    assert s.to_list() == [time(1, 2, 3), None]


def test_decimal_basics():
    from decimal import Decimal as D

    s = pl.Series("d", [D("1.25"), D("-0.75"), None], dtype=dtt.Decimal(10, 2))
    assert s.dtype == dtt.Decimal(10, 2)
    assert s.to_list() == [D("1.25"), D("-0.75"), None]


def test_schema_dtype_inference_python_values():
    df = pl.DataFrame({
        "i": [1, 2], "f": [1.0, 2.0], "s": ["a", "b"], "b": [True, False],
        "d": [date(2020, 1, 1), date(2020, 1, 2)],
        "t": [datetime(2020, 1, 1), datetime(2020, 1, 2)],
    })
    assert df.schema["i"] == dtt.Int64()
    assert df.schema["f"] == dtt.Float64()
    assert df.schema["s"] == dtt.String()
    assert df.schema["b"] == dtt.Boolean()
    assert df.schema["d"] == dtt.Date()
    assert isinstance(df.schema["t"], dtt.Datetime)


def test_cast_list_inner():
    df = pl.DataFrame({"l": [[1, 2], [3]]})
    out = df.select(pl.col("l").cast(dtt.List(dtt.Float64())))
    assert out.schema["l"] == dtt.List(dtt.Float64())
    assert out["l"].to_list() == [[1.0, 2.0], [3.0]]


def test_lit_dtype_override():
    df = pl.DataFrame({"a": [1]})
    out = df.select(pl.lit(5, dtype=dtt.Int8()).alias("x"))
    assert out.schema["x"] == dtt.Int8()
    out2 = df.select(pl.lit("2020-01-01", dtype=dtt.Date()).alias("d"))
    assert out2["d"].to_list() == [date(2020, 1, 1)]


def test_when_then_dynamic_literal():
    df = pl.DataFrame({"i8": pl.Series("i8", [1, 2], dtype=dtt.Int8())})
    out = df.select(pl.when(pl.col("i8") > 1).then(pl.col("i8")).otherwise(0).alias("r"))
    assert out.schema["r"] == dtt.Int8()
    out2 = df.select(pl.when(pl.col("i8") > 1).then(0).otherwise(pl.col("i8")).alias("r"))
    assert out2.schema["r"] == dtt.Int8()
