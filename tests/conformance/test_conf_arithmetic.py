"""Arithmetic dtype promotion + null/NaN propagation (reference:
crates/polars-core/src/utils/supertype.rs; py-polars
tests/unit/operations/arithmetic/)."""

import math

import pytest

import polars_tpu as pl


def _out_dtype(a_dt, b_dt, op):
    df = pl.DataFrame(
        {"a": pl.Series("a", [1], dtype=a_dt), "b": pl.Series("b", [1], dtype=b_dt)}
    )
    e = {
        "+": pl.col("a") + pl.col("b"),
        "/": pl.col("a") / pl.col("b"),
        "//": pl.col("a") // pl.col("b"),
    }[op]
    return df.select(e.alias("x")).schema["x"]


@pytest.mark.parametrize(
    ("a", "b", "op", "expected"),
    [
        (pl.Int8(), pl.Int16(), "+", pl.Int16()),
        (pl.Int8(), pl.UInt8(), "+", pl.Int16()),
        (pl.UInt32(), pl.Int32(), "+", pl.Int64()),
        (pl.UInt8(), pl.UInt64(), "+", pl.UInt64()),
        # "follow numpy": signed vs UInt64 promotes to Float64
        # (supertype.rs:175,241)
        (pl.Int8(), pl.UInt64(), "+", pl.Float64()),
        (pl.Int64(), pl.UInt64(), "+", pl.Float64()),
        (pl.Float32(), pl.Float64(), "+", pl.Float64()),
        (pl.Float32(), pl.Int64(), "+", pl.Float64()),
        (pl.Int64(), pl.Int64(), "/", pl.Float64()),
        (pl.Int32(), pl.Int64(), "//", pl.Int64()),
    ],
)
def test_promotion(a, b, op, expected):
    assert _out_dtype(a, b, op) == expected


def test_null_propagation_arithmetic():
    a = pl.Series("a", [1, None, 3])
    b = pl.Series("b", [None, 2, 3])
    assert (a + b).to_list() == [None, None, 6]
    assert (a * b).to_list() == [None, None, 9]
    assert (a - b).to_list() == [None, None, 0]


def test_division_semantics():
    # int / int -> float; division by zero -> inf/nan like reference
    a = pl.Series("a", [1, 0, -1])
    z = pl.Series("b", [0, 0, 0])
    out = (a / z).to_list()
    assert out[0] == math.inf and out[2] == -math.inf
    assert math.isnan(out[1])
    # int // 0 -> null (reference: integer floordiv by zero gives null)
    fd = (a // z).to_list()
    assert fd == [None, None, None]
    # float mod follows Python sign convention (reference uses rem_euclid-like
    # "sign of rhs" — python %)
    assert pl.Series("a", [7]).__mod__(pl.Series("b", [3])).to_list() == [1]


def test_integer_overflow_wraps():
    # reference wraps on overflow in release builds (two's complement)
    s = pl.Series("a", [2**62]) * 4
    assert s.to_list() == [0]
    m = pl.Series("a", [127], dtype=pl.Int8()) + pl.Series("b", [1], dtype=pl.Int8())
    assert m.to_list() == [-128]


def test_nan_is_value_not_null():
    s = pl.Series("a", [float("nan"), 1.0, None])
    assert s.null_count() == 1
    assert s.is_nan().to_list() == [True, False, None]
    assert s.is_null().to_list() == [False, False, True]
    # NaN sorts greatest (total order)
    srt = pl.Series("a", [float("nan"), 1.0, 2.0]).sort().to_list()
    assert srt[0] == 1.0 and srt[1] == 2.0 and math.isnan(srt[2])


def test_string_numeric_comparison_errors():
    df = pl.DataFrame({"s": ["a"], "n": [1]})
    with pytest.raises(Exception):
        df.select(pl.col("s") > pl.col("n")).to_dicts()


def test_bool_arithmetic():
    # bool + bool stays Boolean in this engine? reference: numeric supertype.
    # sum of bools is the countable path
    assert pl.Series("a", [True, True, False]).sum() == 2


def test_scalar_broadcast_promotion():
    s = pl.Series("a", [1, 2], dtype=pl.Int8())
    out = s + 300  # literal exceeding Int8 promotes
    assert out.to_list() == [301, 302]
