"""Conformance slice: string + temporal edge behavior adapted from the
reference suite (py-polars/tests/unit/operations/namespaces/string/,
temporal/) — null propagation, empty frames, boundary values."""

from datetime import date, datetime, time, timedelta

import pytest

import polars_tpu as pl


# -- strings: null propagation -------------------------------------------------


def test_string_ops_propagate_nulls():
    s = pl.Series("s", ["Abc", None, ""])
    assert s.str.to_uppercase().to_list() == ["ABC", None, ""]
    assert s.str.to_lowercase().to_list() == ["abc", None, ""]
    assert s.str.len_chars().to_list() == [3, None, 0]
    assert s.str.starts_with("A").to_list() == [True, None, False]
    assert s.str.ends_with("c").to_list() == [True, None, False]
    assert s.str.contains("b").to_list() == [True, None, False]


def test_string_slice_negative_and_oob():
    s = pl.Series("s", ["hello", "ab", ""])
    assert s.str.slice(1, 2).to_list() == ["el", "b", ""]
    assert s.str.slice(-2).to_list() == ["lo", "ab", ""]
    assert s.str.slice(10).to_list() == ["", "", ""]
    assert s.str.head(2).to_list() == ["he", "ab", ""]
    assert s.str.tail(2).to_list() == ["lo", "ab", ""]


def test_string_strip_variants():
    s = pl.Series("s", ["  x  ", "xx", " "])
    assert s.str.strip_chars().to_list() == ["x", "xx", ""]
    assert s.str.strip_chars_start().to_list() == ["x  ", "xx", ""]
    assert s.str.strip_chars_end().to_list() == ["  x", "xx", ""]
    s2 = pl.Series("s", ["xyxAx", "yy"])
    assert s2.str.strip_chars("xy").to_list() == ["A", ""]


def test_string_pad_and_zfill():
    s = pl.Series("s", ["7", "1234"])
    assert s.str.pad_start(3, "0").to_list() == ["007", "1234"]
    assert s.str.pad_end(3, "!").to_list() == ["7!!", "1234"]
    assert s.str.zfill(3).to_list() == ["007", "1234"]


def test_string_replace_first_vs_all():
    s = pl.Series("s", ["aaa", "bab"])
    assert s.str.replace("a", "X", literal=True).to_list() == ["Xaa", "bXb"]
    assert s.str.replace_all("a", "X", literal=True).to_list() == ["XXX", "bXb"]


def test_string_split_variants():
    s = pl.Series("s", ["a,b,c", "x", ""])
    assert s.str.split(",").to_list() == [["a", "b", "c"], ["x"], [""]]
    assert s.str.split_exact(",", 1).struct.field("field_0").to_list() == ["a", "x", ""]


def test_string_extract_groups():
    s = pl.Series("s", ["a-1", "b-22", "nope"])
    assert s.str.extract(r"(\w)-(\d+)", 2).to_list() == ["1", "22", None]
    assert s.str.extract_all(r"\d").to_list() == [["1"], ["2", "2"], []]
    assert s.str.count_matches(r"\d").to_list() == [1, 2, 0]


def test_string_json_and_casts():
    s = pl.Series("s", ["123", "-5", "x"])
    out = s.str.to_integer(strict=False)
    assert out.to_list() == [123, -5, None]
    with pytest.raises(Exception):
        s.str.to_integer(strict=True).to_list()


def test_empty_frame_string_ops():
    df = pl.DataFrame({"s": pl.Series("s", [], dtype=pl.String())})
    out = df.select(pl.col("s").str.to_uppercase())
    assert out.height == 0
    assert out.schema["s"] == pl.String()


# -- temporal ------------------------------------------------------------------


def test_date_components():
    s = pl.Series("d", [date(2021, 3, 14), date(1999, 12, 31), None])
    assert s.dt.year().to_list() == [2021, 1999, None]
    assert s.dt.month().to_list() == [3, 12, None]
    assert s.dt.day().to_list() == [14, 31, None]
    assert s.dt.ordinal_day().to_list() == [73, 365, None]
    assert s.dt.weekday().to_list() == [7, 5, None]  # Sunday=7, Friday=5
    assert s.dt.quarter().to_list() == [1, 4, None]


def test_datetime_components_and_truncate():
    s = pl.Series("t", [datetime(2021, 3, 14, 15, 9, 26, 535898)])
    assert s.dt.hour().to_list() == [15]
    assert s.dt.minute().to_list() == [9]
    assert s.dt.second().to_list() == [26]
    assert s.dt.millisecond().to_list() == [535]
    assert s.dt.microsecond().to_list() == [535898]
    assert s.dt.truncate("1h").to_list() == [datetime(2021, 3, 14, 15)]
    assert s.dt.truncate("1d").to_list() == [datetime(2021, 3, 14)]
    assert s.dt.date().to_list() == [date(2021, 3, 14)]


def test_duration_totals():
    s = pl.Series("d", [timedelta(days=1, hours=2, minutes=3, seconds=4)])
    assert s.dt.total_seconds().to_list() == [93784]
    assert s.dt.total_minutes().to_list() == [1563]
    assert s.dt.total_hours().to_list() == [26]
    assert s.dt.total_days().to_list() == [1]


def test_date_arithmetic():
    df = pl.DataFrame({"d": [date(2021, 1, 1)]})
    out = df.select((pl.col("d") + pl.duration(days=31)).alias("x"))
    assert out["x"].to_list() == [date(2021, 2, 1)]
    out2 = df.select((pl.col("d") - date(2020, 12, 31)).alias("x"))
    assert out2["x"].to_list() == [timedelta(days=1)]


def test_datetime_range_and_offset_by():
    out = pl.datetime_range(
        datetime(2021, 1, 1), datetime(2021, 1, 2), interval="12h", eager=True
    )
    assert out.to_list() == [
        datetime(2021, 1, 1), datetime(2021, 1, 1, 12), datetime(2021, 1, 2)]
    s = pl.Series("d", [date(2021, 1, 31)])
    assert s.dt.offset_by("1mo").to_list() == [date(2021, 2, 28)]


def test_time_dtype_roundtrip():
    s = pl.Series("t", [time(1, 2, 3), None])
    assert s.to_list() == [time(1, 2, 3), None]
    assert s.dtype == pl.Time()


def test_strptime_and_to_string():
    s = pl.Series("s", ["2021-01-02", "bad", None])
    out = s.str.to_date("%Y-%m-%d", strict=False)
    assert out.to_list() == [date(2021, 1, 2), None, None]
    d = pl.Series("d", [date(2021, 1, 2)])
    assert d.dt.to_string("%Y/%m/%d").to_list() == ["2021/01/02"]


def test_month_start_end_leap():
    s = pl.Series("d", [date(2020, 2, 15)])
    assert s.dt.month_start().to_list() == [date(2020, 2, 1)]
    assert s.dt.month_end().to_list() == [date(2020, 2, 29)]
    assert s.dt.is_leap_year().to_list() == [True]


def test_temporal_group_by_key():
    df = pl.DataFrame(
        {
            "d": [date(2021, 1, 1), date(2021, 1, 1), date(2021, 2, 1)],
            "v": [1, 2, 3],
        }
    )
    out = df.group_by("d").agg(pl.col("v").sum()).sort("d")
    assert out.rows() == [(date(2021, 1, 1), 3), (date(2021, 2, 1), 3)]


def test_temporal_min_max_filter():
    df = pl.DataFrame({"t": [datetime(2021, 1, 1), datetime(2022, 6, 1), None]})
    assert df.select(pl.col("t").min())["t"].to_list() == [datetime(2021, 1, 1)]
    assert df.select(pl.col("t").max())["t"].to_list() == [datetime(2022, 6, 1)]
    out = df.filter(pl.col("t") > datetime(2021, 6, 1))
    assert out["t"].to_list() == [datetime(2022, 6, 1)]


def test_string_add_concatenates():
    # reference: Add on String/Binary chunked arrays concatenates
    df = pl.DataFrame({"s": ["a", None, "c"], "t": ["x", "y", "z"]})
    assert df.select((pl.col("s") + pl.col("t")).alias("r")).to_series().to_list() == [
        "ax", None, "cz"]
    assert df.select((pl.col("s") + "_suf").alias("r")).to_series().to_list() == [
        "a_suf", None, "c_suf"]
    assert df.select(("pre_" + pl.col("t")).alias("r")).to_series().to_list() == [
        "pre_x", "pre_y", "pre_z"]
    b = pl.DataFrame({"b": pl.Series("b", [b"ab", b"cd"], dtype=pl.Binary)})
    assert b.select((pl.col("b") + pl.col("b")).alias("r")).to_series().to_list() == [
        b"abab", b"cdcd"]
    df2 = pl.DataFrame({"g": [1, 1], "s": ["a", "b"]})
    assert df2.group_by("g").agg((pl.col("s") + "!").alias("r")).rows() == [
        (1, ["a!", "b!"])]


def test_timedelta_literal_arithmetic():
    # timedelta literals store microseconds in Duration("us")
    from datetime import datetime, timedelta

    df = pl.DataFrame(
        {"d": pl.Series("d", [datetime(2021, 1, 1, 10, 0, 0)], dtype=pl.Datetime("us"))}
    )
    out = df.select((pl.col("d") + timedelta(days=1, hours=2)).alias("r"))
    assert out.to_series().to_list() == [datetime(2021, 1, 2, 12, 0, 0)]
    out2 = df.select((pl.col("d") - timedelta(minutes=30)).alias("r"))
    assert out2.to_series().to_list() == [datetime(2021, 1, 1, 9, 30, 0)]
    # filter comparison against datetime +- timedelta
    assert df.filter(pl.col("d") > datetime(2021, 1, 1) + timedelta(hours=9)).height == 1
