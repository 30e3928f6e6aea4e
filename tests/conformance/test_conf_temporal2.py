"""Conformance slice: temporal edge cases (leap years, month arithmetic,
truncate/round grids, durations) and asof-join tolerance — behaviors from
the reference's operations/test_join_asof.py and namespaces/temporal/ suites
(own frames, same semantics)."""

import datetime as dtm

import pytest

import polars_tpu as pl


# ----------------------------------------------------------- asof tolerance


def test_asof_tolerance_numeric():
    a = pl.DataFrame({"t": [1, 5, 10], "x": ["a", "b", "c"]})
    b = pl.DataFrame({"t": [0, 4, 11], "y": [10, 20, 30]})
    out = a.join_asof(b, on="t", tolerance=2)
    assert out["y"].to_list() == [10, 20, None]


def test_asof_tolerance_duration_string():
    a = pl.DataFrame({"t": [dtm.datetime(2020, 1, 1, 0, 0, 10)], "x": [1]})
    b = pl.DataFrame({"t": [dtm.datetime(2020, 1, 1, 0, 0, 0)], "y": [2]})
    assert a.join_asof(b, on="t", tolerance="5s")["y"].to_list() == [None]
    assert a.join_asof(b, on="t", tolerance="15s")["y"].to_list() == [2]
    assert a.join_asof(b, on="t", tolerance="1m")["y"].to_list() == [2]


def test_asof_tolerance_timedelta():
    a = pl.DataFrame({"t": [dtm.datetime(2020, 1, 1, 1)], "x": [1]})
    b = pl.DataFrame({"t": [dtm.datetime(2020, 1, 1, 0)], "y": [2]})
    assert a.join_asof(b, on="t", tolerance=dtm.timedelta(hours=2))["y"].to_list() == [2]
    assert a.join_asof(b, on="t", tolerance=dtm.timedelta(minutes=30))["y"].to_list() == [None]


def test_asof_tolerance_date_keys():
    a = pl.DataFrame({"d": [dtm.date(2020, 1, 10)], "x": [1]})
    b = pl.DataFrame({"d": [dtm.date(2020, 1, 1)], "y": [2]})
    assert a.join_asof(b, on="d", tolerance="5d")["y"].to_list() == [None]
    assert a.join_asof(b, on="d", tolerance="2w")["y"].to_list() == [2]


def test_asof_tolerance_calendar_unit_rejected():
    a = pl.DataFrame({"d": [dtm.date(2020, 1, 10)], "x": [1]})
    b = pl.DataFrame({"d": [dtm.date(2020, 1, 1)], "y": [2]})
    with pytest.raises(Exception):
        a.join_asof(b, on="d", tolerance="1mo")


def test_asof_forward_with_tolerance():
    a = pl.DataFrame({"t": [1, 5], "x": ["a", "b"]})
    b = pl.DataFrame({"t": [3, 20], "y": [10, 20]})
    out = a.join_asof(b, on="t", strategy="forward", tolerance=4)
    assert out["y"].to_list() == [10, None]


def test_asof_by_with_tolerance():
    a = pl.DataFrame({"g": ["x", "y"], "t": [10, 10], "v": [1, 2]})
    b = pl.DataFrame({"g": ["x", "y"], "t": [8, 1], "w": [100, 200]})
    out = a.join_asof(b, on="t", by="g", tolerance=5)
    assert out["w"].to_list() == [100, None]


# ----------------------------------------------------------- calendar math


def test_leap_year_handling():
    s = pl.Series([dtm.date(2024, 2, 29)])
    assert s.dt.is_leap_year().to_list() == [True]
    assert s.dt.offset_by("1y").to_list() == [dtm.date(2025, 2, 28)]
    assert pl.Series([dtm.date(2023, 3, 1)]).dt.is_leap_year().to_list() == [False]


def test_month_end_start_clamping():
    s = pl.Series([dtm.date(2024, 1, 31)])
    assert s.dt.offset_by("1mo").to_list() == [dtm.date(2024, 2, 29)]
    assert s.dt.month_end().to_list() == [dtm.date(2024, 1, 31)]
    assert pl.Series([dtm.date(2024, 2, 15)]).dt.month_end().to_list() == [dtm.date(2024, 2, 29)]
    assert pl.Series([dtm.date(2024, 2, 15)]).dt.month_start().to_list() == [dtm.date(2024, 2, 1)]


def test_days_in_month():
    s = pl.Series([dtm.date(2024, 2, 1), dtm.date(2023, 2, 1), dtm.date(2024, 4, 1)])
    assert s.dt.days_in_month().to_list() == [29, 28, 30]


def test_truncate_grids():
    t = pl.Series([dtm.datetime(2024, 5, 17, 13, 7, 44)])
    assert t.dt.truncate("1h").to_list() == [dtm.datetime(2024, 5, 17, 13)]
    assert t.dt.truncate("30m").to_list() == [dtm.datetime(2024, 5, 17, 13, 0)]
    assert t.dt.truncate("1d").to_list() == [dtm.datetime(2024, 5, 17)]
    assert t.dt.truncate("1q").to_list() == [dtm.datetime(2024, 4, 1)]
    assert t.dt.truncate("1w").to_list() == [dtm.datetime(2024, 5, 13)]  # Monday


def test_round_half_up():
    t = pl.Series([dtm.datetime(2024, 1, 1, 0, 30)])
    assert t.dt.round("1h").to_list() == [dtm.datetime(2024, 1, 1, 1)]
    t2 = pl.Series([dtm.datetime(2024, 1, 1, 0, 29, 59)])
    assert t2.dt.round("1h").to_list() == [dtm.datetime(2024, 1, 1, 0)]


def test_weekday_iso():
    # 2024-01-01 is a Monday -> ISO weekday 1
    s = pl.Series([dtm.date(2024, 1, 1), dtm.date(2024, 1, 7)])
    assert s.dt.weekday().to_list() == [1, 7]


def test_iso_year_week():
    # 2021-01-01 is ISO week 53 of ISO year 2020
    s = pl.Series([dtm.date(2021, 1, 1)])
    assert s.dt.iso_year().to_list() == [2020]
    assert s.dt.week().to_list() == [53]


def test_ordinal_day():
    assert pl.Series([dtm.date(2024, 3, 1)]).dt.ordinal_day().to_list() == [61]
    assert pl.Series([dtm.date(2023, 3, 1)]).dt.ordinal_day().to_list() == [60]


# ----------------------------------------------------------- durations


def test_duration_components():
    d = pl.Series([dtm.timedelta(days=1, hours=2, minutes=3)])
    assert d.dt.total_hours().to_list() == [26]
    assert d.dt.total_minutes().to_list() == [26 * 60 + 3]
    assert d.dt.total_days().to_list() == [1]


def test_datetime_minus_datetime_is_duration():
    df = pl.DataFrame({
        "a": [dtm.datetime(2024, 1, 2)],
        "b": [dtm.datetime(2024, 1, 1)],
    })
    out = df.select((pl.col("a") - pl.col("b")).alias("d"))
    assert out.schema["d"].base_type() == pl.Duration
    assert out.to_series().to_list() == [dtm.timedelta(days=1)]


def test_date_plus_duration():
    # supertype (Date, Duration) -> Date
    # (reference crates/polars-core/src/utils/supertype.rs:400)
    df = pl.DataFrame({"d": [dtm.date(2024, 1, 1)]})
    out = df.select(pl.col("d") + pl.duration(days=5))
    assert out.schema["d"] == pl.Date
    assert out.to_series().to_list()[0] == dtm.date(2024, 1, 6)


def test_duration_arithmetic_scaling():
    d = pl.Series([dtm.timedelta(hours=1)])
    out = (d * 2).to_list()
    assert out == [dtm.timedelta(hours=2)]


# ----------------------------------------------------------- strftime/strptime


def test_strftime_roundtrip():
    t = pl.Series([dtm.datetime(2024, 5, 17, 13, 7)])
    s = t.dt.strftime("%Y-%m-%d %H:%M")
    assert s.to_list() == ["2024-05-17 13:07"]
    back = s.str.strptime(pl.Datetime, "%Y-%m-%d %H:%M")
    assert back.to_list() == [dtm.datetime(2024, 5, 17, 13, 7)]


def test_strptime_date_infer():
    s = pl.Series(["2024-01-15"])
    assert s.str.to_date().to_list() == [dtm.date(2024, 1, 15)]


def test_epoch_units():
    t = pl.Series([dtm.datetime(1970, 1, 1, 0, 0, 1)])
    assert t.dt.epoch("s").to_list() == [1]
    assert t.dt.epoch("ms").to_list() == [1000]


def test_time_extraction():
    t = pl.Series([dtm.datetime(2024, 1, 1, 13, 30, 59)])
    assert t.dt.time().to_list() == [dtm.time(13, 30, 59)]
    assert t.dt.date().to_list() == [dtm.date(2024, 1, 1)]
