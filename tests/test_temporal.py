"""Temporal ops (mirrors py-polars tests/unit/operations/namespaces/temporal)."""

import datetime as dtm

import numpy as np
import pytest

import polars_tpu as pl


@pytest.fixture
def dates() -> pl.DataFrame:
    return pl.DataFrame(
        {
            "d": [dtm.date(2024, 2, 29), dtm.date(1999, 12, 31), dtm.date(1970, 1, 1)],
            "ts": [
                dtm.datetime(2024, 2, 29, 13, 45, 30, 123456),
                dtm.datetime(1999, 12, 31, 23, 59, 59),
                dtm.datetime(1970, 1, 1, 0, 0, 0),
            ],
        }
    )


def test_date_parts(dates):
    out = dates.select(
        y=pl.col("d").dt.year(),
        m=pl.col("d").dt.month(),
        day=pl.col("d").dt.day(),
        q=pl.col("d").dt.quarter(),
        wd=pl.col("d").dt.weekday(),
        od=pl.col("d").dt.ordinal_day(),
        ly=pl.col("d").dt.is_leap_year(),
    )
    assert out.get_column("y").to_list() == [2024, 1999, 1970]
    assert out.get_column("m").to_list() == [2, 12, 1]
    assert out.get_column("day").to_list() == [29, 31, 1]
    assert out.get_column("q").to_list() == [1, 4, 1]
    # 2024-02-29 was a Thursday(4), 1999-12-31 Friday(5), 1970-01-01 Thursday(4)
    assert out.get_column("wd").to_list() == [4, 5, 4]
    assert out.get_column("od").to_list() == [60, 365, 1]
    assert out.get_column("ly").to_list() == [True, False, False]


def test_time_parts(dates):
    out = dates.select(
        h=pl.col("ts").dt.hour(),
        mi=pl.col("ts").dt.minute(),
        s=pl.col("ts").dt.second(),
        us=pl.col("ts").dt.microsecond(),
    )
    assert out.get_column("h").to_list() == [13, 23, 0]
    assert out.get_column("mi").to_list() == [45, 59, 0]
    assert out.get_column("s").to_list() == [30, 59, 0]
    assert out.get_column("us").to_list() == [123456, 0, 0]


def test_iso_week():
    df = pl.DataFrame({"d": [dtm.date(2024, 1, 1), dtm.date(2023, 1, 1), dtm.date(2020, 12, 31)]})
    out = df.select(w=pl.col("d").dt.week(), iy=pl.col("d").dt.iso_year())
    assert out.get_column("w").to_list() == [1, 52, 53]
    assert out.get_column("iy").to_list() == [2024, 2022, 2020]


def test_date_arith():
    df = pl.DataFrame({"a": [dtm.date(2024, 1, 10)], "b": [dtm.date(2024, 1, 1)]})
    out = df.select(
        diff=pl.col("a") - pl.col("b"),
        days=(pl.col("a") - pl.col("b")).dt.total_days(),
    )
    assert out.get_column("days").to_list() == [9]
    assert out.schema["diff"] == pl.Duration


def test_datetime_compare_literal():
    df = pl.DataFrame({"d": [dtm.date(2024, 1, 1), dtm.date(2025, 1, 1)]})
    out = df.filter(pl.col("d") > dtm.date(2024, 6, 1))
    assert out.height == 1


def test_truncate():
    df = pl.DataFrame({"d": [dtm.date(2024, 2, 29)], "ts": [dtm.datetime(2024, 2, 29, 13, 47)]})
    out = df.select(
        mo=pl.col("d").dt.truncate("1mo"),
        y=pl.col("d").dt.truncate("1y"),
        h=pl.col("ts").dt.truncate("1h"),
    )
    assert out.get_column("mo").to_list() == [dtm.date(2024, 2, 1)]
    assert out.get_column("y").to_list() == [dtm.date(2024, 1, 1)]
    assert out.get_column("h").to_list() == [dtm.datetime(2024, 2, 29, 13, 0)]


def test_offset_by_month_end():
    df = pl.DataFrame({"d": [dtm.date(2024, 1, 31)]})
    out = df.select(
        p1=pl.col("d").dt.offset_by("1mo"),
        me=pl.col("d").dt.month_end(),
        ms=pl.col("d").dt.month_start(),
        dim=pl.col("d").dt.days_in_month(),
    )
    assert out.get_column("p1").to_list() == [dtm.date(2024, 2, 29)]
    assert out.get_column("me").to_list() == [dtm.date(2024, 1, 31)]
    assert out.get_column("ms").to_list() == [dtm.date(2024, 1, 1)]
    assert out.get_column("dim").to_list() == [31]


def test_make_date_fn():
    out = pl.select(d=pl.date(2024, 2, 29))
    assert out.item() == dtm.date(2024, 2, 29)


def test_date_range():
    s = pl.date_range(dtm.date(2024, 1, 1), dtm.date(2024, 1, 5), "1d", eager=True)
    assert len(s) == 5
    assert s.to_list()[0] == dtm.date(2024, 1, 1)
    assert s.to_list()[-1] == dtm.date(2024, 1, 5)


def test_duration_fn():
    df = pl.DataFrame({"d": [dtm.date(2024, 1, 1)]})
    out = df.select(x=pl.col("d") + pl.duration(days=10))
    assert out.item() == dtm.date(2024, 1, 11) or out.item() == dtm.datetime(2024, 1, 11)


def test_timestamp_epoch():
    df = pl.DataFrame({"ts": [dtm.datetime(1970, 1, 2, 0, 0, 0)]})
    out = df.select(e=pl.col("ts").dt.epoch("s"))
    assert out.item() == 86400


def test_cast_date_datetime():
    df = pl.DataFrame({"d": [dtm.date(2024, 5, 5)]})
    out = df.select(ts=pl.col("d").cast(pl.Datetime("us")))
    assert out.item() == dtm.datetime(2024, 5, 5, 0, 0)
    back = out.select(d=pl.col("ts").cast(pl.Date))
    assert back.item() == dtm.date(2024, 5, 5)


def test_group_by_date_key():
    df = pl.DataFrame(
        {
            "d": [dtm.date(2024, 1, 1), dtm.date(2024, 1, 1), dtm.date(2024, 2, 1)],
            "v": [1, 2, 3],
        }
    )
    out = df.group_by(pl.col("d").dt.month().alias("m")).agg(s=pl.col("v").sum()).sort("m")
    assert out.get_column("s").to_list() == [3, 3]
