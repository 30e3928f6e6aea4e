"""Timezone-aware Datetime behavior (reference: py-polars
tests/unit/operations/namespaces/temporal/test_datetime.py and polars-time
replace_time_zone/convert_time_zone; engine: kernels/timezone.py static
transition tables + in-trace searchsorted offset lookup)."""

from datetime import date, datetime, time, timedelta, timezone
from zoneinfo import ZoneInfo

import pytest

import polars_tpu as pl

AMS = ZoneInfo("Europe/Amsterdam")
TOK = ZoneInfo("Asia/Tokyo")


def test_replace_time_zone_roundtrip():
    s = pl.Series("t", [datetime(2021, 6, 1, 12), datetime(2021, 1, 1, 12), None])
    r = s.dt.replace_time_zone("Europe/Amsterdam")
    assert r.dtype == pl.Datetime("us", "Europe/Amsterdam")
    assert r.to_list() == [
        datetime(2021, 6, 1, 12, tzinfo=AMS),
        datetime(2021, 1, 1, 12, tzinfo=AMS),
        None,
    ]
    # wall reading unchanged when stripping the zone
    assert r.dt.replace_time_zone(None).to_list() == s.to_list()


def test_convert_time_zone_same_instant():
    r = pl.Series("t", [datetime(2021, 6, 1, 12)]).dt.replace_time_zone(
        "Europe/Amsterdam"
    )
    c = r.dt.convert_time_zone("Asia/Tokyo")
    assert c.to_list() == [datetime(2021, 6, 1, 19, tzinfo=TOK)]
    assert c.dt.hour().to_list() == [19]
    # instant preserved: timestamps equal
    assert c.dt.timestamp("us").to_list() == r.dt.timestamp("us").to_list()


def test_local_components():
    # 23:30 UTC on 2021-06-01 is 01:30 on 2021-06-02 in Amsterdam (CEST)
    utc = pl.Series("t", [datetime(2021, 6, 1, 23, 30)]).dt.replace_time_zone("UTC")
    ams = utc.dt.convert_time_zone("Europe/Amsterdam")
    assert ams.dt.day().to_list() == [2]
    assert ams.dt.hour().to_list() == [1]
    assert ams.dt.date().to_list() == [date(2021, 6, 2)]


def test_ambiguous_and_nonexistent():
    # 2020-10-25 02:30 occurs twice in Amsterdam (DST fall-back)
    amb = pl.Series("t", [datetime(2020, 10, 25, 2, 30)])
    with pytest.raises(Exception, match="ambiguous|non-existent"):
        amb.dt.replace_time_zone("Europe/Amsterdam").to_list()
    early = amb.dt.replace_time_zone("Europe/Amsterdam", ambiguous="earliest")
    late = amb.dt.replace_time_zone("Europe/Amsterdam", ambiguous="latest")
    diff = late.dt.timestamp("us").to_list()[0] - early.dt.timestamp("us").to_list()[0]
    assert diff == 3_600_000_000  # one hour apart
    # 2020-03-29 02:30 does not exist (spring-forward)
    nonex = pl.Series("t", [datetime(2020, 3, 29, 2, 30)])
    with pytest.raises(Exception, match="ambiguous|non-existent"):
        nonex.dt.replace_time_zone("Europe/Amsterdam").to_list()


def test_base_and_dst_offset():
    s = pl.Series(
        "t", [datetime(2021, 6, 1, 12), datetime(2021, 1, 1, 12)]
    ).dt.replace_time_zone("Europe/Amsterdam")
    assert s.dt.base_utc_offset().to_list() == [timedelta(hours=1)] * 2
    assert s.dt.dst_offset().to_list() == [timedelta(hours=1), timedelta(0)]


def test_tz_aware_construction_inference():
    s = pl.Series("t", [datetime(2021, 6, 1, 12, tzinfo=TOK)])
    assert s.dtype == pl.Datetime("us", "Asia/Tokyo")
    assert s.to_list() == [datetime(2021, 6, 1, 12, tzinfo=TOK)]
    u = pl.Series("t", [datetime(2021, 6, 1, 12, tzinfo=timezone.utc)])
    assert u.dtype == pl.Datetime("us", "UTC")


def test_tz_wall_clock_ops():
    s = pl.Series("t", [datetime(2021, 6, 1, 12, 34)]).dt.replace_time_zone(
        "Europe/Amsterdam"
    )
    assert s.dt.truncate("1d").to_list() == [datetime(2021, 6, 1, tzinfo=AMS)]
    assert s.dt.month_start().to_list() == [datetime(2021, 6, 1, 12, 34, tzinfo=AMS)]
    assert s.dt.month_end().to_list() == [datetime(2021, 6, 30, 12, 34, tzinfo=AMS)]
    assert s.dt.offset_by("1d").to_list() == [datetime(2021, 6, 2, 12, 34, tzinfo=AMS)]
    # physical sub-day offset crosses wall time linearly
    assert s.dt.offset_by("3h").to_list() == [datetime(2021, 6, 1, 15, 34, tzinfo=AMS)]


def test_tz_group_and_filter_on_instants():
    base = pl.DataFrame(
        {"t": [datetime(2021, 6, 1, 12), datetime(2021, 6, 1, 13)], "v": [1, 2]}
    )
    df = base.with_columns(pl.col("t").dt.replace_time_zone("UTC"))
    out = df.filter(pl.col("t") > datetime(2021, 6, 1, 12, 30, tzinfo=timezone.utc))
    assert out["v"].to_list() == [2]


def test_month_start_preserves_time_naive():
    s = pl.Series("t", [datetime(2000, 3, 15, 2)])
    assert s.dt.month_start().to_list() == [datetime(2000, 3, 1, 2)]
    assert s.dt.month_end().to_list() == [datetime(2000, 3, 31, 2)]


def test_dt_replace_and_combine():
    s = pl.Series("t", [datetime(2021, 3, 14, 15, 9, 26)])
    assert s.dt.replace(year=2000, minute=0).to_list() == [
        datetime(2000, 3, 14, 15, 0, 26)
    ]
    d = pl.Series("d", [date(2021, 1, 31)])
    assert d.dt.replace(month=2).to_list() == [date(2021, 2, 28)]
    assert d.dt.combine(time(10, 30)).to_list() == [datetime(2021, 1, 31, 10, 30)]


def test_century_millennium():
    d = pl.Series("d", [date(2000, 3, 1), date(2001, 1, 1), date(1999, 12, 31)])
    assert d.dt.century().to_list() == [20, 21, 20]
    assert d.dt.millennium().to_list() == [2, 3, 2]


def test_business_days():
    bd = pl.Series("d", [date(2024, 1, 5)])  # Friday
    assert bd.dt.add_business_days(1).to_list() == [date(2024, 1, 8)]
    assert bd.dt.add_business_days(-1).to_list() == [date(2024, 1, 4)]
    assert bd.dt.add_business_days(1, holidays=[date(2024, 1, 8)]).to_list() == [
        date(2024, 1, 9)
    ]
    s = pl.Series("d", [date(2024, 1, 6), date(2024, 1, 8)])
    assert s.dt.is_business_day().to_list() == [False, True]
    # roll
    sat = pl.Series("d", [date(2024, 1, 6)])
    with pytest.raises(Exception):
        sat.dt.add_business_days(1).to_list()
    assert sat.dt.add_business_days(1, roll="forward").to_list() == [date(2024, 1, 9)]
    assert sat.dt.add_business_days(1, roll="backward").to_list() == [date(2024, 1, 8)]


def test_tz_to_string():
    s = pl.Series("t", [datetime(2021, 6, 1, 12)]).dt.replace_time_zone(
        "Europe/Amsterdam"
    )
    out = s.dt.to_string("%Y-%m-%d %H:%M %z")
    assert out.to_list() == ["2021-06-01 12:00 +0200"]
