"""group_by_dynamic (reference: polars-time group_by_dynamic + py-polars tests)."""

import datetime as dtm

import polars_tpu as pl


def _df():
    return pl.DataFrame({
        "ts": [dtm.datetime(2024, 1, 1, h, m) for h, m in
               [(0, 0), (0, 15), (0, 30), (1, 0), (1, 45), (2, 30), (3, 0), (3, 1)]],
        "v": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0],
        "g": ["a", "a", "b", "a", "b", "a", "b", "b"],
    })


def test_tumbling():
    out = _df().lazy().group_by_dynamic("ts", every="1h").agg(
        pl.col("v").sum().alias("s"), pl.len().alias("n")).collect()
    assert out["ts"].to_list() == [dtm.datetime(2024, 1, 1, h) for h in (0, 1, 2, 3)]
    assert out["s"].to_list() == [6.0, 9.0, 6.0, 15.0]
    assert out["n"].to_list() == [3, 2, 1, 2]


def test_overlapping_period():
    out = _df().lazy().group_by_dynamic("ts", every="1h", period="2h").agg(
        pl.col("v").sum().alias("s")).collect()
    # windows [0,2h) [1,3h) [2,4h) [3,5h): no window before the first datapoint
    assert out["s"].to_list() == [15.0, 15.0, 21.0, 15.0]


def test_closed_right():
    out = _df().lazy().group_by_dynamic("ts", every="1h", closed="right").agg(
        pl.len().alias("n")).collect()
    # (23:00,0:00]={0:00}; (0,1]={0:15,0:30,1:00}; (1,2]={1:45}; (2,3]={2:30,3:00}; (3,4]={3:01}
    assert out["n"].to_list() == [1, 3, 1, 2, 1]


def test_label_right_and_datapoint():
    out = _df().lazy().group_by_dynamic("ts", every="2h", label="right").agg(
        pl.len().alias("n")).collect()
    assert out["ts"].to_list() == [dtm.datetime(2024, 1, 1, 2), dtm.datetime(2024, 1, 1, 4)]
    assert out["n"].to_list() == [5, 3]
    out = _df().lazy().group_by_dynamic("ts", every="1h", label="datapoint").agg(
        pl.len().alias("n")).collect()
    assert out["ts"].to_list()[2] == dtm.datetime(2024, 1, 1, 2, 30)


def test_group_by_keys_and_boundaries():
    out = _df().lazy().group_by_dynamic(
        "ts", every="2h", group_by=["g"], include_boundaries=True
    ).agg(pl.col("v").sum().alias("s")).collect()
    assert out.columns == ["g", "_lower_boundary", "_upper_boundary", "ts", "s"]
    assert out["g"].to_list() == ["a", "a", "b", "b"]
    assert out["s"].to_list() == [7.0, 6.0, 8.0, 15.0]
    assert out["_upper_boundary"].to_list()[0] == dtm.datetime(2024, 1, 1, 2)


def test_offset_and_start_by_datapoint():
    out = _df().lazy().group_by_dynamic("ts", every="1h", offset="30m").agg(
        pl.len().alias("n")).collect()
    assert out["ts"].to_list()[0] == dtm.datetime(2023, 12, 31, 23, 30)
    assert out["n"].to_list() == [2, 2, 1, 3]
    out = _df().lazy().group_by_dynamic("ts", every="1h", start_by="datapoint").agg(
        pl.len().alias("n")).collect()
    assert out["ts"].to_list()[0] == dtm.datetime(2024, 1, 1, 0, 0)


def test_calendar_months():
    df = pl.DataFrame({
        "d": [dtm.date(2024, 1, 5), dtm.date(2024, 1, 20), dtm.date(2024, 2, 2), dtm.date(2024, 3, 30)],
        "x": [1, 2, 3, 4],
    })
    out = df.lazy().group_by_dynamic("d", every="1mo").agg(pl.col("x").sum().alias("s")).collect()
    assert out["d"].to_list() == [dtm.date(2024, 1, 1), dtm.date(2024, 2, 1), dtm.date(2024, 3, 1)]
    assert out["s"].to_list() == [3, 3, 4]


def test_integer_index():
    df = pl.DataFrame({"i": [0, 1, 2, 5, 6, 9], "x": [1] * 6})
    out = df.lazy().group_by_dynamic("i", every="3i").agg(pl.len().alias("n")).collect()
    assert out["i"].to_list() == [0, 3, 6, 9]
    assert out["n"].to_list() == [3, 1, 1, 1]


def test_eager_frame_method():
    out = _df().group_by_dynamic("ts", every="2h").agg(pl.col("v").mean().alias("m"))
    assert out["m"].to_list() == [3.0, 7.0]
