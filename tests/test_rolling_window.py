"""Time-window rolling group-by (reference: polars-time rolling)."""

import datetime as dtm

import polars_tpu as pl


def _df():
    return pl.DataFrame({
        "ts": [dtm.datetime(2024, 1, 1, 0, m) for m in (0, 10, 20, 40, 50)],
        "v": [1.0, 2.0, 3.0, 4.0, 5.0],
    })


def test_rolling_basic_aggs():
    out = _df().lazy().rolling("ts", period="25m").agg(
        pl.col("v").sum().alias("s"), pl.col("v").mean().alias("m"),
        pl.col("v").min().alias("lo"), pl.col("v").max().alias("hi"),
        pl.col("v").count().alias("n"),
    ).collect()
    assert out["s"].to_list() == [1.0, 3.0, 6.0, 7.0, 9.0]
    assert out["m"].to_list() == [1.0, 1.5, 2.0, 3.5, 4.5]
    assert out["lo"].to_list() == [1.0, 1.0, 1.0, 3.0, 4.0]
    assert out["hi"].to_list() == [1.0, 2.0, 3.0, 4.0, 5.0]
    assert out["n"].to_list() == [1, 2, 3, 2, 2]


def test_rolling_group_by():
    g = pl.DataFrame({
        "ts": [dtm.datetime(2024, 1, 1, 0, m) for m in (0, 10, 20, 0, 10)],
        "v": [1.0, 2.0, 3.0, 10.0, 20.0],
        "k": ["a", "a", "a", "b", "b"],
    })
    out = g.lazy().rolling("ts", period="15m", group_by=["k"]).agg(
        pl.col("v").sum().alias("s")).collect()
    assert out["s"].to_list() == [1.0, 3.0, 5.0, 10.0, 30.0]


def test_rolling_closed_and_offset():
    # closed='both' with period 20m: [t-20, t]
    out = _df().lazy().rolling("ts", period="20m", offset="-20m", closed="both").agg(
        pl.col("v").sum().alias("s")).collect()
    assert out["s"].to_list() == [1.0, 3.0, 6.0, 7.0, 9.0]


def test_rolling_var_std():
    out = _df().lazy().rolling("ts", period="25m").agg(
        pl.col("v").var().alias("var")).collect()
    # row2 window {1,2,3}: var = 1.0
    assert abs(out["var"].to_list()[2] - 1.0) < 1e-12


def test_rolling_first_last():
    out = _df().lazy().rolling("ts", period="25m").agg(
        pl.col("v").first().alias("f"), pl.col("v").last().alias("l")).collect()
    assert out["f"].to_list() == [1.0, 1.0, 1.0, 3.0, 4.0]
    assert out["l"].to_list() == [1.0, 2.0, 3.0, 4.0, 5.0]


def test_rolling_by_exprs():
    df = pl.DataFrame({
        "t": [dtm.datetime(2024, 1, 1, 0, m) for m in (0, 10, 20, 40, 50)],
        "v": [1.0, 2.0, 3.0, 4.0, 5.0],
    })
    out = df.select(pl.col("v").rolling_sum_by("t", "25m").alias("s"))
    assert out["s"].to_list() == [1.0, 3.0, 6.0, 7.0, 9.0]
    shuffled = df.gather([3, 0, 4, 1, 2])
    out2 = shuffled.select(pl.col("v").rolling_sum_by("t", "25m").alias("s"))
    assert out2["s"].to_list() == [7.0, 1.0, 9.0, 3.0, 6.0]
