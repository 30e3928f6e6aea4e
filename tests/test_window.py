"""Window (.over) expressions (reference: polars-expr window.rs, 1210 LoC)."""

import polars_tpu as pl


def test_over_order_by():
    df = pl.DataFrame(
        {
            "g": ["a", "a", "b", "b", "a"],
            "t": [3, 1, 2, 1, 2],
            "v": [30, 10, 200, 100, 20],
        }
    )
    out = df.with_columns(
        cs=pl.col("v").cum_sum().over("g", order_by="t"),
    )
    # within each group ordered by t, cumulative sums map back to rows
    assert out.get_column("cs").to_list() == [60, 10, 300, 100, 30]


def test_over_shift_order_by():
    df = pl.DataFrame(
        {"g": ["x", "x", "x"], "t": [2, 0, 1], "v": [20, 0, 10]}
    )
    out = df.with_columns(prev=pl.col("v").shift(1).over("g", order_by="t"))
    assert out.get_column("prev").to_list() == [10, None, 0]


def test_over_agg_broadcast():
    df = pl.DataFrame({"g": [1, 2, 1], "v": [1.0, 2.0, 3.0]})
    out = df.with_columns(
        mn=pl.col("v").min().over("g"),
        nrm=(pl.col("v") - pl.col("v").mean().over("g")),
    )
    assert out.get_column("mn").to_list() == [1.0, 2.0, 1.0]
    assert out.get_column("nrm").to_list() == [-1.0, 0.0, 1.0]


def test_over_in_select():
    df = pl.DataFrame({"g": ["a", "b", "a"], "v": [1, 2, 3]})
    out = df.select(s=pl.col("v").sum().over("g"))
    assert out.get_column("s").to_list() == [4, 2, 4]


def test_over_filtered_frame():
    df = pl.DataFrame({"g": ["a", "b", "a", "b"], "v": [1, 2, 3, 4]})
    out = (
        df.lazy()
        .filter(pl.col("v") > 1)
        .with_columns(s=pl.col("v").sum().over("g"))
        .collect()
    )
    # rows after filter: (b,2),(a,3),(b,4) -> group sums b=6, a=3
    assert out.get_column("s").to_list() == [6, 3, 6]


def test_over_null_keys():
    df = pl.DataFrame({"g": ["a", None, "a", None], "v": [1, 2, 3, 4]})
    out = df.with_columns(s=pl.col("v").sum().over("g"))
    assert out.get_column("s").to_list() == [4, 6, 4, 6]


def test_rank_over():
    df = pl.DataFrame({"g": ["a", "a", "b", "a", "b"], "v": [3.0, 1.0, 5.0, 2.0, 4.0]})
    out = df.select(
        pl.col("v").rank().over("g").alias("r"),
        pl.col("v").rank("ordinal").over("g").alias("o"),
        pl.col("v").rank("dense", descending=True).over("g").alias("d"),
    )
    assert out["r"].to_list() == [3.0, 1.0, 2.0, 2.0, 1.0]
    assert out["o"].to_list() == [3, 1, 2, 2, 1]
    assert out["d"].to_list() == [1, 3, 1, 2, 2]


def test_rank_over_ties_average():
    df = pl.DataFrame({"g": ["x", "x", "x", "y"], "v": [1.0, 1.0, 2.0, 7.0]})
    out = df.select(pl.col("v").rank().over("g").alias("r"))
    assert out["r"].to_list() == [1.5, 1.5, 3.0, 1.0]
