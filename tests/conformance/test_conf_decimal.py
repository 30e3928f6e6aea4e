"""Decimal end-to-end conformance (reference: polars-core
arithmetic/decimal.rs scale rules, polars-compute decimal.rs rounding,
py-polars/tests/unit/datatypes/test_decimal.py)."""

from decimal import Decimal as D

import pytest

import polars_tpu as pl


def test_series_construct_and_to_list():
    s = pl.Series("d", [D("1.23"), D("4.50"), None], dtype=pl.Decimal(10, 2))
    assert s.to_list() == [D("1.23"), D("4.50"), None]
    assert s.dtype == pl.Decimal(10, 2)


def test_scale_inference():
    s = pl.Series("d", [D("1.2"), D("3.45"), None])
    assert s.dtype.scale == 2
    assert s.to_list() == [D("1.20"), D("3.45"), None]


@pytest.fixture
def dec_df():
    return pl.DataFrame(
        {
            "a": pl.Series("a", [D("1.10"), D("2.20")], dtype=pl.Decimal(10, 2)),
            "b": pl.Series("b", [D("0.50"), D("0.25")], dtype=pl.Decimal(10, 2)),
        }
    )


def test_arithmetic_same_scale(dec_df):
    out = dec_df.select(
        (pl.col("a") + pl.col("b")).alias("add"),
        (pl.col("a") - pl.col("b")).alias("sub"),
        (pl.col("a") * pl.col("b")).alias("mul"),
        (pl.col("a") / pl.col("b")).alias("div"),
    )
    # scale = max(s_l, s_r); mul/div round half-even (dec128_mul/dec128_div)
    assert out["add"].to_list() == [D("1.60"), D("2.45")]
    assert out["sub"].to_list() == [D("0.60"), D("1.95")]
    assert out["mul"].to_list() == [D("0.55"), D("0.55")]
    assert out["div"].to_list() == [D("2.20"), D("8.80")]
    for c in out.schema.values():
        assert c.scale == 2


def test_arithmetic_mixed_scale():
    df = pl.DataFrame(
        {
            "x": pl.Series("x", [D("1.5")], dtype=pl.Decimal(10, 1)),
            "y": pl.Series("y", [D("0.25")], dtype=pl.Decimal(10, 2)),
        }
    )
    out = df.select((pl.col("x") + pl.col("y")).alias("z"))
    assert out["z"].to_list() == [D("1.75")]
    assert out.schema["z"].scale == 2


def test_int_times_decimal(dec_df):
    out = dec_df.select((pl.col("a") * 2).alias("z"))
    assert out["z"].to_list() == [D("2.20"), D("4.40")]


def test_decimal_literal(dec_df):
    out = dec_df.select((pl.col("a") + pl.lit(D("0.01"))).alias("z"))
    assert out["z"].to_list() == [D("1.11"), D("2.21")]


def test_compare_across_scales():
    df = pl.DataFrame(
        {
            "x": pl.Series("x", [D("1.50"), D("2.00")], dtype=pl.Decimal(10, 2)),
            "y": pl.Series("y", [D("1.5"), D("1.9")], dtype=pl.Decimal(10, 1)),
        }
    )
    out = df.select((pl.col("x") == pl.col("y")).alias("e"), (pl.col("x") > pl.col("y")).alias("g"))
    assert out["e"].to_list() == [True, False]
    assert out["g"].to_list() == [False, True]


def test_aggregations(dec_df):
    assert dec_df.select(pl.col("a").sum())["a"].to_list() == [D("3.30")]
    assert dec_df.select(pl.col("a").min())["a"].to_list() == [D("1.10")]
    assert dec_df.select(pl.col("a").max())["a"].to_list() == [D("2.20")]
    mean = dec_df.select(pl.col("a").mean())["a"].to_list()[0]
    assert abs(mean - 1.65) < 1e-9  # mean of Decimal -> Float64 logical value


def test_group_by_join_sort_keys():
    dfg = pl.DataFrame(
        {
            "k": pl.Series("k", [D("1.0"), D("2.0"), D("1.0")], dtype=pl.Decimal(5, 1)),
            "v": [1, 2, 3],
        }
    )
    assert dfg.group_by("k").agg(pl.col("v").sum()).sort("k").rows() == [
        (D("1.0"), 4), (D("2.0"), 2)]
    other = pl.DataFrame(
        {"k": pl.Series("k", [D("1.0")], dtype=pl.Decimal(5, 1)), "w": [9]}
    )
    assert dfg.join(other, on="k", how="inner").sort("v").rows() == [
        (D("1.0"), 1, 9), (D("1.0"), 3, 9)]
    assert dfg.sort("k", descending=True)["k"].to_list() == [D("2.0"), D("1.0"), D("1.0")]


def test_casts():
    s = pl.Series("d", [D("1.23"), D("4.50"), None])
    assert s.cast(pl.Decimal(10, 3)).to_list() == [D("1.230"), D("4.500"), None]
    assert s.cast(pl.Float64()).to_list() == [1.23, 4.5, None]
    assert pl.Series("i", [3]).cast(pl.Decimal(10, 2)).to_list() == [D("3.00")]
    assert pl.Series("d", [D("2.75")], dtype=pl.Decimal(10, 2)).cast(pl.Int64()).to_list() == [2]


def test_parquet_roundtrip(dec_df, tmp_path):
    p = tmp_path / "d.parquet"
    dec_df.write_parquet(p)
    back = pl.read_parquet(p)
    assert back.schema["a"] == pl.Decimal(10, 2)
    assert back["a"].to_list() == [D("1.10"), D("2.20")]


def test_nested_parquet_roundtrip(tmp_path):
    df = pl.DataFrame({"l": [[1, 2], None, []], "st": [{"a": 1}, {"a": 2}, {"a": None}]})
    p = tmp_path / "n.parquet"
    df.write_parquet(p)
    back = pl.read_parquet(p)
    assert back["l"].to_list() == [[1, 2], None, []]
    assert back["st"].to_list() == [{"a": 1}, {"a": 2}, {"a": None}]
