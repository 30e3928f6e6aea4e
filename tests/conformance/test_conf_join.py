"""Conformance slice adapted from the reference behavioral suite
(py-polars/tests/unit/operations/test_join.py) — join semantics over nulls,
empties, dtypes, coalescing and validation."""

from datetime import date

import pytest

import polars_tpu as pl
from polars_tpu import datatypes as dtt


@pytest.fixture()
def dfs():
    left = pl.DataFrame({"a": [1, 2, 3, 1], "b": ["w", "x", "y", "z"]})
    right = pl.DataFrame({"a": [1, 3, 4], "c": [10.0, 30.0, 40.0]})
    return left, right


def _sorted_rows(df):
    return sorted(df.rows(), key=lambda r: tuple((v is None, str(v)) for v in r))


def test_inner_join(dfs):
    left, right = dfs
    out = left.join(right, on="a", how="inner")
    assert out.columns == ["a", "b", "c"]
    assert _sorted_rows(out) == [(1, "w", 10.0), (1, "z", 10.0), (3, "y", 30.0)]


def test_left_join(dfs):
    left, right = dfs
    out = left.join(right, on="a", how="left")
    assert _sorted_rows(out) == [
        (1, "w", 10.0), (1, "z", 10.0), (2, "x", None), (3, "y", 30.0)]


def test_full_join_coalesce(dfs):
    left, right = dfs
    out = left.join(right, on="a", how="full", coalesce=True)
    assert out.columns == ["a", "b", "c"]
    assert _sorted_rows(out) == [
        (1, "w", 10.0), (1, "z", 10.0), (2, "x", None), (3, "y", 30.0),
        (4, None, 40.0)]


def test_full_join_no_coalesce(dfs):
    left, right = dfs
    out = left.join(right, on="a", how="full")
    assert out.columns == ["a", "b", "a_right", "c"]
    assert (None, None, 4, 40.0) in out.rows()


def test_semi_anti_join():
    # reference: test_semi_anti_join
    df_a = pl.DataFrame({"a": [1, 2, 3], "b": ["a", "b", "c"]})
    df_b = pl.DataFrame({"a": [1, 3]})
    semi = df_a.join(df_b, on="a", how="semi")
    assert semi.rows() == [(1, "a"), (3, "c")]
    assert semi.columns == ["a", "b"]  # no right columns
    anti = df_a.join(df_b, on="a", how="anti")
    assert anti.rows() == [(2, "b")]


def test_join_negative_integers():
    # reference: test_join_negative_integers
    expected = [(-6, -2), (-1, -3)]
    df1 = pl.DataFrame({"a": [-1, -6, -3], "b": [-1, -6, -3]})
    df2 = pl.DataFrame({"a": [-6, -1, -4], "c": [-2, -3, -30]})
    for d in (dtt.Int8(), dtt.Int16(), dtt.Int32(), dtt.Int64()):
        out = (
            df1.with_columns(pl.col("a").cast(d))
            .join(df2.with_columns(pl.col("a").cast(d)), on="a", how="inner")
            .select("a", "c")
        )
        assert sorted(out.rows()) == expected


def test_join_on_expressions():
    # reference: test_join_on_expressions
    df_a = pl.DataFrame({"a": [1, 2, 3, 4, 5]})
    df_b = pl.DataFrame({"b": [1, 4, 9, 16, 25]})
    out = df_a.join(df_b, left_on=(pl.col("a") ** 2).cast(dtt.Int64()), right_on=pl.col("b"))
    assert sorted(out["a"].to_list()) == [1, 2, 3, 4, 5]


def test_joins_dispatch_dtypes():
    # reference: test_joins_dispatch — join on temporal + string keys
    df = pl.DataFrame(
        {
            "datetime": [13241324, 12341256, 12341234, 13241324],
            "int": [1, 2, 3, 1],
            "str": ["wow", "a", "b", "wow"],
        }
    ).with_columns(pl.col("datetime").cast(dtt.Datetime("us")))
    for how in ("left", "inner", "full"):
        out = df.join(df, on=["datetime", "str"], how=how)
        assert out.height >= df.height


def test_join_on_cast():
    # reference: test_join_on_cast — key expr casts coerce
    df_a = pl.DataFrame({"a": [-5, -2, 3, 3, 9, 10]}).with_row_index()
    df_b = pl.DataFrame({"a": [-2, -3, 3, 10]})
    out = df_a.join(df_b, on=pl.col("a").cast(dtt.Int32()))
    assert sorted(out["a"].to_list()) == [-2, 3, 3, 10]


def test_sorted_merge_joins():
    # reference: test_sorted_merge_joins (shrunk): results equal regardless
    # of sortedness flags
    import numpy as np

    rng = np.random.default_rng(0)
    left = pl.DataFrame({"a": sorted(rng.integers(0, 10, 20).tolist())})
    right = pl.DataFrame({"a": sorted(rng.integers(0, 10, 10).tolist())})
    for how in ("left", "inner"):
        out_plain = left.join(right, on="a", how=how)
        out_sorted = left.set_sorted("a").join(right.set_sorted("a"), on="a", how=how)
        assert out_plain.height == out_sorted.height


def test_join_nulls_flag():
    # nulls never match by default; nulls_equal=True matches them
    left = pl.DataFrame({"a": [1, None, 3]})
    right = pl.DataFrame({"a": [None, 3], "c": ["x", "y"]})
    out = left.join(right, on="a", how="inner")
    assert out.rows() == [(3, "y")]
    out2 = left.join(right, on="a", how="inner", nulls_equal=True)
    assert sorted(out2.rows(), key=str) == [(3, "y"), (None, "x")]


def test_full_outer_join_bool():
    # reference: test_full_outer_join_bool
    df1 = pl.DataFrame({"id": [True, False], "val": [1, 2]})
    df2 = pl.DataFrame({"id": [True, False], "val": [0, -1]})
    out = df1.join(df2, on="id", how="full")
    assert sorted(out["val"].to_list()) == [1, 2]
    assert sorted(out["val_right"].to_list()) == [-1, 0]


def test_join_validation():
    # reference: test_join_validation — violated validations raise
    df1 = pl.DataFrame({"a": [1, 2, 3], "b": [1, 2, 2]})
    df2 = pl.DataFrame({"a": [1, 1, 2], "c": [9, 8, 7]})
    with pytest.raises(Exception):
        df1.join(df2, on="a", how="inner", validate="m:1").height
    # satisfied validations pass
    df3 = pl.DataFrame({"a": [1, 2], "c": [9, 7]})
    out = df1.join(df3, on="a", how="inner", validate="m:1")
    assert out.height == 2


def test_join_empties():
    # reference: test_join_empties — empty side yields correct schema/height
    left = pl.DataFrame({"a": pl.Series([], dtype=dtt.Int64()),
                         "b": pl.Series([], dtype=dtt.String())})
    right = pl.DataFrame({"a": [1], "c": [2.0]})
    for how, h in (("inner", 0), ("left", 0), ("semi", 0), ("anti", 0)):
        out = left.join(right, on="a", how=how)
        assert out.height == h
    out = right.join(left, on="a", how="left")
    assert out.height == 1
    assert out.rows() == [(1, 2.0, None)]


def test_cross_join():
    df1 = pl.DataFrame({"a": [1, 2]})
    df2 = pl.DataFrame({"b": ["x", "y", "z"]})
    out = df1.join(df2, how="cross")
    assert out.height == 6
    assert out.columns == ["a", "b"]
    assert out.rows()[:3] == [(1, "x"), (1, "y"), (1, "z")]


def test_join_suffix():
    df1 = pl.DataFrame({"a": [1], "b": [2]})
    df2 = pl.DataFrame({"a": [1], "b": [3]})
    out = df1.join(df2, on="a")
    assert out.columns == ["a", "b", "b_right"]
    out2 = df1.join(df2, on="a", suffix="_r2")
    assert out2.columns == ["a", "b", "b_r2"]


def test_join_multi_key_with_nulls():
    left = pl.DataFrame({"k1": [1, 1, None], "k2": ["a", None, "b"], "v": [1, 2, 3]})
    right = pl.DataFrame({"k1": [1, None], "k2": ["a", "b"], "w": [10, 30]})
    out = left.join(right, on=["k1", "k2"], how="inner")
    assert out.rows() == [(1, "a", 1, 10)]
    out2 = left.join(right, on=["k1", "k2"], how="inner", nulls_equal=True)
    assert sorted(out2["v"].to_list()) == [1, 3]


def test_join_float_keys():
    left = pl.DataFrame({"a": [1.5, 2.5, float("nan")]})
    right = pl.DataFrame({"a": [1.5, float("nan")], "c": [1, 2]})
    out = left.join(right, on="a", how="inner")
    # NaN == NaN under polars total equality in joins
    assert sorted(out["c"].to_list()) == [1, 2]


def test_join_string_keys_disjoint_dicts():
    left = pl.DataFrame({"s": ["apple", "pear", "plum"], "v": [1, 2, 3]})
    right = pl.DataFrame({"s": ["plum", "apple", "kiwi"], "w": [30, 10, 99]})
    out = left.join(right, on="s", how="left").sort("v")
    assert out["w"].to_list() == [10, None, 30]


def test_update():
    # reference: test_update (core behavior)
    df1 = pl.DataFrame({"a": [1, 2, 3], "b": [10, 20, 30]})
    df2 = pl.DataFrame({"a": [2, 3], "b": [99, None]})
    out = df1.update(df2, on="a").sort("a")
    # nulls in other do NOT overwrite by default
    assert out["b"].to_list() == [10, 99, 30]
    out2 = df1.update(df2, on="a", include_nulls=True).sort("a")
    assert out2["b"].to_list() == [10, 99, None]


def test_join_coalesce_keys_kept_per_how():
    a = pl.DataFrame({"k": [1, 2], "x": [1, 2]})
    b = pl.DataFrame({"k": [1, 2], "y": [3, 4]})
    assert a.join(b, on="k", how="inner").columns == ["k", "x", "y"]
    assert a.join(b, on="k", how="inner", coalesce=False).columns == [
        "k", "x", "k_right", "y"]


def test_join_results_in_duplicate_names():
    # reference: test_join_results_in_duplicate_names
    df = pl.DataFrame({"a": [1, 2], "b": [3, 4], "b_right": [5, 6]})
    with pytest.raises(Exception):
        df.join(df, on="a").height


def test_asof_join_basic():
    left = pl.DataFrame({"t": [1, 5, 10], "v": ["a", "b", "c"]})
    right = pl.DataFrame({"t": [0, 4, 8], "w": [10, 20, 30]})
    out = left.join_asof(right, on="t")
    assert out["w"].to_list() == [10, 20, 30]
    out_fwd = left.join_asof(right, on="t", strategy="forward")
    assert out_fwd["w"].to_list() == [20, 30, None]


def test_asof_join_by_group():
    left = pl.DataFrame({"g": ["a", "b"], "t": [3, 3], "v": [1, 2]})
    right = pl.DataFrame({"g": ["a", "a", "b"], "t": [1, 2, 5], "w": [10, 20, 30]})
    out = left.join_asof(right, on="t", by="g")
    assert out["w"].to_list() == [20, None]


def test_join_where_inequality():
    # reference: test_inequality_join basics
    east = pl.DataFrame({"id": [100, 101], "dur": [120, 140], "rev": [12, 14]})
    west = pl.DataFrame({"t_id": [404, 498], "time": [90, 130], "cost": [9, 13]})
    out = east.join_where(west, pl.col("dur") < pl.col("time"))
    assert sorted(out.select("id", "t_id").rows()) == [(100, 498), (101, 498)][: out.height] or out.height == 1
    got = sorted(out.select("id", "t_id").rows())
    assert got == [(100, 498)]


def test_join_date_keys():
    left = pl.DataFrame({"d": [date(2020, 1, 1), date(2020, 1, 2)], "v": [1, 2]})
    right = pl.DataFrame({"d": [date(2020, 1, 2)], "w": ["x"]})
    out = left.join(right, on="d", how="left").sort("v")
    assert out["w"].to_list() == [None, "x"]


def test_right_join():
    left = pl.DataFrame({"k": [1, 2], "x": ["a", "b"]})
    right = pl.DataFrame({"k": [2, 3], "y": [20, 30]})
    out = left.join(right, on="k", how="right")
    assert out.columns == ["x", "k", "y"]
    assert sorted(out.rows(), key=str) == [("b", 2, 20), (None, 3, 30)]


def test_join_projection_pushdown_keeps_keys():
    # projection above join keeps key columns alive through the scan
    left = pl.DataFrame({"k": [1, 2], "x": [10, 20]}).lazy()
    right = pl.DataFrame({"k": [1, 2], "y": [5, 6]}).lazy()
    out = left.join(right, on="k").select("y").collect()
    assert sorted(out["y"].to_list()) == [5, 6]


def test_join_chained():
    a = pl.DataFrame({"k": [1, 2, 3], "a": [1, 2, 3]}).lazy()
    b = pl.DataFrame({"k": [1, 2], "b": [10, 20]}).lazy()
    c = pl.DataFrame({"k": [2, 3], "c": [200, 300]}).lazy()
    out = a.join(b, on="k").join(c, on="k").collect()
    assert out.rows() == [(2, 2, 20, 200)]
