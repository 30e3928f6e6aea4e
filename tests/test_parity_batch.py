"""Round-1 py-polars parity batch (Series delegation, frame helpers, new exprs)."""

import polars_tpu as pl


def test_series_expr_delegation():
    s = pl.Series("a", [3.0, 1.0, 2.0, 2.0, None])
    assert s.rank().to_list() == [4.0, 1.0, 2.5, 2.5, None]
    assert s.peak_max().to_list()[:1] == [True]
    assert s.replace(2.0, 9.0).to_list() == [3.0, 1.0, 9.0, 9.0, None]
    assert s.is_first_distinct().to_list() == [True, True, True, False, True]
    assert pl.Series("b", [1, 2, 3]).rolling_mean(2).to_list() == [None, 1.5, 2.5]


def test_mode():
    assert pl.Series("a", [3.0, 1.0, 2.0, 2.0, None]).mode().to_list() == [2.0]
    df = pl.DataFrame({"g": ["x", "x", "x", "y", "y"], "v": [1, 1, 2, 5, 7]})
    out = df.group_by("g").agg(pl.col("v").mode().alias("m")).sort("g")
    assert out["m"].to_list() == [1, 5]


def test_rle_and_friends():
    s = pl.Series("a", [1, 1, 2, 2, 2, 1])
    assert s.rle_id().to_list() == [0, 0, 1, 1, 1, 2]
    assert s.rle().to_list() == [
        {"len": 2, "value": 1}, {"len": 3, "value": 2}, {"len": 1, "value": 1}]


def test_bounds_and_sig_figs():
    s = pl.Series("c", [1, 2, 3], dtype=pl.Int32)
    assert s.lower_bound() == -(2**31)
    assert s.upper_bound() == 2**31 - 1
    s2 = pl.Series("b", [0.0012345, 123456.0, 0.0])
    assert s2.round_sig_figs(3).to_list() == [0.00123, 123000.0, 0.0]


def test_sample_shuffle_argtrue():
    s = pl.Series("d", [10, 20, 30, 40])
    assert len(s.sample(2, seed=42)) == 2
    assert sorted(s.shuffle(seed=1).to_list()) == [10, 20, 30, 40]
    assert pl.Series("e", [False, True, False, True]).arg_true().to_list() == [1, 3]


def test_by_variants():
    df = pl.DataFrame({"v": [1, 5, 3], "w": [10, 2, 30]})
    assert df.select(pl.col("v").max_by("w"))["v"].to_list() == [3]
    assert df.select(pl.col("v").min_by("w"))["v"].to_list() == [5]
    assert df.select(pl.col("v").top_k_by("w", 2))["v"].to_list() == [3, 1]
    assert df.select(pl.col("v").index_of(5))["v"].to_list() == [1]


def test_horizontal_selector_splice():
    df = pl.DataFrame({"a": [1.0, 2.0, 3.0], "b": [4.0, 5.0, 6.0]})
    assert df.sum_horizontal().to_list() == [5.0, 7.0, 9.0]
    assert df.mean_horizontal().to_list() == [2.5, 3.5, 4.5]
    assert df.min_horizontal().to_list() == [1.0, 2.0, 3.0]
    assert df.max_horizontal().to_list() == [4.0, 5.0, 6.0]


def test_frame_helpers():
    df = pl.DataFrame({"a": [1.0, 2.0, 3.0], "b": [4.0, 5.0, 6.0]})
    assert df.shift(1)["a"].to_list() == [None, 1.0, 2.0]
    assert df.fold(lambda a, b: a + b).to_list() == [5.0, 7.0, 9.0]
    assert df.pipe(lambda d: d.height) == 3
    d2 = pl.DataFrame({"x": [1, 1, 2], "y": ["a", "a", "b"]})
    assert d2.is_duplicated().to_list() == [True, True, False]
    assert d2.is_unique().to_list() == [False, False, True]
    h = d2.hash_rows()
    assert h.to_list()[0] == h.to_list()[1] != h.to_list()[2]
    dm = pl.DataFrame({"c": ["x", "y", "x"]}).to_dummies()
    assert dm.columns == ["c_x", "c_y"]
    assert pl.DataFrame({"f": [1.0, float("nan"), 3.0]}).drop_nans()["f"].to_list() == [1.0, 3.0]


def test_frame_sql():
    df = pl.DataFrame({"a": [1.0, 2.0, 3.0]})
    assert df.sql("SELECT a FROM self WHERE a > 1")["a"].to_list() == [2.0, 3.0]


def test_lazy_helpers():
    lf = pl.DataFrame({"a": [1.0, 2.0, 3.0], "b": [4.0, 5.0, 6.0]}).lazy()
    assert lf.shift(1).collect()["a"].to_list() == [None, 1.0, 2.0]
    assert lf.collect_async().result().height == 3
    assert lf.approx_n_unique().collect()["a"].to_list() == [3]
    m = lf.match_to_schema({"a": pl.Float64(), "b": pl.Float64(), "c": pl.Int64()}).collect()
    assert m.columns == ["a", "b", "c"]
    assert m["c"].to_list() == [None, None, None]
