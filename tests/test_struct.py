"""Struct dtype (reference: polars struct type + py-polars struct tests)."""

import polars_tpu as pl


def test_struct_roundtrip():
    s = pl.Series("s", [{"a": 1, "b": "x"}, None, {"a": 3, "b": "y"}])
    assert "Struct" in str(s.dtype)
    assert s.to_list() == [{"a": 1, "b": "x"}, None, {"a": 3, "b": "y"}]


def test_struct_build_and_field():
    df = pl.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"], "k": [10, 20, 30]})
    out = df.select(pl.struct("a", "b").alias("s"), "k")
    assert out["s"].to_list() == [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}, {"a": 3, "b": "z"}]
    assert out.select(pl.col("s").struct.field("b"))["b"].to_list() == ["x", "y", "z"]


def test_struct_unnest():
    df = pl.DataFrame({"a": [1, 2], "b": [3.5, 4.5]})
    out = df.select(pl.struct("a", "b").alias("s")).unnest("s")
    assert out.columns == ["a", "b"]
    assert out["b"].to_list() == [3.5, 4.5]


def test_struct_survives_row_ops():
    df = pl.DataFrame({"a": [1, 2, 3], "k": [10, 20, 30]})
    out = df.select(pl.struct("a").alias("s"), "k")
    f = out.lazy().filter(pl.col("k") >= 20).collect()
    assert f["s"].to_list() == [{"a": 2}, {"a": 3}]
    srt = out.lazy().sort("k", descending=True).collect()
    assert srt["s"].to_list()[0] == {"a": 3}
    assert out.gather([2, 0])["s"].to_list() == [{"a": 3}, {"a": 1}]


def test_series_struct_namespace():
    s = pl.Series("s", [{"a": 1, "b": 2}, {"a": 3, "b": 4}])
    assert s.struct.fields == ["a", "b"]
    assert s.struct.field("b").to_list() == [2, 4]


def test_struct_rename_fields():
    df = pl.DataFrame({"a": [1], "b": [2]})
    out = df.select(pl.struct("a", "b").struct.rename_fields(["x", "y"]).alias("s"))
    assert out["s"].to_list() == [{"x": 1, "y": 2}]


def test_struct_field_wildcard_and_multi():
    df = pl.DataFrame({"st": [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]})
    out = df.select(pl.col("st").struct.field("*"))
    assert out.columns == ["a", "b"]
    assert out.rows() == [(1, "x"), (2, "y")]
    out2 = df.select(pl.col("st").struct.field("b", "a"))
    assert out2.columns == ["b", "a"]
    assert out2.rows() == [("x", 1), ("y", 2)]


def test_struct_equality():
    df = pl.DataFrame({"x": [1, 2]})
    out = df.select((pl.struct(a=pl.col("x")) == pl.struct(a=pl.lit(2))).alias("r"))
    assert out.to_series().to_list() == [False, True]
    two = pl.DataFrame({"s": [{"a": 1}, {"a": 2}], "t": [{"a": 1}, {"a": 3}]})
    assert two.select((pl.col("s") == pl.col("t")).alias("r")).to_series().to_list() == [
        True, False]
    assert two.select((pl.col("s") != pl.col("t")).alias("r")).to_series().to_list() == [
        False, True]


def test_sort_by_struct_field_expr():
    df = pl.DataFrame({"st": [{"a": 2, "b": "y"}, {"a": 1, "b": "x"}, {"a": 3, "b": "z"}]})
    out = df.sort(pl.col("st").struct.field("a"), descending=True)
    assert out.unnest("st").rows() == [(3, "z"), (2, "y"), (1, "x")]
    # lazy too
    out2 = df.lazy().sort(pl.col("st").struct.field("a")).collect()
    assert out2.unnest("st").rows() == [(1, "x"), (2, "y"), (3, "z")]


def test_get_categories_excludes_null_sentinel():
    c = pl.DataFrame({"c": pl.Series("c", ["b", "a", None], dtype=pl.Categorical)})
    cats = c.select(pl.col("c").cat.get_categories()).to_series().to_list()
    assert sorted(cats) == ["a", "b"]
    # an actual empty-string category IS kept
    c2 = pl.DataFrame({"c": pl.Series("c", ["", "a", None], dtype=pl.Categorical)})
    cats2 = c2.select(pl.col("c").cat.get_categories()).to_series().to_list()
    assert sorted(cats2) == ["", "a"]
