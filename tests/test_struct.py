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
