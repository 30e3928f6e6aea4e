"""DataFrame construction + basic ops (mirrors py-polars tests/unit/dataframe)."""

import datetime as dtm

import numpy as np
import pytest

import polars_tpu as pl
from polars_tpu.testing import assert_frame_equal, assert_series_equal


def test_init_dict():
    df = pl.DataFrame({"a": [1, 2], "b": ["x", "y"]})
    assert df.shape == (2, 2)
    assert df.columns == ["a", "b"]
    assert df.dtypes == [pl.Int64, pl.String]


def test_init_rows():
    df = pl.DataFrame([(1, "a"), (2, "b")], schema=["x", "y"])
    assert df.to_dicts() == [{"x": 1, "y": "a"}, {"x": 2, "y": "b"}]


def test_init_numpy_2d():
    arr = np.arange(6).reshape(3, 2)
    df = pl.DataFrame(arr, schema=["a", "b"])
    assert df.shape == (3, 2)
    assert df.get_column("a").to_list() == [0, 2, 4]


def test_init_schema_dtypes():
    df = pl.DataFrame({"a": [1, 2]}, schema={"a": pl.Float64})
    assert df.dtypes == [pl.Float64]
    assert df.get_column("a").to_list() == [1.0, 2.0]


def test_init_broadcast_scalar():
    df = pl.DataFrame({"a": [1, 2, 3], "b": [9]})
    assert df.get_column("b").to_list() == [9, 9, 9]


def test_init_pandas():
    import pandas as pd

    pdf = pd.DataFrame({"a": [1, 2], "b": [0.5, np.nan]})
    df = pl.DataFrame(pdf)
    assert df.get_column("a").to_list() == [1, 2]
    assert df.get_column("b").to_list() == [0.5, None]


def test_init_arrow():
    import pyarrow as pa

    t = pa.table({"a": [1, 2, None], "s": ["p", None, "q"]})
    df = pl.DataFrame(t)
    assert df.get_column("a").to_list() == [1, 2, None]
    assert df.get_column("s").to_list() == ["p", None, "q"]


def test_schema_object(df_basic):
    s = df_basic.schema
    assert s["a"] == pl.Int64
    assert s["s"] == pl.String
    assert list(s) == ["a", "b", "s", "flag"]


def test_head_tail_slice(df_basic):
    assert df_basic.head(2).height == 2
    assert df_basic.tail(2).get_column("a").to_list() == [4, 5]
    assert df_basic.slice(1, 2).get_column("a").to_list() == [2, 3]
    assert df_basic.slice(-2).get_column("a").to_list() == [4, 5]
    assert df_basic[1:3].get_column("a").to_list() == [2, 3]


def test_getitem(df_basic):
    assert df_basic["a"].to_list() == [1, 2, 3, 4, 5]
    sub = df_basic[["a", "s"]]
    assert sub.columns == ["a", "s"]
    assert df_basic[0].to_dicts() == [{"a": 1, "b": 1.5, "s": "x", "flag": True}]


def test_rename_drop(df_basic):
    out = df_basic.rename({"a": "A"}).drop("b")
    assert out.columns == ["A", "s", "flag"]
    with pytest.raises(pl.ColumnNotFoundError):
        df_basic.drop("nope")
    assert df_basic.drop("nope", strict=False).columns == df_basic.columns


def test_reverse(df_basic):
    assert df_basic.reverse().get_column("a").to_list() == [5, 4, 3, 2, 1]


def test_gather(df_basic):
    out = df_basic.gather([2, 0])
    assert out.get_column("a").to_list() == [3, 1]
    assert out.get_column("s").to_list() == ["x", "x"]


def test_with_row_index(df_basic):
    out = df_basic.with_row_index("idx", offset=10)
    assert out.columns[0] == "idx"
    assert out.get_column("idx").to_list() == [10, 11, 12, 13, 14]
    assert out.get_column("idx").dtype == pl.UInt32


def test_vstack_hstack():
    a = pl.DataFrame({"x": [1, 2]})
    b = pl.DataFrame({"x": [3]})
    assert a.vstack(b).get_column("x").to_list() == [1, 2, 3]
    c = a.hstack(pl.DataFrame({"y": ["p", "q"]}))
    assert c.columns == ["x", "y"]


def test_concat_vertical_strings():
    a = pl.DataFrame({"s": ["b", "a"]})
    b = pl.DataFrame({"s": ["c", "a"]})
    out = pl.concat([a, b])
    assert out.get_column("s").to_list() == ["b", "a", "c", "a"]


def test_concat_diagonal():
    a = pl.DataFrame({"x": [1]})
    b = pl.DataFrame({"y": [2.5]})
    out = pl.concat([a, b], how="diagonal")
    assert out.to_dicts() == [{"x": 1, "y": None}, {"x": None, "y": 2.5}]


def test_to_numpy_pandas_dicts(df_basic):
    assert df_basic.to_dicts()[2] == {"a": 3, "b": None, "s": "x", "flag": True}
    pdf = df_basic.to_pandas()
    assert list(pdf.columns) == df_basic.columns
    rows = df_basic.rows()
    assert rows[0] == (1, 1.5, "x", True)


def test_item():
    df = pl.DataFrame({"a": [42]})
    assert df.item() == 42
    with pytest.raises(ValueError):
        pl.DataFrame({"a": [1, 2]}).item()


def test_equals(df_basic):
    assert df_basic.equals(df_basic.clone())
    assert not df_basic.equals(df_basic.head(3))


def test_null_count(df_basic):
    out = df_basic.null_count()
    assert out.to_dicts() == [{"a": 0, "b": 1, "s": 0, "flag": 1}]


def test_frame_aggs(df_basic):
    assert df_basic.sum().get_column("a").to_list() == [15]
    assert df_basic.max().get_column("b").to_list() == [5.5]
    assert df_basic.mean().get_column("b").to_list() == [3.5]


def test_unique():
    df = pl.DataFrame({"a": [1, 1, 2, 2, 3], "b": ["x", "x", "y", "z", "z"]})
    assert df.unique().height == 4
    assert df.unique(subset="a").height == 3
    out = df.unique(subset="a", keep="first", maintain_order=True)
    assert out.get_column("b").to_list() == ["x", "y", "z"]
    out = df.unique(subset="a", keep="last", maintain_order=True)
    assert out.get_column("b").to_list() == ["x", "z", "z"]
    assert df.unique(subset="a", keep="none").get_column("a").to_list() == [3]


def test_drop_nulls(df_basic):
    assert df_basic.drop_nulls().height == 3
    assert df_basic.drop_nulls(subset="b").height == 4


def test_fill_null(df_basic):
    out = df_basic.drop("s", "flag").fill_null(0)
    assert out.get_column("b").to_list() == [1.5, 2.5, 0.0, 4.5, 5.5]


def test_partition_by():
    df = pl.DataFrame({"g": ["a", "b", "a"], "v": [1, 2, 3]})
    parts = df.partition_by("g")
    assert len(parts) == 2
    assert sorted(p.height for p in parts) == [1, 2]


def test_sample(df_basic):
    out = df_basic.sample(3, seed=1)
    assert out.height == 3


def test_describe(df_basic):
    out = df_basic.describe()
    assert "statistic" in out.columns


def test_clear(df_basic):
    assert df_basic.clear().height == 0
    assert df_basic.clear().columns == df_basic.columns


def test_cast_frame(df_basic):
    out = df_basic.cast({"a": pl.Float32})
    assert out.schema["a"] == pl.Float32


def test_with_columns_overwrite(df_basic):
    out = df_basic.with_columns((pl.col("a") * 10).alias("a"))
    assert out.get_column("a").to_list() == [10, 20, 30, 40, 50]
    assert out.columns == df_basic.columns


def test_unpivot():
    df = pl.DataFrame({"id": [1, 2], "x": [3, 4], "y": [5, 6]})
    out = df.unpivot(["x", "y"], index="id").sort("variable", "id")
    assert out.columns == ["id", "variable", "value"]
    assert out.height == 4
    assert out.get_column("value").to_list() == [3, 4, 5, 6]
