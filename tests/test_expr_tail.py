"""Round-3 Expr long-tail: truncate/reinterpret/item/is_sorted/ewm_sum/
ewm_*_by/interpolate_by/hist/reshape/rolling-by order stats/rolling_map/
list.item/struct.drop/expr serialize (reference: py-polars expr/expr.py)."""

from datetime import datetime

import pytest

import polars_tpu as pl


def test_truncate_decimals():
    s = pl.Series("a", [0.25, -0.99, 1.9999, -1.9999])
    assert s.truncate(1).to_list() == pytest.approx([0.2, -0.9, 1.9, -1.9])
    assert pl.Series("a", [0.99, -0.99]).truncate().to_list() == [0.0, 0.0]
    assert pl.Series("a", [5, -5]).truncate().to_list() == [5, -5]  # ints pass


def test_reinterpret():
    assert pl.Series("a", [-1], dtype=pl.Int64()).reinterpret(signed=False).to_list() == [2**64 - 1]
    assert pl.Series("a", [1.0]).reinterpret(dtype=pl.Int64()).to_list() == [4607182418800017408]
    assert pl.Series("a", [1065353216], dtype=pl.Int32()).reinterpret(dtype=pl.Float32()).to_list() == [1.0]
    # roundtrip
    s = pl.Series("a", [1.5, -2.25])
    assert s.reinterpret(dtype=pl.UInt64()).reinterpret(dtype=pl.Float64()).to_list() == [1.5, -2.25]


def test_item_semantics():
    assert pl.DataFrame({"a": [7]}).select(pl.col("a").item()).to_dicts() == [{"a": 7}]
    with pytest.raises(Exception):
        pl.DataFrame({"a": [1, 2]}).select(pl.col("a").item()).to_dicts()
    empty = pl.DataFrame({"a": pl.Series("a", [], dtype=pl.Int64())})
    with pytest.raises(Exception):
        empty.select(pl.col("a").item()).to_dicts()
    assert empty.select(pl.col("a").item(allow_empty=True)).to_dicts() == [{"a": None}]


def test_is_sorted():
    assert pl.Series("a", [1, 2, 2, 3]).is_sorted() is True
    assert pl.Series("a", [3, 1]).is_sorted() is False
    assert pl.Series("a", [3, 2, 1]).is_sorted(descending=True) is True
    assert pl.Series("a", [None, 1, 2]).is_sorted() is True
    assert pl.Series("a", [1, 2, None]).is_sorted() is False
    assert pl.Series("a", [1, 2, None]).is_sorted(nulls_last=True) is True
    # descending=None checks either direction
    assert pl.Series("a", [3, 2, 1]).is_sorted(descending=None) is True
    out = (
        pl.DataFrame({"k": ["a", "a", "b", "b"], "v": [1, 2, 5, 4]})
        .group_by("k")
        .agg(pl.col("v").is_sorted())
        .sort("k")
    )
    assert out.to_dicts() == [{"k": "a", "v": True}, {"k": "b", "v": False}]


def test_ewm_sum():
    assert pl.Series("a", [1.0, 1.0, 1.0]).ewm_sum(alpha=0.5).to_list() == [1.0, 1.5, 1.75]


def test_ewm_mean_by():
    # reference doctest values (py-polars expr/expr.py ewm_mean_by)
    df = pl.DataFrame(
        {
            "values": [0.0, 1.0, 2.0, 3.0],
            "times": [
                datetime(2020, 1, 1), datetime(2020, 1, 3),
                datetime(2020, 1, 10), datetime(2020, 1, 11),
            ],
        }
    )
    out = df.select(pl.col("values").ewm_mean_by("times", half_life="2d"))
    assert out.to_series().to_list() == pytest.approx(
        [0.0, 0.5, 1.8674174785275222, 2.1991432188134525]
    )


def test_interpolate_by():
    df = pl.DataFrame({"a": [1.0, None, None, 3.0], "b": [1, 2, 7, 8]})
    out = df.select(pl.col("a").interpolate_by("b")).to_series().to_list()
    assert out == pytest.approx([1.0, 9 / 7, 19 / 7, 3.0])
    # leading/trailing nulls stay null
    df2 = pl.DataFrame({"a": [None, 1.0, None], "b": [1, 2, 3]})
    assert df2.select(pl.col("a").interpolate_by("b")).to_series().to_list() == [None, 1.0, None]


def test_hist():
    df = pl.DataFrame({"a": [1, 3, 8, 8, 2, 1, 3]})
    assert df.select(pl.col("a").hist(bins=[1, 2, 3])).to_series().to_list() == [3, 2]
    bp = df.select(pl.col("a").hist(bins=[1, 2, 3], include_breakpoint=True)).to_series().to_list()
    assert bp == [
        {"breakpoint": 2.0, "count": 3},
        {"breakpoint": 3.0, "count": 2},
    ]


def test_reshape():
    assert pl.Series("a", [1, 2, 3, 4, 5, 6]).reshape((2, 3)).to_list() == [[1, 2, 3], [4, 5, 6]]
    s = pl.Series("a", [1, 2, 3, 4]).reshape((-1, 2))
    assert s.dtype == pl.Array(pl.Int64(), 2)
    with pytest.raises(Exception):
        pl.Series("a", [1, 2, 3]).reshape((2, 2)).to_list()


def test_rolling_by_order_stats():
    df = pl.DataFrame(
        {
            "v": [1.0, 5.0, 3.0, 2.0],
            "t": [datetime(2020, 1, d) for d in (1, 2, 3, 4)],
        }
    )
    assert df.select(pl.col("v").rolling_median_by("t", "2d")).to_series().to_list() == [1.0, 3.0, 4.0, 2.5]
    assert df.select(
        pl.col("v").rolling_quantile_by("t", "3d", quantile=0.5, interpolation="linear")
    ).to_series().to_list() == [1.0, 3.0, 3.0, 3.0]
    assert df.select(pl.col("v").rolling_rank_by("t", "3d")).to_series().to_list() == [1.0, 2.0, 2.0, 1.0]


def test_rolling_map_and_expr_rolling():
    assert pl.Series("a", [1.0, 2.0, 3.0, 4.0]).rolling_map(lambda s: s.sum(), 2).to_list() == [None, 3.0, 5.0, 7.0]
    df = pl.DataFrame(
        {"v": [1.0, 5.0, 3.0], "t": [datetime(2020, 1, d) for d in (1, 2, 3)]}
    )
    out = df.select(pl.col("v").sum().rolling(index_column="t", period="2d"))
    assert out.to_series().to_list() == [1.0, 6.0, 8.0]
    out2 = df.select(pl.col("v").median().rolling(index_column="t", period="2d"))
    assert out2.to_series().to_list() == [1.0, 3.0, 4.0]


def test_list_item_struct_drop():
    assert pl.Series("a", [[1], [2]]).list.item().to_list() == [1, 2]
    with pytest.raises(Exception):
        pl.Series("a", [[1, 2]]).list.item().to_list()
    assert pl.Series("a", [[1], []]).list.item(allow_empty=True).to_list() == [1, None]
    out = pl.DataFrame({"s": [{"a": 1, "b": 2, "c": 3}]}).select(pl.col("s").struct.drop(["b"]))
    assert out.to_dicts() == [{"s": {"a": 1, "c": 3}}]
    with pytest.raises(Exception):
        pl.DataFrame({"s": [{"a": 1}]}).select(pl.col("s").struct.drop(["zzz"])).to_dicts()


def test_expr_serialize_roundtrip():
    e = (pl.col("a") + 1).alias("x")
    s = e.meta.serialize()
    e2 = pl.Expr.deserialize(s)
    assert e2.meta.eq(e)
    assert pl.DataFrame({"a": [1, 2]}).select(e2).to_dicts() == [{"x": 2}, {"x": 3}]


def test_bin_slice_get_reinterpret():
    import struct

    b = pl.Series("b", [b"\x01\x02\x03\x04", b"\xff", None])
    assert b.bin.slice(1, 2).to_list() == [b"\x02\x03", b"", None]
    assert b.bin.get(0).to_list() == [1, 255, None]
    assert b.bin.get(3).to_list() == [4, None, None]
    r = pl.Series("b", [struct.pack("<i", 1234), b"xx"])
    assert r.bin.reinterpret(dtype=pl.Int32()).to_list() == [1234, None]
    # trailing NUL bytes survive the dictionary
    t = pl.Series("b", [b"x\x00", b"x"])
    assert t.to_list() == [b"x\x00", b"x"]
    assert t.bin.size().to_list() == [2, 1]


def test_cat_namespace_string_ops():
    c = pl.Series("c", ["apple", "banana"], dtype=pl.Categorical())
    assert c.cat.starts_with("a").to_list() == [True, False]
    assert c.cat.ends_with("a").to_list() == [False, True]
    assert c.cat.len_chars().to_list() == [5, 6]
    assert c.cat.slice(1, 3).to_list() == ["ppl", "ana"]
    assert c.cat.physical().to_list() == [0, 1]


def test_grouped_window_scans():
    """ewm/rolling over groups (segment-reset associative scans)."""
    df = pl.DataFrame(
        {
            "g": ["a", "a", "a", "b", "b"],
            "v": [1.0, 2.0, 3.0, 10.0, 20.0],
            "t": [datetime(2020, 1, d) for d in (1, 2, 3)] + [datetime(2020, 1, d) for d in (1, 2)],
        }
    )
    out = df.select(pl.col("v").ewm_mean(alpha=0.5).over("g")).to_series().to_list()
    import pandas as pd

    oracle = (
        pd.Series([1.0, 2.0, 3.0]).ewm(alpha=0.5).mean().tolist()
        + pd.Series([10.0, 20.0]).ewm(alpha=0.5).mean().tolist()
    )
    assert out == pytest.approx(oracle)
    assert df.select(pl.col("v").ewm_sum(alpha=0.5).over("g")).to_series().to_list() == pytest.approx(
        [1.0, 2.5, 4.25, 10.0, 25.0]
    )
    assert df.select(pl.col("v").rolling_sum_by("t", "2d").over("g")).to_series().to_list() == [
        1.0, 3.0, 5.0, 10.0, 30.0
    ]
    assert df.select(pl.col("v").ewm_mean_by("t", half_life="1d").over("g")).to_series().to_list() == pytest.approx(
        [1.0, 1.5, 2.25, 10.0, 15.0]
    )


def test_name_fields_and_replace():
    df = pl.DataFrame({"st": [{"a": 1, "b": 2}], "x": [5]})
    out = df.select(pl.col("st").name.prefix_fields("p_"))
    assert [f.name for f in out.schema["st"].fields] == ["p_a", "p_b"]
    assert out.to_series().to_list() == [{"p_a": 1, "p_b": 2}]
    out2 = df.select(pl.col("st").name.suffix_fields("_s").struct.field("a_s"))
    assert out2.rows() == [(1,)]
    out3 = df.select(pl.col("st").name.map_fields(lambda n: n.upper()))
    assert [f.name for f in out3.schema["st"].fields] == ["A", "B"]
    assert df.select(pl.col("x").name.replace("x", "y")).columns == ["y"]
    assert df.select(pl.col("x").name.replace("^(.)$", r"c_\1")).columns == ["c_x"]


def test_meta_tail():
    e = (pl.col("x") * 2).alias("z")
    assert e.meta.undo_aliases().meta.output_name() == "x"
    assert pl.col("x").meta.is_column_selection()
    assert not pl.col("x").meta.is_literal()
    assert pl.lit(1).meta.is_literal()
    assert len((pl.col("x") + pl.col("y")).meta.pop()) == 2
    sel = pl.col("x").meta.as_selector()
    assert pl.DataFrame({"x": [1], "y": [2]}).select(sel).columns == ["x"]
    assert isinstance(pl.col("x").meta.show_graph(show=False), str)
    assert pl.col("x").meta.write_json() == pl.col("x").meta.serialize()
