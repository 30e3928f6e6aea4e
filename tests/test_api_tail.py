"""Round-3 Series/DataFrame/LazyFrame API tail (reference: py-polars
series/series.py, dataframe/frame.py, lazyframe/frame.py)."""

from datetime import datetime

import pytest

import polars_tpu as pl


# -- Series --------------------------------------------------------------------


def test_series_scatter_set_zip():
    s = pl.Series("a", [3, 1, 2, None])
    assert s.scatter([0, 1], [9, 8]).to_list() == [9, 8, 2, None]
    assert pl.Series("a", [1, 2, 3]).set(pl.Series("", [True, False, True]), 0).to_list() == [0, 2, 0]
    assert pl.Series("a", [1, 2, 3]).zip_with(
        pl.Series("", [True, False, True]), pl.Series("", [9, 9, 9])
    ).to_list() == [1, 9, 3]


def test_series_utility_methods():
    s = pl.Series("a", [3, 1, 2, None])
    assert s.n_chunks() == 1
    assert s.chunk_lengths() == [4]
    assert len(s.get_chunks()) == 1
    assert s.rechunk().to_list() == s.to_list()
    assert s.clear().to_list() == []
    assert s.clear(2).to_list() == [None, None]
    assert s.clear().dtype == s.dtype
    assert s.has_validity() is True
    assert pl.Series("b", [1]).has_validity() is False
    assert s.estimated_size() > 0
    assert s.estimated_size("kb") == s.estimated_size() / 1024
    assert s.new_from_index(0, 3).to_list() == [3, 3, 3]
    assert "pl.Series" in pl.Series("a", [1]).to_init_repr()


def test_series_describe_dummies_sql():
    d = pl.Series("a", [1.0, 2.0, 3.0]).describe()
    stats = dict(zip(d["statistic"].to_list(), d["value"].to_list()))
    assert stats["count"] == 3.0 and stats["mean"] == 2.0
    assert pl.Series("g", ["x", "y", "x"]).to_dummies().to_dicts() == [
        {"g_x": 1, "g_y": 0}, {"g_x": 0, "g_y": 1}, {"g_x": 1, "g_y": 0}
    ]
    assert pl.Series("a", [1, 2, 3]).sql("select a*2 as a from self").to_list() == [2, 4, 6]


def test_series_to_torch():
    import torch

    t = pl.Series("a", [1, 2, 3]).to_torch()
    assert isinstance(t, torch.Tensor)
    assert t.tolist() == [1, 2, 3]


# -- DataFrame -----------------------------------------------------------------


def test_frame_flags_and_is_sorted():
    df = pl.DataFrame({"k": ["a", "a", "b"], "v": [1, 2, 3]})
    assert df.flags["v"] == {"SORTED_ASC": False, "SORTED_DESC": False}
    assert df.set_sorted("v").flags["v"]["SORTED_ASC"] is True
    assert df.is_sorted("v") is True
    assert df.sort("v", descending=True).is_sorted("v") is False
    assert df.is_sorted(["k", "v"]) is True


def test_frame_map_columns_rows_remove():
    df = pl.DataFrame({"k": ["a", "a", "b"], "v": [1, 2, 3]})
    assert df.map_columns("v", lambda s: s * 10)["v"].to_list() == [10, 20, 30]
    out = df.select("v").map_rows(lambda r: (r[0] * 2, r[0] + 1))
    assert out.to_dicts()[0] == {"column_0": 2, "column_1": 2}
    assert df.remove(pl.col("v") > 1)["v"].to_list() == [1]


def test_frame_rows_by_key():
    df = pl.DataFrame({"k": ["a", "a", "b"], "v": [1, 2, 3]})
    assert df.rows_by_key("k") == {"a": [(1,), (2,)], "b": [(3,)]}
    assert df.rows_by_key("k", named=True, unique=True) == {
        "a": {"v": 2}, "b": {"v": 3}
    }
    assert df.rows_by_key("k", include_key=True)["b"] == [("b", 3)]


def test_frame_serialize_roundtrip():
    df = pl.DataFrame({"k": ["a", "b"], "v": [1.5, None]})
    assert pl.DataFrame.deserialize(df.serialize()).to_dicts() == df.to_dicts()
    assert pl.DataFrame.deserialize(df.serialize(format="json"), format="json").to_dicts() == df.to_dicts()


def test_frame_unstack_upsample():
    assert pl.DataFrame({"x": [1, 2, 3, 4]}).unstack(step=2).to_dicts() == [
        {"x_0": 1, "x_1": 3}, {"x_0": 2, "x_1": 4}
    ]
    up = pl.DataFrame(
        {"t": [datetime(2021, 1, 1), datetime(2021, 1, 4)], "v": [1, 2]}
    ).upsample("t", every="1d")
    assert up.height == 4
    assert up["v"].to_list() == [1, None, None, 2]
    upg = pl.DataFrame(
        {
            "g": ["a", "a", "b"],
            "t": [datetime(2021, 1, 1), datetime(2021, 1, 3), datetime(2021, 1, 1)],
            "v": [1, 2, 3],
        }
    ).upsample("t", every="1d", group_by="g")
    assert upg.height == 4


def test_frame_match_to_schema():
    df = pl.DataFrame({"k": ["a"], "v": [1]})
    assert df.match_to_schema({"k": pl.String(), "v": pl.Int64()}).columns == ["k", "v"]
    with pytest.raises(Exception):
        df.match_to_schema({"k": pl.String()})  # extra column v
    out = df.match_to_schema(
        {"k": pl.String(), "v": pl.Int64(), "z": pl.Int32()},
        missing_columns="insert",
    )
    assert out["z"].to_list() == [None]
    with pytest.raises(Exception):
        df.match_to_schema({"k": pl.String(), "v": pl.Int32()})  # downcast forbidden
    ok = df.match_to_schema({"k": pl.String(), "v": pl.Int64()}, integer_cast="upcast")
    assert ok["v"].to_list() == [1]


def test_frame_write_database_sqlite():
    import sqlite3

    conn = sqlite3.connect(":memory:")
    df = pl.DataFrame({"a": [1, 2, 3]})
    assert df.write_database("t", conn) == 3
    assert conn.execute("select count(*) from t").fetchone() == (3,)


def test_frame_write_ipc_stream():
    import io

    import pyarrow.ipc as pa_ipc

    df = pl.DataFrame({"a": [1, 2]})
    buf = io.BytesIO()
    df.write_ipc_stream(buf)
    assert pa_ipc.open_stream(io.BytesIO(buf.getvalue())).read_all().num_rows == 2


# -- LazyFrame -----------------------------------------------------------------


def test_lazy_gather_pipe_pivot():
    lf = pl.DataFrame({"k": ["a", "b", "a"], "v": [1, 2, 3]}).lazy()
    assert lf.gather([0, 2]).collect().to_dicts() == [
        {"k": "a", "v": 1}, {"k": "a", "v": 3}
    ]
    assert lf.pipe_with_schema(lambda l, s: l.select(list(s.names()))).collect().columns == ["k", "v"]
    piv = lf.pivot("k", values="v", aggregate_function="sum").collect()
    assert piv.to_dicts() == [{"a": 4, "b": 2}]


def test_lazy_sink_batches():
    lf = pl.DataFrame({"v": list(range(10))}).lazy()
    got = []
    lf.sink_batches(lambda b: got.append(b.height))
    assert sum(got) == 10
    # early stop
    got2 = []
    lf.sink_batches(lambda b: got2.append(b.height) or True, chunk_size=4)
    assert len(got2) == 1


def test_lazy_shims_raise():
    lf = pl.DataFrame({"v": [1]}).lazy()
    with pytest.raises(Exception):
        lf.with_context(lf)
    with pytest.raises(Exception):
        lf.remote()
