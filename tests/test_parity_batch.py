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
    # grouped mode implodes to List; ties return every mode (reference
    # Expr.mode "can return multiple values")
    df = pl.DataFrame({"g": ["x", "x", "x", "y", "y"], "v": [1, 1, 2, 5, 7]})
    out = df.group_by("g").agg(pl.col("v").mode().alias("m")).sort("g")
    assert [sorted(m) for m in out["m"].to_list()] == [[1], [5, 7]]


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
    m = lf.match_to_schema(
        {"a": pl.Float64(), "b": pl.Float64(), "c": pl.Int64()},
        missing_columns="insert",
    ).collect()
    assert m.columns == ["a", "b", "c"]
    assert m["c"].to_list() == [None, None, None]


def test_arctan2_and_business_days():
    import datetime as d

    import numpy as np

    df = pl.DataFrame({"y": [1.0, -1.0, 0.0], "x": [1.0, 1.0, -2.0]})
    out = df.select(pl.arctan2("y", "x").alias("r"), pl.arctan2d("y", "x").alias("deg"))
    ref = np.arctan2([1.0, -1.0, 0.0], [1.0, 1.0, -2.0])
    assert np.allclose(out["r"].to_list(), ref)
    assert np.allclose(out["deg"].to_list(), np.degrees(ref))

    starts = [d.date(2020, 1, 1), d.date(2020, 1, 6), d.date(2020, 1, 4)]
    ends = [d.date(2020, 1, 8), d.date(2020, 1, 3), d.date(2020, 1, 5)]
    df = pl.DataFrame({"s": starts, "e": ends})
    hol = [d.date(2020, 1, 2)]
    got = df.select(pl.business_day_count("s", "e", holidays=hol).alias("n"))["n"].to_list()
    ref = [int(np.busday_count(a, b, holidays=["2020-01-02"])) for a, b in zip(starts, ends)]
    assert got == ref
    got = df.select(
        pl.business_day_count("s", "e", week_mask=(1, 1, 1, 1, 0, 0, 1)).alias("n")
    )["n"].to_list()
    ref = [int(np.busday_count(a, b, weekmask="1111001")) for a, b in zip(starts, ends)]
    assert got == ref


def test_concat_list_and_ranges():
    df = pl.DataFrame({"a": [1, 2, None], "b": [4, 3, 8]})
    assert df.select(pl.concat_list(["a", "b"]).alias("l"))["l"].to_list() == [
        [1, 4], [2, 3], [None, 8],
    ]
    arr = df.select(pl.concat_arr("a", "b").alias("r"))["r"]
    assert type(arr.dtype).__name__ == "Array"
    assert arr.to_list() == [[1, 4], [2, 3], [None, 8]]
    assert df.select(pl.int_ranges("a", "b").alias("r"))["r"].to_list() == [
        [1, 2, 3], [2], None,
    ]
    # concat_list fuses with downstream list aggs in one segment
    assert df.select(pl.concat_list(["a", "b"]).list.sum().alias("s"))["s"].to_list() == [5, 5, 8]


def test_date_ranges_and_linear_spaces():
    import datetime as d

    df = pl.DataFrame({"s": [d.date(2020, 1, 1), d.date(2020, 1, 5)],
                       "e": [d.date(2020, 1, 3), d.date(2020, 1, 5)]})
    out = df.select(pl.date_ranges("s", "e").alias("r"))["r"].to_list()
    assert out == [[d.date(2020, 1, 1), d.date(2020, 1, 2), d.date(2020, 1, 3)],
                   [d.date(2020, 1, 5)]]
    ls = pl.DataFrame({"x": [0.0, 1.0]}).select(
        pl.linear_spaces("x", 2.0, 3).alias("r"))["r"].to_list()
    assert ls == [[0.0, 1.0, 2.0], [1.0, 1.5, 2.0]]
    assert pl.linear_space(0, 1, 5, eager=True).to_list() == [0.0, 0.25, 0.5, 0.75, 1.0]
    assert pl.linear_space(0, 1, 4, closed="left", eager=True).to_list() == [0.0, 0.25, 0.5, 0.75]


def test_time_range_and_time():
    import datetime as d

    out = pl.select(pl.time_range(d.time(1, 0), d.time(5, 0), "2h"))["time"].to_list()
    assert out == [d.time(1, 0), d.time(3, 0), d.time(5, 0)]
    assert pl.select(pl.time(12, 30, 5))["time"].to_list() == [d.time(12, 30, 5)]


def test_rolling_corr_cov():
    import pandas as pd

    a = [1.0, 2.0, 4.0, 8.0, 16.0]
    b = [2.0, 1.0, 3.0, 2.0, 5.0]
    df = pl.DataFrame({"a": a, "b": b})
    out = df.select(
        pl.rolling_corr("a", "b", window_size=3).alias("c"),
        pl.rolling_cov("a", "b", window_size=3).alias("v"),
    )
    pc = pd.Series(a).rolling(3).corr(pd.Series(b)).tolist()
    pv = pd.Series(a).rolling(3).cov(pd.Series(b)).tolist()
    for got, ref in ((out["c"].to_list(), pc), (out["v"].to_list(), pv)):
        for g, r in zip(got, ref):
            assert (g is None and r != r) or abs(g - r) < 1e-9


def test_cum_fold_count_reduce():
    df = pl.DataFrame({"x": [1, 2], "y": [3, 4], "z": [5, 6]})
    out = df.select(pl.cum_fold(0, lambda a, b: a + b, ["x", "y", "z"]))["cum_fold"].to_list()
    assert out == [{"x": 1, "y": 4, "z": 9}, {"x": 2, "y": 6, "z": 12}]
    assert df.select(pl.cum_count("x"))["x"].to_list() == [1, 2]
    out = df.select(pl.cum_sum_horizontal("x", "y"))["cum_sum"].to_list()
    assert out == [{"x": 1, "y": 4}, {"x": 2, "y": 6}]


def test_align_frames_and_misc():
    f1 = pl.DataFrame({"k": [1, 2], "v": [10, 20]})
    f2 = pl.DataFrame({"k": [2, 3], "v": [200, 300]})
    a1, a2 = pl.align_frames(f1, f2, on="k")
    assert a1["k"].to_list() == a2["k"].to_list() == [1, 2, 3]
    assert a1["v"].to_list() == [10, 20, None]
    assert a2["v"].to_list() == [None, 200, 300]
    assert pl.escape_regex("a.b") == "a\\.b"
    assert pl.get_index_type() == pl.UInt32()
    assert pl.thread_pool_size() >= 1
    node = pl.sql_expr("a + 1")._node
    assert type(node).__name__ == "EBinary"
    with pl.StringCache():
        assert pl.using_string_cache() is False
    import datetime as d

    got = pl.select(pl.from_epoch(pl.lit(86400), "s").alias("t"))["t"].to_list()
    assert got == [d.datetime(1970, 1, 2)]


def test_time_ranges():
    import datetime as d

    df = pl.DataFrame({"s": [d.time(1, 0), d.time(10, 30), None],
                       "e": [d.time(3, 0), d.time(11, 0), d.time(1, 0)]})
    out = df.select(pl.time_ranges("s", "e").alias("r"))["r"].to_list()
    assert out == [[d.time(1, 0), d.time(2, 0), d.time(3, 0)], [d.time(10, 30)], None]


def test_interop_long_tail():
    import io as _io

    import pyarrow as pa
    import torch

    assert pl.from_torch(torch.tensor([1.0, 2.0])).to_list() == [1.0, 2.0]
    assert pl.from_torch(torch.arange(6).reshape(3, 2)).shape == (3, 2)

    df = pl.DataFrame({"a": [1, 2], "b": ["x", "y"], "c": [1.5, None]})
    back = pl.from_repr(repr(df))
    assert dict(back.schema) == dict(df.schema)
    assert back["a"].to_list() == [1, 2]
    assert back["c"].to_list() == [1.5, None]
    # polars-style body separators
    b2 = pl.from_repr(
        "│ a   ┆ b   │\n│ --- ┆ --- │\n│ i64 ┆ str │\n│ 1   ┆ foo │\n│ 2   ┆ bar │"
    )
    assert b2["b"].to_list() == ["foo", "bar"]

    out = pl.json_normalize([{"a": 1, "b": {"c": 2, "d": {"e": 3}}}, {"a": 4, "b": {"c": 5}}])
    assert out.columns == ["a", "b.c", "b.d.e"]
    assert out.row(1) == (4, 5, None)

    d = pl.defer(lambda: pl.DataFrame({"x": [1, 2]}), schema={"x": pl.Int64()})
    assert d.collect()["x"].to_list() == [1, 2]

    buf = _io.BytesIO()
    t = pa.table({"a": [1, 2, 3]})
    with pa.ipc.new_stream(buf, t.schema) as w:
        w.write_table(t)
    buf.seek(0)
    assert pl.read_ipc_stream(buf)["a"].to_list() == [1, 2, 3]
    assert pl.scan_arrow_c_stream(t).collect()["a"].to_list() == [1, 2, 3]

    assert isinstance(pl.Float16(), pl.DataType)
    assert pl.QueryOptFlags.none().predicate_pushdown is False
    import pytest as _pytest

    with _pytest.raises(ImportError):
        pl.read_excel("missing.xlsx")
    with _pytest.raises(NotImplementedError):
        pl.plugins.register_plugin_function(function_name="f")


def test_io_long_tail(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = tmp_path / "t.txt"
    p.write_text("hello\nworld\n")
    assert pl.read_lines(str(p))["lines"].to_list() == ["hello", "world"]
    assert pl.scan_lines(str(p)).collect().height == 2

    c = tmp_path / "t.csv"
    c.write_text("a,b\n1,2\n3,4\n")
    r = pl.read_csv_batched(str(c))
    batches = r.next_batches(5)
    assert batches[0]["a"].to_list() == [1, 3]
    assert r.next_batches(1) is None

    t = pa.table({"a": [1, 2]})
    pq.write_table(t, tmp_path / "t.parquet")
    assert pl.read_parquet_metadata(str(tmp_path / "t.parquet")) == {}
    import pyarrow.dataset as ds

    assert pl.scan_pyarrow_dataset(ds.dataset(tmp_path / "t.parquet")).collect()["a"].to_list() == [1, 2]

    f = tmp_path / "t.ipc"
    with pa.ipc.new_file(str(f), t.schema) as w:
        w.write_table(t)
    sch = pl.read_ipc_schema(str(f))
    assert list(sch) == ["a"]


def test_map_batches_and_groups():
    import numpy as np

    df = pl.DataFrame({"g": ["a", "a", "b"], "x": [1.0, 2.0, 3.0], "y": [10.0, 20.0, 30.0]})
    out = df.select(pl.map_batches(["x", "y"], lambda ss: ss[0] + ss[1]).alias("s"))
    assert out["s"].to_list() == [11.0, 22.0, 33.0]

    f = lambda ss: float(np.dot(ss[0].to_numpy(), ss[1].to_numpy()))  # noqa: E731
    out = df.group_by("g").agg(
        pl.map_groups(["x", "y"], f, returns_scalar=True).alias("d")
    ).sort("g")
    assert out["d"].to_list() == [50.0, 90.0]
    out = df.group_by("g").agg(pl.map_groups(["x", "y"], f).alias("d")).sort("g")
    assert out["d"].to_list() == [[50.0], [90.0]]


def test_datatype_expr():
    df = pl.DataFrame({"a": [1, 2], "b": [1.5, 2.5]})
    out = df.select(
        pl.lit(3).cast(pl.dtype_of("b")).alias("x"),
        pl.col("a").cast(pl.self_dtype()).alias("y"),
    )
    assert dict(out.schema) == {"x": pl.Float64(), "y": pl.Int64()}
    assert out["x"].to_list() == [3.0, 3.0]
    # lazy: projection pushdown must keep the dtype_of dependency alive
    lz = df.lazy().select(pl.col("a").cast(pl.dtype_of("b")))
    assert dict(lz.collect().schema) == {"a": pl.Float64()}
    st = pl.struct_with_fields({"p": pl.Int64(), "q": pl.dtype_of("b")})
    assert st.collect_dtype(df.schema) == pl.Struct([("p", pl.Int64()), ("q", pl.Float64())])
    assert pl.Int32().to_dtype_expr().collect_dtype({}) == pl.Int32()


def test_partitioned_sink(tmp_path):
    import os

    lf = pl.DataFrame({"year": [2026, 2027, 2026, None], "v": [1, 2, 3, 4]}).lazy()
    lf.sink_parquet(pl.PartitionBy(str(tmp_path / "data"), key="year"))
    dirs = sorted(os.listdir(tmp_path / "data"))
    assert dirs == ["year=2026", "year=2027", "year=__HIVE_DEFAULT_PARTITION__"]
    back = pl.scan_parquet(str(tmp_path / "data/**/*.parquet"), hive_partitioning=True).collect()
    rows = sorted(back.rows(), key=lambda r: r[1])
    assert rows == [(2026, 1), (2027, 2), (2026, 3), (None, 4)]

    lf.sink_parquet(pl.PartitionBy(str(tmp_path / "rows"), max_rows_per_file=2))
    assert sorted(os.listdir(tmp_path / "rows")) == ["00000000.parquet", "00000001.parquet"]

    lf.sink_csv(pl.PartitionBy(
        str(tmp_path / "csv"), key="year", include_key=False,
        file_path_provider=lambda a: str(tmp_path / "csv" / f"p{a.part}_{a.in_part_index}.csv"),
    ))
    assert sorted(os.listdir(tmp_path / "csv")) == ["p0_0.csv", "p1_0.csv", "p2_0.csv"]
    assert open(tmp_path / "csv" / "p0_0.csv").read().splitlines()[0] == "v"


def test_groups_list_and_categories():
    import warnings

    df = pl.DataFrame({"a": [1, 2, 3], "b": [10, 20, 30]})
    assert df.select(pl.list(["a", "b"]).alias("l"))["l"].to_list() == [[1, 10], [2, 20], [3, 30]]
    out = df.group_by((pl.col("a") > 1).alias("g")).agg(
        pl.col("b").agg_groups().alias("idx")
    ).sort("g")
    assert out["idx"].to_list() == [[0], [1, 2]]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        out = df.group_by((pl.col("a") > 1).alias("g")).agg(pl.groups("b")).sort("g")
    assert out["b"].to_list() == [[0], [1, 2]]

    assert pl.Categories("f") == pl.Categories("f")
    assert pl.Categories("f") != pl.Categories("g")
    assert pl.Categories.random().name
    assert isinstance(pl.ScanCastOptions(), pl.ScanCastOptions)
    assert pl.CredentialProviderAWS(profile_name="x").profile_name == "x"
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        pl.CredentialProviderGCP()()


def test_extension_types():
    class Point(pl.BaseExtension):
        __slots__ = ()

    pl.register_extension_type("point_t", Point)
    try:
        assert pl.get_extension_type("point_t") is Point
        p = Point("point_t", pl.Struct([("x", pl.Float64()), ("y", pl.Float64())]))
        assert p.ext_name() == "point_t"
        assert p.ext_storage() == pl.Struct([("x", pl.Float64()), ("y", pl.Float64())])
        assert p == Point.ext_from_params("point_t", p.ext_storage(), None)
        import pytest as _pytest

        with _pytest.raises(ValueError):
            pl.register_extension_type("point_t", Point)
    finally:
        pl.unregister_extension_type("point_t")
    assert pl.get_extension_type("point_t") is None
