"""I/O roundtrips + scan pushdowns (mirrors py-polars tests/unit/io)."""

import datetime as dtm
import io

import numpy as np
import pytest

import polars_tpu as pl
from polars_tpu.testing import assert_frame_equal


@pytest.fixture
def df() -> pl.DataFrame:
    return pl.DataFrame(
        {
            "i": [1, 2, 3, None],
            "f": [1.5, None, 3.5, 4.5],
            "s": ["a", "b", None, "d"],
            "b": [True, False, True, None],
            "d": [dtm.date(2024, 1, 1), dtm.date(2024, 6, 1), None, dtm.date(2025, 1, 1)],
        }
    )


def test_parquet_roundtrip(tmp_path, df):
    p = tmp_path / "t.parquet"
    df.write_parquet(p)
    out = pl.read_parquet(p)
    assert_frame_equal(df, out)


def test_parquet_scan_projection(tmp_path, df):
    p = tmp_path / "t.parquet"
    df.write_parquet(p)
    lf = pl.scan_parquet(p).select("i", "s")
    out = lf.collect()
    assert out.columns == ["i", "s"]
    assert out.get_column("i").to_list() == [1, 2, 3, None]


def test_parquet_scan_predicate(tmp_path, df):
    p = tmp_path / "t.parquet"
    df.write_parquet(p)
    out = pl.scan_parquet(p).filter(pl.col("i") >= 2).collect()
    assert out.get_column("i").to_list() == [2, 3]


def test_parquet_row_group_pruning(tmp_path):
    big = pl.DataFrame({"x": list(range(10000))})
    p = tmp_path / "rg.parquet"
    big.write_parquet(p, row_group_size=1000)
    out = pl.scan_parquet(p).filter(pl.col("x") >= 9995).collect()
    assert out.get_column("x").to_list() == [9995, 9996, 9997, 9998, 9999]


def test_parquet_multifile(tmp_path, df):
    df.write_parquet(tmp_path / "a.parquet")
    df.write_parquet(tmp_path / "b.parquet")
    out = pl.scan_parquet(str(tmp_path / "*.parquet")).collect()
    assert out.height == df.height * 2


def test_scan_n_rows(tmp_path, df):
    p = tmp_path / "t.parquet"
    df.write_parquet(p)
    out = pl.scan_parquet(p, n_rows=2).collect()
    assert out.height == 2
    out2 = pl.scan_parquet(p).head(3).collect()
    assert out2.height == 3


def test_csv_roundtrip(tmp_path, df):
    p = tmp_path / "t.csv"
    df.write_csv(p)
    out = pl.read_csv(p)
    assert out.get_column("i").to_list() == [1, 2, 3, None]
    assert out.get_column("s").to_list() == ["a", "b", None, "d"]
    assert out.get_column("b").to_list() == [True, False, True, None]


def test_csv_string_output(df):
    text = df.write_csv()
    assert text.splitlines()[0] == "i,f,s,b,d"


def test_csv_overrides(tmp_path):
    p = tmp_path / "o.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    out = pl.read_csv(p, schema_overrides={"a": pl.Float64})
    assert out.schema["a"] == pl.Float64


def test_csv_no_header(tmp_path):
    p = tmp_path / "nh.csv"
    p.write_text("1,x\n2,y\n")
    out = pl.read_csv(p, has_header=False)
    assert out.columns == ["column_1", "column_2"]


def test_ipc_roundtrip(tmp_path, df):
    p = tmp_path / "t.arrow"
    df.write_ipc(p)
    out = pl.read_ipc(p)
    assert_frame_equal(df, out)


def test_ndjson_roundtrip(tmp_path, df):
    p = tmp_path / "t.ndjson"
    df.drop("d").write_ndjson(p)
    out = pl.read_ndjson(p)
    assert out.get_column("i").to_list() == [1, 2, 3, None]


def test_sink_parquet(tmp_path, df):
    p = tmp_path / "sink.parquet"
    df.lazy().filter(pl.col("i") == 1).sink_parquet(p)
    out = pl.read_parquet(p)
    assert out.height == 1


def test_arrow_roundtrip(df):
    t = df.to_arrow()
    back = pl.from_arrow(t)
    assert_frame_equal(df, back)


def test_pandas_roundtrip(df):
    pdf = df.to_pandas()
    back = pl.from_pandas(pdf)
    assert back.get_column("i").to_list() == [1, 2, 3, None]


def test_parquet_preserves_nan_vs_null():
    df = pl.DataFrame({"f": [1.5, None, float("nan")]})
    df.write_parquet("/tmp/_nan.parquet")
    out = pl.read_parquet("/tmp/_nan.parquet").get_column("f").to_list()
    assert out[0] == 1.5 and out[1] is None and out[2] != out[2]
    a = df.to_arrow().column("f").to_pylist()
    assert a[1] is None and a[2] != a[2]


def test_parquet_binary_column_scan_filter():
    df = pl.DataFrame({"i": [1, 2], "bin": pl.Series("bin", [b"ab", b"\x00\xff"], dtype=pl.Binary)})
    df.write_parquet("/tmp/_bin.parquet")
    out = pl.scan_parquet("/tmp/_bin.parquet").filter(pl.col("i") == 2).collect()
    assert out.get_column("bin").to_list() == [b"\x00\xff"]
    assert out.schema["bin"] == pl.Binary()


def test_parquet_categorical_round_trip():
    df = pl.DataFrame({"c": pl.Series("c", ["p", None, "q"], dtype=pl.Categorical)})
    df.write_parquet("/tmp/_cat.parquet")
    rt = pl.read_parquet("/tmp/_cat.parquet")
    assert rt.schema["c"] == pl.Categorical()
    assert rt.get_column("c").to_list() == ["p", None, "q"]


def test_write_parquet_partition_by(tmp_path):
    base = tmp_path / "hive"
    pl.DataFrame({"k": ["a", "a", "b"], "v": [1, 2, 3]}).write_parquet(
        str(base), partition_by=["k"])
    out = pl.scan_parquet(str(base) + "/**/*.parquet", hive_partitioning=True)
    assert out.filter(pl.col("k") == "a").collect().height == 2
    assert pl.scan_parquet(str(base) + "/**/*.parquet").collect().height == 3


def test_ndjson_temporal_values_round_trip():
    from datetime import date, datetime

    df = pl.DataFrame({
        "d": pl.Series("d", [date(2021, 1, 1), None], dtype=pl.Date),
        "t": pl.Series("t", [datetime(2021, 1, 1, 12), None], dtype=pl.Datetime("us")),
    })
    df.write_ndjson("/tmp/_nd.ndjson")
    rt = pl.read_ndjson("/tmp/_nd.ndjson")
    # pyarrow infers ISO strings as timestamps; VALUES must be exact
    assert rt.get_column("t").to_list() == df.get_column("t").to_list()
    assert rt.get_column("d").cast(pl.Date).to_list() == df.get_column("d").to_list()
