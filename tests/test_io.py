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
