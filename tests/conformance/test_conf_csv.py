"""CSV/NDJSON read edge behavior (reference: py-polars tests/unit/io/test_csv.py)."""

import os
from datetime import date

import pytest

import polars_tpu as pl


@pytest.fixture()
def csvfile(tmp_path):
    def write(content, name="t.csv"):
        p = os.path.join(tmp_path, name)
        with open(p, "w") as f:
            f.write(content)
        return p

    return write


def test_quoted_fields_and_escapes(csvfile):
    p = csvfile('a,b,c\n1,"x,y",2.5\n,z,\n3,"q""q",1e3\n')
    df = pl.read_csv(p)
    assert df.to_dicts() == [
        {"a": 1, "b": "x,y", "c": 2.5},
        {"a": None, "b": "z", "c": None},
        {"a": 3, "b": 'q"q', "c": 1000.0},
    ]


def test_null_values_and_separator(csvfile):
    p = csvfile("a;b\nNA;1\nfoo;2\n")
    df = pl.read_csv(p, separator=";", null_values=["NA"])
    assert df["a"].to_list() == [None, "foo"]


def test_skip_rows_no_header(csvfile):
    p = csvfile("junk\n1,2\n3,4\n")
    df = pl.read_csv(p, skip_rows=1, has_header=False)
    assert df.columns == ["column_1", "column_2"]
    assert df.rows() == [(1, 2), (3, 4)]


def test_comment_prefix(csvfile):
    p = csvfile("a,b\n# a comment line\n1,2\n")
    assert pl.read_csv(p, comment_prefix="#").rows() == [(1, 2)]


def test_schema_overrides_and_dates(csvfile):
    p = csvfile("a,d\n1,2021-01-02\n")
    df = pl.read_csv(p, schema_overrides={"a": pl.Float64()}, try_parse_dates=True)
    assert df.schema["a"] == pl.Float64()
    assert df["d"].to_list() == [date(2021, 1, 2)]


def test_n_rows_columns_new_columns(csvfile):
    p = csvfile("a,b\n1,2\n3,4\n5,6\n")
    assert pl.read_csv(p, n_rows=2).height == 2
    assert pl.read_csv(p, columns=["b"]).columns == ["b"]
    assert pl.read_csv(p, new_columns=["x", "y"]).columns == ["x", "y"]


def test_schema_cache_sees_rewrites(csvfile):
    p = csvfile("a,b\n1,2\n")
    assert pl.read_csv(p).columns == ["a", "b"]
    import time

    time.sleep(0.01)
    with open(p, "w") as f:
        f.write("z\n5\n")
    assert pl.read_csv(p).columns == ["z"]


def test_row_index(csvfile):
    p = csvfile("a\n10\n20\n")
    df = pl.read_csv(p, row_index_name="idx", row_index_offset=5)
    assert df["idx"].to_list() == [5, 6]


def test_csv_roundtrip_types(tmp_path):
    df = pl.DataFrame(
        {"i": [1, None], "f": [1.5, None], "s": ["a,b", None], "b": [True, False]}
    )
    p = os.path.join(tmp_path, "rt.csv")
    df.write_csv(p)
    back = pl.read_csv(p)
    assert back["i"].to_list() == [1, None]
    assert back["f"].to_list() == [1.5, None]
    assert back["s"].to_list() == ["a,b", None]
    assert back["b"].to_list() == [True, False]


def test_ndjson_roundtrip(tmp_path):
    df = pl.DataFrame({"a": [1, 2], "s": ["x", None]})
    p = os.path.join(tmp_path, "t.ndjson")
    df.write_ndjson(p)
    assert pl.read_ndjson(p).to_dicts() == df.to_dicts()
