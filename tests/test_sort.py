"""Sorting (mirrors py-polars tests/unit/operations/test_sort.py)."""

import numpy as np

import polars_tpu as pl


def test_sort_basic():
    df = pl.DataFrame({"a": [3, 1, 2]})
    assert df.sort("a").get_column("a").to_list() == [1, 2, 3]
    assert df.sort("a", descending=True).get_column("a").to_list() == [3, 2, 1]


def test_sort_nulls():
    df = pl.DataFrame({"a": [3, None, 1]})
    assert df.sort("a").get_column("a").to_list() == [None, 1, 3]
    assert df.sort("a", nulls_last=True).get_column("a").to_list() == [1, 3, None]
    assert df.sort("a", descending=True, nulls_last=True).get_column("a").to_list() == [3, 1, None]


def test_sort_multi():
    df = pl.DataFrame({"a": [1, 2, 1, 2], "b": [4, 3, 2, 1]})
    out = df.sort("a", "b")
    assert out.rows() == [(1, 2), (1, 4), (2, 1), (2, 3)]
    out = df.sort(["a", "b"], descending=[False, True])
    assert out.rows() == [(1, 4), (1, 2), (2, 3), (2, 1)]


def test_sort_strings():
    df = pl.DataFrame({"s": ["banana", "apple", None, "cherry"]})
    out = df.sort("s", nulls_last=True)
    assert out.get_column("s").to_list() == ["apple", "banana", "cherry", None]


def test_sort_floats_nan():
    df = pl.DataFrame({"f": [2.0, float("nan"), 1.0, None]})
    out = df.sort("f", nulls_last=True)
    vals = out.get_column("f").to_list()
    assert vals[0] == 1.0 and vals[1] == 2.0
    assert vals[2] != vals[2]  # NaN sorts greatest
    assert vals[3] is None


def test_sort_stability():
    df = pl.DataFrame({"a": [1, 1, 1], "tag": ["x", "y", "z"]})
    out = df.sort("a")
    assert out.get_column("tag").to_list() == ["x", "y", "z"]


def test_sort_expr_key():
    df = pl.DataFrame({"a": [-3, 1, 2]})
    out = df.sort(pl.col("a").abs())
    assert out.get_column("a").to_list() == [1, 2, -3]


def test_top_bottom_k():
    df = pl.DataFrame({"a": [5, 1, 4, 2, 3]})
    assert sorted(df.top_k(2, by="a").get_column("a").to_list()) == [4, 5]
    assert sorted(df.bottom_k(2, by="a").get_column("a").to_list()) == [1, 2]


def test_sort_big_random():
    rng = np.random.default_rng(7)
    v = rng.normal(size=10_000)
    df = pl.DataFrame({"v": v})
    out = df.sort("v").get_column("v").to_list()
    assert out == sorted(v.tolist())


def test_sort_after_filter():
    df = pl.DataFrame({"a": [5, 1, 4, 2, 3]})
    out = df.lazy().filter(pl.col("a") > 2).sort("a", descending=True).collect()
    assert out.get_column("a").to_list() == [5, 4, 3]


def test_sort_date():
    import datetime as dtm

    df = pl.DataFrame({"d": [dtm.date(2024, 3, 1), dtm.date(2023, 1, 1), dtm.date(2024, 1, 1)]})
    out = df.sort("d")
    assert out.get_column("d").to_list() == [
        dtm.date(2023, 1, 1), dtm.date(2024, 1, 1), dtm.date(2024, 3, 1),
    ]
