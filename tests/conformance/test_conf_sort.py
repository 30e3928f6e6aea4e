"""Conformance slice adapted from the reference behavioral suite
(py-polars/tests/unit/operations/test_sort.py) — sort stability, null
placement, NaN total order, multi-key and by-expression sorts."""

from datetime import date

import pytest

import polars_tpu as pl
from polars_tpu import datatypes as dtt

NAN = float("nan")


def test_sort_basic():
    df = pl.DataFrame({"a": [2, 1, 3], "b": ["x", "y", "z"]})
    assert df.sort("a")["a"].to_list() == [1, 2, 3]
    assert df.sort("a", descending=True)["a"].to_list() == [3, 2, 1]
    assert df.sort("a")["b"].to_list() == ["y", "x", "z"]


def test_sort_nulls_default_first_like_smallest():
    # polars: nulls sort FIRST ascending by default (nulls_last=False)
    df = pl.DataFrame({"a": [3, None, 1]})
    assert df.sort("a")["a"].to_list() == [None, 1, 3]
    assert df.sort("a", nulls_last=True)["a"].to_list() == [1, 3, None]
    # descending keeps nulls at the chosen end
    assert df.sort("a", descending=True)["a"].to_list() == [None, 3, 1]
    assert df.sort("a", descending=True, nulls_last=True)["a"].to_list() == [3, 1, None]


def test_sort_nan_total_order():
    # NaN sorts as the GREATEST value (after +inf), nulls separate
    df = pl.DataFrame({"a": [1.0, NAN, float("inf"), None, -1.0]})
    out = df.sort("a", nulls_last=True)["a"].to_list()
    assert out[0] == -1.0 and out[1] == 1.0 and out[2] == float("inf")
    assert out[3] != out[3]  # NaN
    assert out[4] is None


def test_sort_multi_key_mixed_order():
    df = pl.DataFrame({"a": [1, 1, 2, 2], "b": [4, 3, 2, 1]})
    out = df.sort(["a", "b"], descending=[False, True])
    assert out.rows() == [(1, 4), (1, 3), (2, 2), (2, 1)]
    out2 = df.sort("a", "b")
    assert out2.rows() == [(1, 3), (1, 4), (2, 1), (2, 2)]


def test_sort_stability():
    df = pl.DataFrame({"k": [1, 1, 1, 1], "i": [0, 1, 2, 3]})
    assert df.sort("k")["i"].to_list() == [0, 1, 2, 3]
    # equal keys keep input order under descending too (stable sort)
    assert df.sort("k", descending=True)["i"].to_list() == [0, 1, 2, 3]


def test_sort_by_expression():
    df = pl.DataFrame({"a": [-3, 1, 2]})
    out = df.sort(pl.col("a").abs())
    assert out["a"].to_list() == [1, 2, -3]


def test_sort_strings_and_categoricals():
    df = pl.DataFrame({"s": ["pear", "apple", None, "fig"]})
    assert df.sort("s")["s"].to_list() == [None, "apple", "fig", "pear"]
    cat = df.with_columns(pl.col("s").cast(dtt.Categorical()))
    assert cat.sort("s")["s"].to_list() == [None, "apple", "fig", "pear"]


def test_sort_booleans_dates():
    df = pl.DataFrame({"b": [True, False, None]})
    assert df.sort("b")["b"].to_list() == [None, False, True]
    dd = pl.DataFrame({"d": [date(2021, 3, 1), date(2020, 1, 1), None]})
    assert dd.sort("d")["d"].to_list() == [None, date(2020, 1, 1), date(2021, 3, 1)]


def test_sort_empty_and_single():
    df = pl.DataFrame({"a": pl.Series([], dtype=dtt.Int64())})
    assert df.sort("a").height == 0
    one = pl.DataFrame({"a": [5]})
    assert one.sort("a")["a"].to_list() == [5]


def test_arg_sort_and_expr_sort():
    s = pl.Series("a", [2, 1, 3])
    assert s.arg_sort().to_list() == [1, 0, 2]
    df = pl.DataFrame({"a": [2, 1, 3]})
    out = df.select(pl.col("a").sort())
    assert out["a"].to_list() == [1, 2, 3]
    out2 = df.select(pl.col("a").sort(descending=True))
    assert out2["a"].to_list() == [3, 2, 1]


def test_expr_sort_by():
    df = pl.DataFrame({"g": [1, 1, 1], "a": [1, 2, 3], "b": [3, 1, 2]})
    out = df.select(pl.col("a").sort_by("b"))
    assert out["a"].to_list() == [2, 3, 1]
    out2 = df.select(pl.col("a").sort_by("b", descending=True))
    assert out2["a"].to_list() == [1, 3, 2]


def test_sort_by_multiple():
    df = pl.DataFrame({"a": [1, 2, 3, 4], "k1": [1, 1, 0, 0], "k2": [1, 0, 1, 0]})
    out = df.select(pl.col("a").sort_by(["k1", "k2"]))
    assert out["a"].to_list() == [4, 3, 2, 1]


def test_top_k_bottom_k():
    df = pl.DataFrame({"a": [5, 1, 8, 3]})
    assert sorted(df.select(pl.col("a").top_k(2))["a"].to_list()) == [5, 8]
    assert sorted(df.select(pl.col("a").bottom_k(2))["a"].to_list()) == [1, 3]
    out = df.sort("a", descending=True).head(2)
    assert out["a"].to_list() == [8, 5]


def test_lazy_sort_limit_is_topk():
    lf = pl.DataFrame({"a": [5, 1, 8, 3]}).lazy()
    out = lf.sort("a").limit(2).collect()
    assert out["a"].to_list() == [1, 3]
    out2 = lf.sort("a", descending=True).head(3).collect()
    assert out2["a"].to_list() == [8, 5, 3]


def test_sort_maintains_other_columns():
    df = pl.DataFrame(
        {"x": [3, 1, 2], "s": ["c", "a", "b"], "f": [3.0, 1.0, 2.0],
         "l": [[3], [1], [2]]}
    )
    out = df.sort("x")
    assert out["s"].to_list() == ["a", "b", "c"]
    assert out["f"].to_list() == [1.0, 2.0, 3.0]
    assert out["l"].to_list() == [[1], [2], [3]]


def test_sort_with_nulls_multi_key():
    df = pl.DataFrame({"a": [1, None, 1, None], "b": [2, 1, None, None]})
    out = df.sort("a", "b")
    assert out.rows() == [(None, None), (None, 1), (1, None), (1, 2)]
    out2 = df.sort("a", "b", nulls_last=True)
    assert out2.rows() == [(1, 2), (1, None), (None, 1), (None, None)]


def test_sort_per_key_null_placement():
    df = pl.DataFrame({"a": [1, None, 2], "b": [1, 2, 3]})
    out = df.sort("a", "b", nulls_last=[True, False])
    assert out.rows() == [(1, 1), (2, 3), (None, 2)]


def test_series_sort_api():
    s = pl.Series("s", [3, None, 1])
    assert s.sort().to_list() == [None, 1, 3]
    assert s.sort(descending=True).to_list() == [None, 3, 1]
    assert s.sort(nulls_last=True).to_list() == [1, 3, None]


def test_sort_idempotent_flags():
    df = pl.DataFrame({"a": [2, 1, 3]}).sort("a")
    # re-sorting a sorted frame is a no-op with identical output
    assert df.sort("a")["a"].to_list() == [1, 2, 3]


def test_reverse_and_shift_after_sort():
    df = pl.DataFrame({"a": [2, 1, 3]})
    assert df.sort("a").reverse()["a"].to_list() == [3, 2, 1]
    assert df.sort("a").select(pl.col("a").shift(1))["a"].to_list() == [None, 1, 2]


def test_sort_large_random_matches_python():
    import numpy as np

    rng = np.random.default_rng(7)
    vals = rng.integers(-1000, 1000, 500).tolist()
    df = pl.DataFrame({"a": vals})
    assert df.sort("a")["a"].to_list() == sorted(vals)
    fl = rng.normal(size=300).tolist()
    dff = pl.DataFrame({"a": fl})
    assert dff.sort("a")["a"].to_list() == sorted(fl)


def test_sort_u64_extremes():
    df = pl.DataFrame({"a": pl.Series([2**63 + 5, 1, 2**64 - 1, 0], dtype=dtt.UInt64())})
    assert df.sort("a")["a"].to_list() == [0, 1, 2**63 + 5, 2**64 - 1]


def test_sort_i64_extremes():
    lo, hi = -(2**63), 2**63 - 1
    df = pl.DataFrame({"a": [5, lo, hi, -1]})
    assert df.sort("a")["a"].to_list() == [lo, -1, 5, hi]


def test_search_sorted_ignores_padding():
    s = pl.Series("s", [1, 3, 5])
    assert s.search_sorted(4) == 2
    assert s.search_sorted(0) == 0
    assert s.search_sorted(9) == 3
    many = pl.DataFrame({"s": [1, 3, 5]}).select(
        pl.col("s").search_sorted([0, 4, 9])
    ).to_series().to_list()
    assert many == [0, 2, 3]
    s2 = pl.Series("s", [1, 2, 2, 3])
    assert s2.search_sorted(2, side="left") == 1
    assert s2.search_sorted(2, side="right") == 3


def test_sort_sets_sortedness_flags():
    df = pl.DataFrame({"a": [3, 1, 2], "b": [1, 2, 3]})
    out = df.sort("a")
    assert out.get_column("a").flags["SORTED_ASC"]
    assert not out.get_column("b").flags["SORTED_ASC"]
    outd = df.sort("a", descending=True)
    assert outd.get_column("a").flags["SORTED_DESC"]
    lz = df.lazy().sort("a").collect()
    assert lz.get_column("a").flags["SORTED_ASC"]


def test_timedelta_sort_is_stable_with_limit():
    df = pl.DataFrame({"a": [3, 1, 2]})
    assert df.sort("a").head(2).get_column("a").flags["SORTED_ASC"]
