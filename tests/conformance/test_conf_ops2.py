"""Conformance slice: rank / cut / qcut / rle / top_k / list set ops / is_in /
clip / pct_change / value_counts / hash — behavioral corners from the
reference's py-polars/tests/unit/operations/{test_rank,test_cut,test_rle,
test_sets,test_is_in,test_top_k,...}.py (own frames, same semantics)."""

import pytest

import polars_tpu as pl


# ---------------------------------------------------------------- rank


def test_rank_average_dtype_and_ties():
    s = pl.Series("a", [1, 1, 2, 2, 3])
    r = s.rank()
    assert r.dtype == pl.Float64
    assert r.to_list() == [1.5, 1.5, 3.5, 3.5, 5.0]


def test_rank_methods():
    s = pl.Series("a", [1, 2, 3, 2, 2, 3, 0])
    assert s.rank("min").to_list() == [2, 3, 6, 3, 3, 6, 1]
    assert s.rank("max").to_list() == [2, 5, 7, 5, 5, 7, 1]
    assert s.rank("dense").to_list() == [2, 3, 4, 3, 3, 4, 1]
    assert s.rank("ordinal").to_list() == [2, 3, 6, 4, 5, 7, 1]
    assert s.rank("max").dtype == pl.UInt32


def test_rank_nulls_and_empty():
    assert pl.Series("a", [], dtype=pl.Int64).rank().to_list() == []
    assert pl.Series("a", [None], dtype=pl.Int64).rank().to_list() == [None]
    assert pl.Series("a", [None, 1, 2, None]).rank().to_list() == [None, 1.0, 2.0, None]


def test_rank_descending():
    s = pl.Series("a", [1, 2, 3])
    assert s.rank(descending=True).to_list() == [3.0, 2.0, 1.0]


def test_rank_random_deterministic_with_seed():
    s = pl.Series("a", [1, 1, 1, 1])
    r1 = s.rank("random", seed=7).to_list()
    r2 = s.rank("random", seed=7).to_list()
    assert r1 == r2
    assert sorted(r1) == [1, 2, 3, 4]


def test_rank_over_groups():
    df = pl.DataFrame({"g": ["a", "a", "b", "b"], "x": [2, 1, 5, 9]})
    out = df.select(pl.col("x").rank().over("g"))
    assert out.to_series().to_list() == [2.0, 1.0, 1.0, 2.0]


# ---------------------------------------------------------------- cut / qcut


def test_cut_default_labels_enum():
    s = pl.Series("a", [-2, -1, 0, 1, 2])
    out = s.cut([-1, 1])
    assert out.dtype == pl.Enum(["(-inf, -1]", "(-1, 1]", "(1, inf]"])
    assert out.to_list() == [
        "(-inf, -1]", "(-inf, -1]", "(-1, 1]", "(-1, 1]", "(1, inf]",
    ]


def test_cut_lazy_schema_is_enum():
    lf = pl.LazyFrame({"a": [-2, 0, 2]}).select(pl.col("a").cut([-1, 1]))
    sch = lf.collect_schema()
    assert sch["a"] == pl.Enum(["(-inf, -1]", "(-1, 1]", "(1, inf]"])


def test_cut_custom_labels_and_left_closed():
    s = pl.Series("a", [-2, 0, 2])
    out = s.cut([-1, 1], labels=["lo", "mid", "hi"])
    assert out.dtype == pl.Enum(["lo", "mid", "hi"])
    assert out.to_list() == ["lo", "mid", "hi"]
    lc = pl.Series("a", [-1, 0]).cut([-1], left_closed=True)
    # -1 goes to the second bin when bins are left-closed
    assert lc.to_list()[0] == lc.to_list()[1]


def test_cut_include_breaks_struct():
    s = pl.Series("a", [-2, 0, 2])
    out = s.cut([-1, 1], include_breaks=True)
    assert out.dtype.base_type() == pl.Struct
    rows = out.to_list()
    assert [r["breakpoint"] for r in rows] == [-1.0, 1.0, float("inf")]
    assert rows[0]["category"] == "(-inf, -1]"


def test_cut_wrong_label_count_raises():
    with pytest.raises(Exception):
        pl.Series("a", [1, 2]).cut([1], labels=["only-one"])


def test_qcut_data_dependent_breakpoint():
    s = pl.Series("q", [float(i) for i in range(10)])
    out = s.qcut([0.5], include_breaks=True)
    bps = {r["breakpoint"] for r in out.to_list()}
    assert 4.5 in bps  # the actual median of 0..9


def test_qcut_int_bins():
    s = pl.Series("q", list(range(8)))
    out = s.qcut(2, labels=["low", "high"])
    assert out.to_list() == ["low"] * 4 + ["high"] * 4


# ---------------------------------------------------------------- rle


def test_rle_struct():
    s = pl.Series("a", [1, 1, 2, 1, None, 1, 3, 3])
    out = s.rle()
    assert out.to_list() == [
        {"len": 2, "value": 1},
        {"len": 1, "value": 2},
        {"len": 1, "value": 1},
        {"len": 1, "value": None},
        {"len": 1, "value": 1},
        {"len": 2, "value": 3},
    ]


def test_rle_id_counts_null_runs():
    s = pl.Series("a", [1, 1, 2, 1, None, 1, 3, 3])
    assert s.rle_id().to_list() == [0, 0, 1, 2, 3, 4, 5, 5]
    assert s.rle_id().dtype == pl.UInt32


def test_rle_empty():
    assert pl.Series("a", [], dtype=pl.Int64).rle().to_list() == []
    assert pl.Series("a", [], dtype=pl.Int64).rle_id().to_list() == []


def test_rle_strings():
    s = pl.Series("a", ["x", "x", "y"])
    assert s.rle().to_list() == [
        {"len": 2, "value": "x"},
        {"len": 1, "value": "y"},
    ]


# ---------------------------------------------------------------- top_k


def test_top_k_bottom_k():
    s = pl.Series("a", [3, 8, 1, 5, None])
    assert sorted(s.top_k(2).to_list()) == [5, 8]
    assert sorted(s.bottom_k(2).to_list()) == [1, 3]


def test_top_k_by():
    df = pl.DataFrame({"a": ["w", "x", "y", "z"], "v": [2, 9, 1, 5]})
    out = df.select(pl.col("a").top_k_by("v", 2))
    assert sorted(out.to_series().to_list()) == ["x", "z"]


def test_top_k_more_than_len():
    s = pl.Series("a", [2, 1])
    assert sorted(s.top_k(5).to_list()) == [1, 2]


# ---------------------------------------------------------------- list set ops


def test_list_set_ops_column_rhs():
    df = pl.DataFrame({"a": [["x", "y", "z1", "z"]], "b": [["x", "y"]]})
    assert df.select(pl.col("a").list.set_difference("b")).to_series().to_list() == [["z1", "z"]]
    assert df.select(pl.col("a").list.set_intersection("b")).to_series().to_list() == [["x", "y"]]
    assert df.select(pl.col("a").list.set_union("b")).to_series().to_list() == [["x", "y", "z1", "z"]]
    assert df.select(pl.col("a").list.set_symmetric_difference("b")).to_series().to_list() == [["z1", "z"]]


def test_list_set_ops_literal_rhs():
    df = pl.DataFrame({"a": [[1, 2, 3], [3, 4, 5]]})
    out = df.select(pl.col("a").list.set_intersection([3, 9]))
    assert out.to_series().to_list() == [[3], [3]]


def test_list_set_ops_first_occurrence_order_and_dedup():
    df = pl.DataFrame({"a": [[2, 1, 2, 3]], "b": [[3, 3, 4]]})
    assert df.select(pl.col("a").list.set_union("b")).to_series().to_list() == [[2, 1, 3, 4]]
    assert df.select(pl.col("a").list.set_difference("b")).to_series().to_list() == [[2, 1]]


def test_list_set_ops_null_element_is_a_value():
    df = pl.DataFrame({"a": [[1, None, 2]], "b": [[None, 3]]})
    assert df.select(pl.col("a").list.set_intersection("b")).to_series().to_list() == [[None]]


# ---------------------------------------------------------------- is_in


def test_is_in_null_propagates_by_default():
    s = pl.Series([1, None, 3])
    assert s.is_in([1, 2]).to_list() == [True, None, False]


def test_is_in_nulls_equal():
    s = pl.Series([1, None, 3])
    assert s.is_in([1, None], nulls_equal=True).to_list() == [True, True, False]


def test_is_in_empty_rhs():
    s = pl.Series([1, 2])
    assert s.is_in([]).to_list() == [False, False]


def test_is_in_series_rhs_and_strings():
    s = pl.Series(["a", "b", "c"])
    assert s.is_in(pl.Series(["b"])).to_list() == [False, True, False]


def test_is_in_list_column_rhs():
    df = pl.DataFrame({"v": [1, 2, 3], "l": [[1, 9], [0], [3, 3]]})
    out = df.select(pl.col("v").is_in(pl.col("l")))
    assert out.to_series().to_list() == [True, False, True]


# ---------------------------------------------------------------- clip


def test_clip_expr_bounds():
    df = pl.DataFrame({"x": [1, 5, 9], "lo": [2, 2, 2], "hi": [8, 8, 8]})
    out = df.select(pl.col("x").clip(pl.col("lo"), pl.col("hi")))
    assert out.to_series().to_list() == [2, 5, 8]


def test_clip_one_sided_and_nulls():
    s = pl.Series([1, 5, 9, None])
    assert s.clip(lower_bound=3).to_list() == [3, 5, 9, None]
    assert s.clip(upper_bound=6).to_list() == [1, 5, 6, None]


def test_clip_null_bound_no_clip():
    df = pl.DataFrame({"x": [1, 9], "lo": [5, None]})
    out = df.select(pl.col("x").clip(pl.col("lo")))
    assert out.to_series().to_list() == [5, 9]


# ---------------------------------------------------------------- misc


def test_pct_change():
    s = pl.Series([1.0, 2.0, 4.0])
    assert s.pct_change().to_list() == [None, 1.0, 1.0]
    assert s.pct_change(2).to_list() == [None, None, 3.0]


def test_value_counts_normalize():
    s = pl.Series("v", ["a", "b", "a", "a"])
    out = s.value_counts(sort=True, normalize=True)
    rows = out.to_dicts()
    assert rows[0]["v"] == "a" and abs(rows[0]["proportion"] - 0.75) < 1e-12


def test_value_counts_custom_name():
    s = pl.Series("v", ["a", "a", "b"])
    out = s.value_counts(sort=True, name="n")
    assert out.columns == ["v", "n"]
    assert out.to_dicts()[0] == {"v": "a", "n": 2}


def test_hash_deterministic_within_session():
    s = pl.Series([1, 2, 3])
    assert s.hash(seed=42).to_list() == s.hash(seed=42).to_list()
    assert s.hash(seed=1).to_list() != s.hash(seed=2).to_list()


def test_unique_counts():
    s = pl.Series(["a", "b", "a", "a"])
    # order follows first occurrence
    assert s.unique_counts().to_list() == [3, 1]


def test_is_close():
    s = pl.Series([1.0, 1.0000001, 2.0])
    out = s.is_close(1.0, rel_tol=1e-5)
    assert out.to_list() == [True, True, False]


def test_cum_count_with_nulls():
    s = pl.Series([1, None, 3])
    assert s.cum_count().to_list() == [1, 1, 2]
    assert s.cum_count(reverse=True).to_list() == [2, 1, 1]


def test_diff_modes():
    s = pl.Series([10, 20, 35])
    assert s.diff().to_list() == [None, 10, 15]
    assert s.diff(null_behavior="drop").to_list() == [10, 15]
    assert s.diff(-1).to_list() == [-10, -15, None]


def test_shift_fill_value_expr():
    df = pl.DataFrame({"x": [1, 2, 3]})
    out = df.select(pl.col("x").shift(1, fill_value=pl.col("x").max()))
    assert out.to_series().to_list() == [3, 1, 2]


def test_peak_min_max():
    # reference zero-fill boundary semantics
    # (crates/polars-ops/src/chunked_array/peaks.rs shift_and_fill)
    s = pl.Series("a", [4, 1, 3, 2, 5])
    assert s.peak_min().to_list() == [False, True, False, True, False]
    assert s.peak_max().to_list() == [True, False, True, False, True]
    b = pl.Series("a", [False, True, False, True, True, False])
    assert b.peak_min().to_list() == [False, False, True, False, False, False]
    assert b.peak_max().to_list() == [False, True, False, False, False, False]
