"""Conformance slice adapted from the reference behavioral suite
(py-polars/tests/unit/operations/*) — fill_null, cum ops, unique, explode,
gather, is_in, clip, shift, value_counts, interpolate, when/then."""

from datetime import date

import pytest

import polars_tpu as pl
from polars_tpu import datatypes as dtt

NAN = float("nan")


# -- fill_null (reference: test_fill_null.py) --------------------------------


def test_fill_null_value():
    s = pl.Series("a", [1, None, 3])
    assert s.fill_null(99).to_list() == [1, 99, 3]


@pytest.mark.parametrize(
    ("strategy", "expected"),
    [
        ("forward", [1, 1, 3, 3, 3]),
        ("backward", [1, 3, 3, None, None]),
        ("min", [1, 1, 3, 1, 1]),
        ("max", [1, 3, 3, 3, 3]),
        ("mean", [1, 2, 3, 2, 2]),
        ("zero", [1, 0, 3, 0, 0]),
        ("one", [1, 1, 3, 1, 1]),
    ],
)
def test_fill_null_strategies(strategy, expected):
    df = pl.DataFrame({"a": [1, None, 3, None, None]})
    out = df.select(pl.col("a").fill_null(strategy=strategy))
    got = out["a"].to_list()
    if strategy == "mean":
        got = [None if g is None else float(g) for g in got]
        expected = [None if e is None else float(e) for e in expected]
    assert got == expected


def test_fill_null_limit():
    df = pl.DataFrame({"a": [1, None, None, None, 5]})
    out = df.select(pl.col("a").fill_null(strategy="forward", limit=1))
    assert out["a"].to_list() == [1, 1, None, None, 5]


def test_fill_null_expr():
    df = pl.DataFrame({"a": [1, None], "b": [10, 20]})
    out = df.select(pl.col("a").fill_null(pl.col("b")))
    assert out["a"].to_list() == [1, 20]


def test_fill_nan():
    s = pl.Series("a", [1.0, NAN, 3.0])
    assert s.fill_nan(0.0).to_list() == [1.0, 0.0, 3.0]
    # fill_nan does NOT touch nulls
    s2 = pl.Series("a", [1.0, None, NAN])
    assert s2.fill_nan(9.0).to_list() == [1.0, None, 9.0]


# -- cum ops (reference: test_cum_agg) ----------------------------------------


def test_cum_ops():
    df = pl.DataFrame({"a": [1, 2, None, 4]})
    assert df.select(pl.col("a").cum_sum())["a"].to_list() == [1, 3, None, 7]
    assert df.select(pl.col("a").cum_min())["a"].to_list() == [1, 1, None, 1]
    assert df.select(pl.col("a").cum_max())["a"].to_list() == [1, 2, None, 4]
    assert df.select(pl.col("a").cum_prod())["a"].to_list() == [1, 2, None, 8]
    assert df.select(pl.col("a").cum_count())["a"].to_list() == [1, 2, 2, 3]


def test_cum_sum_reverse():
    df = pl.DataFrame({"a": [1, 2, 3]})
    assert df.select(pl.col("a").cum_sum(reverse=True))["a"].to_list() == [6, 5, 3]


# -- unique / value_counts / is_duplicated ------------------------------------


def test_unique_series():
    s = pl.Series("a", [1, 2, 2, 3, None, None])
    assert sorted(s.unique().to_list(), key=lambda x: (x is None, x)) == [1, 2, 3, None]
    assert s.n_unique() == 4


def test_frame_unique_keep():
    df = pl.DataFrame({"a": [1, 1, 2], "b": ["x", "y", "z"]})
    out = df.unique(subset="a", keep="first", maintain_order=True)
    assert out.rows() == [(1, "x"), (2, "z")]
    out2 = df.unique(subset="a", keep="last", maintain_order=True)
    assert out2.rows() == [(1, "y"), (2, "z")]
    out3 = df.unique(subset="a", keep="none", maintain_order=True)
    assert out3.rows() == [(2, "z")]


def test_value_counts():
    s = pl.Series("a", ["x", "y", "x"])
    out = s.value_counts()
    d = {r[0]: r[1] for r in out.rows()}
    assert d == {"x": 2, "y": 1}


def test_is_duplicated_is_unique():
    s = pl.Series("a", [1, 2, 2, 3])
    assert s.is_duplicated().to_list() == [False, True, True, False]
    assert s.is_unique().to_list() == [True, False, False, True]


def test_is_first_last_distinct():
    s = pl.Series("a", [1, 2, 1, 3])
    df = pl.DataFrame({"a": s})
    assert df.select(pl.col("a").is_first_distinct())["a"].to_list() == [
        True, True, False, True]
    assert df.select(pl.col("a").is_last_distinct())["a"].to_list() == [
        False, True, True, True]


# -- explode (reference: test_explode.py) --------------------------------------


def test_explode_basics():
    df = pl.DataFrame({"l": [[1, 2], [], None, [3]], "k": ["a", "b", "c", "d"]})
    out = df.explode("l")
    assert out["l"].to_list() == [1, 2, None, None, 3]
    assert out["k"].to_list() == ["a", "a", "b", "c", "d"]


def test_explode_multiple_columns():
    df = pl.DataFrame({"a": [[1, 2], [3]], "b": [["x", "y"], ["z"]]})
    out = df.explode("a", "b")
    assert out["a"].to_list() == [1, 2, 3]
    assert out["b"].to_list() == ["x", "y", "z"]


def test_explode_mismatched_lengths_raises():
    df = pl.DataFrame({"a": [[1, 2]], "b": [["x"]]})
    with pytest.raises(Exception):
        df.explode("a", "b").height


# -- gather / slicing -----------------------------------------------------------


def test_gather_expr():
    df = pl.DataFrame({"a": [10, 20, 30]})
    out = df.select(pl.col("a").gather([2, 0]))
    assert out["a"].to_list() == [30, 10]
    assert df.select(pl.col("a").get(1))["a"].to_list() == [20]


def test_gather_every_frame():
    df = pl.DataFrame({"a": list(range(10))})
    assert df.gather_every(3)["a"].to_list() == [0, 3, 6, 9]
    assert df.gather_every(3, offset=1)["a"].to_list() == [1, 4, 7]


def test_head_tail_slice_negative():
    df = pl.DataFrame({"a": [1, 2, 3, 4, 5]})
    assert df.head(2)["a"].to_list() == [1, 2]
    assert df.tail(2)["a"].to_list() == [4, 5]
    assert df.slice(-2)["a"].to_list() == [4, 5]
    assert df.slice(1, 2)["a"].to_list() == [2, 3]
    assert df.head(-2)["a"].to_list() == [1, 2, 3]
    assert df.tail(-2)["a"].to_list() == [3, 4, 5]


# -- is_in / is_between ----------------------------------------------------------


def test_is_in():
    df = pl.DataFrame({"a": [1, 2, 3, None]})
    out = df.select(pl.col("a").is_in([1, 3]))
    assert out["a"].to_list() == [True, False, True, None]
    s = pl.DataFrame({"s": ["a", "b", None]})
    assert s.select(pl.col("s").is_in(["a"]))["s"].to_list() == [True, False, None]


def test_is_between():
    df = pl.DataFrame({"a": [1, 2, 3, 4]})
    assert df.select(pl.col("a").is_between(2, 3))["a"].to_list() == [
        False, True, True, False]
    assert df.select(pl.col("a").is_between(2, 3, closed="none"))["a"].to_list() == [
        False, False, False, False]
    assert df.select(pl.col("a").is_between(2, 3, closed="left"))["a"].to_list() == [
        False, True, False, False]


# -- clip / abs / sign / round ---------------------------------------------------


def test_clip():
    df = pl.DataFrame({"a": [-2, -1, 0, 1, 2]})
    assert df.select(pl.col("a").clip(-1, 1))["a"].to_list() == [-1, -1, 0, 1, 1]
    assert df.select(pl.col("a").clip(lower_bound=0))["a"].to_list() == [0, 0, 0, 1, 2]


def test_abs_sign():
    df = pl.DataFrame({"a": [-2.5, 0.0, 3.5, None]})
    assert df.select(pl.col("a").abs())["a"].to_list() == [2.5, 0.0, 3.5, None]
    assert df.select(pl.col("a").sign())["a"].to_list() == [-1.0, 0.0, 1.0, None]


def test_round_floor_ceil():
    df = pl.DataFrame({"a": [1.45, -1.45, 2.5]})
    assert df.select(pl.col("a").round(1))["a"].to_list() == [1.5, -1.5, 2.5]
    assert df.select(pl.col("a").floor())["a"].to_list() == [1.0, -2.0, 2.0]
    assert df.select(pl.col("a").ceil())["a"].to_list() == [2.0, -1.0, 3.0]
    # polars round: half away from zero
    assert df.select(pl.col("a").round(0))["a"].to_list() == [1.0, -1.0, 3.0]


# -- shift / diff / pct_change ----------------------------------------------------


def test_shift():
    df = pl.DataFrame({"a": [1, 2, 3]})
    assert df.select(pl.col("a").shift(1))["a"].to_list() == [None, 1, 2]
    assert df.select(pl.col("a").shift(-1))["a"].to_list() == [2, 3, None]
    assert df.select(pl.col("a").shift(1, fill_value=0))["a"].to_list() == [0, 1, 2]


def test_diff_null_behavior():
    df = pl.DataFrame({"a": [10, 20, 35]})
    assert df.select(pl.col("a").diff())["a"].to_list() == [None, 10, 15]
    assert df.select(pl.col("a").diff(null_behavior="drop"))["a"].to_list() == [10, 15]


# -- when/then ---------------------------------------------------------------------


def test_when_then_otherwise():
    df = pl.DataFrame({"a": [1, 2, 3]})
    out = df.select(
        pl.when(pl.col("a") > 2).then(pl.lit("big")).otherwise(pl.lit("small")).alias("s")
    )
    assert out["s"].to_list() == ["small", "small", "big"]
    # missing otherwise -> null
    out2 = df.select(pl.when(pl.col("a") > 2).then(1).alias("x"))
    assert out2["x"].to_list() == [None, None, 1]
    # chained whens
    out3 = df.select(
        pl.when(pl.col("a") == 1).then(10)
        .when(pl.col("a") == 2).then(20)
        .otherwise(0).alias("x")
    )
    assert out3["x"].to_list() == [10, 20, 0]


def test_when_then_null_predicate():
    df = pl.DataFrame({"p": [True, None, False], "a": [1, 2, 3]})
    out = df.select(pl.when(pl.col("p")).then(pl.col("a")).otherwise(-1).alias("x"))
    # null predicate behaves as false (otherwise branch)
    assert out["x"].to_list() == [1, -1, -1]


# -- interpolate / forward scan over nulls -------------------------------------------


def test_interpolate_linear():
    s = pl.Series("a", [1.0, None, 3.0])
    assert s.interpolate().to_list() == [1.0, 2.0, 3.0]
    s2 = pl.Series("a", [None, 2.0, None])
    out = s2.interpolate().to_list()
    assert out[0] is None and out[1] == 2.0 and out[2] is None


# -- horizontal ops -----------------------------------------------------------------


def test_horizontal_aggs():
    df = pl.DataFrame({"a": [1, 5], "b": [3, 2], "c": [None, 1]})
    assert df.select(pl.max_horizontal("a", "b", "c").alias("m"))["m"].to_list() == [3, 5]
    assert df.select(pl.min_horizontal("a", "b", "c").alias("m"))["m"].to_list() == [1, 1]
    assert df.select(pl.sum_horizontal("a", "b", "c").alias("m"))["m"].to_list() == [4, 8]


def test_fold():
    df = pl.DataFrame({"a": [1, 2], "b": [10, 20]})
    out = df.select(
        pl.fold(acc=pl.lit(0), function=lambda acc, x: acc + x, exprs=pl.all()).alias("s")
    )
    assert out["s"].to_list() == [11, 22]


def test_concat_str():
    df = pl.DataFrame({"a": ["x", None], "b": ["1", "2"]})
    out = df.select(pl.concat_str(["a", "b"], separator="-").alias("s"))
    assert out["s"].to_list() == ["x-1", None]
    out2 = df.select(pl.concat_str(["a", "b"], separator="-", ignore_nulls=True).alias("s"))
    assert out2["s"].to_list() == ["x-1", "2"]


# -- with_row_index / rename / drop ----------------------------------------------------


def test_with_row_index():
    df = pl.DataFrame({"a": ["x", "y"]})
    out = df.with_row_index()
    assert out.columns == ["index", "a"]
    assert out["index"].to_list() == [0, 1]
    out2 = df.with_row_index("id", offset=5)
    assert out2["id"].to_list() == [5, 6]


def test_rename_and_drop():
    df = pl.DataFrame({"a": [1], "b": [2], "c": [3]})
    assert df.rename({"a": "x"}).columns == ["x", "b", "c"]
    assert df.drop("b").columns == ["a", "c"]
    assert df.drop("b", "c").columns == ["a"]
    with pytest.raises(Exception):
        df.drop("nope").columns
    assert df.drop("nope", strict=False).columns == ["a", "b", "c"]


# -- null_count / has_nulls / drop_nulls -------------------------------------------------


def test_null_accounting():
    df = pl.DataFrame({"a": [1, None, 3], "b": [None, None, "x"]})
    assert df.null_count().rows() == [(1, 2)]
    assert df.drop_nulls().rows() == [(3, "x")]
    assert df.drop_nulls(subset="a").height == 2
    s = pl.Series("a", [1, None])
    assert s.has_nulls()
    assert s.null_count() == 1


# -- replace ------------------------------------------------------------------------------


def test_replace():
    df = pl.DataFrame({"a": [1, 2, 2, 3]})
    out = df.select(pl.col("a").replace(2, 99))
    assert out["a"].to_list() == [1, 99, 99, 3]
    out2 = df.select(pl.col("a").replace({1: 10, 3: 30}))
    assert out2["a"].to_list() == [10, 2, 2, 30]


def test_replace_strict():
    df = pl.DataFrame({"a": [1, 2]})
    out = df.select(pl.col("a").replace_strict({1: "x", 2: "y"}))
    assert out["a"].to_list() == ["x", "y"]
    with pytest.raises(Exception):
        df.select(pl.col("a").replace_strict({1: "x"}))["a"].to_list()


# -- reshape: pivot / unpivot / transpose ----------------------------------------------------


def test_unpivot():
    df = pl.DataFrame({"k": ["a", "b"], "x": [1, 2], "y": [3, 4]})
    out = df.unpivot(index="k", on=["x", "y"]).sort("variable", "k")
    assert out.columns == ["k", "variable", "value"]
    assert out.rows() == [
        ("a", "x", 1), ("b", "x", 2), ("a", "y", 3), ("b", "y", 4)]


def test_pivot():
    df = pl.DataFrame({"k": ["a", "a", "b"], "c": ["x", "y", "x"], "v": [1, 2, 3]})
    out = df.pivot(on="c", index="k", values="v", aggregate_function="sum").sort("k")
    assert out.columns == ["k", "x", "y"]
    assert out.rows() == [("a", 1, 2), ("b", 3, None)]


def test_transpose():
    df = pl.DataFrame({"a": [1, 2], "b": [3, 4]})
    out = df.transpose(include_header=True, header_name="col")
    assert out["col"].to_list() == ["a", "b"]
    assert out.width == 3


# -- search_sorted / index_of ---------------------------------------------------------------


def test_search_sorted():
    s = pl.Series("a", [1, 3, 5])
    assert s.search_sorted(3) == 1
    assert s.search_sorted(4) == 2


def test_index_of():
    s = pl.Series("a", [10, 20, 30])
    assert s.index_of(20) == 1
    assert s.index_of(99) is None


# -- extend_constant / repeat_by -------------------------------------------------------------


def test_extend_constant():
    s = pl.Series("a", [1, 2])
    assert s.extend_constant(9, 2).to_list() == [1, 2, 9, 9]


def test_repeat_by():
    df = pl.DataFrame({"a": ["x", "y"], "n": [2, 1]})
    out = df.select(pl.col("a").repeat_by("n"))
    assert out["a"].to_list() == [["x", "x"], ["y"]]


def test_mode_multi_value():
    """mode returns ALL most-occurring values (reference: Expr.mode)."""
    assert sorted(pl.Series("a", [1, 1, 2, 2, 3]).mode().to_list()) == [1, 2]
    assert pl.Series("a", [1, 1, 2]).mode().to_list() == [1]
    out = (
        pl.DataFrame({"g": ["x", "x", "y"], "a": [1, 1, 2]})
        .group_by("g")
        .agg(pl.col("a").mode())
        .sort("g")
    )
    assert out.schema["a"] == pl.List(pl.Int64())
    assert out.to_dicts() == [{"g": "x", "a": [1]}, {"g": "y", "a": [2]}]


def test_interpolate_methods():
    s = pl.Series("a", [1, None, None, 4], dtype=pl.Int64())
    lin = s.interpolate()
    assert lin.dtype == pl.Float64()
    assert lin.to_list() == [1.0, 2.0, 3.0, 4.0]
    near = s.interpolate("nearest")
    assert near.dtype == pl.Int64()
    assert near.to_list() == [1, 1, 4, 4]


def test_explode_nested_inners():
    """explode of List(Struct)/List(List) keeps the child payloads."""
    s = pl.Series("a", [[{"x": 1}, {"x": 2}], [{"x": 3}]])
    assert s.explode().to_list() == [{"x": 1}, {"x": 2}, {"x": 3}]
    s3 = pl.Series("c", [[[1, 2]], [[3], [4, 5]]])
    assert s3.explode().to_list() == [[1, 2], [3], [4, 5]]
    assert s3.explode().explode().to_list() == [1, 2, 3, 4, 5]
    df = pl.DataFrame({"g": [1, 2], "a": [[{"x": 1}, {"x": 2}], [{"x": 3}]]})
    assert df.explode("a").to_dicts() == [
        {"g": 1, "a": {"x": 1}},
        {"g": 1, "a": {"x": 2}},
        {"g": 2, "a": {"x": 3}},
    ]


def test_positional_selectors_survive_pushdown():
    """nth/by_index resolve against the pre-pushdown schema."""
    import polars_tpu.selectors as cs

    df = pl.DataFrame({"a": [1.0], "b": [3], "s": ["x"]})
    assert df.select(pl.nth(1)).columns == ["b"]
    assert df.select(pl.nth(0, 2)).columns == ["a", "s"]
    assert df.select(pl.last()).columns == ["s"]
    assert df.select(cs.by_index(2)).columns == ["s"]
    lf = df.lazy().select(pl.nth(1))
    assert lf.collect().columns == ["b"]


def test_arg_sort_by():
    df = pl.DataFrame({"a": [2.0, 1.0, 3.0], "b": [1, 2, 0]})
    assert df.select(pl.arg_sort_by("a")).to_series().to_list() == [1, 0, 2]
    assert df.select(pl.arg_sort_by("a", descending=True)).to_series().to_list() == [2, 0, 1]
    assert df.select(pl.arg_sort_by(["b", "a"])).to_series().to_list() == [2, 0, 1]
    assert pl.DataFrame({"a": [2.0, None, 1.0]}).select(
        pl.arg_sort_by("a")
    ).to_series().to_list() == [1, 2, 0]


def test_shrink_and_cumulative_eval():
    assert pl.Series("a", [1, 2]).shrink_dtype().dtype == pl.Int8()
    assert pl.Series("a", [1, 300]).shrink_dtype().dtype == pl.Int16()
    assert pl.Series("a", [1.5]).shrink_dtype().dtype == pl.Float32()
    assert pl.Series("a", [1, 2, 3]).cumulative_eval(pl.element().sum()).to_list() == [1, 3, 6]
    assert pl.Series("a", [1, 2, 3]).cumulative_eval(
        pl.element().sum(), min_samples=2
    ).to_list() == [None, 3, 6]


def test_from_epoch_eager():
    from datetime import date, datetime

    assert pl.from_epoch(pl.Series("t", [86400]), time_unit="s").to_list() == [datetime(1970, 1, 2)]
    assert pl.from_epoch(pl.Series("t", [1]), time_unit="d").to_list() == [date(1970, 1, 2)]
