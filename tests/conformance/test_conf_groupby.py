"""Conformance slice adapted from the reference behavioral suite
(py-polars/tests/unit/operations/test_group_by.py) — polars semantics for
group-by over nulls, empties, and the dtype lattice."""

from datetime import date, datetime, timedelta

import pytest

import polars_tpu as pl
from polars_tpu import datatypes as dtt


def test_group_by_basic():
    df = pl.DataFrame(
        {"a": ["a", "b", "a", "b", "b", "c"], "b": [1, 2, 3, 4, 5, 6],
         "c": [6, 5, 4, 3, 2, 1]}
    )
    assert sorted(df.group_by("a").agg(pl.sum("b")).rows()) == [
        ("a", 4), ("b", 11), ("c", 6)]
    assert df.group_by("a", maintain_order=True).agg(pl.sum("b")).rows() == [
        ("a", 4), ("b", 11), ("c", 6)]


def test_group_by_count_and_columns():
    df = pl.DataFrame(
        {"a": [1, 2, 3, 4, 5], "b": ["a", "a", "b", "b", "b"],
         "c": [None, 1, None, 1, None]}
    )
    result = df.group_by("b", maintain_order=True).agg(pl.count("a"))
    assert result.rows() == [("a", 2), ("b", 3)]
    assert result.columns == ["b", "a"]
    # count skips nulls; len does not
    r2 = df.group_by("b", maintain_order=True).agg(
        pl.col("c").count().alias("cnt"), pl.col("c").len().alias("n")
    )
    assert r2.rows() == [("a", 1, 2), ("b", 1, 3)]


@pytest.mark.parametrize(
    ("in_dtype", "out_dtype"),
    [
        (dtt.UInt8(), dtt.Float64()),
        (dtt.Int8(), dtt.Float64()),
        (dtt.UInt16(), dtt.Float64()),
        (dtt.Int16(), dtt.Float64()),
        (dtt.UInt32(), dtt.Float64()),
        (dtt.Int32(), dtt.Float64()),
        (dtt.UInt64(), dtt.Float64()),
        (dtt.Int64(), dtt.Float64()),
        (dtt.Float32(), dtt.Float32()),
        (dtt.Float64(), dtt.Float64()),
    ],
)
def test_group_by_mean_by_dtype(in_dtype, out_dtype):
    # reference: test_group_by.py::test_group_by_mean_by_dtype
    df = pl.DataFrame(
        {"g": [1, 1, 2, 2], "x": pl.Series("x", [1, 2, 3, 4], dtype=in_dtype)}
    )
    out = df.group_by("g", maintain_order=True).agg(pl.col("x").mean())
    assert out.schema["x"] == out_dtype
    assert out["x"].to_list() == [1.5, 3.5]


def test_group_by_mean_bool():
    df = pl.DataFrame({"g": [1, 1, 1, 2], "x": [False, True, True, True]})
    out = df.group_by("g", maintain_order=True).agg(pl.col("x").mean())
    assert out["x"].to_list() == [2 / 3, 1.0]


@pytest.mark.parametrize("agg", ["sum", "min", "max", "mean", "median", "first", "last"])
def test_group_by_shorthands(agg):
    df = pl.DataFrame({"g": ["a", "a", "b"], "v": [1.0, 3.0, 5.0]})
    out = getattr(df.group_by("g", maintain_order=True), agg)()
    exp = {
        "sum": [4.0, 5.0], "min": [1.0, 5.0], "max": [3.0, 5.0],
        "mean": [2.0, 5.0], "median": [2.0, 5.0], "first": [1.0, 5.0],
        "last": [3.0, 5.0],
    }[agg]
    assert out["v"].to_list() == exp


def test_group_by_args_positional_and_named():
    df = pl.DataFrame({"a": ["a", "b", "a"], "b": [1, 2, 3], "c": [9, 8, 7]})
    assert df.group_by("a", "b").agg(pl.len()).columns == ["a", "b", "len"]
    out = df.group_by(["a", "b"], maintain_order=True).agg(pl.col("c").sum())
    assert out.rows() == [("a", 1, 9), ("b", 2, 8), ("a", 3, 7)]
    named = df.group_by(key=pl.col("a")).agg(pl.sum("b"))
    assert sorted(named.rows()) == [("a", 4), ("b", 2)]
    assert named.columns == ["key", "b"]


def test_group_by_empty_frame():
    df = pl.DataFrame({"a": pl.Series("a", [], dtype=dtt.Int64())})
    out = df.group_by("a").agg(pl.len())
    assert out.height == 0
    assert out.columns == ["a", "len"]


def test_group_by_sorted_empty():
    # reference: test_group_by_sorted_empty_dataframe_3680
    df = (
        pl.DataFrame({"key": pl.Series([], dtype=dtt.Boolean()),
                      "val": pl.Series([], dtype=dtt.Float64())})
        .lazy().sort("key").group_by("key").agg(pl.col("val").first()).collect()
    )
    assert df.height == 0
    assert df.columns == ["key", "val"]


def test_group_by_signed_transmutes():
    # reference: test_group_by_signed_transmutes — negative keys survive
    for d in (dtt.Int8(), dtt.Int16(), dtt.Int32(), dtt.Int64()):
        df = pl.DataFrame({"foo": [-1, -2, -3, -4, -5], "bar": [500, 600, 700, 800, 900]}).with_columns(
            pl.col("foo").cast(d)
        )
        out = df.group_by("foo", maintain_order=True).agg(pl.col("bar").median())
        assert out.rows() == [
            (-1, 500.0), (-2, 600.0), (-3, 700.0), (-4, 800.0), (-5, 900.0)]


def test_group_by_all_masked_out():
    # every row filtered away inside the agg
    df = pl.DataFrame({"g": [1, 1, 2], "x": [1, 2, 3]})
    out = df.group_by("g", maintain_order=True).agg(
        pl.col("x").filter(pl.col("x") > 100).sum().alias("s"),
        pl.col("x").filter(pl.col("x") > 100).max().alias("m"),
    )
    assert out["s"].to_list() == [0, 0]
    assert out["m"].to_list() == [None, None]


def test_group_by_null_propagation():
    # reference: test_group_by_null_propagation_6185
    df = pl.DataFrame({"A": [0, 0], "B": [1, 2]})
    expr = pl.col("B").sort_by("A")
    out = df.group_by("A").agg((expr - expr.head(1).first()).alias("d"))
    assert out["d"].to_list() == [[0, 1]]


def test_group_by_binary_agg_with_literal():
    # reference: test_group_by_binary_agg_with_literal
    df = pl.DataFrame({"id": ["a", "a", "b", "b"], "value": [1, 2, 3, 4]})
    out = df.group_by("id", maintain_order=True).agg(
        pl.col("value") + pl.lit(1)
    )
    assert out["value"].to_list() == [[2, 3], [4, 5]]


def test_group_by_multiple_column_reference():
    # reference: test_group_by_multiple_column_reference
    df = pl.DataFrame({"gr": ["a", "b", "a", "b", "a", "b"],
                       "val": [1, 20, 100, 2000, 10000, 200000]})
    out = df.group_by("gr", maintain_order=True).agg(
        pl.col("val") + pl.col("val").shift().fill_null(0)
    )
    assert out["val"].to_list() == [[1, 101, 10100], [20, 2020, 202000]]


def test_group_by_empty_groups_len():
    df = pl.DataFrame({"g": [1, 1, 2], "x": [1, None, None]})
    out = df.group_by("g", maintain_order=True).agg(
        pl.col("x").drop_nulls().len().alias("n")
    )
    assert out["n"].to_list() == [1, 0]


def test_group_by_nulls_as_keys():
    # null IS a group key value
    df = pl.DataFrame({"g": ["a", None, "a", None, "b"], "x": [1, 2, 3, 4, 5]})
    out = df.group_by("g", maintain_order=True).agg(pl.col("x").sum())
    assert out.rows() == [("a", 4), (None, 6), ("b", 5)]


def test_group_by_multiple_null_cols():
    # reference: test_group_by_multiple_null_cols_15623
    df = pl.DataFrame({"a": [None, None], "b": [None, None], "x": [1, 2]},
                      schema={"a": dtt.Int64(), "b": dtt.Int64(), "x": dtt.Int64()})
    out = df.group_by("a", "b").agg(pl.col("x").sum())
    assert out.rows() == [(None, None, 3)]


def test_categorical_vs_str_group_by():
    # reference: test_categorical_vs_str_group_by — same results either way
    df_str = pl.DataFrame({"g": ["a", "b", "a"], "x": [1, 2, 3]})
    df_cat = df_str.with_columns(pl.col("g").cast(dtt.Categorical()))
    for df in (df_str, df_cat):
        out = df.group_by("g", maintain_order=True).agg(pl.col("x").sum())
        assert [(str(k), v) for k, v in out.rows()] == [("a", 4), ("b", 2)]


def test_boolean_min_max_any_all_agg():
    # reference: test_boolean_min_max_agg
    df = pl.DataFrame({"g": [1, 1, 2, 2, 3], "b": [True, False, True, True, None]})
    out = df.group_by("g", maintain_order=True).agg(
        pl.col("b").min().alias("mn"), pl.col("b").max().alias("mx"),
        pl.col("b").any().alias("any"), pl.col("b").all().alias("all"),
    )
    assert out["mn"].to_list() == [False, True, None]
    assert out["mx"].to_list() == [True, True, None]
    assert out["any"].to_list() == [True, True, False]
    assert out["all"].to_list() == [False, True, True]


def test_schema_on_agg():
    # reference: test_schema_on_agg — lazy schema matches collected dtypes
    lf = pl.DataFrame({"b": ["a", "b"], "a": [1, 2]}).lazy()
    q = lf.group_by("b").agg(
        pl.col("a").sum().alias("s"),
        pl.col("a").min().alias("mn"),
        pl.col("a").mean().alias("avg"),
        pl.col("a").n_unique().alias("nu"),
    )
    sch = dict(q.collect_schema().items())
    assert sch["s"] == dtt.Int64()
    assert sch["mn"] == dtt.Int64()
    assert sch["avg"] == dtt.Float64()
    out = q.collect()
    for name in ("s", "mn", "avg", "nu"):
        assert out.schema[name] == sch[name]


def test_group_by_with_expr_as_key():
    # reference: test_group_by_with_expr_as_key
    df = pl.DataFrame({"x": [1.2, 1.7, 2.1], "y": [1, 2, 3]})
    out = df.group_by(pl.col("x").floor().alias("f"), maintain_order=True).agg(
        pl.col("y").sum()
    )
    assert out.rows() == [(1.0, 3), (2.0, 3)]


def test_group_by_double_on_empty():
    # reference: test_group_by_double_on_empty_12194
    df = pl.DataFrame({"group": pl.Series([], dtype=dtt.Int64()),
                       "x": pl.Series([], dtype=dtt.Float64())})
    out = df.group_by("group").agg(pl.col("x").sum())
    assert out.columns == ["group", "x"]
    assert out.height == 0


def test_group_by_named_kwargs():
    # reference: test_group_by_named
    df = pl.DataFrame({"a": [1, 1, 2], "b": [4, 5, 6]})
    out = df.group_by(z=pl.col("a") * 2, maintain_order=True).agg(
        y_sum=pl.col("b").sum()
    )
    assert out.columns == ["z", "y_sum"]
    assert out.rows() == [(2, 9), (4, 6)]


def test_group_by_agg_broadcast_scalar():
    # an aggregated scalar used elementwise inside the agg broadcasts
    # (reference: test_aggregated_scalar_elementwise_15602)
    df = pl.DataFrame({"g": [1, 1, 2], "x": [1.0, 3.0, 5.0]})
    out = df.group_by("g", maintain_order=True).agg(
        (pl.col("x") - pl.col("x").mean()).alias("c")
    )
    assert out["c"].to_list() == [[-1.0, 1.0], [0.0]]


def test_group_by_quantile():
    df = pl.DataFrame({"g": [1, 1, 1, 1, 2], "x": [1.0, 2.0, 3.0, 4.0, 9.0]})
    out = df.group_by("g", maintain_order=True).agg(
        pl.col("x").quantile(0.5).alias("q")
    )
    # default interpolation="nearest": idx = round(0.5 * 3) = 2 -> 3.0
    assert out["q"].to_list() == [3.0, 9.0]
    out2 = df.group_by("g", maintain_order=True).agg(
        pl.col("x").quantile(0.5, interpolation="linear").alias("q")
    )
    assert out2["q"].to_list() == [2.5, 9.0]


def test_group_by_temporal_keys():
    df = pl.DataFrame({
        "d": [date(2021, 1, 1), date(2021, 1, 2), date(2021, 1, 1)],
        "x": [1, 2, 3],
    })
    out = df.group_by("d", maintain_order=True).agg(pl.col("x").sum())
    assert out.rows() == [(date(2021, 1, 1), 4), (date(2021, 1, 2), 2)]


def test_group_by_datetime_mean():
    df = pl.DataFrame({
        "g": [1, 1], "t": [datetime(2023, 1, 1), datetime(2023, 1, 3)],
    })
    out = df.group_by("g").agg(pl.col("t").mean())
    assert out["t"].to_list() == [datetime(2023, 1, 2)]


def test_group_by_duration_sum():
    df = pl.DataFrame({"g": [1, 1, 2], "d": [timedelta(1), timedelta(2), timedelta(5)]})
    out = df.group_by("g", maintain_order=True).agg(pl.col("d").sum())
    assert out["d"].to_list() == [timedelta(3), timedelta(5)]


def test_group_by_bool_keys():
    df = pl.DataFrame({"g": [True, False, True, None], "x": [1, 2, 3, 4]})
    out = df.group_by("g", maintain_order=True).agg(pl.col("x").sum())
    assert out.rows() == [(True, 4), (False, 2), (None, 4)]


def test_group_by_var_std():
    df = pl.DataFrame({"g": [1, 1, 1, 2], "x": [1.0, 2.0, 3.0, 4.0]})
    out = df.group_by("g", maintain_order=True).agg(
        pl.col("x").var().alias("v"), pl.col("x").std().alias("s"),
        pl.col("x").var(ddof=0).alias("v0"),
    )
    assert out["v"].to_list() == [1.0, None]
    assert out["s"].to_list() == [1.0, None]
    assert out["v0"].to_list()[0] == pytest.approx(2 / 3)
    assert out["v0"].to_list()[1] == 0.0


def test_group_by_n_unique_with_nulls():
    df = pl.DataFrame({"g": [1, 1, 1, 2], "x": [1, 1, None, None]})
    out = df.group_by("g", maintain_order=True).agg(pl.col("x").n_unique())
    # n_unique counts null as a distinct value (polars semantics)
    assert out["x"].to_list() == [2, 1]


def test_group_by_first_last_with_nulls():
    df = pl.DataFrame({"g": [1, 1, 2, 2], "x": [None, 5, 7, None]})
    out = df.group_by("g", maintain_order=True).agg(
        pl.col("x").first().alias("f"), pl.col("x").last().alias("l")
    )
    assert out["f"].to_list() == [None, 7]
    assert out["l"].to_list() == [5, None]


def test_group_by_wildcard_and_selectors():
    import polars_tpu.selectors as cs

    df = pl.DataFrame({"g": ["a", "a", "b"], "x": [1, 2, 3], "y": [4.0, 5.0, 6.0]})
    out = df.group_by("g", maintain_order=True).agg(pl.col("x", "y").sum())
    assert out.rows() == [("a", 3, 9.0), ("b", 3, 6.0)]
    out2 = df.group_by("g", maintain_order=True).agg(cs.numeric().max())
    assert out2.rows() == [("a", 2, 5.0), ("b", 3, 6.0)]


def test_group_by_len_alias_len_column():
    df = pl.DataFrame({"g": [1, 1, 2]})
    out = df.group_by("g", maintain_order=True).agg(pl.len())
    assert out.columns == ["g", "len"]
    assert out.schema["len"] == dtt.UInt32()
    assert out["len"].to_list() == [2, 1]


def test_group_by_min_max_strings():
    df = pl.DataFrame({"g": [1, 1, 2], "s": ["b", "a", "z"]})
    out = df.group_by("g", maintain_order=True).agg(
        pl.col("s").min().alias("mn"), pl.col("s").max().alias("mx")
    )
    assert out["mn"].to_list() == ["a", "z"]
    assert out["mx"].to_list() == ["b", "z"]


def test_group_by_sum_skips_nulls_mean_too():
    df = pl.DataFrame({"g": [1, 1, 1], "x": [1.0, None, 3.0]})
    out = df.group_by("g").agg(
        pl.col("x").sum().alias("s"), pl.col("x").mean().alias("m")
    )
    assert out["s"].to_list() == [4.0]
    assert out["m"].to_list() == [2.0]


def test_group_by_nan_handling():
    nan = float("nan")
    df = pl.DataFrame({"g": [1, 1, 2], "x": [nan, 1.0, nan]})
    out = df.group_by("g", maintain_order=True).agg(
        pl.col("x").min().alias("mn"), pl.col("x").max().alias("mx")
    )
    mn = out["mn"].to_list()
    assert mn[0] == 1.0  # NaN is greatest in total order: min skips it
    mx = out["mx"].to_list()
    assert mx[0] != mx[0]  # max of {NaN, 1.0} is NaN


def test_group_by_head_tail_implode():
    df = pl.DataFrame({"g": [1, 1, 1, 2], "x": [1, 2, 3, 4]})
    out = df.group_by("g", maintain_order=True).agg(
        pl.col("x").head(2).alias("h"), pl.col("x").tail(1).alias("t")
    )
    assert out["h"].to_list() == [[1, 2], [4]]
    assert out["t"].to_list() == [[3], [4]]


def test_group_by_unique_in_agg_sorted():
    df = pl.DataFrame({"g": [1, 1, 1, 2], "x": [3, 1, 3, 2]})
    out = df.group_by("g", maintain_order=True).agg(
        pl.col("x").unique(maintain_order=True).alias("u")
    )
    assert out["u"].to_list() == [[3, 1], [2]]


def test_lazy_group_by_agg_then_filter():
    lf = pl.DataFrame({"g": ["a", "a", "b", "c"], "x": [1, 2, 3, 4]}).lazy()
    out = (
        lf.group_by("g").agg(pl.col("x").sum()).filter(pl.col("x") > 2).sort("g").collect()
    )
    assert out.rows() == [("a", 3), ("b", 3), ("c", 4)]


def test_group_by_iteration():
    df = pl.DataFrame({"g": ["a", "a", "b"], "x": [1, 2, 3]})
    groups = {k[0] if isinstance(k, tuple) else k: sub for k, sub in df.group_by("g", maintain_order=True)}
    assert set(groups) == {"a", "b"}
    assert groups["a"]["x"].to_list() == [1, 2]
    assert groups["b"]["x"].to_list() == [3]


def test_group_by_arg_min_max_within_group_position():
    # reference: arg_min/arg_max return the position within the group's
    # element list, not a global row index
    df = pl.DataFrame({"g": [1, 1, 2, 2, 2], "x": [5, 3, 9, 1, 7]})
    out = df.group_by("g", maintain_order=True).agg(
        pl.col("x").arg_min().alias("amin"),
        pl.col("x").arg_max().alias("amax"),
    )
    assert out.rows() == [(1, 1, 0), (2, 1, 0)]
    # position is within the post-filter element list
    out2 = df.group_by("g", maintain_order=True).agg(
        pl.col("x").filter(pl.col("x") > 2).arg_min().alias("p")
    )
    assert out2.rows() == [(1, 1), (2, 1)]
    # nulls count as elements (but are not candidates)
    df3 = pl.DataFrame({"g": [1, 1, 1], "x": [None, 9, 3]})
    assert df3.group_by("g").agg(pl.col("x").arg_min()).rows() == [(1, 2)]
    # over() broadcasts the group result
    assert df.select(pl.col("x").arg_min().over("g")).to_series().to_list() == [
        1, 1, 1, 1, 1]


def test_select_duplicate_output_name_raises():
    df = pl.DataFrame({"x": [1, 2, 3]})
    with pytest.raises(pl.exceptions.DuplicateError):
        df.select(pl.col("x").min(), pl.col("x").max())
    with pytest.raises(pl.exceptions.DuplicateError):
        df.group_by(pl.col("x").alias("g")).agg(
            pl.col("x").min(), pl.col("x").max()
        )


def test_group_scalar_broadcasts_to_rows_in_agg():
    # reference: AggregatedScalar combined with NotAggregated broadcasts the
    # per-group scalar back to the group's rows (x - x.mean() demeaning)
    df = pl.DataFrame({"g": [1, 1, 2, 2, 2], "x": [5, 3, 9, 1, 7]})
    out = df.group_by("g", maintain_order=True).agg(
        (pl.col("x") - pl.col("x").mean()).max().alias("dm"),
        (pl.col("x") / pl.col("x").sum()).sum().alias("fracsum"),
        pl.when(pl.col("x") > pl.col("x").mean())
        .then(pl.col("x")).otherwise(None).count().alias("above"),
    )
    rows = out.rows()
    assert rows[0][0] == 1 and abs(rows[0][1] - 1.0) < 1e-12
    assert abs(rows[0][2] - 1.0) < 1e-12 and rows[0][3] == 1
    assert abs(rows[1][1] - (9 - 17 / 3)) < 1e-12
    assert abs(rows[1][2] - 1.0) < 1e-12 and rows[1][3] == 2
    # over() path
    d = df.with_columns(d=pl.col("x") - pl.col("x").mean().over("g"))
    assert d.get_column("d").to_list() == [1.0, -1.0, 9 - 17 / 3, 1 - 17 / 3, 7 - 17 / 3]


def test_grouped_expression_sort():
    df = pl.DataFrame(
        {"g": [1, 1, 2, 2, 2], "x": [5, 3, 9, 1, 7], "y": [1, 2, 3, 4, 5]}
    )
    out = df.group_by("g", maintain_order=True).agg(
        pl.col("x").sort().alias("s"),
        pl.col("x").sort(descending=True).first().alias("mx"),
        pl.col("x").sort_by("y", descending=True).alias("byy"),
        pl.col("x").sort_by("y", descending=True).first().alias("x_at_max_y"),
    )
    assert out.rows() == [
        (1, [3, 5], 5, [3, 5], 3),
        (2, [1, 7, 9], 9, [7, 1, 9], 7),
    ]
    dfn = pl.DataFrame({"g": [1, 1, 1], "x": [None, 9, 3]})
    out2 = dfn.group_by("g").agg(
        pl.col("x").sort().alias("a"), pl.col("x").sort(nulls_last=True).alias("b")
    )
    assert out2.rows() == [(1, [None, 3, 9], [3, 9, None])]


def test_nested_host_aggs():
    # host aggs (mode/implode) nested under larger agg expressions
    df = pl.DataFrame({"g": [1, 1, 1, 2, 2], "x": [7, 7, 9, 3, 3]})
    out = df.group_by("g", maintain_order=True).agg(
        pl.col("x").mode().min().alias("m"))
    assert out.rows() == [(1, 7), (2, 3)]
    out2 = df.group_by("g", maintain_order=True).agg(
        pl.col("x").implode().list.len().alias("n"))
    assert out2.rows() == [(1, 3), (2, 2)]
    # select context too
    assert df.select(pl.col("x").mode().min()).rows() == [(3,)]
    assert df.select(pl.col("x").implode().list.len()).rows() == [(5,)]
