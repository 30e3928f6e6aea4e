"""Conformance slice: aggregation semantics on empty/all-null inputs,
horizontal aggs, folds, implode, and arr/binary/struct namespace corners —
behaviors from the reference's py-polars/tests/unit/operations/aggregation/
and namespaces/ suites (own frames, same semantics)."""

import pytest

import polars_tpu as pl


# ----------------------------------------------------------- empty / all-null


def test_sum_empty_is_zero():
    assert pl.Series("a", [], dtype=pl.Int64).sum() == 0
    assert pl.DataFrame({"a": []}, schema={"a": pl.Int64}).select(pl.col("a").sum()).item() == 0


def test_sum_all_null_is_zero():
    assert pl.Series("a", [None, None], dtype=pl.Int64).sum() == 0


def test_mean_empty_and_all_null_is_null():
    assert pl.Series("a", [], dtype=pl.Int64).mean() is None
    assert pl.Series("a", [None], dtype=pl.Int64).mean() is None


def test_min_max_empty_is_null():
    s = pl.Series("a", [], dtype=pl.Int64)
    assert s.min() is None and s.max() is None


def test_count_vs_len_with_nulls():
    s = pl.Series("a", [1, None, 3])
    assert s.count() == 2
    assert s.len() == 3
    df = pl.DataFrame({"a": [1, None, 3]})
    out = df.select(pl.col("a").count().alias("c"), pl.len().alias("n"))
    assert out.to_dicts() == [{"c": 2, "n": 3}]


def test_var_std_ddof():
    s = pl.Series("a", [1.0, 2.0, 3.0, 4.0])
    assert abs(s.var() - 5.0 / 3.0) < 1e-12  # ddof=1
    assert abs(s.var(ddof=0) - 1.25) < 1e-12
    assert s.var() > 0 and abs(s.std() ** 2 - s.var()) < 1e-12


def test_single_element_var_is_null():
    assert pl.Series("a", [1.0]).var() is None  # ddof=1 on n=1
    assert pl.Series("a", [1.0]).var(ddof=0) == 0.0


def test_grouped_empty_group_semantics():
    df = pl.DataFrame({"g": ["a", "a", "b"], "v": [None, None, 1]})
    out = df.group_by("g").agg(
        pl.col("v").sum().alias("s"),
        pl.col("v").mean().alias("m"),
        pl.col("v").count().alias("c"),
    ).sort("g")
    assert out.to_dicts() == [
        {"g": "a", "s": 0, "m": None, "c": 0},
        {"g": "b", "s": 1, "m": 1.0, "c": 1},
    ]


def test_quantile_methods():
    s = pl.Series("a", [1.0, 2.0, 3.0, 4.0])
    assert s.quantile(0.5) == 3.0  # default "nearest"
    assert s.quantile(0.5, interpolation="linear") == 2.5
    assert s.quantile(0.5, interpolation="lower") == 2.0
    assert s.quantile(0.5, interpolation="higher") == 3.0
    assert s.quantile(0.5, interpolation="midpoint") == 2.5


def test_first_last_on_empty_is_null():
    df = pl.DataFrame({"a": []}, schema={"a": pl.Int64})
    out = df.select(pl.col("a").first().alias("f"), pl.col("a").last().alias("l"))
    assert out.to_dicts() == [{"f": None, "l": None}]


def test_any_all_kleene():
    assert pl.Series([True, None]).any() is True
    assert pl.Series([False, None]).any(ignore_nulls=False) is None
    assert pl.Series([False, None]).any() is False
    assert pl.Series([True, None]).all() is True
    assert pl.Series([True, None]).all(ignore_nulls=False) is None


def test_product():
    assert pl.Series([1, 2, 3, 4]).product() == 24
    df = pl.DataFrame({"g": ["a", "a", "b"], "v": [2.0, 3.0, 5.0]})
    out = df.group_by("g").agg(pl.col("v").product()).sort("g")
    assert out["v"].to_list() == [6.0, 5.0]


# ----------------------------------------------------------- horizontal


def test_horizontal_sum_ignores_nulls():
    df = pl.DataFrame({"a": [1, None], "b": [None, None], "c": [2, None]})
    out = df.select(pl.sum_horizontal("a", "b", "c"))
    assert out.to_series().to_list() == [3, 0]


def test_horizontal_min_max():
    df = pl.DataFrame({"a": [1, 8], "b": [5, 2]})
    assert df.select(pl.min_horizontal("a", "b")).to_series().to_list() == [1, 2]
    assert df.select(pl.max_horizontal("a", "b")).to_series().to_list() == [5, 8]


def test_horizontal_mean_with_nulls():
    df = pl.DataFrame({"a": [1.0, None], "b": [3.0, 4.0]})
    out = df.select(pl.mean_horizontal("a", "b"))
    assert out.to_series().to_list() == [2.0, 4.0]


def test_any_all_horizontal():
    df = pl.DataFrame({"a": [True, False, False], "b": [True, True, False]})
    assert df.select(pl.all_horizontal("a", "b")).to_series().to_list() == [True, False, False]
    assert df.select(pl.any_horizontal("a", "b")).to_series().to_list() == [True, True, False]


# ----------------------------------------------------------- folds / implode


def test_fold_with_accumulator():
    df = pl.DataFrame({"a": [1, 2], "b": [10, 20]})
    out = df.select(
        pl.fold(pl.lit(0), lambda acc, x: acc + x, pl.all()).alias("s")
    )
    assert out.to_series().to_list() == [11, 22]


def test_reduce():
    df = pl.DataFrame({"a": [1, 2], "b": [10, 20]})
    out = df.select(pl.reduce(lambda a, b: a * b, pl.all()).alias("p"))
    assert out.to_series().to_list() == [10, 40]


def test_implode_in_group_by():
    df = pl.DataFrame({"g": ["x", "x", "y"], "v": [1, 2, 3]})
    out = df.group_by("g").agg(pl.col("v").implode()).sort("g")
    # implode in agg context nests the aggregated list
    vals = out["v"].to_list()
    assert vals == [[[1, 2]], [[3]]] or vals == [[1, 2], [3]]


def test_implode_select_context():
    df = pl.DataFrame({"v": [1, 2, 3]})
    out = df.select(pl.col("v").implode())
    assert out.to_series().to_list() == [[1, 2, 3]]


# ----------------------------------------------------------- arr namespace


@pytest.fixture
def arr_df():
    return pl.DataFrame(
        {"a": [[1, 2], [3, None]]},
        schema={"a": pl.Array(pl.Int64, 2)},
    )


def test_arr_sum_min_max(arr_df):
    out = arr_df.select(
        pl.col("a").arr.sum().alias("s"),
        pl.col("a").arr.min().alias("mn"),
        pl.col("a").arr.max().alias("mx"),
    )
    assert out.to_dicts() == [
        {"s": 3, "mn": 1, "mx": 2},
        {"s": 3, "mn": 3, "mx": 3},
    ]


def test_arr_get_and_contains(arr_df):
    out = arr_df.select(pl.col("a").arr.get(1).alias("g"))
    assert out.to_series().to_list() == [2, None]
    out = arr_df.select(pl.col("a").arr.contains(3).alias("c"))
    assert out.to_series().to_list() == [False, True]


def test_arr_to_list_dtype(arr_df):
    out = arr_df.select(pl.col("a").arr.to_list())
    assert out.schema["a"] == pl.List(pl.Int64)
    assert out.to_series().to_list() == [[1, 2], [3, None]]


def test_arr_join():
    df = pl.DataFrame({"a": [["x", "y"]]}, schema={"a": pl.Array(pl.String, 2)})
    out = df.select(pl.col("a").arr.join("-"))
    assert out.to_series().to_list() == ["x-y"]


# ----------------------------------------------------------- binary namespace


def test_binary_contains_starts_ends():
    s = pl.Series("b", [b"hello", b"world"])
    assert s.bin.contains(b"ell").to_list() == [True, False]
    assert s.bin.starts_with(b"he").to_list() == [True, False]
    assert s.bin.ends_with(b"ld").to_list() == [False, True]


def test_binary_encode_decode():
    s = pl.Series("b", [b"\x01\xff"])
    assert s.bin.encode("hex").to_list() == ["01ff"]
    assert pl.Series("h", ["01ff"]).str.decode("hex").to_list() == [b"\x01\xff"]
    b64 = s.bin.encode("base64").to_list()[0]
    assert pl.Series("x", [b64]).str.decode("base64").to_list() == [b"\x01\xff"]


def test_binary_size():
    s = pl.Series("b", [b"abc", b""])
    assert s.bin.size().to_list() == [3, 0]


# ----------------------------------------------------------- struct namespace


def test_struct_with_fields():
    df = pl.DataFrame({"s": [{"x": 1, "y": 2}]})
    out = df.select(
        pl.col("s").struct.with_fields(z=pl.field("x") + 10)
    )
    assert out.to_series().to_list() == [{"x": 1, "y": 2, "z": 11}]


def test_struct_unnest_and_schema():
    df = pl.DataFrame({"s": [{"x": 1, "y": "a"}]})
    out = df.select(pl.col("s").struct.unnest())
    assert out.columns == ["x", "y"]
    assert df.schema["s"] == pl.Struct({"x": pl.Int64, "y": pl.String})


def test_struct_json_encode():
    df = pl.DataFrame({"s": [{"x": 1}]})
    out = df.select(pl.col("s").struct.json_encode())
    import json

    assert json.loads(out.to_series().to_list()[0]) == {"x": 1}


def test_struct_field_arithmetic():
    df = pl.DataFrame({"s": [{"a": 1, "b": 2}, {"a": 3, "b": 4}]})
    out = df.select(
        (pl.col("s").struct.field("a") * pl.col("s").struct.field("b")).alias("p")
    )
    assert out.to_series().to_list() == [2, 12]


# ----------------------------------------------------------- agg expressions


def test_agg_expression_arithmetic():
    df = pl.DataFrame({"g": ["a", "a", "b"], "v": [1.0, 3.0, 5.0]})
    out = df.group_by("g").agg(
        ((pl.col("v") - pl.col("v").mean()) ** 2).sum().alias("ss")
    ).sort("g")
    assert out["ss"].to_list() == [2.0, 0.0]


def test_agg_filtered():
    df = pl.DataFrame({"g": ["a", "a", "b"], "v": [1, 10, 5]})
    out = df.group_by("g").agg(
        pl.col("v").filter(pl.col("v") > 2).sum().alias("s")
    ).sort("g")
    assert out["s"].to_list() == [10, 5]


def test_agg_n_unique_and_null_count():
    df = pl.DataFrame({"g": ["a", "a", "a", "b"], "v": [1, 1, None, 2]})
    out = df.group_by("g").agg(
        pl.col("v").n_unique().alias("nu"),
        pl.col("v").null_count().alias("nc"),
    ).sort("g")
    assert out.to_dicts() == [
        {"g": "a", "nu": 2, "nc": 1},
        {"g": "b", "nu": 1, "nc": 0},
    ]


def test_median_on_ints_is_float():
    s = pl.Series([1, 2, 3, 4])
    assert s.median() == 2.5
    df = pl.DataFrame({"a": [1, 2]})
    assert df.select(pl.col("a").median()).schema["a"] == pl.Float64
