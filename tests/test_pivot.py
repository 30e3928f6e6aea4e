"""Pivot / transpose / unpivot reshapes (reference: polars-ops/src/frame/pivot/)."""

import polars_tpu as pl


def test_pivot_basic():
    df = pl.DataFrame(
        {
            "ix": [1, 1, 2, 2, 3],
            "col": ["a", "b", "a", "b", "a"],
            "v": [10, 20, 30, 40, 50],
        }
    )
    out = df.pivot("col", index="ix", values="v")
    assert out.columns == ["ix", "a", "b"]
    assert out.get_column("a").to_list() == [10, 30, 50]
    assert out.get_column("b").to_list() == [20, 40, None]


def test_pivot_agg():
    df = pl.DataFrame(
        {
            "ix": [1, 1, 1, 2],
            "col": ["a", "a", "b", "b"],
            "v": [1.0, 2.0, 3.0, 4.0],
        }
    )
    out = df.pivot("col", index="ix", values="v", aggregate_function="sum")
    assert out.get_column("a").to_list() == [3.0, None]
    assert out.get_column("b").to_list() == [3.0, 4.0]


def test_pivot_sort_columns():
    df = pl.DataFrame({"ix": [1], "col": ["z"], "v": [1], "w": [2]})
    out = df.pivot("col", index="ix", values=["v", "w"])
    assert out.columns == ["ix", "v_z", "w_z"]


def test_transpose():
    df = pl.DataFrame({"a": [1, 2], "b": [3, 4]})
    out = df.transpose(include_header=True)
    assert out.get_column("column").to_list() == ["a", "b"]
    assert out.get_column("column_0").to_list() == [1, 3]
    assert out.get_column("column_1").to_list() == [2, 4]


def test_unpivot_roundtrip_shape():
    df = pl.DataFrame({"id": [1, 2], "x": [10, 20], "y": [30, 40]})
    long = df.unpivot(["x", "y"], index="id")
    wide = long.pivot("variable", index="id", values="value")
    assert wide.sort("id").get_column("x").to_list() == [10, 20]
