"""concat strategies + explode/when-then edges (reference: py-polars
tests/unit/functions/test_concat.py, operations/test_explode.py)."""

import pytest

import polars_tpu as pl


def test_concat_vertical_and_relaxed():
    a = pl.DataFrame({"x": [1], "y": ["a"]})
    b = pl.DataFrame({"x": [2.5], "y": ["b"]})
    assert pl.concat([a, a]).height == 2
    out = pl.concat([a, b], how="vertical_relaxed")
    assert out.schema["x"] == pl.Float64()
    assert out["x"].to_list() == [1.0, 2.5]
    with pytest.raises(Exception):
        pl.concat([a, pl.DataFrame({"z": [1]})], how="vertical")


def test_concat_diagonal():
    a = pl.DataFrame({"x": [1], "y": ["a"]})
    c = pl.DataFrame({"x": [3], "z": [9]})
    out = pl.concat([a, c], how="diagonal")
    assert out.to_dicts() == [
        {"x": 1, "y": "a", "z": None},
        {"x": 3, "y": None, "z": 9},
    ]


def test_concat_horizontal_and_align():
    a = pl.DataFrame({"x": [1], "y": ["a"]})
    assert pl.concat([a, pl.DataFrame({"w": [7]})], how="horizontal").columns == ["x", "y", "w"]
    l = pl.DataFrame({"id": [1, 2], "l": [10, 20]})
    r = pl.DataFrame({"id": [2, 3], "r": [5, 6]})
    out = pl.concat([l, r], how="align")
    assert out.to_dicts() == [
        {"id": 1, "l": 10, "r": None},
        {"id": 2, "l": 20, "r": 5},
        {"id": 3, "l": None, "r": 6},
    ]
    assert pl.concat([l, r], how="align_left")["id"].to_list() == [1, 2]


def test_explode_empty_and_null_lists():
    s = pl.Series("a", [[1, 2], [], None, [3]])
    assert s.explode().to_list() == [1, 2, None, None, 3]
    df = pl.DataFrame({"g": [1, 2, 3, 4], "a": [[1, 2], [], None, [3]]})
    assert df.explode("a").to_dicts() == [
        {"g": 1, "a": 1},
        {"g": 1, "a": 2},
        {"g": 2, "a": None},
        {"g": 3, "a": None},
        {"g": 4, "a": 3},
    ]


def test_when_then_chain_and_missing_otherwise():
    df = pl.DataFrame({"v": [1, 5, 10]})
    out = df.select(
        pl.when(pl.col("v") < 2).then(0).when(pl.col("v") < 7).then(1).otherwise(2).alias("c")
    )
    assert out["c"].to_list() == [0, 1, 2]
    out2 = df.select(pl.when(pl.col("v") < 2).then(0).alias("c"))
    assert out2["c"].to_list() == [0, None, None]
