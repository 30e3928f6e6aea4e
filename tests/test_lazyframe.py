"""LazyFrame API (mirrors py-polars tests/unit/lazyframe)."""

import pytest

import polars_tpu as pl
from polars_tpu.testing import assert_frame_equal


@pytest.fixture
def lf() -> pl.LazyFrame:
    return pl.DataFrame({"a": [1, 2, 3], "b": [0.5, 1.5, 2.5], "s": ["x", "y", "z"]}).lazy()


def test_schema_no_execution(lf):
    s = lf.with_columns(c=pl.col("a") * 2).schema
    assert s["c"] == pl.Int64
    assert lf.collect_schema().names() == ["a", "b", "s"]
    assert lf.width == 3


def test_select_collect(lf):
    out = lf.select(pl.col("a") + 1).collect()
    assert out.to_series().to_list() == [2, 3, 4]


def test_lazyframe_init_from_data():
    lf = pl.LazyFrame({"x": [1, 2]})
    assert lf.collect().height == 2


def test_filter_chain(lf):
    out = lf.filter(pl.col("a") > 1).filter(pl.col("b") < 2.0).collect()
    assert out.height == 1


def test_filter_kwargs(lf):
    out = lf.filter(s="y").collect()
    assert out.get_column("a").to_list() == [2]


def test_remove(lf):
    out = lf.remove(pl.col("a") == 2).collect()
    assert out.get_column("a").to_list() == [1, 3]


def test_rename_callable(lf):
    out = lf.rename(str.upper).collect()
    assert out.columns == ["A", "B", "S"]


def test_reverse(lf):
    assert lf.reverse().collect().get_column("a").to_list() == [3, 2, 1]


def test_slice_tail(lf):
    assert lf.slice(1, 1).collect().get_column("a").to_list() == [2]
    assert lf.tail(2).collect().get_column("a").to_list() == [2, 3]
    assert lf.first().collect().get_column("a").to_list() == [1]
    assert lf.last().collect().get_column("a").to_list() == [3]


def test_gather_every(lf):
    assert lf.gather_every(2).collect().get_column("a").to_list() == [1, 3]
    assert lf.gather_every(2, offset=1).collect().get_column("a").to_list() == [2]


def test_fetch(lf):
    assert lf.fetch(2).height == 2


def test_cast_mapping(lf):
    out = lf.cast({"a": pl.Float32}).collect()
    assert out.schema["a"] == pl.Float32


def test_lazy_aggregate_shortcuts(lf):
    assert lf.sum().collect().get_column("a").to_list() == [6]
    assert lf.max().collect().get_column("b").to_list() == [2.5]
    out = lf.null_count().collect()
    assert out.get_column("a").to_list() == [0]


def test_profile(lf):
    out, timings = lf.select(pl.col("a").sum()).profile()
    assert out.item() == 6
    assert timings.height >= 1


def test_map_batches(lf):
    out = lf.map_batches(lambda df: df.head(1)).collect()
    assert out.height == 1


def test_concat_lazy():
    a = pl.DataFrame({"x": [1]}).lazy()
    b = pl.DataFrame({"x": [2]}).lazy()
    out = pl.concat([a, b]).collect()
    assert out.get_column("x").to_list() == [1, 2]


def test_explain_contains_pushdown(tmp_path):
    df = pl.DataFrame({"a": [1, 2], "b": [3, 4]})
    p = tmp_path / "x.parquet"
    df.write_parquet(p)
    text = pl.scan_parquet(p).filter(pl.col("a") > 1).select("a").explain()
    assert "Scan" in text


def test_with_row_index_lazy(lf):
    out = lf.with_row_index("i").collect()
    assert out.get_column("i").to_list() == [0, 1, 2]


def test_unique_lazy():
    lf = pl.DataFrame({"a": [1, 1, 2]}).lazy()
    assert lf.unique().collect().height == 2


def test_join_coalesce_none():
    a = pl.DataFrame({"k": [1, 2]}).lazy()
    b = pl.DataFrame({"k": [1, 2], "v": [5, 6]}).lazy()
    out = a.join(b, on="k", coalesce=False).collect()
    assert "k_right" in out.columns


def test_drop_nans():
    lf = pl.DataFrame({"a": [1.0, float("nan"), 3.0]}).lazy()
    out = lf.drop_nans().collect()
    assert out.height == 2
