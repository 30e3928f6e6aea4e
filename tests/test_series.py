"""Series API (mirrors py-polars tests/unit/series)."""

import numpy as np
import pytest

import polars_tpu as pl
from polars_tpu.testing import assert_series_equal


def test_init_variants():
    assert pl.Series("a", [1, 2]).to_list() == [1, 2]
    assert pl.Series([1.5]).name == ""
    assert pl.Series("x", [1], dtype=pl.Float64).dtype == pl.Float64
    s = pl.Series("n", np.array([1, 2], np.int32))
    assert s.dtype == pl.Int32


def test_arithmetic():
    s = pl.Series("a", [1, 2, 3])
    assert (s + 1).to_list() == [2, 3, 4]
    assert (2 * s).to_list() == [2, 4, 6]
    assert (s / 2).to_list() == [0.5, 1.0, 1.5]
    assert (10 - s).to_list() == [9, 8, 7]
    assert (-s).to_list() == [-1, -2, -3]
    assert (s**2).to_list() == [1, 4, 9]


def test_comparison():
    s = pl.Series("a", [1, 2, 3])
    assert (s > 1).to_list() == [False, True, True]
    assert (s == 2).to_list() == [False, True, False]


def test_series_vs_series():
    a = pl.Series("a", [1, 2])
    b = pl.Series("b", [10, 20])
    assert (a + b).to_list() == [11, 22]
    assert (a < b).to_list() == [True, True]


def test_aggregates():
    s = pl.Series("a", [1.0, 2.0, None, 4.0])
    assert s.sum() == 7.0
    assert s.mean() == 7 / 3
    assert s.min() == 1.0
    assert s.max() == 4.0
    assert s.null_count() == 1
    assert s.n_unique() == 4  # null counts as distinct
    assert s.first() == 1.0
    assert s.last() == 4.0


def test_std_var():
    s = pl.Series("a", [1.0, 2.0, 3.0])
    assert abs(s.std() - 1.0) < 1e-12
    assert abs(s.var() - 1.0) < 1e-12


def test_indexing_slicing():
    s = pl.Series("a", [10, 20, 30, 40])
    assert s[1] == 20
    assert s[-1] == 40
    assert s[1:3].to_list() == [20, 30]
    assert s.head(2).to_list() == [10, 20]
    assert s.tail(2).to_list() == [30, 40]
    assert s.gather([0, 3]).to_list() == [10, 40]


def test_filter_mask():
    s = pl.Series("a", [1, 2, 3])
    mask = pl.Series("m", [True, False, True])
    assert s.filter(mask).to_list() == [1, 3]


def test_unique_sort():
    s = pl.Series("a", [3, 1, 3, 2])
    assert sorted(s.unique().to_list()) == [1, 2, 3]
    assert s.sort().to_list() == [1, 2, 3, 3]
    assert s.sort(descending=True).to_list() == [3, 3, 2, 1]


def test_value_counts():
    s = pl.Series("a", ["x", "y", "x"])
    out = s.value_counts(sort=True)
    assert out.columns == ["a", "count"]
    assert out.rows()[0] == ("x", 2)


def test_is_null_fill():
    s = pl.Series("a", [1, None, 3])
    assert s.is_null().to_list() == [False, True, False]
    assert s.fill_null(0).to_list() == [1, 0, 3]
    assert s.drop_nulls().to_list() == [1, 3]


def test_cum_and_shift():
    s = pl.Series("a", [1, 2, 3])
    assert s.cum_sum().to_list() == [1, 3, 6]
    assert s.shift(1).to_list() == [None, 1, 2]
    assert s.diff().to_list() == [None, 1, 1]


def test_cast():
    s = pl.Series("a", [1, 2])
    assert s.cast(pl.Float64).to_list() == [1.0, 2.0]
    assert s.cast(pl.String).to_list() == ["1", "2"]


def test_str_namespace():
    s = pl.Series("s", ["ab", "CD"])
    assert s.str.to_uppercase().to_list() == ["AB", "CD"]
    assert s.str.len_chars().to_list() == [2, 2]


def test_dt_namespace():
    import datetime as dtm

    s = pl.Series("d", [dtm.date(2024, 5, 17)])
    assert s.dt.year().to_list() == [2024]
    assert s.dt.month().to_list() == [5]


def test_append_concat():
    a = pl.Series("a", [1])
    b = pl.Series("b", [2])
    a.append(b)
    assert a.to_list() == [1, 2]
    c = pl.concat([pl.Series("x", [1]), pl.Series("y", [2.5])])
    assert c.to_list() == [1.0, 2.5]
    assert c.dtype == pl.Float64


def test_to_frame_numpy_jax():
    s = pl.Series("a", [1, 2])
    assert s.to_frame().columns == ["a"]
    assert s.to_numpy().tolist() == [1, 2]
    assert s.to_jax().shape == (2,)


def test_rank_arg_sort():
    s = pl.Series("a", [30, 10, 20])
    assert s.arg_sort().to_list() == [1, 2, 0]
    assert s.rank("ordinal").to_list() == [3, 1, 2]


def test_equals():
    assert pl.Series("a", [1, None]).equals(pl.Series("a", [1, None]))
    assert not pl.Series("a", [1]).equals(pl.Series("a", [2]))


def test_clip_abs_round():
    s = pl.Series("a", [-1.6, 2.4])
    assert s.abs().to_list() == [1.6, 2.4]
    assert s.round(0).to_list() == [-2.0, 2.0]
    assert s.clip(0, 2).to_list() == [0.0, 2.0]


def test_is_in():
    s = pl.Series("a", [1, 2, 3])
    assert s.is_in([1, 3]).to_list() == [True, False, True]


def test_item():
    assert pl.Series("a", [42]).item() == 42
    with pytest.raises(ValueError):
        pl.Series("a", [1, 2]).item()
