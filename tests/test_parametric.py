"""Property-based differential tests (reference pattern: py-polars hypothesis
profiles, SURVEY.md §4 tier 2)."""

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings

import polars_tpu as pl
from polars_tpu.testing.parametric import dataframes, series_strategy

_settings = settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)


@given(s=series_strategy("Int64", max_size=30))
@_settings
def test_sort_matches_python(s):
    out = s.sort(nulls_last=True).to_list()
    vals = [v for v in s.to_list() if v is not None]
    nn = s.to_list().count(None)
    assert out == sorted(vals) + [None] * nn


@given(s=series_strategy("Float64", max_size=30))
@_settings
def test_sum_matches_numpy(s):
    import math

    vals = [v for v in s.to_list() if v is not None]
    got = s.sum()
    exp = float(np.sum(vals)) if vals else 0.0
    if np.isinf(exp) or np.isnan(exp):
        assert got == exp or (np.isnan(got) and np.isnan(exp))
        return
    # summation order differs (numpy pairwise vs engine sequential); when
    # intermediate partial sums overflow-cancel near f64 max the results
    # legitimately diverge — compare against the exact fsum with a tolerance
    # scaled by the largest term's ulp instead
    scale = max((abs(v) for v in vals if not math.isinf(v)), default=1.0)
    try:
        exact = math.fsum(vals)
    except OverflowError:
        return
    tol = max(1e-9 * max(1.0, abs(exact)), 32 * np.spacing(max(scale, 1.0)) * len(vals))
    if np.isinf(got):
        # a different summation order can overflow transiently; only valid
        # when terms actually reach the overflow region
        assert scale >= 1e292
    else:
        assert abs(got - exact) <= tol


@given(s=series_strategy("Int64", max_size=30, allow_null=False))
@_settings
def test_unique_roundtrip(s):
    assert sorted(s.unique().to_list()) == sorted(set(s.to_list()))


@given(s=series_strategy("String", max_size=25))
@_settings
def test_string_sort_and_filter(s):
    out = s.sort(nulls_last=True).to_list()
    vals = sorted(v for v in s.to_list() if v is not None)
    assert out[: len(vals)] == vals


@given(df=dataframes(max_cols=3, max_size=25))
@_settings
def test_head_tail_slice_consistency(df):
    n = df.height
    k = min(3, n)
    assert df.head(k).height == k
    assert df.tail(k).height == k
    assert df.slice(0, n).height == n
    if n:
        assert df.reverse().reverse().equals(df)


@given(s=series_strategy("Int64", max_size=30))
@_settings
def test_filter_groupby_count_invariant(s):
    df = s.to_frame("x")
    total = df.height
    nulls = df.select(pl.col("x").is_null().sum().alias("n")).item()
    lf = df.lazy().group_by(pl.col("x").is_null().alias("k")).agg(c=pl.len())
    out = lf.collect()
    assert sum(out.get_column("c").to_list()) == total


@given(a=series_strategy("Int64", max_size=20, allow_null=False),
       b=series_strategy("Int64", max_size=20, allow_null=False))
@_settings
def test_join_cardinality_vs_pandas(a, b):
    la = pl.DataFrame({"k": a.to_list()})
    rb = pl.DataFrame({"k": b.to_list()})
    got = la.join(rb, on="k").height
    exp = len(pd.merge(pd.DataFrame({"k": a.to_list()}), pd.DataFrame({"k": b.to_list()}), on="k"))
    assert got == exp


# -- py-polars-compatible strategies (round 3: series/dataframes/column) ------


from hypothesis import given, settings

from polars_tpu.testing.parametric import column, dataframes as pdataframes, series


@given(s=series(excluded_dtypes=[pl.Categorical(), pl.Decimal(38, 2)]))
@settings(max_examples=30, deadline=None)
def test_series_strategy_roundtrips(s):
    # construction -> to_list -> reconstruction is stable
    again = pl.Series(s.name, s.to_list(), dtype=s.dtype)
    assert again.to_list() == s.to_list()
    assert len(s) == s.len()


@given(s=series(dtype=pl.Int64(), allow_null=True))
@settings(max_examples=30, deadline=None)
def test_series_filter_null_accounting(s):
    vals = s.to_list()
    nn = s.is_not_null().sum() or 0
    assert nn == sum(v is not None for v in vals)
    assert s.null_count() == sum(v is None for v in vals)


@given(df=pdataframes(
    cols=[column("k", dtype=pl.Int8(), allow_null=False), column("v", dtype=pl.Int64())],
    min_size=1,
))
@settings(max_examples=25, deadline=None)
def test_group_by_sum_matches_python(df):
    out = df.group_by("k").agg(pl.col("v").sum()).sort("k")
    expected: dict = {}
    for k, v in zip(df["k"].to_list(), df["v"].to_list()):
        expected[k] = expected.get(k, 0) + (v or 0)
    # i64 sums wrap on overflow (polars semantics)
    wrap = {k: ((v + 2**63) % 2**64) - 2**63 for k, v in expected.items()}
    got = {r[0]: r[1] for r in out.rows()}
    assert got == wrap


_SMALLEST_NORMAL = 2.2250738585072014e-308


def _ftz(v):
    """XLA executes f64 with denormals-as-zero (measured: ``x > 0`` is False
    and ``x == 0`` is True for every subnormal on both XLA:CPU and TPU), so
    subnormals compare equal to ±0.0 in EVERY engine comparison — filters,
    min/max, and sort keys alike. The sort is stable, so the oracle maps
    subnormals to zero and relies on stability for their relative order."""
    import math

    if v is None or math.isnan(v) or math.isinf(v):
        return v
    return 0.0 if abs(v) < _SMALLEST_NORMAL else v


@given(df=pdataframes(cols=[column("a", dtype=pl.Float64())], min_size=1))
@settings(max_examples=25, deadline=None)
def test_sort_is_ordered(df):
    out = df.sort("a", nulls_last=True)["a"].to_list()
    vals = [_ftz(v) for v in out if v is not None]
    assert vals == sorted(vals)
    n_null = sum(v is None for v in out)
    assert out[len(out) - n_null:] == [None] * n_null


@given(df=pdataframes(lazy=True, max_cols=3, max_size=8,
                      excluded_dtypes=[pl.Categorical(), pl.Decimal(38, 2)]))
@settings(max_examples=20, deadline=None)
def test_lazy_roundtrip_identity(df):
    out = df.collect()
    again = out.lazy().collect()
    assert again.rows() == out.rows()


@given(s=series(dtype=pl.Int64(), unique=True, allow_null=False))
@settings(max_examples=20, deadline=None)
def test_unique_strategy_is_unique(s):
    assert s.n_unique() == len(s)
