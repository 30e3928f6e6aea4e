"""Conformance slice adapted from the reference behavioral suite
(py-polars/tests/unit/operations/test_window.py) — .over() window semantics:
aggregation broadcast, order preservation, rank/shift/cum in windows."""

import pytest

import polars_tpu as pl
from polars_tpu import datatypes as dtt


@pytest.fixture()
def df():
    return pl.DataFrame(
        {
            "a": ["a", "a", "b", "b", "b"],
            "b": [1, 2, 3, 5, 3],
            "c": [2, 4, 6, 8, 10],
        }
    )


def test_over_agg_broadcasts(df):
    out = df.select(pl.col("b").sum().over("a").alias("s"))
    assert out["s"].to_list() == [3, 3, 11, 11, 11]
    out2 = df.select(pl.col("b").mean().over("a").alias("m"))
    assert out2["m"].to_list() == [1.5, 1.5, 11 / 3, 11 / 3, 11 / 3]


def test_over_preserves_row_order(df):
    out = df.with_columns(mx=pl.col("b").max().over("a"))
    assert out["b"].to_list() == [1, 2, 3, 5, 3]  # original order intact
    assert out["mx"].to_list() == [2, 2, 5, 5, 5]


def test_over_multiple_keys():
    df = pl.DataFrame({"g1": [1, 1, 1, 2], "g2": ["x", "x", "y", "y"],
                       "v": [1, 2, 3, 4]})
    out = df.select(pl.col("v").sum().over("g1", "g2").alias("s"))
    assert out["s"].to_list() == [3, 3, 3, 4]


def test_over_expression_key():
    df = pl.DataFrame({"x": [1.1, 1.9, 2.2], "v": [1, 2, 3]})
    out = df.select(pl.col("v").sum().over(pl.col("x").floor()).alias("s"))
    assert out["s"].to_list() == [3, 3, 3]


def test_rank_over(df):
    out = df.select(pl.col("b").rank().over("a").alias("r"))
    assert out["r"].to_list() == [1.0, 2.0, 1.5, 3.0, 1.5]


def test_shift_over(df):
    out = df.select(pl.col("b").shift(1).over("a").alias("s"))
    assert out["s"].to_list() == [None, 1, None, 3, 5]


def test_cum_sum_over(df):
    out = df.select(pl.col("b").cum_sum().over("a").alias("c"))
    assert out["c"].to_list() == [1, 3, 3, 8, 11]


def test_first_last_over(df):
    out = df.select(
        pl.col("b").first().over("a").alias("f"),
        pl.col("b").last().over("a").alias("l"),
    )
    assert out["f"].to_list() == [1, 1, 3, 3, 3]
    assert out["l"].to_list() == [2, 2, 3, 3, 3]


def test_n_unique_len_over(df):
    out = df.select(
        pl.col("b").n_unique().over("a").alias("nu"),
        pl.len().over("a").alias("n"),
    )
    assert out["nu"].to_list() == [2, 2, 2, 2, 2]
    assert out["n"].to_list() == [2, 2, 3, 3, 3]


def test_over_with_nulls_in_values():
    df = pl.DataFrame({"g": [1, 1, 2, 2], "v": [None, 2, None, None]})
    out = df.select(
        pl.col("v").sum().over("g").alias("s"),
        pl.col("v").count().over("g").alias("c"),
        pl.col("v").max().over("g").alias("m"),
    )
    assert out["s"].to_list() == [2, 2, 0, 0]
    assert out["c"].to_list() == [1, 1, 0, 0]
    assert out["m"].to_list() == [2, 2, None, None]


def test_over_with_null_keys():
    df = pl.DataFrame({"g": [None, None, "a"], "v": [1, 2, 3]})
    out = df.select(pl.col("v").sum().over("g").alias("s"))
    assert out["s"].to_list() == [3, 3, 3]


def test_over_order_by():
    # order_by controls the ORDER the window fn sees, output stays row-order
    df = pl.DataFrame({"g": [1, 1, 1], "t": [3, 1, 2], "v": [30, 10, 20]})
    out = df.select(pl.col("v").cum_sum().over("g", order_by="t").alias("c"))
    assert out["c"].to_list() == [60, 10, 30]
    out2 = df.select(pl.col("v").shift(1).over("g", order_by="t").alias("s"))
    assert out2["s"].to_list() == [20, None, 10]


def test_window_and_elementwise_combined(df):
    out = df.select(((pl.col("b") - pl.col("b").mean().over("a")) ** 2).alias("d"))
    assert out["d"].to_list()[0] == pytest.approx(0.25)


def test_multiple_windows_one_select(df):
    out = df.select(
        pl.col("b").min().over("a").alias("mn"),
        pl.col("b").max().over("a").alias("mx"),
        pl.col("c").sum().over("a").alias("cs"),
    )
    assert out["mn"].to_list() == [1, 1, 3, 3, 3]
    assert out["mx"].to_list() == [2, 2, 5, 5, 5]
    assert out["cs"].to_list() == [6, 6, 24, 24, 24]


def test_over_on_whole_frame_literal_key():
    df = pl.DataFrame({"v": [1, 2, 3]})
    out = df.select(pl.col("v").sum().over(pl.lit(1)).alias("s"))
    assert out["s"].to_list() == [6, 6, 6]


def test_over_in_filter_context():
    df = pl.DataFrame({"g": [1, 1, 2, 2], "v": [1, 9, 2, 8]})
    out = df.filter(pl.col("v") == pl.col("v").max().over("g"))
    assert out.rows() == [(1, 9), (2, 8)]


def test_over_in_with_columns_keeps_width(df):
    out = df.with_columns(pl.col("b").sum().over("a").alias("s"))
    assert out.columns == ["a", "b", "c", "s"]
    assert out.height == df.height


def test_rank_methods_over():
    df = pl.DataFrame({"g": [1, 1, 1, 1], "v": [10, 20, 20, 30]})
    assert df.select(pl.col("v").rank("dense").over("g").alias("r"))["r"].to_list() == [1, 2, 2, 3]
    assert df.select(pl.col("v").rank("min").over("g").alias("r"))["r"].to_list() == [1, 2, 2, 4]
    assert df.select(pl.col("v").rank("max").over("g").alias("r"))["r"].to_list() == [1, 3, 3, 4]
    assert df.select(pl.col("v").rank("ordinal").over("g").alias("r"))["r"].to_list() == [1, 2, 3, 4]


def test_diff_pct_change_over():
    df = pl.DataFrame({"g": [1, 1, 1, 2, 2], "v": [1.0, 2.0, 4.0, 10.0, 20.0]})
    out = df.select(pl.col("v").diff().over("g").alias("d"))
    assert out["d"].to_list() == [None, 1.0, 2.0, None, 10.0]
    out2 = df.select(pl.col("v").pct_change().over("g").alias("p"))
    assert out2["p"].to_list() == [None, 1.0, 1.0, None, 1.0]


def test_distinct_flags_are_per_group_in_window():
    # nulls and equal values must not match across group boundaries
    df = pl.DataFrame({"g": [1, 1, 2, 2], "x": [7, 3, 7, 7]})
    assert df.select(
        pl.col("x").is_duplicated().over("g")
    ).to_series().to_list() == [False, False, True, True]
    dfn = pl.DataFrame({"g": [1, 1, 2], "x": [None, 1, None]})
    assert dfn.select(
        pl.col("x").is_first_distinct().over("g")
    ).to_series().to_list() == [True, True, True]
    assert dfn.select(
        pl.col("x").is_unique().over("g")
    ).to_series().to_list() == [True, True, True]


def test_fill_null_strategy_per_group():
    df = pl.DataFrame({"g": [1, 1, 1, 2, 2], "x": [4, None, 8, 1, None]})
    assert df.select(
        pl.col("x").fill_null(strategy="mean").over("g")
    ).to_series().to_list() == [4, 6, 8, 1, 1]
    assert df.select(
        pl.col("x").fill_null(strategy="min").over("g")
    ).to_series().to_list() == [4, 4, 8, 1, 1]
    assert df.select(
        pl.col("x").fill_null(strategy="max").over("g")
    ).to_series().to_list() == [4, 8, 8, 1, 1]
    # a group with no non-null values keeps its nulls
    dfa = pl.DataFrame({"g": [1, 2], "x": [None, 3]})
    assert dfa.select(
        pl.col("x").fill_null(strategy="mean").over("g")
    ).to_series().to_list() == [None, 3]
    # flat all-null column stays null too
    assert pl.Series("x", [None, None], dtype=pl.Int64).fill_null(
        strategy="min"
    ).to_list() == [None, None]


def test_rolling_over_groups():
    df = pl.DataFrame({"g": [1, 1, 1, 2, 2], "x": [1, 2, 3, 10, 20]})
    assert df.select(
        pl.col("x").rolling_sum(2).over("g")
    ).to_series().to_list() == [None, 3, 5, None, 30]
    assert df.select(
        pl.col("x").rolling_mean(2, min_samples=1).over("g")
    ).to_series().to_list() == [1.0, 1.5, 2.5, 10.0, 15.0]
    assert df.select(
        pl.col("x").rolling_max(3, min_samples=1).over("g")
    ).to_series().to_list() == [1, 2, 3, 10, 20]
    assert df.select(
        pl.col("x").rolling_median(2, min_samples=1).over("g")
    ).to_series().to_list() == [1.0, 1.5, 2.5, 10.0, 15.0]


def test_ewm_mean_nan_does_not_leak_across_groups():
    df = pl.DataFrame(
        {"g": [1, 1, 2, 2], "f": [float("nan"), 1.0, 2.0, 4.0]}
    )
    out = df.select(pl.col("f").ewm_mean(alpha=0.5).over("g")).to_series().to_list()
    import math
    assert math.isnan(out[0]) and math.isnan(out[1])
    assert out[2] == 2.0 and abs(out[3] - (2 + 4 * 2) / 3) < 1e-12


def test_peak_max_reference_semantics():
    # reference peaks.rs: boundaries compare against literal 0; null
    # comparisons propagate through Kleene AND
    s = pl.Series("x", [1, 5, 2, 4, 3])
    assert s.peak_max().to_list() == [False, True, False, True, False]
    assert s.peak_min().to_list() == [False, False, True, False, False]
    assert pl.Series("y", [5, None, 3]).peak_max().to_list() == [None, None, None]
    assert pl.Series("z", [-5, -10, -20]).peak_max().to_list() == [
        False, False, False]
    df = pl.DataFrame({"g": [1, 1, 1, 2, 2], "x": [1, 5, 2, 9, 1]})
    assert df.select(
        pl.col("x").peak_max().over("g")
    ).to_series().to_list() == [False, True, False, True, False]


def _ref_ewm(vals, alpha, adjust, min_periods, ignore_nulls, want, bias=False):
    """Direct python port of the reference EWM state machines
    (polars-compute/src/ewm/{mean,cov}.rs)."""
    ow = 1.0 if adjust else alpha
    mean = 0.0
    weight = 0.0
    cov = 0.0
    ws = 0.0
    w2 = 0.0
    nn = 0
    out = []
    for v in vals:
        if nn == 0 and v is not None:
            nn = 1
            mean = v
            weight = 1.0
            ws = 1.0
            w2 = 1.0
        else:
            if v is not None or not ignore_nulls:
                ws *= 1 - alpha
                w2 *= (1 - alpha) ** 2
                weight *= 1 - alpha
            if v is not None:
                nn += 1
                nw = weight + ow
                c = ow / nw
                newm = mean + (v - mean) * c
                cov = (weight * (cov + (mean - newm) ** 2) + ow * (v - newm) ** 2) / nw
                mean = newm
                weight = nw
                ws += ow
                w2 += ow * ow
                if not adjust:
                    ws /= nw
                    w2 /= nw * nw
                    weight = 1.0
        if v is None or nn < min_periods:
            out.append(None)
        elif want == "mean":
            out.append(mean)
        elif bias:
            out.append(cov)
        else:
            numer = ws * ws
            denom = numer - w2
            out.append(numer / denom * cov if denom > 0 else None)
    return out


def test_ewm_exact_reference_recurrences():
    """round-5: ewm_mean/var/std previously dropped min_samples and bias and
    always behaved as ignore_nulls=True. Now every (adjust, ignore_nulls,
    min_samples, bias) combination matches the reference state machine."""
    import numpy as np

    rng = np.random.default_rng(3)
    x = rng.normal(size=40)
    null_at = rng.random(40) < 0.25
    vals = [None if m else float(v) for v, m in zip(x, null_at)]
    df = pl.DataFrame({"x": vals})
    for adjust in (True, False):
        for ignore_nulls in (True, False):
            for minp in (1, 3):
                got = df.lazy().select(pl.col("x").ewm_mean(
                    alpha=0.3, adjust=adjust, ignore_nulls=ignore_nulls,
                    min_samples=minp)).collect()["x"].to_list()
                ref = _ref_ewm(vals, 0.3, adjust, minp, ignore_nulls, "mean")
                label = f"mean adj={adjust} ign={ignore_nulls} minp={minp}"
                for g, e in zip(got, ref):
                    assert (g is None) == (e is None), label
                    if g is not None:
                        assert abs(g - e) < 1e-10, label
                for bias in (True, False):
                    gv = df.lazy().select(pl.col("x").ewm_var(
                        alpha=0.3, adjust=adjust, ignore_nulls=ignore_nulls,
                        min_samples=minp, bias=bias)).collect()["x"].to_list()
                    gs = df.lazy().select(pl.col("x").ewm_std(
                        alpha=0.3, adjust=adjust, ignore_nulls=ignore_nulls,
                        min_samples=minp, bias=bias)).collect()["x"].to_list()
                    rv = _ref_ewm(vals, 0.3, adjust, minp, ignore_nulls, "var", bias)
                    label = f"var adj={adjust} ign={ignore_nulls} minp={minp} bias={bias}"
                    for g, s_, e in zip(gv, gs, rv):
                        assert (g is None) == (e is None), label
                        if g is not None:
                            assert abs(g - e) < 1e-8, label
                            assert abs(s_ - e ** 0.5) < 1e-8, label
