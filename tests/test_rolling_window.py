"""Time-window rolling group-by (reference: polars-time rolling)."""

import datetime as dtm

import pytest

import polars_tpu as pl


def _df():
    return pl.DataFrame({
        "ts": [dtm.datetime(2024, 1, 1, 0, m) for m in (0, 10, 20, 40, 50)],
        "v": [1.0, 2.0, 3.0, 4.0, 5.0],
    })


def test_rolling_basic_aggs():
    out = _df().lazy().rolling("ts", period="25m").agg(
        pl.col("v").sum().alias("s"), pl.col("v").mean().alias("m"),
        pl.col("v").min().alias("lo"), pl.col("v").max().alias("hi"),
        pl.col("v").count().alias("n"),
    ).collect()
    assert out["s"].to_list() == [1.0, 3.0, 6.0, 7.0, 9.0]
    assert out["m"].to_list() == [1.0, 1.5, 2.0, 3.5, 4.5]
    assert out["lo"].to_list() == [1.0, 1.0, 1.0, 3.0, 4.0]
    assert out["hi"].to_list() == [1.0, 2.0, 3.0, 4.0, 5.0]
    assert out["n"].to_list() == [1, 2, 3, 2, 2]


def test_rolling_group_by():
    g = pl.DataFrame({
        "ts": [dtm.datetime(2024, 1, 1, 0, m) for m in (0, 10, 20, 0, 10)],
        "v": [1.0, 2.0, 3.0, 10.0, 20.0],
        "k": ["a", "a", "a", "b", "b"],
    })
    out = g.lazy().rolling("ts", period="15m", group_by=["k"]).agg(
        pl.col("v").sum().alias("s")).collect()
    assert out["s"].to_list() == [1.0, 3.0, 5.0, 10.0, 30.0]


def test_rolling_closed_and_offset():
    # closed='both' with period 20m: [t-20, t]
    out = _df().lazy().rolling("ts", period="20m", offset="-20m", closed="both").agg(
        pl.col("v").sum().alias("s")).collect()
    assert out["s"].to_list() == [1.0, 3.0, 6.0, 7.0, 9.0]


def test_rolling_var_std():
    out = _df().lazy().rolling("ts", period="25m").agg(
        pl.col("v").var().alias("var")).collect()
    # row2 window {1,2,3}: var = 1.0
    assert abs(out["var"].to_list()[2] - 1.0) < 1e-12


def test_rolling_first_last():
    out = _df().lazy().rolling("ts", period="25m").agg(
        pl.col("v").first().alias("f"), pl.col("v").last().alias("l")).collect()
    assert out["f"].to_list() == [1.0, 1.0, 1.0, 3.0, 4.0]
    assert out["l"].to_list() == [1.0, 2.0, 3.0, 4.0, 5.0]


def test_rolling_by_exprs():
    df = pl.DataFrame({
        "t": [dtm.datetime(2024, 1, 1, 0, m) for m in (0, 10, 20, 40, 50)],
        "v": [1.0, 2.0, 3.0, 4.0, 5.0],
    })
    out = df.select(pl.col("v").rolling_sum_by("t", "25m").alias("s"))
    assert out["s"].to_list() == [1.0, 3.0, 6.0, 7.0, 9.0]
    shuffled = df.gather([3, 0, 4, 1, 2])
    out2 = shuffled.select(pl.col("v").rolling_sum_by("t", "25m").alias("s"))
    assert out2["s"].to_list() == [7.0, 1.0, 9.0, 3.0, 6.0]


def test_rolling_by_long_span_no_overflow():
    # round-1 advisor (high): the (1<<40)*k_stride invalid-row sentinel
    # overflowed int64 for a 30-day us span, returning all nulls
    days = list(range(30))
    df = pl.DataFrame({
        "ts": [dtm.datetime(2024, 1, 1) + dtm.timedelta(days=d) for d in days],
        "v": [float(d) for d in days],
    })
    out = df.lazy().select(
        pl.col("v").rolling_sum_by("ts", "3d").alias("s")
    ).collect()
    got = out["s"].to_list()
    assert got[0] == 0.0 and got[1] == 1.0 and got[2] == 3.0
    assert got[10] == 8.0 + 9.0 + 10.0


def test_rolling_by_window_larger_than_span():
    # '1h' window over 50 minutes of data must NOT be all nulls
    df = _df()
    out = df.lazy().select(pl.col("v").rolling_sum_by("ts", "1h").alias("s")).collect()
    assert out["s"].to_list() == [1.0, 3.0, 6.0, 10.0, 15.0]


def test_rolling_by_min_samples():
    df = _df()
    out = df.lazy().select(
        pl.col("v").rolling_sum_by("ts", "25m", min_samples=3).alias("s")
    ).collect()
    # windows: sizes 1,2,3,2,2 -> only the third has >= 3 samples
    assert out["s"].to_list() == [None, None, 6.0, None, None]


def test_rolling_by_ddof():
    df = _df()
    v1 = df.lazy().select(
        pl.col("v").rolling_var_by("ts", "25m", ddof=0).alias("s")
    ).collect()["s"].to_list()
    v2 = df.lazy().select(
        pl.col("v").rolling_var_by("ts", "25m", ddof=1).alias("s")
    ).collect()["s"].to_list()
    # third window holds [1,2,3]: population var 2/3, sample var 1.0
    assert abs(v1[2] - 2.0 / 3.0) < 1e-12
    assert abs(v2[2] - 1.0) < 1e-12


def test_rolling_by_null_index_rows():
    df = pl.DataFrame({
        "ts": [dtm.datetime(2024, 1, 1, 0, m) if m is not None else None for m in (0, 10, None, 40, 50)],
        "v": [1.0, 2.0, 3.0, 4.0, 5.0],
    })
    out = df.lazy().select(pl.col("v").rolling_sum_by("ts", "25m").alias("s")).collect()
    got = out["s"].to_list()
    assert got[2] is None  # null index -> null output
    assert got[0] == 1.0 and got[1] == 3.0


def test_rolling_by_fuses_into_one_segment(monkeypatch):
    # round-1 verdict #6: rolling_*_by must run INSIDE the traced segment —
    # filter -> rolling_mean_by -> agg is exactly ONE run_segment call
    from polars_tpu.engine import executors, run

    calls = []
    orig = executors.run_segment

    def counting(node, leaf_dfs, **kw):
        calls.append(type(node).__name__)
        return orig(node, leaf_dfs, **kw)

    monkeypatch.setattr(executors, "run_segment", counting)
    monkeypatch.setattr(run, "run_segment", counting)
    df = _df()
    out = (
        df.lazy()
        .filter(pl.col("v") > 0)
        .select(pl.col("v").rolling_mean_by("ts", "25m").sum().alias("s"))
        .collect()
    )
    assert len(calls) == 1, calls
    assert abs(out["s"].to_list()[0] - (1.0 + 1.5 + 2.0 + 3.5 + 4.5)) < 1e-12


def test_rolling_by_closed_variants_oracle():
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(3)
    n = 80
    t = np.sort(rng.integers(0, 40_000, n)).astype("datetime64[us]")
    v = rng.normal(size=n)
    df = pl.DataFrame({"t": t, "v": v})
    for closed, pd_closed in (("right", "right"), ("left", "left"), ("both", "both"), ("none", "neither")):
        out = df.lazy().select(
            pl.col("v").rolling_sum_by("t", "5s", closed=closed).alias("s")
        ).collect()["s"].to_list()
        exp = pd.Series(v, index=pd.DatetimeIndex(t)).rolling("5s", closed=pd_closed, min_periods=1).sum()
        got = np.array([np.nan if x is None else x for x in out])
        assert np.allclose(got, exp.to_numpy(), equal_nan=True, rtol=1e-9), closed


def test_weighted_rolling_matches_reference_formulas():
    """round-5: weights were previously ACCEPTED AND IGNORED. Semantics now
    follow the reference: sum = dot(v, w); mean = dot/sum(w); min/max over
    v*w; var/std single-pass weighted (ddof ignored); quantile/median via
    compute_wq (no_nulls/quantile.rs:194 — Julia StatsBase definition).
    Truncated start windows align to the weights TAIL."""
    x = [3.0, 1.0, 4.0, 1.5, 9.0, 2.0]
    w = [0.5, 1.0, 2.0]
    df = pl.DataFrame({"x": x})
    out = df.lazy().select(
        pl.col("x").rolling_sum(3, weights=w, min_samples=1).alias("ws"),
        pl.col("x").rolling_mean(3, weights=w, min_samples=1).alias("wm"),
        pl.col("x").rolling_min(3, weights=w).alias("wmin"),
        pl.col("x").rolling_max(3, weights=w).alias("wmax"),
        pl.col("x").rolling_var(3, weights=w).alias("wv"),
        pl.col("x").rolling_median(3, weights=w).alias("wmed"),
        pl.col("x").rolling_quantile(0.4, "linear", 3, weights=w).alias("wq"),
    ).collect()

    def win(i, n=3):
        lo = max(i - n + 1, 0)
        vals = x[lo:i + 1]
        return vals, w[len(w) - len(vals):]

    def wq_oracle(vals, wts, p):
        buf = sorted(zip(vals, wts))
        wsum = sum(w)
        s = s_old = 0.0
        vk = v_old = 0.0
        h = p * (wsum - buf[0][1]) + buf[0][1]
        for v_, w_ in buf:
            if s > h:
                break
            s_old, v_old, vk = s, vk, v_
            s += w_
        if h == s_old:
            return v_old
        return v_old + (h - s_old) / (s - s_old) * (vk - v_old)

    for i in range(len(x)):
        vals, wts = win(i)
        assert out["wm"].to_list()[i] == pytest.approx(
            sum(a * b for a, b in zip(vals, wts)) / sum(wts))
        if i >= 2:
            assert out["ws"].to_list()[i] == pytest.approx(
                sum(a * b for a, b in zip(vals, wts)))
            assert out["wmin"].to_list()[i] == pytest.approx(
                min(a * b for a, b in zip(vals, wts)))
            assert out["wmax"].to_list()[i] == pytest.approx(
                max(a * b for a, b in zip(vals, wts)))
            wtot = sum(wts)
            mean = sum(a * b for a, b in zip(vals, wts)) / wtot
            var = sum(a * a * b for a, b in zip(vals, wts)) / wtot - mean * mean
            assert out["wv"].to_list()[i] == pytest.approx(var)
            assert out["wmed"].to_list()[i] == pytest.approx(
                wq_oracle(vals, wts, 0.5))
            assert out["wq"].to_list()[i] == pytest.approx(
                wq_oracle(vals, wts, 0.4))
    # nulls + weights: loud error, like the reference's nulls-path panic
    dfn = pl.DataFrame({"x": [1.0, None, 3.0]})
    with pytest.raises(Exception, match="null"):
        dfn.lazy().select(pl.col("x").rolling_sum(2, weights=[1.0, 2.0])).collect()


def test_rolling_rank_methods_and_center_quantile():
    """round-5: rolling_rank method/descending were dropped (always average);
    rolling_median/quantile ignored center."""
    x = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0]
    df = pl.DataFrame({"x": x})
    out = df.lazy().select(
        pl.col("x").rolling_median(3, min_samples=1, center=True).alias("cm"),
        pl.col("x").rolling_rank(3, method="min", min_samples=1).alias("rmin"),
        pl.col("x").rolling_rank(3, method="max", min_samples=1).alias("rmax"),
        pl.col("x").rolling_rank(3, method="ordinal", min_samples=1).alias("rord"),
        pl.col("x").rolling_rank(3, method="dense", min_samples=1).alias("rd"),
        pl.col("x").rolling_rank(3, descending=True, min_samples=1).alias("rdesc"),
    ).collect()
    # centered windows: [3,1] [3,1,4] [1,4,1] [4,1,5] [1,5,9] [5,9]
    assert out["cm"].to_list() == [2.0, 3.0, 1.0, 4.0, 5.0, 7.0]
    # i=3 window [4,1,1]: cur=1 -> less=0, eq=2
    assert out["rmin"].to_list()[3] == 1.0
    assert out["rmax"].to_list()[3] == 2.0
    assert out["rord"].to_list()[3] == 2.0
    assert out["rd"].to_list()[3] == 1.0
    assert out["rdesc"].to_list()[5] == 1.0
    import pytest as _pt

    with _pt.raises(Exception, match="random"):
        df.lazy().select(pl.col("x").rolling_rank(3, method="random")).collect()


def test_hash_more_seeds_change_output():
    df = pl.DataFrame({"x": [3.0, 1.0, 4.0]})
    h1 = df.select(pl.col("x").hash(1))["x"].to_list()
    h2 = df.select(pl.col("x").hash(1, 2, 3, 4))["x"].to_list()
    assert h1 != h2 and len(set(h1)) == 3
