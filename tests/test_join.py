"""Joins (mirrors py-polars tests/unit/operations/test_join.py)."""

import numpy as np
import pandas as pd
import pytest

import polars_tpu as pl
from polars_tpu.testing import assert_frame_equal


@pytest.fixture
def left() -> pl.DataFrame:
    return pl.DataFrame({"k": [1, 2, 3, 4], "lv": ["a", "b", "c", "d"]})


@pytest.fixture
def right() -> pl.DataFrame:
    return pl.DataFrame({"k": [2, 3, 3, 5], "rv": [20, 30, 31, 50]})


def test_inner(left, right):
    out = left.join(right, on="k").sort("k", "rv")
    assert out.columns == ["k", "lv", "rv"]
    assert out.get_column("k").to_list() == [2, 3, 3]
    assert out.get_column("rv").to_list() == [20, 30, 31]


def test_left(left, right):
    out = left.join(right, on="k", how="left").sort("k", "rv")
    assert out.get_column("k").to_list() == [1, 2, 3, 3, 4]
    assert out.get_column("rv").to_list() == [None, 20, 30, 31, None]


def test_semi_anti(left, right):
    semi = left.join(right, on="k", how="semi").sort("k")
    assert semi.get_column("k").to_list() == [2, 3]
    assert semi.columns == ["k", "lv"]
    anti = left.join(right, on="k", how="anti").sort("k")
    assert anti.get_column("k").to_list() == [1, 4]


def test_full(left, right):
    out = left.join(right, on="k", how="full", coalesce=True).sort("k")
    assert out.get_column("k").to_list() == [1, 2, 3, 3, 4, 5]
    assert out.get_column("rv").to_list() == [None, 20, 30, 31, None, 50]
    assert out.get_column("lv").to_list() == ["a", "b", "c", "c", "d", None]


def test_right(left, right):
    out = left.join(right, on="k", how="right").sort("k", "rv")
    assert out.get_column("k").to_list() == [2, 3, 3, 5]
    assert out.get_column("lv").to_list() == ["b", "c", "c", None]


def test_cross(left):
    small = pl.DataFrame({"x": [10, 20]})
    out = left.join(small, how="cross")
    assert out.height == 8
    assert out.columns == ["k", "lv", "x"]


def test_suffix():
    a = pl.DataFrame({"k": [1], "v": [1]})
    b = pl.DataFrame({"k": [1], "v": [2]})
    out = a.join(b, on="k")
    assert out.columns == ["k", "v", "v_right"]
    out = a.join(b, on="k", suffix="_b")
    assert out.columns == ["k", "v", "v_b"]


def test_left_right_on():
    a = pl.DataFrame({"ka": [1, 2], "v": [1, 2]})
    b = pl.DataFrame({"kb": [2, 3], "w": [20, 30]})
    out = a.join(b, left_on="ka", right_on="kb").sort("ka")
    assert out.get_column("ka").to_list() == [2]
    assert out.get_column("w").to_list() == [20]


def test_string_keys():
    a = pl.DataFrame({"s": ["x", "y", "z"], "v": [1, 2, 3]})
    b = pl.DataFrame({"s": ["y", "z", "w"], "w": [20, 30, 40]})
    out = a.join(b, on="s").sort("s")
    assert out.get_column("s").to_list() == ["y", "z"]
    assert out.get_column("w").to_list() == [20, 30]


def test_multi_key_join():
    a = pl.DataFrame({"k1": [1, 1, 2], "k2": ["x", "y", "x"], "v": [1, 2, 3]})
    b = pl.DataFrame({"k1": [1, 2, 2], "k2": ["x", "x", "z"], "w": [10, 20, 30]})
    out = a.join(b, on=["k1", "k2"]).sort("v")
    assert out.get_column("v").to_list() == [1, 3]
    assert out.get_column("w").to_list() == [10, 20]


def test_join_nulls():
    a = pl.DataFrame({"k": [1, None], "v": [1, 2]})
    b = pl.DataFrame({"k": [1, None], "w": [10, 20]})
    out = a.join(b, on="k")
    assert out.height == 1
    out = a.join(b, on="k", nulls_equal=True).sort("v")
    assert out.height == 2
    assert out.get_column("w").to_list() == [10, 20]


def test_join_expr_keys():
    a = pl.DataFrame({"k": [1, 2], "v": [1, 2]})
    b = pl.DataFrame({"k2": [2, 4], "w": [20, 40]})
    out = a.join(b, left_on=pl.col("k") * 2, right_on="k2").sort("v")
    assert out.get_column("w").to_list() == [20, 40]


def test_float_key_join():
    a = pl.DataFrame({"k": [1.5, 2.5]})
    b = pl.DataFrame({"k": [2.5, 3.5], "w": [1, 2]})
    out = a.join(b, on="k")
    assert out.get_column("w").to_list() == [1]


def test_big_join_vs_pandas(rng):
    n = 5_000
    lk = rng.integers(0, 2000, n)
    rk = rng.integers(0, 2000, n)
    lv = rng.normal(size=n)
    rv = rng.normal(size=n)
    a = pl.DataFrame({"k": lk, "lv": lv})
    b = pl.DataFrame({"k": rk, "rv": rv})
    out = a.join(b, on="k")
    exp = pd.merge(pd.DataFrame({"k": lk, "lv": lv}), pd.DataFrame({"k": rk, "rv": rv}), on="k")
    assert out.height == len(exp)
    assert abs(sum(out.get_column("rv").to_list()) - exp["rv"].sum()) < 1e-6


def test_join_where():
    a = pl.DataFrame({"x": [1, 2, 3]})
    b = pl.DataFrame({"y": [2, 3, 4]})
    out = a.join_where(b, pl.col("x") > pl.col("y"))
    assert out.height == 1
    assert out.to_dicts() == [{"x": 3, "y": 2}]


def test_asof_backward():
    quotes = pl.DataFrame({"t": [1, 3, 5, 7], "price": [10.0, 11.0, 12.0, 13.0]})
    trades = pl.DataFrame({"t": [2, 5, 8]})
    out = trades.join_asof(quotes, on="t")
    assert out.get_column("price").to_list() == [10.0, 12.0, 13.0]


def test_asof_forward():
    quotes = pl.DataFrame({"t": [1, 3, 5, 7], "price": [10.0, 11.0, 12.0, 13.0]})
    trades = pl.DataFrame({"t": [2, 5, 8]})
    out = trades.join_asof(quotes, on="t", strategy="forward")
    assert out.get_column("price").to_list() == [11.0, 12.0, None]


def test_update():
    a = pl.DataFrame({"k": [1, 2, 3], "v": [10, 20, 30], "w": ["x", "y", "z"]})
    b = pl.DataFrame({"k": [2, 3], "v": [99, None]})
    out = a.update(b, on="k").sort("k")
    assert out.get_column("v").to_list() == [10, 99, 30]
    out2 = a.update(b, on="k", include_nulls=True).sort("k")
    assert out2.get_column("v").to_list() == [10, 99, None]


def test_merge_sorted():
    a = pl.DataFrame({"t": [1, 3, 5], "s": ["a1", "a3", "a5"]})
    b = pl.DataFrame({"t": [2, 3, 6], "s": ["b2", "b3", "b6"]})
    out = a.merge_sorted(b, "t")
    assert out.get_column("t").to_list() == [1, 2, 3, 3, 5, 6]


def test_asof_join_by():
    trades = pl.DataFrame({
        "sym": ["A", "A", "B", "B", "A"],
        "t": [3, 7, 2, 9, 1],
        "qty": [10, 20, 30, 40, 50],
    })
    quotes = pl.DataFrame({
        "sym": ["A", "A", "B", "B"],
        "t": [2, 6, 1, 8],
        "px": [1.0, 2.0, 3.0, 4.0],
    })
    out = trades.lazy().join_asof(quotes.lazy(), on="t", by="sym").collect()
    assert out["px"].to_list() == [1.0, 2.0, 3.0, 4.0, None]
    fwd = trades.lazy().join_asof(quotes.lazy(), on="t", by="sym", strategy="forward").collect()
    assert fwd["px"].to_list() == [2.0, None, 4.0, None, 1.0]
    tol = trades.lazy().join_asof(quotes.lazy(), on="t", by="sym", tolerance=1).collect()
    assert tol["px"].to_list() == [1.0, 2.0, 3.0, 4.0, None]


def test_join_where_equi_split():
    east = pl.DataFrame({"id": [100, 101, 102], "dur": [120, 140, 160], "ecores": [2, 8, 4]})
    west = pl.DataFrame({"t_id": [404, 498, 676, 742], "time": [90, 130, 150, 170], "wcores": [4, 2, 1, 4]})
    out = east.join_where(west, pl.col("ecores") == pl.col("wcores"), pl.col("dur") < pl.col("time"))
    assert sorted((r["id"], r["t_id"]) for r in out.to_dicts()) == [(100, 498), (102, 742)]
    out2 = east.join_where(west, pl.col("dur") < pl.col("time"))
    assert out2.height == 6


def test_range_join_differential():
    """Pure-inequality join_where runs the sort-based range path (iejoin
    analogue, engine/join.range_join_frames) — differential vs a brute-force
    pandas cross product, across ops/nulls/NaN/duplicates."""
    import itertools

    import numpy as np

    rng = np.random.default_rng(11)
    n_l, n_r = 37, 53
    lx = rng.integers(0, 12, n_l).astype(float)
    rx = rng.integers(0, 12, n_r).astype(float)
    lx[rng.random(n_l) < 0.15] = np.nan
    a = pl.DataFrame({"x": [None if np.isnan(v) else v for v in lx], "li": list(range(n_l))})
    b = pl.DataFrame({"y": [float("nan") if i % 9 == 0 else float(v) for i, v in enumerate(rx)], "ri": list(range(n_r))})
    for op, fn in [("<", np.less), ("<=", np.less_equal), (">", np.greater), (">=", np.greater_equal)]:
        pred = {"<": pl.col("x") < pl.col("y"), "<=": pl.col("x") <= pl.col("y"),
                ">": pl.col("x") > pl.col("y"), ">=": pl.col("x") >= pl.col("y")}[op]
        out = a.join_where(b, pred)
        got = sorted(zip(out["li"].to_list(), out["ri"].to_list()))
        exp = sorted(
            (i, j)
            for i, j in itertools.product(range(n_l), range(n_r))
            if not np.isnan(lx[i]) and not np.isnan(b["y"].to_list()[j]) and fn(lx[i], b["y"].to_list()[j])
        )
        assert got == exp, f"op {op}: {len(got)} vs {len(exp)} pairs"


def test_range_join_flipped_strings_and_rest():
    # right-op-left orientation flips the operator
    a = pl.DataFrame({"x": [5, 1, 3]})
    b = pl.DataFrame({"y": [2, 4]})
    out = a.join_where(b, pl.col("y") < pl.col("x"))
    assert sorted((r["x"], r["y"]) for r in out.to_dicts()) == [(3, 2), (5, 2), (5, 4)]
    # dict-coded strings compare by ordinal code
    s1 = pl.DataFrame({"s": ["b", "d", "a"], "i": [0, 1, 2]})
    s2 = pl.DataFrame({"t": ["c", "a"], "j": [0, 1]})
    out = s1.join_where(s2, pl.col("s") > pl.col("t"))
    assert sorted((r["i"], r["j"]) for r in out.to_dicts()) == [(0, 1), (1, 0), (1, 1)]
    # extra non-driver predicate filters the range output
    e1 = pl.DataFrame({"x": [1, 2, 3], "u": [10, 20, 30]})
    e2 = pl.DataFrame({"y": [0, 0, 5], "w": [15, 25, 35]})
    out = e1.join_where(e2, pl.col("x") > pl.col("y"), pl.col("u") < pl.col("w"))
    got = sorted((r["x"], r["y"], r["u"], r["w"]) for r in out.to_dicts())
    exp = sorted(
        (x, y, u, w)
        for (x, u) in [(1, 10), (2, 20), (3, 30)]
        for (y, w) in [(0, 15), (0, 25), (5, 35)]
        if x > y and u < w
    )
    assert got == exp
    # empty result
    out = pl.DataFrame({"x": [1]}).join_where(pl.DataFrame({"y": [5]}), pl.col("x") > pl.col("y"))
    assert out.height == 0


def test_fused_join_propagates_list_and_struct_children():
    """ADVICE r2 (high): trace_join must carry v.child through the gathered
    Vals — List/Struct columns survive a fused m:1 join and explode works."""
    left = pl.DataFrame({"k": [1, 2, 3], "v": [[1, 2], [3], [4, 5, 6]]})
    right = pl.DataFrame({"k": [1, 2, 3], "w": [10, 20, 30]})
    out = left.lazy().join(right.lazy(), on="k", validate="m:1").collect()
    assert out["v"].to_list() == [[1, 2], [3], [4, 5, 6]]
    out2 = (
        left.lazy().join(right.lazy(), on="k", validate="m:1").explode("v").collect()
    )
    assert out2["v"].to_list() == [1, 2, 3, 4, 5, 6]
    assert out2["w"].to_list() == [10, 10, 20, 30, 30, 30]
    # right-side List + Struct gather through the build side
    l2 = pl.DataFrame({"k": [2, 1], "a": [7, 8]})
    r2 = pl.DataFrame({"k": [1, 2], "v": [[1, 2], [3]], "s": [{"x": 1}, {"x": 2}]})
    out3 = l2.lazy().join(r2.lazy(), on="k", validate="m:1").collect()
    assert out3["v"].to_list() == [[3], [1, 2]]
    assert out3["s"].to_list() == [{"x": 2}, {"x": 1}]
    # left join: unmatched probe rows get null lists (zeroed packed words)
    l3 = pl.DataFrame({"k": [1, 9]})
    out4 = l3.lazy().join(r2.lazy(), on="k", how="left", validate="m:1").collect()
    assert out4["v"].to_list() == [[1, 2], None]


def test_multikey_pack_exact_no_verify():
    """r5 (SURVEY 2.5 polars-row): small fixed-width multi-key joins pack
    into ONE exact int64 word (polars-row fixed encoding analogue) — no
    hash, no candidate verification; wide tuples keep the hash+verify path."""
    import numpy as np

    import polars_tpu as pl
    from polars_tpu.core.frame import DataFrame
    from polars_tpu.engine.join import _side_keys

    rng = np.random.default_rng(3)
    n = 1000
    df = pl.DataFrame({
        "i": rng.integers(-50, 50, n).astype(np.int32),
        "s": [f"g{v}" for v in rng.integers(0, 10, n)],
        "b": rng.integers(0, 2, n).astype(bool),
        "big": rng.integers(0, 1 << 40, n),  # int64: no width bound
    })
    cols = [df._get("i"), df._get("s"), df._get("b")]
    _k, _m, verify = _side_keys(cols, cols, False)
    assert verify is False  # int32(33) + dict10(6) + bool(2) + seps fits 63

    wide = [df._get("i"), df._get("big")]
    _k2, _m2, verify2 = _side_keys(wide, wide, False)
    assert verify2 is True  # int64 key: falls back to hash + verify

    # end-to-end: packed join matches the single-key decomposition
    left = df.lazy().group_by("i", "s", "b").agg(v=pl.len())
    out = (
        left.join(left, on=["i", "s", "b"], how="inner", validate="1:1")
        .collect()
    )
    assert out.height == left.collect().height
