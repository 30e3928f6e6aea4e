"""Expression-level CSE (VERDICT r3 item 10; reference:
polars-plan/src/plans/optimizer/cse/cse_expr.rs): an expensive agg/window
subexpression computed in a with_columns and repeated verbatim above a
row-preserving barrier is rewritten to a column reference — the duplicated
``sum(x)`` traces ONCE."""

import numpy as np
import pandas as pd

import polars_tpu as pl
from polars_tpu.plan import exprs as E
from polars_tpu.plan import logical as L
from polars_tpu.plan.optimizer import optimize


def _df():
    rng = np.random.default_rng(3)
    return pl.DataFrame({
        "k": rng.integers(0, 7, 200),
        "x": rng.normal(size=200),
        "t": rng.integers(0, 1000, 200),
    })


def _count_windows(plan: L.LNode) -> int:
    n = 0
    stack = [plan]
    while stack:
        cur = stack.pop()
        for e in cur.exprs() if hasattr(cur, "exprs") else ():
            n += sum(isinstance(s, E.EWindow) for s in E.walk(e))
        stack.extend(cur.inputs())
    return n


def test_duplicated_window_traced_once_plan_shape():
    lf = (
        _df().lazy()
        .with_columns(s=pl.col("x").sum().over("k"))
        .sort("t")
        .with_columns(d=pl.col("x").sum().over("k") * 2)
        .filter(pl.col("x").sum().over("k") > -1e9)
    )
    before = _count_windows(lf._node)
    after = _count_windows(optimize(lf._node))
    assert before == 3
    assert after == 1  # the two later occurrences became col("s")

    # results identical with and without the pass
    got = lf.collect()
    raw = lf.collect(optimizations=pl.QueryOptFlags(comm_subexpr_elim=False))
    pd.testing.assert_frame_equal(got.to_pandas(), raw.to_pandas())


def test_cse_blocked_by_filter_and_redefinition():
    df = _df()
    # a filter between def and use changes group membership: must NOT reuse
    lf = (
        df.lazy()
        .with_columns(s=pl.col("x").sum().over("k"))
        .filter(pl.col("x") > 0)
        .with_columns(d=pl.col("x").sum().over("k"))
    )
    opt = optimize(lf._node)
    assert _count_windows(opt) == 2  # both windows survive
    got = lf.collect()
    exp = (
        df.to_pandas()
        .assign(s=lambda p: p.groupby("k")["x"].transform("sum"))
        .query("x > 0")
        .assign(d=lambda p: p.groupby("k")["x"].transform("sum"))
    )
    pd.testing.assert_frame_equal(
        got.to_pandas().reset_index(drop=True), exp.reset_index(drop=True)
    )

    # redefining an input column between def and use kills the def
    lf2 = (
        df.lazy()
        .with_columns(s=pl.col("x").sum().over("k"))
        .with_columns(x=pl.col("x") + 1)
        .with_columns(d=pl.col("x").sum().over("k"))
    )
    assert _count_windows(optimize(lf2._node)) == 2
    out = lf2.collect()
    assert not np.allclose(out["s"].to_numpy(), out["d"].to_numpy())


def test_cse_bare_agg_broadcast():
    lf = (
        _df().lazy()
        .with_columns(tot=pl.col("x").sum())
        .sort("t")
        .with_columns(frac=pl.col("x").sum() / 100.0)
    )
    opt = optimize(lf._node)

    def count_aggs(plan):
        n = 0
        stack = [plan]
        while stack:
            cur = stack.pop()
            for e in cur.exprs() if hasattr(cur, "exprs") else ():
                n += sum(isinstance(s, E.EAgg) for s in E.walk(e))
            stack.extend(cur.inputs())
        return n

    assert count_aggs(opt) == 1
    out = lf.collect()
    assert np.allclose(out["frac"].to_numpy(), out["tot"].to_numpy() / 100.0)
