"""Optimizer correctness: plans contain/lack nodes after pushdowns
(reference pattern: polars-lazy/src/tests/optimization_checks.rs)."""

import polars_tpu as pl
from polars_tpu.plan import logical as L
from polars_tpu.plan.optimizer import optimize
from polars_tpu.testing import assert_frame_equal


def _nodes(plan):
    out = [plan]
    for i in plan.inputs():
        out.extend(_nodes(i))
    return out


def _find(plan, cls):
    return [n for n in _nodes(plan) if isinstance(n, cls)]


def test_predicate_pushdown_to_scan(tmp_path):
    df = pl.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    p = tmp_path / "t.parquet"
    df.write_parquet(p)
    lf = pl.scan_parquet(p).select("a", "b").filter(pl.col("a") > 1)
    plan = optimize(lf._node)
    scans = _find(plan, L.LScan)
    assert len(scans) == 1
    assert scans[0].predicate is not None
    assert not _find(plan, L.LFilter)
    assert_frame_equal(lf.collect(), df.filter(pl.col("a") > 1))


def test_predicate_pushdown_through_join():
    a = pl.DataFrame({"k": [1, 2], "v": [1, 2]}).lazy()
    b = pl.DataFrame({"k": [1, 2], "w": [10, 20]}).lazy()
    lf = a.join(b, on="k").filter(pl.col("v") > 1).filter(pl.col("w") < 100)
    plan = optimize(lf._node)
    join = _find(plan, L.LJoin)[0]
    # both predicates moved below the join
    assert isinstance(join.input_left, L.LFilter)
    assert isinstance(join.input_right, L.LFilter)


def test_predicate_not_pushed_past_slice():
    lf = pl.DataFrame({"a": [3, 1, 2]}).lazy().head(2).filter(pl.col("a") > 1)
    plan = optimize(lf._node)
    # filter must remain above the slice
    assert isinstance(plan, L.LFilter)
    out = lf.collect()
    assert out.get_column("a").to_list() == [3]


def test_projection_pushdown_to_scan(tmp_path):
    df = pl.DataFrame({"a": [1], "b": [2], "c": [3]})
    p = tmp_path / "t.parquet"
    df.write_parquet(p)
    lf = pl.scan_parquet(p).select("a")
    plan = optimize(lf._node)
    scan = _find(plan, L.LScan)[0]
    assert scan.projection == ("a",)


def test_projection_pushdown_through_join(tmp_path):
    a = pl.DataFrame({"k": [1], "v": [1], "unused": [9]})
    b = pl.DataFrame({"k": [1], "w": [10], "unused2": [9]})
    pa_, pb = tmp_path / "a.parquet", tmp_path / "b.parquet"
    a.write_parquet(pa_)
    b.write_parquet(pb)
    lf = pl.scan_parquet(pa_).join(pl.scan_parquet(pb), on="k").select("v", "w")
    plan = optimize(lf._node)
    scans = _find(plan, L.LScan)
    projs = {s.sources[0]: set(s.projection) for s in scans}
    assert projs[str(pa_)] == {"k", "v"}
    assert projs[str(pb)] == {"k", "w"}
    assert lf.collect().to_dicts() == [{"v": 1, "w": 10}]


def test_slice_pushdown_to_scan(tmp_path):
    df = pl.DataFrame({"a": list(range(100))})
    p = tmp_path / "t.parquet"
    df.write_parquet(p)
    lf = pl.scan_parquet(p).head(5)
    plan = optimize(lf._node)
    scan = _find(plan, L.LScan)[0]
    assert scan.n_rows == 5
    assert not _find(plan, L.LSlice)


def test_slice_fuses_into_topk():
    lf = pl.DataFrame({"a": [5, 3, 1, 4, 2]}).lazy().sort("a").head(2)
    plan = optimize(lf._node)
    sorts = _find(plan, L.LSort)
    assert sorts[0].limit == 2
    assert lf.collect().get_column("a").to_list() == [1, 2]


def test_simplify_constant_folding():
    lf = pl.DataFrame({"a": [1]}).lazy().select(pl.col("a") + (pl.lit(2) + pl.lit(3)))
    plan = optimize(lf._node)
    from polars_tpu.plan import exprs as E

    sel = _find(plan, L.LSelect)[0]
    # 2+3 folded into a single literal
    lits = [n for n in E.walk(sel.expressions[0]) if isinstance(n, E.ELiteral)]
    assert len(lits) == 1 and lits[0].value == 5


def test_boolean_simplify():
    lf = pl.DataFrame({"a": [1, 2]}).lazy().filter((pl.col("a") > 1) & pl.lit(True))
    plan = optimize(lf._node)
    from polars_tpu.plan import exprs as E

    # `& True` removed
    filt = _find(plan, L.LFilter)
    if filt:
        assert not any(
            isinstance(n, E.ELiteral) and n.value is True for n in E.walk(filt[0].predicate)
        )
    assert lf.collect().get_column("a").to_list() == [2]


def test_explain_runs():
    lf = pl.DataFrame({"a": [1]}).lazy().filter(pl.col("a") > 0).select("a")
    text = lf.explain()
    assert "Scan" in text or "DataFrameScan" in text


def test_optimizations_preserve_results(rng):
    n = 2000
    df = pl.DataFrame(
        {
            "k": rng.integers(0, 50, n),
            "v": rng.normal(size=n),
            "s": np.asarray(["a", "b", "c"], object)[rng.integers(0, 3, n)],
        }
    )
    lf = (
        df.lazy()
        .filter(pl.col("v") > 0)
        .with_columns(w=pl.col("v") * 2)
        .group_by("k", "s")
        .agg(s2=pl.col("w").sum())
        .sort("k", "s")
    )
    assert_frame_equal(lf.collect(), lf.collect(no_optimization=True))


import numpy as np  # noqa: E402


# --- plan-shape checks (the optimization_checks.rs pattern) -----------------


def _count_nodes(n, cls):
    from polars_tpu.plan import logical as L

    return isinstance(n, cls) + sum(_count_nodes(i, cls) for i in n.inputs())


def test_common_subplan_cached_and_traced_once():
    """Q15-style self-join against an aggregate of the same subplan: the
    optimizer wraps the repeated group-by in LCache and it EXECUTES once."""
    from polars_tpu.engine import run as R
    from polars_tpu.plan import logical as L
    from polars_tpu.plan.optimizer import optimize

    df = pl.DataFrame({"k": [1, 2, 3, 1, 2], "v": [1.0, 2.0, 3.0, 4.0, 5.0]})
    rev = df.lazy().group_by("k").agg(pl.col("v").sum().alias("total"))
    top = rev.select(pl.col("total").max().alias("total"))
    q = rev.join(top, on="total", how="inner")

    opt = optimize(q._node)
    assert _count_nodes(opt, L.LCache) == 2  # two occurrences, one ident
    caches = []

    def walk(n):
        if isinstance(n, L.LCache):
            caches.append(n)
        for i in n.inputs():
            walk(i)

    walk(opt)
    assert caches[0] == caches[1] and caches[0].ident == caches[1].ident

    counts = {"gb": 0}
    orig = R._execute_node

    def counting(node, *, sync=True):
        if isinstance(node, L.LGroupBy):
            counts["gb"] += 1
        return orig(node, sync=sync)

    R._execute_node = counting
    try:
        out = q.collect()
    finally:
        R._execute_node = orig
    assert counts["gb"] == 1, f"shared subplan executed {counts['gb']}x"
    assert out["k"].to_list() == [2] and out["total"].to_list() == [7.0]


def test_sort_collapse_plan_shape():
    from polars_tpu.plan import logical as L
    from polars_tpu.plan.optimizer import optimize

    df = pl.DataFrame({"k": [3, 1, 2], "v": [1.0, 2.0, 3.0]})
    lf = df.lazy().sort("v").sort("k")
    assert _count_nodes(lf._node, L.LSort) == 2
    assert _count_nodes(optimize(lf._node), L.LSort) == 1
    assert lf.collect()["k"].to_list() == [1, 2, 3]


def test_sort_collapse_keeps_topk_and_maintain_order():
    from polars_tpu.plan import logical as L
    from polars_tpu.plan.optimizer import optimize

    df = pl.DataFrame({"k": [3, 1, 2, 5], "v": [1.0, 2.0, 3.0, 0.5]})
    # inner sort with limit is a top-k SELECTION — must survive
    lf = df.lazy().sort("v", descending=True).head(2).sort("k")
    out = lf.collect()
    assert out["k"].to_list() == [1, 2]  # top-2 by v are (k=2,v=3),(k=1,v=2)
    # maintain_order outer sort depends on incoming order — inner survives
    lf2 = df.lazy().sort("v").sort(pl.col("k") // 2, maintain_order=True)
    assert _count_nodes(optimize(lf2._node), L.LSort) == 2


def test_expression_cse_traces_subtree_once():
    """disc_price-style repeated subtrees evaluate ONCE per context."""
    from polars_tpu.engine import compiler as C

    df = pl.DataFrame({"p": [10.0, 20.0], "d": [0.1, 0.2], "t": [0.05, 0.1]})
    counts = {"n": 0}
    orig = C._eval_expr_uncached

    def counting(node, ctx):
        from polars_tpu.plan import exprs as E

        if isinstance(node, E.EBinary) and node.op == "*":
            counts["n"] += 1
        return orig(node, ctx)

    C._eval_expr_uncached = counting
    try:
        base = pl.col("p") * (1.0 - pl.col("d"))
        out = df.lazy().select(
            base.alias("disc_price"),
            (base * (1.0 + pl.col("t"))).alias("charge"),
        ).collect()
    finally:
        C._eval_expr_uncached = orig
    # p*(1-d) traced once (memo), charge adds one more multiply: 2 total
    assert counts["n"] == 2, counts["n"]
    assert abs(out["charge"].to_list()[0] - 10.0 * 0.9 * 1.05) < 1e-12


# -- collapse_joins (reference: plans/optimizer/collapse_joins.rs) ------------


def test_collapse_joins_rewrites_filtered_cross():
    import polars_tpu as pl

    l = pl.DataFrame({"k": [1, 2, 3, 1], "x": [10, 20, 30, 40]}).lazy()
    r = pl.DataFrame({"k": [1, 2, 2], "y": [100, 200, 300]}).lazy()
    lf = l.join(r, how="cross").filter(
        (pl.col("k") == pl.col("k_right")) & (pl.col("y") > 100)
    )
    plan = lf.explain()
    assert "cross" not in plan.lower()
    assert "inner" in plan.lower()
    out = lf.collect().sort(["k", "x", "y"]).rows()
    off = lf.collect(optimizations=pl.QueryOptFlags(collapse_joins=False)).sort(
        ["k", "x", "y"]).rows()
    assert out == off == [(2, 20, 2, 200), (2, 20, 2, 300)]
    assert "cross" in lf.explain(
        optimizations=pl.QueryOptFlags(collapse_joins=False)).lower()


def test_collapse_joins_keeps_inequality_residual():
    import polars_tpu as pl

    l = pl.DataFrame({"a": [1, 2], "v": [5, 6]}).lazy()
    r = pl.DataFrame({"a": [1, 2], "w": [5, 9]}).lazy()
    lf = l.join(r, how="cross").filter(
        (pl.col("a") == pl.col("a_right")) & (pl.col("v") < pl.col("w"))
    )
    assert lf.collect().rows() == [(2, 6, 2, 9)]


def test_type_check_raises_early():
    import pytest

    import polars_tpu as pl

    lf = pl.DataFrame({"a": [1]}).lazy().select(pl.col("nope"))
    with pytest.raises(Exception):
        lf.collect()


def test_order_observe_drops_unobserved_sorts():
    """order_observe pass (reference: optimizer CHECK_ORDER_OBSERVE)."""
    lf = pl.DataFrame({"k": ["b", "a", "a"], "v": [3.0, 1.0, 2.0]}).lazy()
    # order-agnostic group_by: sort dropped, result unchanged
    q = lf.sort("v").group_by("k").agg(pl.col("v").sum())
    assert "SORT" not in q.explain().upper()
    assert sorted(q.collect().to_dicts(), key=lambda d: d["k"]) == [
        {"k": "a", "v": 3.0}, {"k": "b", "v": 3.0}
    ]
    # first() observes order: sort kept and honored
    q2 = lf.sort("v").group_by("k").agg(pl.col("v").first())
    assert "SORT" in q2.explain().upper()
    assert sorted(q2.collect().to_dicts(), key=lambda d: d["k"]) == [
        {"k": "a", "v": 1.0}, {"k": "b", "v": 3.0}
    ]
    # unique(keep='any') drops, keep='first' keeps
    assert "SORT" not in lf.sort("v").unique(subset=["k"]).explain().upper()
    q4 = lf.sort("v").unique(subset=["k"], keep="first")
    assert "SORT" in q4.explain().upper()
    # transparent select passes through; cum_sum blocks
    q5 = lf.sort("v").select("k", (pl.col("v") * 2).alias("v")).group_by("k").agg(pl.col("v").sum())
    assert "SORT" not in q5.explain().upper()
    q6 = lf.sort("v").select("k", pl.col("v").cum_sum()).group_by("k").agg(pl.col("v").sum())
    assert "SORT" in q6.explain().upper()
    assert sorted(q6.collect().to_dicts(), key=lambda d: d["k"]) == [
        {"k": "a", "v": 4.0}, {"k": "b", "v": 6.0}
    ]


def test_count_star_fast_path(tmp_path):
    """scan(...).select(pl.len()) answers from parquet metadata (reference:
    optimizer/count_star.rs) — the plan collapses to a 1-row DataFrameScan."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = str(tmp_path / "t.parquet")
    pq.write_table(pa.table({"a": np.arange(5000), "b": np.arange(5000) * 0.5}), p)

    lf = pl.scan_parquet(p).select(pl.len())
    assert "DataFrameScan [1 cols, 1 rows]" in lf.explain()
    out = lf.collect()
    assert out.rows() == [(5000,)]
    assert out.schema["len"] == pl.UInt32

    # alias preserved
    assert pl.scan_parquet(p).select(pl.len().alias("n")).collect().rows() == [(5000,)]
    # predicate blocks the fast path but stays correct
    got = pl.scan_parquet(p).filter(pl.col("a") < 70).select(pl.len()).collect()
    assert got.rows() == [(70,)]
    # n_rows slice blocks it
    got = pl.scan_parquet(p, n_rows=33).select(pl.len()).collect()
    assert got.rows() == [(33,)]
    # flag off: full scan path, same answer (0-column padded-mask fix)
    got = lf.collect(optimizations=pl.QueryOptFlags.none())
    assert got.rows() == [(5000,)]
    # multi-file sums
    p2 = str(tmp_path / "t2.parquet")
    pq.write_table(pa.table({"a": np.arange(77), "b": np.arange(77) * 1.0}), p2)
    assert pl.scan_parquet([p, p2]).select(pl.len()).collect().rows() == [(5077,)]


def test_len_over_zero_column_frame():
    from polars_tpu.core.frame import DataFrame

    df = DataFrame._from_columns([], 1_000_000)
    assert df.lazy().select(pl.len()).collect().rows() == [(1_000_000,)]
    assert df.lazy().select((pl.len() * 2).alias("x")).collect().rows() == [(2_000_000,)]
