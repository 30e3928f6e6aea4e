"""List dtype: storage, namespace ops, explode, implode.

Reference semantics: polars-ops chunked_array/list/ + py-polars list tests.
"""

import pytest

import polars_tpu as pl


def test_ingest_roundtrip():
    s = pl.Series("a", [[1, 2], [3], None, [], [4, 5, 6]])
    assert "List" in str(s.dtype)
    assert s.to_list() == [[1, 2], [3], None, [], [4, 5, 6]]


def test_row_ops_preserve_lists():
    df = pl.DataFrame({"k": [1, 2, 3, 4], "lst": [[1, 2], [3], None, [4, 5, 6]]})
    assert df.lazy().filter(pl.col("k") >= 2).collect()["lst"].to_list() == [[3], None, [4, 5, 6]]
    assert df.lazy().sort("k", descending=True).collect()["lst"].to_list() == [[4, 5, 6], None, [3], [1, 2]]
    assert df.gather([3, 0])["lst"].to_list() == [[4, 5, 6], [1, 2]]
    assert df.head(2)["lst"].to_list() == [[1, 2], [3]]


def test_list_namespace():
    df = pl.DataFrame({"lst": [[1, 2], [3], None, [], [4, 5, 6]]})
    out = df.select(
        pl.col("lst").list.len().alias("n"),
        pl.col("lst").list.sum().alias("sum"),
        pl.col("lst").list.mean().alias("mean"),
        pl.col("lst").list.min().alias("lo"),
        pl.col("lst").list.max().alias("hi"),
        pl.col("lst").list.first().alias("f"),
        pl.col("lst").list.last().alias("l"),
        pl.col("lst").list.contains(3).alias("has3"),
    )
    assert out["n"].to_list() == [2, 1, None, 0, 3]
    assert out["sum"].to_list() == [3, 3, None, 0, 15]
    assert out["mean"].to_list() == [1.5, 3.0, None, None, 5.0]
    assert out["lo"].to_list() == [1, 3, None, None, 4]
    assert out["hi"].to_list() == [2, 3, None, None, 6]
    assert out["f"].to_list() == [1, 3, None, None, 4]
    assert out["l"].to_list() == [2, 3, None, None, 6]
    assert out["has3"].to_list() == [False, True, None, False, False]


def test_list_strings_and_transforms():
    df = pl.DataFrame({"s": [["a", "b"], ["c"], None, []]})
    assert df.select(pl.col("s").list.join("-"))["s"].to_list() == ["a-b", "c", None, ""]
    s = pl.Series("x", [[3, 1, 2], None, [5, 5]])
    assert s.list.sort().to_list() == [[1, 2, 3], None, [5, 5]]
    assert s.list.sort(descending=True).to_list() == [[3, 2, 1], None, [5, 5]]
    assert s.list.reverse().to_list() == [[2, 1, 3], None, [5, 5]]
    assert s.list.unique().to_list() == [[1, 2, 3], None, [5]]
    assert s.list.get(1).to_list() == [1, None, 5]


def test_explode():
    df = pl.DataFrame({"k": [1, 2, 3, 4], "lst": [[10, 20], [30], None, []]})
    out = df.explode("lst")
    assert out["k"].to_list() == [1, 1, 2, 3, 4]
    assert out["lst"].to_list() == [10, 20, 30, None, None]
    s = pl.Series("x", [[1, 2], [], [3]])
    assert s.explode().to_list() == [1, 2, None, 3]


def test_explode_strings():
    df = pl.DataFrame({"s": [["a", "b"], ["c"]]})
    assert df.explode("s")["s"].to_list() == ["a", "b", "c"]


def test_implode_group_agg():
    df = pl.DataFrame({"g": ["a", "b", "a", "a", "b"], "v": [1, 2, 3, 4, 5]})
    out = df.group_by("g").agg(pl.col("v").implode().alias("vs")).sort("g")
    assert out["vs"].to_list() == [[1, 3, 4], [2, 5]]
    back = out.explode("vs").sort("vs")
    assert back["vs"].to_list() == [1, 2, 3, 4, 5]


def test_concat_lists_vertical():
    a = pl.DataFrame({"l": [[1], [2, 3]]})
    b = pl.DataFrame({"l": [[4, 5]]})
    assert pl.concat([a, b])["l"].to_list() == [[1], [2, 3], [4, 5]]


def test_lazy_explode():
    df = pl.DataFrame({"k": ["x", "y"], "lst": [[1, 2, 3], [4]]})
    out = df.lazy().explode("lst").filter(pl.col("lst") > 1).collect()
    assert out["k"].to_list() == ["x", "x", "y"]
    assert out["lst"].to_list() == [2, 3, 4]


def test_binary_namespace():
    s = pl.Series("b", [b"abc", b"xyz", None])
    assert s.bin.contains(b"b").to_list() == [True, False, None]
    assert s.bin.starts_with(b"ab").to_list() == [True, False, None]
    assert s.bin.ends_with(b"z").to_list() == [False, True, None]
    assert s.bin.size().to_list() == [3, 3, None]
    assert s.bin.encode("hex").to_list() == ["616263", "78797a", None]
    assert s.bin.encode("base64").to_list()[0] == "YWJj"


def test_array_dtype():
    s = pl.Series("a", [[1, 2], [3, 4], None], dtype=pl.Array(pl.Int64, 2))
    assert s.to_list() == [[1, 2], [3, 4], None]
    assert s.arr.sum().to_list() == [3, 7, None]
    df = pl.DataFrame({"a": s, "k": [1, 2, 3]})
    assert df.lazy().sort("k", descending=True).collect()["a"].to_list() == [None, [3, 4], [1, 2]]


def test_list_aggs_traced_in_segment(monkeypatch):
    """round-2: list.len/sum/mean/min/max/get/contains trace into segments
    (no host fallback) — verified by running under a no-host-eval guard."""
    from polars_tpu.engine import run

    def boom(df, e, schema):
        raise AssertionError(f"host generator hit for {getattr(e, 'name', e)}")

    monkeypatch.setattr(run, "_eval_generator", boom)
    df = pl.DataFrame({"x": [[1, 2, 3], [], [4, None], None, [7]]})
    out = df.lazy().select(
        pl.col("x").list.len().alias("len"),
        pl.col("x").list.sum().alias("sum"),
        pl.col("x").list.mean().alias("mean"),
        pl.col("x").list.min().alias("mn"),
        pl.col("x").list.max().alias("mx"),
        pl.col("x").list.get(0, null_on_oob=True).alias("g0"),
        pl.col("x").list.contains(2).alias("c2"),
    ).collect()
    assert out["len"].to_list() == [3, 0, 2, None, 1]
    assert out["sum"].to_list() == [6, 0, 4, None, 7]
    assert out["mean"].to_list() == [2.0, None, 4.0, None, 7.0]
    assert out["mn"].to_list() == [1, None, 4, None, 7]
    assert out["mx"].to_list() == [3, None, 4, None, 7]
    assert out["g0"].to_list() == [1, None, 4, None, 7]
    assert out["c2"].to_list() == [True, False, False, None, False]


def test_list_child_not_stale_across_jit_cache_hits():
    """Two signature-equal frames share one compiled segment; the child must
    come from the CURRENT frame, not the trace-time capture (round-2 fix)."""
    df1 = pl.DataFrame({"x": [[1, 2], [3]]})
    df2 = pl.DataFrame({"x": [[9, 8], [7]]})
    assert df1.lazy().select(pl.col("x")).collect()["x"].to_list() == [[1, 2], [3]]
    assert df2.lazy().select(pl.col("x")).collect()["x"].to_list() == [[9, 8], [7]]


def test_list_string_min_max_get_traced():
    ds = pl.DataFrame({"s": [["b", "a"], ["z"], []]})
    o = ds.lazy().select(
        pl.col("s").list.min().alias("mn"),
        pl.col("s").list.max().alias("mx"),
        pl.col("s").list.contains("z").alias("hz"),
        pl.col("s").list.get(0, null_on_oob=True).alias("g0"),
    ).collect()
    assert o["mn"].to_list() == ["a", "z", None]
    assert o["mx"].to_list() == ["b", "z", None]
    assert o["hz"].to_list() == [False, True, False]
    assert o["g0"].to_list() == ["b", "z", None]


def test_list_sum_temporal_exact_int64():
    # int64 accumulate: values above 2^53 must stay exact
    big = (1 << 60) + 7
    df = pl.DataFrame({"x": [[big, 1], [big]]})
    out = df.lazy().select(pl.col("x").list.sum().alias("s")).collect()
    assert out["s"].to_list() == [big + 1, big]
    mx = df.lazy().select(pl.col("x").list.max().alias("m")).collect()
    assert mx["m"].to_list() == [big, big]


def test_explode_fuses_into_one_segment(monkeypatch):
    """round-2 verdict #6: explode of List columns traces INTO the segment —
    filter -> explode -> agg is exactly ONE run_segment call."""
    from polars_tpu.engine import executors, run

    calls = []
    orig = executors.run_segment

    def counting(node, leaf_dfs, **kw):
        calls.append(type(node).__name__)
        return orig(node, leaf_dfs, **kw)

    monkeypatch.setattr(executors, "run_segment", counting)
    monkeypatch.setattr(run, "run_segment", counting)
    df = pl.DataFrame({"k": [1, 2, 3], "lst": [[10, 20], [30], []]})
    out = (
        df.lazy()
        .filter(pl.col("k") < 3)
        .explode("lst")
        .select(pl.col("lst").sum().alias("s"))
        .collect()
    )
    assert len(calls) == 1, calls
    assert out["s"].to_list() == [60]


def test_explode_multi_column_matching_lengths():
    df = pl.DataFrame({"a": [[1, 2], [3]], "b": [["x", "y"], ["z"]]})
    out = df.explode("a", "b")
    assert out["a"].to_list() == [1, 2, 3]
    assert out["b"].to_list() == ["x", "y", "z"]


def test_explode_multi_column_mismatch_raises():
    from polars_tpu.errors import ComputeError, ShapeError

    df = pl.DataFrame({"a": [[1, 2], [3]], "b": [["x"], ["z"]]})
    with pytest.raises((ComputeError, ShapeError)):
        df.lazy().explode("a", "b").collect()


def test_explode_null_and_empty_emit_null_rows():
    df = pl.DataFrame({"k": [1, 2, 3], "lst": [None, [], [5]]})
    out = df.lazy().explode("lst").collect()
    assert out["k"].to_list() == [1, 2, 3]
    assert out["lst"].to_list() == [None, None, 5]


def test_explode_streams_through_chain(parquet_list_path=None):
    # explode is a row-local chain node in the streaming engine
    df = pl.DataFrame({"g": [1, 1, 2, 2], "lst": [[1.0, 2.0], [3.0], [], [4.0, 5.0]]})
    lf = df.lazy().explode("lst").group_by("g").agg(pl.col("lst").sum().alias("s"))
    a = lf.collect().sort("g")
    b = lf.collect(engine="streaming").sort("g")
    assert a["s"].to_list() == b["s"].to_list()


def test_list_sort_reverse_unique_traced(monkeypatch):
    """round-2: list.sort/reverse/unique rebuild the child IN-TRACE (the
    run_segment child_outs protocol) — no host generator, one segment."""
    from polars_tpu.engine import run

    def boom(df, e, schema):
        raise AssertionError(f"host generator hit for {getattr(e, 'name', e)}")

    monkeypatch.setattr(run, "_eval_generator", boom)
    df = pl.DataFrame({"x": [[3, 1, None, 2], [5, 5], None, []]})
    out = df.lazy().select(
        pl.col("x").list.sort().alias("s"),
        pl.col("x").list.sort(descending=True).alias("sd"),
        pl.col("x").list.sort(nulls_last=True).alias("sl"),
        pl.col("x").list.sort(descending=True, nulls_last=True).alias("sdl"),
        pl.col("x").list.reverse().alias("r"),
        pl.col("x").list.unique().alias("u"),
        pl.col("x").list.unique(maintain_order=True).alias("um"),
    ).collect()
    # polars defaults: nulls FIRST (nulls_last=False), independent of descending
    assert out["s"].to_list() == [[None, 1, 2, 3], [5, 5], None, []]
    assert out["sd"].to_list() == [[None, 3, 2, 1], [5, 5], None, []]
    assert out["sl"].to_list() == [[1, 2, 3, None], [5, 5], None, []]
    assert out["sdl"].to_list() == [[3, 2, 1, None], [5, 5], None, []]
    assert out["r"].to_list() == [[2, None, 1, 3], [5, 5], None, []]
    assert out["u"].to_list() == [[None, 1, 2, 3], [5], None, []]
    assert out["um"].to_list() == [[3, 1, None, 2], [5], None, []]


def test_list_sort_strings_and_nan():
    ds = pl.DataFrame({"s": [["b", "a", "b"], ["z"]]})
    o = ds.lazy().select(
        pl.col("s").list.sort().alias("ss"),
        pl.col("s").list.unique().alias("su"),
    ).collect()
    assert o["ss"].to_list() == [["a", "b", "b"], ["z"]]
    assert o["su"].to_list() == [["a", "b"], ["z"]]
    # NaNs compare equal in total order (unique keeps ONE NaN, sorted last)
    import math

    dn = pl.DataFrame({"f": [[float("nan"), 1.0, float("nan"), 0.5]]})
    s = dn.lazy().select(pl.col("f").list.sort().alias("s")).collect()["s"].to_list()[0]
    assert s[0] == 0.5 and s[1] == 1.0 and math.isnan(s[2]) and math.isnan(s[3])
    u = dn.lazy().select(pl.col("f").list.unique().alias("u")).collect()["u"].to_list()[0]
    assert len(u) == 3 and u[0] == 0.5 and u[1] == 1.0 and math.isnan(u[2])


def test_list_sort_then_explode_one_segment(monkeypatch):
    from polars_tpu.engine import executors, run

    calls = []
    orig = executors.run_segment

    def counting(node, leaf_dfs, **kw):
        calls.append(type(node).__name__)
        return orig(node, leaf_dfs, **kw)

    monkeypatch.setattr(executors, "run_segment", counting)
    monkeypatch.setattr(run, "run_segment", counting)
    df = pl.DataFrame({"x": [[3, 1], [2]], "k": [1, 2]})
    out = (
        df.lazy()
        .filter(pl.col("k") > 0)
        .select(pl.col("x").list.sort().alias("s"))
        .explode("s")
        .collect()
    )
    assert len(calls) == 1, calls
    assert out["s"].to_list() == [1, 3, 2]


def test_select_explode_lowers_to_traced_plan(monkeypatch):
    """select(col.explode()) must run through the traced LExplode plan node
    (readback-free device path), not the host special-select barrier (r5:
    the host path reads packed offsets back = the axon flip)."""
    import polars_tpu as pl
    from polars_tpu.engine import run as R

    def boom(node):  # noqa: ARG001
        raise AssertionError("host special-select barrier used for explode")

    monkeypatch.setattr(R, "_exec_special_select", boom)
    df = pl.DataFrame({"a": [[1, 2], [], None, [5]], "b": [[9], [8], [7], [6]]})
    out = df.lazy().select(pl.col("a").explode()).collect()
    assert out["a"].to_list() == [1, 2, None, None, 5]
    out2 = df.lazy().select(
        pl.col("a").explode().alias("x"),
    ).collect()
    assert out2.columns == ["x"]
    assert out2["x"].to_list() == [1, 2, None, None, 5]


def test_list_longtail_traced_in_segment(monkeypatch):
    """round-5 (VERDICT r4 #8): the list long tail — any/all/count_matches,
    var/std/median/n_unique/arg_min/arg_max, slice/head/tail/shift/diff/
    drop_nulls/gather_every — traces into fused segments; verified under a
    no-host-eval guard. Expected values mirror the host oracle semantics
    (ops/list_ops.py; reference polars-ops list/namespace.rs)."""
    from polars_tpu.engine import run

    def boom(df, e, schema):
        raise AssertionError(f"host generator hit for {getattr(e, 'name', e)}")

    monkeypatch.setattr(run, "_eval_generator", boom)
    x = pl.col("x")
    df = pl.DataFrame(
        {"x": [[3, 1, 2, None], [], [5], None, [None, None], [2, 2, 7, 7, 1]]}
    )
    out = df.lazy().select(
        x.list.count_matches(2).alias("cm"),
        x.list.var().alias("var"),
        x.list.std().alias("std"),
        x.list.median().alias("med"),
        x.list.n_unique().alias("nu"),
        x.list.arg_min().alias("amin"),
        x.list.arg_max().alias("amax"),
        x.list.head(2).alias("h2"),
        x.list.tail(2).alias("t2"),
        x.list.slice(1, 2).alias("s12"),
        x.list.slice(-2).alias("sm2"),
        x.list.shift(1).alias("sh1"),
        x.list.diff().alias("d1"),
        x.list.diff(n=1, null_behavior="drop").alias("dd"),
        x.list.drop_nulls().alias("dn"),
        x.list.gather_every(2, 1).alias("ge"),
    ).collect()
    assert out["cm"].to_list() == [1, 0, 0, None, 0, 2]
    vs = out["var"].to_list()
    assert vs[0] == pytest.approx(1.0) and vs[5] == pytest.approx(8.7)
    assert vs[1] is None and vs[2] is None and vs[3] is None and vs[4] is None
    assert out["std"].to_list()[5] == pytest.approx(8.7 ** 0.5)
    assert out["med"].to_list() == [2.0, None, 5.0, None, None, 2.0]
    assert out["nu"].to_list() == [4, 0, 1, None, 1, 3]
    assert out["amin"].to_list() == [1, None, 0, None, None, 4]
    assert out["amax"].to_list() == [0, None, 0, None, None, 2]
    assert out["h2"].to_list() == [[3, 1], [], [5], None, [None, None], [2, 2]]
    assert out["t2"].to_list() == [[2, None], [], [5], None, [None, None], [7, 1]]
    assert out["s12"].to_list() == [[1, 2], [], [], None, [None], [2, 7]]
    assert out["sm2"].to_list() == [[2, None], [], [5], None, [None, None], [7, 1]]
    assert out["sh1"].to_list() == [
        [None, 3, 1, 2], [], [None], None, [None, None], [None, 2, 2, 7, 7]
    ]
    assert out["d1"].to_list() == [
        [None, -2, 1, None], [], [None], None, [None, None], [None, 0, 5, 0, -6]
    ]
    assert out["dd"].to_list() == [[-2, 1, None], [], [], None, [None], [0, 5, 0, -6]]
    assert out["dn"].to_list() == [[3, 1, 2], [], [5], None, [], [2, 2, 7, 7, 1]]
    assert out["ge"].to_list() == [[1, None], [], [], None, [None], [2, 7]]


def test_list_longtail_bool_and_strings_traced(monkeypatch):
    from polars_tpu.engine import run

    def boom(df, e, schema):
        raise AssertionError(f"host generator hit for {getattr(e, 'name', e)}")

    monkeypatch.setattr(run, "_eval_generator", boom)
    df = pl.DataFrame(
        {
            "b": [[True, None], [], [False], None, [None], [True, False]],
            "s": [["b", "a"], [], ["z"], None, [None, "a"], ["c", "a", "c"]],
        }
    )
    out = df.lazy().select(
        pl.col("b").list.any().alias("any"),
        pl.col("b").list.all().alias("all"),
        pl.col("s").list.arg_min().alias("smin"),
        pl.col("s").list.n_unique().alias("snu"),
        pl.col("s").list.head(2).alias("sh"),
        pl.col("s").list.drop_nulls().alias("sdn"),
    ).collect()
    assert out["any"].to_list() == [True, False, False, None, False, True]
    assert out["all"].to_list() == [True, True, False, None, True, False]
    assert out["smin"].to_list() == [1, None, 0, None, 1, 1]
    assert out["snu"].to_list() == [2, 0, 1, None, 2, 2]
    assert out["sh"].to_list() == [["b", "a"], [], ["z"], None, [None, "a"], ["c", "a"]]
    assert out["sdn"].to_list() == [["b", "a"], [], ["z"], None, ["a"], ["c", "a", "c"]]


def test_list_longtail_host_fallback_shapes():
    """Shapes the gates reject (non-column-ref input, string var) still work
    via the host path — same results."""
    df = pl.DataFrame({"x": [[3, 1, None], [], None, [5, 5]]})
    out = df.lazy().select(
        pl.col("x").list.reverse().list.head(1).alias("h"),
        pl.col("x").list.reverse().list.arg_min().alias("am"),
    ).collect()
    assert out["h"].to_list() == [[None], [], None, [5]]
    assert out["am"].to_list() == [1, None, None, 0]


def test_list_eval_filter_traced_in_segment(monkeypatch):
    """round-5: list.eval / list.filter with ELEMENTWISE inner exprs trace
    into fused segments (child payload rewrite / within-list compaction)."""
    from polars_tpu.engine import run

    def boom(df, e, schema):
        raise AssertionError(f"host generator hit for {getattr(e, 'name', e)}")

    monkeypatch.setattr(run, "_eval_generator", boom)
    df = pl.DataFrame({"x": [[3, 1, None, 2], [], [5, 5, 4], None],
                       "s": [["a", "bb", None], [], ["c"], None]})
    out = df.lazy().select(
        pl.col("x").list.eval(pl.element() * 2 + 1).alias("ev"),
        pl.col("x").list.eval(pl.element().is_null()).alias("en"),
        pl.col("x").list.eval(pl.element().fill_null(0)).alias("ef"),
        pl.col("x").list.filter(pl.element() > 2).alias("f"),
        pl.col("x").list.filter(pl.element().is_null()).alias("fn"),
        pl.col("s").list.eval(pl.element().str.len_chars()).alias("sl"),
        # chains: eval output feeds traced aggregations
        pl.col("x").list.eval(pl.element() * 2).list.sum().alias("evs"),
        pl.col("x").list.filter(pl.element() >= 4).list.len().alias("fl"),
    ).collect()
    assert out["ev"].to_list() == [[7, 3, None, 5], [], [11, 11, 9], None]
    assert out["en"].to_list() == [[False, False, True, False], [], [False, False, False], None]
    assert out["ef"].to_list() == [[3, 1, 0, 2], [], [5, 5, 4], None]
    assert out["f"].to_list() == [[3], [], [5, 5, 4], None]
    assert out["fn"].to_list() == [[None], [], [], None]
    assert out["sl"].to_list() == [[1, 2, None], [], [1], None]
    assert out["evs"].to_list() == [12, 0, 28, None]
    assert out["fl"].to_list() == [0, 0, 3, None]


def test_list_eval_host_fallback_semantics():
    """Aggregating / input-independent inner exprs keep host semantics."""
    df = pl.DataFrame({"x": [[3, 1, None], [], [5, 4]]})
    out = df.lazy().select(
        pl.col("x").list.eval(pl.element().sum()).alias("agg"),
        pl.col("x").list.eval(pl.element().rank()).alias("rk"),
    ).collect()
    assert out["agg"].to_list() == [[4], [0], [9]]
    assert out["rk"].to_list() == [[2.0, 1.0, None], [], [2.0, 1.0]]


def test_list_concat_union_item_traced(monkeypatch):
    """round-5: row-wise list.concat, set_union (concat + first-occurrence
    dedup), and strict list.item trace into segments."""
    from polars_tpu.engine import run

    def boom(df, e, schema):
        raise AssertionError(f"host generator hit for {getattr(e, 'name', e)}")

    monkeypatch.setattr(run, "_eval_generator", boom)
    df = pl.DataFrame({
        "a": [[1, 2, 2], [], None, [5]], "b": [[2, 3], [4], [1], None],
        "s": [["x"], ["y", "x"], [], ["z"]], "t": [["x", "q"], ["y"], ["w"], []],
    })
    out = df.lazy().select(
        pl.col("a").list.concat(pl.col("b")).alias("cat"),
        pl.col("a").list.set_union(pl.col("b")).alias("un"),
        pl.col("s").list.set_union(pl.col("t")).alias("su"),
        pl.col("a").list.concat(pl.col("b")).list.sum().alias("cs"),
    ).collect()
    assert out["cat"].to_list() == [[1, 2, 2, 2, 3], [4], None, None]
    assert out["un"].to_list() == [[1, 2, 3], [4], None, None]
    assert out["su"].to_list() == [["x", "q"], ["y", "x"], ["w"], ["z"]]
    assert out["cs"].to_list() == [10, 4, None, None]
    df2 = pl.DataFrame({"x": [[7], [9], None]})
    o2 = df2.lazy().select(pl.col("x").list.item()).collect()
    assert o2["x"].to_list() == [7, 9, None]
    o3 = df2.lazy().select(pl.col("x").list.item(allow_empty=True)).collect()
    assert o3["x"].to_list() == [7, 9, None]


def test_list_item_strictness():
    df = pl.DataFrame({"a": [[1, 2], [5]]})
    with pytest.raises(Exception, match="length 1"):
        df.lazy().select(pl.col("a").list.item()).collect()
    with pytest.raises(Exception, match="length 1"):
        pl.DataFrame({"a": [[], [5]]}).lazy().select(
            pl.col("a").list.item()).collect()
    out = pl.DataFrame({"a": [[], [5]]}).lazy().select(
        pl.col("a").list.item(allow_empty=True)).collect()
    assert out["a"].to_list() == [None, 5]


def test_list_set_ops_traced(monkeypatch):
    """round-5: intersection/difference/symmetric_difference trace via the
    side-tagged concat + value-run marking; null is a set member."""
    from polars_tpu.engine import run

    def boom(df, e, schema):
        raise AssertionError(f"host generator hit for {getattr(e, 'name', e)}")

    monkeypatch.setattr(run, "_eval_generator", boom)
    df = pl.DataFrame({"a": [[1, 2, 2, None], [], None, [5, 7]],
                       "b": [[2, 3, None], [4], [1], None]})
    out = df.lazy().select(
        pl.col("a").list.set_intersection(pl.col("b")).alias("i"),
        pl.col("a").list.set_difference(pl.col("b")).alias("d"),
        pl.col("a").list.set_symmetric_difference(pl.col("b")).alias("sd"),
    ).collect()
    assert out["i"].to_list() == [[2, None], [], None, None]
    assert out["d"].to_list() == [[1], [], None, None]
    assert out["sd"].to_list() == [[1, 3], [4], None, None]


def test_list_gather_to_array_traced(monkeypatch):
    from polars_tpu.engine import run

    def boom(df, e, schema):
        raise AssertionError(f"host generator hit for {getattr(e, 'name', e)}")

    monkeypatch.setattr(run, "_eval_generator", boom)
    df = pl.DataFrame({"a": [[10, 20, 30], [7], None, [1, 2]],
                       "ix": [[2, 0, -1], [0], [0], []]})
    out = df.lazy().select(
        pl.col("a").list.gather(pl.col("ix")).alias("g"),
        pl.col("a").list.gather([0], null_on_oob=True).alias("g0"),
        pl.col("a").list.gather([5], null_on_oob=True).alias("oob"),
    ).collect()
    assert out["g"].to_list() == [[30, 10, 30], [7], None, []]
    assert out["g0"].to_list() == [[10], [7], None, [1]]
    assert out["oob"].to_list() == [[None], [None], None, [None]]
    with pytest.raises(Exception, match="out of bounds"):
        df.lazy().select(pl.col("a").list.gather([5])).collect()
    o2 = pl.DataFrame({"x": [[1, 2], [3, 4], None]}).lazy().select(
        pl.col("x").list.to_array(2)).collect()
    assert o2["x"].to_list() == [[1, 2], [3, 4], None]
    assert "Array" in str(o2["x"].dtype)
    with pytest.raises(Exception, match="width"):
        pl.DataFrame({"x": [[1], [3, 4]]}).lazy().select(
            pl.col("x").list.to_array(2)).collect()


def test_str_extract_find_many_traced(monkeypatch):
    """round-5: literal-pattern extract_many/find_many trace through the
    dictionary LUT (per-unique Aho-Corasick at trace time)."""
    from polars_tpu.engine import run

    def boom(df, e, schema):
        raise AssertionError(f"host generator hit for {getattr(e, 'name', e)}")

    monkeypatch.setattr(run, "_eval_generator", boom)
    df = pl.DataFrame({"s": ["foobar baz", "barbar", None, "qux"]})
    out = df.lazy().select(
        pl.col("s").str.extract_many(["bar", "baz"]).alias("em"),
        pl.col("s").str.find_many(["bar", "baz"]).alias("fm"),
        pl.col("s").str.extract_many(["bar", "baz"]).list.len().alias("n"),
    ).collect()
    assert out["em"].to_list() == [["bar", "baz"], ["bar", "bar"], None, []]
    assert out["fm"].to_list() == [[3, 7], [0, 3], None, []]
    assert out["n"].to_list() == [2, 2, None, 0]
    # per-row pattern columns keep the host path (guard must be lifted)
    monkeypatch.undo()
    df2 = pl.DataFrame({"s": ["ab cd", "xy"], "p": [["ab"], ["zz"]]})
    o2 = df2.lazy().select(pl.col("s").str.extract_many(pl.col("p"))).collect()
    assert o2["s"].to_list() == [["ab"], []]


def test_struct_splits_no_row_readback():
    """round-5: extract_groups / split_exact / splitn compute per UNIQUE and
    LUT-gather device codes — no row-value readback."""
    from polars_tpu.core.column import Column

    df = pl.DataFrame({"s": ["a-1", "b-2", None, "c"]})
    calls = []
    orig = Column.to_pylist

    def spy(self):
        calls.append(self.name)
        return orig(self)

    Column.to_pylist = spy
    try:
        out = df.lazy().select(
            pl.col("s").str.extract_groups(r"(\w)-(\d)").alias("g"),
            pl.col("s").str.split_exact("-", 1).alias("se"),
            pl.col("s").str.splitn("-", 2).alias("sn"),
        ).collect()
        assert calls == [], f"row readbacks: {calls}"
    finally:
        Column.to_pylist = orig
    assert out["g"].to_list() == [
        {"1": "a", "2": "1"}, {"1": "b", "2": "2"}, None, {"1": None, "2": None}
    ]
    assert out["se"].to_list() == [
        {"field_0": "a", "field_1": "1"}, {"field_0": "b", "field_1": "2"},
        None, {"field_0": "c", "field_1": None},
    ]
    assert out["sn"].to_list() == out["se"].to_list()
    o2 = df.lazy().select(
        pl.col("s").str.split_exact("-", 1).struct.field("field_1")).collect()
    assert o2["field_1"].to_list() == ["1", "2", None, None]


def test_list_get_oob_raises_by_default():
    """reference default null_on_oob=False RAISES on out-of-bounds
    (py-polars expr/list.py get) — both the traced and host paths."""
    df = pl.DataFrame({"x": [[1, 2], []]})
    with pytest.raises(Exception, match="out of bounds"):
        df.lazy().select(pl.col("x").list.get(0)).collect()
    out = df.lazy().select(pl.col("x").list.get(0, null_on_oob=True)).collect()
    assert out["x"].to_list() == [1, None]
    # first()/last() keep their null-on-empty convenience semantics
    assert df.lazy().select(pl.col("x").list.first()).collect()["x"].to_list() == [1, None]
