"""Seeded random-plan differential fuzz (reference:
py-polars/tests/parametric/): >=1000 random expressions + plans executed
across {in-memory, streaming, distributed} engines and a pandas-nullable
oracle. Every case reproduces from its (seed, index)."""

from __future__ import annotations

import numpy as np
import pytest

import polars_tpu as pl
from polars_tpu.testing import fuzz

# 6 chunks x (20 selects x 6 exprs + 15 group-bys x ~2 aggs + 10 engine
# selects x 4 exprs) ~= 1200 expression cases
CHUNKS = range(6)


def _assert_same(label, got, want):
    assert got == want, f"{label}: {got[:8]} != {want[:8]}"


@pytest.mark.parametrize("chunk", CHUNKS)
def test_fuzz_rowwise_oracle(chunk):
    rng = np.random.default_rng(1000 + chunk)
    df, pdf = fuzz.random_frame(rng)
    for sel in range(20):
        exprs, oracles = [], []
        for k in range(6):
            e, f, _ = fuzz.gen_oracle_expr(rng, depth=3)
            exprs.append(e.alias(f"e{k}"))
            oracles.append(f)
        out_mem = df.lazy().select(exprs).collect()
        out_str = df.lazy().select(exprs).collect(engine="streaming")
        for k, f in enumerate(oracles):
            want = fuzz.normalize(f(pdf).tolist())
            _assert_same(
                f"seed={1000+chunk} sel={sel} e{k} [memory vs oracle]",
                fuzz.normalize(out_mem[f"e{k}"].to_list()), want,
            )
            _assert_same(
                f"seed={1000+chunk} sel={sel} e{k} [streaming vs oracle]",
                fuzz.normalize(out_str[f"e{k}"].to_list()), want,
            )


@pytest.mark.parametrize("chunk", CHUNKS)
def test_fuzz_groupby_oracle(chunk):
    rng = np.random.default_rng(2000 + chunk)
    df, pdf = fuzz.random_frame(rng, n_rows=53)
    for case in range(15):
        aggs, oracle = fuzz.gen_groupby_case(rng)
        want = oracle(pdf)
        got_mem = df.lazy().group_by("g").agg(aggs).sort("g").collect()
        got_str = (
            df.lazy().group_by("g").agg(aggs).sort("g").collect(engine="streaming")
        )
        for c in want.columns:
            if c == "g":
                continue
            w = fuzz.normalize(want[c].tolist())
            _assert_same(
                f"seed={2000+chunk} case={case} {c} [memory vs oracle]",
                fuzz.normalize(got_mem[c].to_list()), w,
            )
            _assert_same(
                f"seed={2000+chunk} case={case} {c} [streaming vs oracle]",
                fuzz.normalize(got_str[c].to_list()), w,
            )


@pytest.mark.parametrize("chunk", CHUNKS)
def test_fuzz_engine_cross_check(chunk):
    """Engine-only semantics (division, when/then, windows, cumulatives):
    the three engines must agree with each other."""
    rng = np.random.default_rng(3000 + chunk)
    df, _ = fuzz.random_frame(rng)
    for sel in range(10):
        exprs = [fuzz.gen_engine_expr(rng).alias(f"e{k}") for k in range(4)]
        lf = df.lazy().select(exprs)
        out_mem = lf.collect()
        out_str = lf.collect(engine="streaming")
        for k in range(4):
            _assert_same(
                f"seed={3000+chunk} sel={sel} e{k} [memory vs streaming]",
                fuzz.normalize(out_str[f"e{k}"].to_list()),
                fuzz.normalize(out_mem[f"e{k}"].to_list()),
            )


@pytest.mark.parametrize("chunk", range(3))
def test_fuzz_groupby_distributed(chunk):
    """Distributed group-by agrees with single-chip on the 8-device mesh."""
    rng = np.random.default_rng(4000 + chunk)
    df, pdf = fuzz.random_frame(rng, n_rows=61)
    for case in range(6):
        aggs, oracle = fuzz.gen_groupby_case(rng)
        want = oracle(pdf)
        got = df.lazy().group_by("g").agg(aggs).sort("g").collect(engine="distributed")
        for c in want.columns:
            if c == "g":
                continue
            _assert_same(
                f"seed={4000+chunk} case={case} {c} [distributed vs oracle]",
                fuzz.normalize(got[c].to_list()),
                fuzz.normalize(want[c].tolist()),
            )


@pytest.mark.parametrize("chunk", range(4))
def test_fuzz_optimizer_differential(chunk):
    """Random plans executed with the full optimizer pipeline vs with every
    pass disabled must agree exactly — the oracle class that catches unsound
    pushdowns (e.g. a filter pushed below a window projection)."""
    rng = np.random.default_rng(5000 + chunk)
    df, _ = fuzz.random_frame(rng, n_rows=43)
    for case in range(12):
        lf = fuzz.gen_plan(rng, df.lazy())
        opt = lf.collect()
        raw = lf.collect(optimizations=pl.QueryOptFlags.none())
        assert opt.columns == raw.columns, f"seed={5000+chunk} case={case}"
        for c in opt.columns:
            _assert_same(
                f"seed={5000+chunk} case={case} col={c} [optimized vs none]",
                fuzz.normalize(opt[c].to_list()),
                fuzz.normalize(raw[c].to_list()),
            )


@pytest.mark.parametrize("chunk", range(4))
def test_fuzz_streaming_plan_differential(chunk):
    """Random small PLANS (not just expression selects) through the streaming
    engine at tiny batch sizes vs in-memory — exercises batch decomposition,
    terminal combine, the multi-stateful splice recursion, and the in-memory
    fallbacks for non-streamable nodes."""
    rng = np.random.default_rng(6000 + chunk)
    df, _ = fuzz.random_frame(rng, n_rows=67)
    for case in range(10):
        lf = fuzz.gen_plan(rng, df.lazy())
        mem = lf.collect()
        st = lf.collect(engine="streaming", batch_rows=16)
        assert st.columns == mem.columns, f"seed={6000+chunk} case={case}"
        for c in mem.columns:
            _assert_same(
                f"seed={6000+chunk} case={case} col={c} [streaming vs memory]",
                fuzz.normalize(st[c].to_list()),
                fuzz.normalize(mem[c].to_list()),
            )


@pytest.mark.parametrize("chunk", range(3))
def test_fuzz_join_cross_engine(chunk):
    """Random equi-join + aggregate plans across the three engines (the
    join->group-by spine is the canonical analytics shape)."""
    rng = np.random.default_rng(8000 + chunk)
    df, _ = fuzz.random_frame(rng, n_rows=59)
    n_dim = 13
    dim = pl.DataFrame({
        "g": np.arange(n_dim),
        "w": rng.normal(size=n_dim),
        "tag": [f"t{i % 4}" for i in range(n_dim)],
    })
    for case in range(6):
        how = ["inner", "left", "semi", "anti"][int(rng.integers(0, 4))]
        lf = df.lazy().join(dim.lazy(), on="g", how=how, validate="m:1")
        if how in ("inner", "left") and rng.random() < 0.7:
            lf = lf.group_by("tag" if how != "anti" else "g").agg(
                s=pl.col("f").sum(), n=pl.len()
            )
        lf = lf.sort(lf.collect_schema().names()[0], nulls_last=True, maintain_order=True)
        mem = lf.collect()
        st = lf.collect(engine="streaming", batch_rows=16)
        di = lf.collect(engine="distributed")
        for eng, got in (("streaming", st), ("distributed", di)):
            assert got.columns == mem.columns, f"seed={8000+chunk} case={case} {eng}"
            for c in mem.columns:
                _assert_same(
                    f"seed={8000+chunk} case={case} col={c} [{eng} vs memory]",
                    fuzz.normalize(got[c].to_list()),
                    fuzz.normalize(mem[c].to_list()),
                )


@pytest.mark.parametrize("chunk", range(2))
def test_fuzz_length_changing_ops(chunk):
    """value_counts / rle / unique_counts / gather_every run through device
    group-by segments now (VERDICT r4 #8) — differential-check them against
    pure-python oracles over random typed columns (nulls included)."""
    from collections import Counter

    rng = np.random.default_rng(7000 + chunk)
    for case in range(12):
        kind = ["int", "str", "float", "bool"][int(rng.integers(0, 4))]
        n = int(rng.integers(1, 60))
        null = rng.random(n) < 0.15
        if kind == "int":
            vals = [None if m else int(v) for v, m in zip(rng.integers(0, 6, n), null)]
            dtype = pl.Int64
        elif kind == "str":
            pool = ["a", "b", "c", "dd", ""]
            vals = [None if m else pool[v] for v, m in zip(rng.integers(0, 5, n), null)]
            dtype = pl.String
        elif kind == "float":
            vals = [None if m else round(float(v), 1) for v, m in zip(rng.integers(0, 5, n) * 0.5, null)]
            dtype = pl.Float64
        else:
            vals = [None if m else bool(v) for v, m in zip(rng.integers(0, 2, n), null)]
            dtype = pl.Boolean
        label = f"seed={7000+chunk} case={case} kind={kind}"
        s = pl.Series("a", vals, dtype=dtype)

        c = Counter(vals)
        got_vc = {(d["a"], d["count"]) for d in s.to_frame().select(
            pl.col("a").value_counts())["a"].to_list()}
        assert got_vc == set(c.items()), label

        got_sorted = [d["count"] for d in s.to_frame().select(
            pl.col("a").value_counts(sort=True))["a"].to_list()]
        assert got_sorted == sorted(got_sorted, reverse=True), label

        order = list(dict.fromkeys(vals))
        want_uc = [c[v] for v in order]
        got_uc = s.to_frame().select(pl.col("a").unique_counts())["a"].to_list()
        assert got_uc == want_uc, label

        runs = []
        for v in vals:
            if runs and runs[-1][1] == v:
                runs[-1][0] += 1
            else:
                runs.append([1, v])
        got_rle = [(d["len"], d["value"]) for d in s.to_frame().select(
            pl.col("a").rle())["a"].to_list()]
        assert got_rle == [tuple(r) for r in runs], label

        step, off = int(rng.integers(1, 4)), int(rng.integers(0, 3))
        got_ge = s.to_frame().select(
            pl.col("a").gather_every(step, off))["a"].to_list()
        assert got_ge == vals[off::step], label


def test_value_counts_rle_no_value_readback():
    """The device paths must not read column VALUES back to the host during
    execution (on the TPU backend the first readback permanently degrades
    the session — CLAUDE.md §1); only the segment count sync and the final
    materialization may touch the host."""
    from polars_tpu.core.column import Column

    df = pl.DataFrame({"a": [1, 1, 2, 2, 2, 3, None, None]})
    calls = []
    orig = Column.to_pylist

    def spy(self):
        calls.append(self.name)
        return orig(self)

    Column.to_pylist = spy
    try:
        out_vc = df.select(pl.col("a").value_counts())
        out_rle = df.select(pl.col("a").rle())
        assert calls == [], f"value readbacks during execution: {calls}"
    finally:
        Column.to_pylist = orig
    assert {(d["a"], d["count"]) for d in out_vc["a"].to_list()} == {
        (1, 2), (2, 3), (3, 1), (None, 2)
    }
    assert [(d["len"], d["value"]) for d in out_rle["a"].to_list()] == [
        (2, 1), (3, 2), (1, 3), (2, None)
    ]


def _cmp_lists(label, got, want):
    assert len(got) == len(want), label
    for i, (g, w) in enumerate(zip(got, want)):
        gl = g if isinstance(g, list) else [g]
        wl = w if isinstance(w, list) else [w]
        if not isinstance(g, list):
            gl, wl = [g], [w]
        assert len(gl) == len(wl), f"{label} row {i}: {g} != {w}"
        for a, b in zip(gl, wl):
            if isinstance(a, float) and isinstance(b, float):
                if a != a and b != b:
                    continue
                assert a == pytest.approx(b, rel=1e-9, abs=1e-12), (
                    f"{label} row {i}: {g} != {w}"
                )
            else:
                assert a == b, f"{label} row {i}: {g} != {w}"


@pytest.mark.parametrize("chunk", CHUNKS)
def test_fuzz_list_longtail_traced_vs_host(chunk, monkeypatch):
    """round-5: every newly traced list op (fn_nested long tail) against the
    host oracle (ops/list_ops.py) over random list columns — same exprs,
    gate flipped via POLARS_TPU_FORCE_HOST_LISTOPS."""
    rng = np.random.default_rng(9100 + chunk)
    x = pl.col("x")

    def rand_args():
        return int(rng.integers(-3, 4)), int(rng.integers(0, 4))

    for case in range(6):
        kind = ["int", "float", "str", "bool"][int(rng.integers(0, 4))]
        n_rows = int(rng.integers(1, 24))

        def rand_list():
            if rng.random() < 0.12:
                return None
            k = int(rng.integers(0, 6))
            out = []
            for _ in range(k):
                if rng.random() < 0.15:
                    out.append(None)
                elif kind == "int":
                    out.append(int(rng.integers(-9, 10)))
                elif kind == "float":
                    out.append(round(float(rng.normal(0, 100)), 2))
                elif kind == "str":
                    out.append(["a", "b", "cc", ""][int(rng.integers(0, 4))])
                else:
                    out.append(bool(rng.integers(0, 2)))
            return out

        inner = {"int": pl.Int64, "float": pl.Float64, "str": pl.String,
                 "bool": pl.Boolean}[kind]
        df = pl.DataFrame(
            {"x": pl.Series("x", [rand_list() for _ in range(n_rows)],
                            dtype=pl.List(inner))}
        )
        nv, ov = rand_args()
        exprs = [
            x.list.head(nv).alias("h"),
            x.list.tail(nv).alias("t"),
            x.list.slice(nv, ov).alias("sl"),
            x.list.slice(nv).alias("slo"),
            x.list.shift(nv).alias("sh"),
            x.list.drop_nulls().alias("dn"),
            x.list.gather_every(max(ov, 1), max(nv, 0)).alias("ge"),
            x.list.n_unique().alias("nu"),
            x.list.arg_min().alias("amin"),
            x.list.arg_max().alias("amax"),
        ]
        if kind in ("int", "float"):
            exprs += [
                x.list.diff(n=nv or 1).alias("d"),
                x.list.diff(n=nv or 1, null_behavior="drop").alias("dd"),
                x.list.var().alias("v"),
                x.list.std().alias("sd"),
                x.list.median().alias("md"),
                x.list.count_matches(1 if kind == "int" else 1.0).alias("cm"),
            ]
        if kind == "bool":
            exprs += [x.list.any().alias("any"), x.list.all().alias("all")]
        # elementwise eval/filter (r5 traced) — numeric math on numerics,
        # null-shape predicates everywhere
        exprs += [x.list.eval(pl.element().is_null()).alias("evn"),
                  x.list.filter(pl.element().is_not_null()).alias("fnn"),
                  x.list.concat(x.list.reverse()).alias("cc"),
                  x.list.set_union(x.list.head(2)).alias("un"),
                  x.list.set_intersection(x.list.tail(3)).alias("ix"),
                  x.list.set_difference(x.list.head(1)).alias("df"),
                  x.list.set_symmetric_difference(x.list.gather_every(2)).alias("sx")]
        if kind in ("int", "float"):
            exprs += [
                x.list.eval(pl.element() * 2 + 1).alias("ev2"),
                x.list.filter(pl.element() > 0).alias("fgt"),
                x.list.eval(pl.element().abs()).alias("eab"),
            ]
        label = f"seed={9100+chunk} case={case} kind={kind} n={nv} o={ov}"
        traced = df.lazy().select(exprs).collect()
        monkeypatch.setenv("POLARS_TPU_FORCE_HOST_LISTOPS", "1")
        try:
            host = df.lazy().select(exprs).collect()
        finally:
            monkeypatch.delenv("POLARS_TPU_FORCE_HOST_LISTOPS")
        for cname in traced.columns:
            _cmp_lists(f"{label} col={cname}", traced[cname].to_list(),
                       host[cname].to_list())
