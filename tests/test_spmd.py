"""SPMD engine tests on the 8-device virtual CPU mesh (round-2 verdict #1:
distributed execution of REAL query plans — oracle-exact results, all_to_all
in the compiled program, skew absorbed by pre-aggregation)."""

import numpy as np
import pandas as pd
import pytest

import polars_tpu as pl
from polars_tpu.engine import spmd
from polars_tpu.testing import pdsh


def _cmp(lf, **kw):
    exp = lf.collect()
    got = lf.collect(engine="distributed")
    pd.testing.assert_frame_equal(
        got.to_pandas().reset_index(drop=True),
        exp.to_pandas().reset_index(drop=True),
        **kw,
    )
    return got


@pytest.fixture(scope="module")
def facts(rng_mod):
    n = 6000
    return pl.DataFrame({
        "k": rng_mod.integers(0, 97, n),
        "s": np.asarray(["a", "b", "c", "d"], object)[rng_mod.integers(0, 4, n)],
        "v": rng_mod.normal(size=n),
        "w": rng_mod.integers(0, 1000, n),
    })


@pytest.fixture(scope="module")
def rng_mod():
    return np.random.default_rng(1234)


def test_dist_groupby_decomposable(facts):
    _cmp(
        facts.lazy()
        .filter(pl.col("v") > -1.0)
        .group_by("k")
        .agg(
            s=pl.col("v").sum(), m=pl.col("v").mean(), n=pl.len(),
            lo=pl.col("v").min(), hi=pl.col("v").max(),
        )
        .sort("k")
    )


def test_dist_groupby_string_keys(facts):
    _cmp(facts.lazy().group_by("s", "k").agg(t=pl.col("v").sum()).sort("s", "k"))


def test_dist_groupby_nondecomposable(facts):
    # median/n_unique force the raw-row shuffle path
    _cmp(
        facts.lazy().group_by("s").agg(
            md=pl.col("v").median(), nu=pl.col("k").n_unique()
        ).sort("s")
    )


def test_dist_join_broadcast_and_groupby(facts, rng_mod):
    dim = pl.DataFrame({"k": np.arange(97), "name": [f"g{i}" for i in range(97)]})
    _cmp(
        facts.lazy()
        .join(dim.lazy(), on="k", validate="m:1")
        .group_by("name")
        .agg(t=(pl.col("v") * 2).sum())
        .sort("name")
    )


def test_dist_join_shuffle_path(facts, monkeypatch):
    from polars_tpu.config import config

    monkeypatch.setattr(config(), "broadcast_join_rows", 0)
    dim = pl.DataFrame({"k": np.arange(97), "f": np.linspace(0, 1, 97)})
    _cmp(
        facts.lazy()
        .join(dim.lazy(), on="k", validate="m:1")
        .group_by("k")
        .agg(t=(pl.col("v") * pl.col("f")).sum())
        .sort("k")
    )


def test_dist_shuffle_overflow_retry(facts, monkeypatch):
    # capacity of 2 rows/bucket at rung 1 must overflow; the ladder retries at
    # the measured pow2 rung (cap 2*scale), still producing exact results
    orig = spmd._shuffle_cap
    monkeypatch.setattr(
        spmd, "_shuffle_cap",
        lambda rows, d, scale: rows if scale <= 0 else 2 * max(scale, 1),
    )
    _cmp(facts.lazy().group_by("s").agg(md=pl.col("v").median()).sort("s"))
    monkeypatch.setattr(spmd, "_shuffle_cap", orig)


def test_dist_overflow_single_pow2_retry(facts, monkeypatch):
    """One overflow = exactly ONE extra compile at the measured pow2 rung —
    never the unbounded recompile walk (VERDICT r3 item 6)."""
    calls = []
    orig = spmd.run_spmd_segment

    def spy(root, leaf_dfs, mesh, lossless=False, cap_scale=1, sync=True):
        calls.append(0 if lossless else cap_scale)
        return orig(root, leaf_dfs, mesh, lossless=lossless, cap_scale=cap_scale, sync=sync)

    monkeypatch.setattr(spmd, "run_spmd_segment", spy)
    monkeypatch.setattr(
        spmd, "_shuffle_cap",
        lambda rows, d, scale: rows if scale <= 0 else 2 * max(scale, 1),
    )
    # the overflow-readback retry ladder belongs to the SYNC protocol; the
    # flip-free default would have chosen lossless up front instead
    monkeypatch.setenv("POLARS_TPU_DIST_SYNC", "1")
    spmd._SPMD_JIT_CACHE.clear()
    _cmp(facts.lazy().group_by("s").agg(md=pl.col("v").median()).sort("s"))
    assert len(calls) == 2, calls           # first attempt + ONE retry
    assert calls[0] == 1
    assert calls[1] >= 2 and (calls[1] & (calls[1] - 1)) == 0  # pow2 rung


def test_dist_skewed_keys(rng_mod):
    # zipf-skewed keys: the pre-agg path bounds per-key shuffle traffic to one
    # partial row per shard, so no capacity blowup
    n = 20000
    k = np.minimum(rng_mod.zipf(1.2, n), 1000).astype(np.int64)
    df = pl.DataFrame({"k": k, "v": rng_mod.normal(size=n)})
    _cmp(df.lazy().group_by("k").agg(s=pl.col("v").sum(), c=pl.len()).sort("k"))


def test_hlo_contains_all_to_all(facts, monkeypatch):
    monkeypatch.setattr(spmd, "CAPTURE_HLO", True)
    spmd._SPMD_JIT_CACHE.clear()
    lf = facts.lazy().group_by("w").agg(s=pl.col("v").sum()).sort("w")
    _cmp(lf)
    text = spmd.LAST_LOWERED
    assert text is not None
    assert "all_to_all" in text, "distributed group-by must shuffle via all_to_all"


def test_hlo_broadcast_join_contains_all_gather(facts, monkeypatch):
    monkeypatch.setattr(spmd, "CAPTURE_HLO", True)
    spmd._SPMD_JIT_CACHE.clear()
    dim = pl.DataFrame({"k": np.arange(97), "name": [f"g{i}" for i in range(97)]})
    lf = (
        facts.lazy().join(dim.lazy(), on="k", validate="m:1")
        .group_by("name").agg(t=pl.col("v").sum()).sort("name")
    )
    _cmp(lf)
    assert "all_gather" in spmd.LAST_LOWERED


# -- PDS-H through the SPMD engine (verdict #1 done-when) ---------------------


@pytest.fixture(scope="module")
def pdsh_frames():
    raw = pdsh.generate_pdsh(scale=0.004, seed=11)
    return {name: pl.DataFrame(tbl) for name, tbl in raw.items()}


def test_pdsh_q1_distributed(pdsh_frames):
    _cmp(pdsh.q1(pdsh_frames["lineitem"]))


def test_pdsh_q3_distributed(pdsh_frames):
    _cmp(
        pdsh.q3(
            pdsh_frames["customer"], pdsh_frames["orders"], pdsh_frames["lineitem"]
        )
    )


def test_pdsh_q4_distributed(pdsh_frames):
    _cmp(pdsh.q4(pdsh_frames["orders"], pdsh_frames["lineitem"]))


def test_pdsh_q6_distributed(pdsh_frames):
    _cmp(pdsh.q6(pdsh_frames["lineitem"]))


def test_skew_routed_shuffle_join(monkeypatch, rng_mod):
    """A 60%-hot probe key through the (non-broadcast) shuffle join: the
    in-trace probe histogram (CardinalitySketch analogue) must route hot
    buckets — heavy build rows replicate via all_gather, heavy probe rows
    stay local — so the lossless full-capacity retry never fires and the
    result stays oracle-exact."""
    monkeypatch.setenv("POLARS_TPU_BROADCAST_JOIN_ROWS", "1")
    from polars_tpu import config as _cfg

    monkeypatch.setattr(_cfg.config(), "broadcast_join_rows", 1)
    n = 4096
    keys = np.where(rng_mod.random(n) < 0.6, 7, rng_mod.integers(0, 500, n)).astype(np.int64)
    probe = pl.DataFrame({"k": keys, "v": rng_mod.normal(size=n)})
    build = pl.DataFrame({"k": np.arange(500, dtype=np.int64), "w": rng_mod.normal(size=500)})
    q = (
        probe.lazy().join(build.lazy(), on="k", validate="m:1")
        .group_by("k").agg(sv=pl.col("v").sum(), w=pl.col("w").first()).sort("k")
    )
    orig = spmd.run_spmd_segment

    def guard(root, leaf_dfs, mesh, lossless=False, cap_scale=1, sync=True):
        assert not lossless and cap_scale == 1, "capacity retry fired — skew routing failed"
        return orig(root, leaf_dfs, mesh, lossless=lossless, cap_scale=cap_scale, sync=sync)

    monkeypatch.setattr(spmd, "run_spmd_segment", guard)
    monkeypatch.setattr(spmd, "CAPTURE_HLO", True)
    spmd._SPMD_JIT_CACHE.clear()
    _cmp(q)
    text = spmd.LAST_LOWERED
    assert "all_to_all" in text and "all_gather" in text


def test_dist_sort_range_partitioned(facts, monkeypatch):
    """Distributed sort (VERDICT r3 item 5): sample splitters + all_to_all +
    local radix sort must reproduce the single-chip sort exactly, including
    stability, null placement, and multi-key descending."""
    monkeypatch.setattr(spmd, "CAPTURE_HLO", True)
    spmd._SPMD_JIT_CACHE.clear()
    lf = facts.lazy().sort("v")
    _cmp(lf)
    assert "all_to_all" in spmd.LAST_LOWERED  # the exchange really happened

    # multi-key with descending + string key + nulls_last
    withnull = facts.with_columns(
        pl.when(pl.col("w") % 11 == 0).then(None).otherwise(pl.col("v")).alias("v")
    )
    _cmp(withnull.lazy().sort(["s", "v"], descending=[True, False], nulls_last=True))
    # stability: equal keys keep original order
    _cmp(facts.lazy().sort("s", maintain_order=True))


def test_dist_sort_after_groupby(facts):
    # sort above a distributed group-by stays inside ONE shard_map program
    _cmp(facts.lazy().group_by("k").agg(t=pl.col("v").sum()).sort("t"))


def test_dist_distinct(facts):
    base = facts.lazy().select("s", "k").with_columns(kk=pl.col("k") % 7)
    for keep in ("any", "first", "last", "none"):
        exp = base.unique(subset=["s", "kk"], keep=keep).sort("s", "kk", "k").collect()
        got = (
            base.unique(subset=["s", "kk"], keep=keep)
            .sort("s", "kk", "k")
            .collect(engine="distributed")
        )
        pd.testing.assert_frame_equal(
            got.to_pandas().reset_index(drop=True),
            exp.to_pandas().reset_index(drop=True),
        )


def test_dist_window_scalar_aggs(facts, monkeypatch):
    """Scalar-agg windows rewrite to group-by + m:1 join (spmd._rewrite_windows)
    and run fully distributed: rows never move, only the per-key aggregate
    table rides the exchange."""
    monkeypatch.setattr(spmd, "CAPTURE_HLO", True)
    spmd._SPMD_JIT_CACHE.clear()
    lf = facts.lazy().with_columns(
        t=pl.col("v").sum().over("k"),
        m=pl.col("v").mean().over("k"),
    )
    _cmp(lf)
    assert spmd.LAST_LOWERED is not None  # the SPMD engine really ran

    # window nested in arithmetic, select form
    _cmp(facts.lazy().select("k", dev=pl.col("v") - pl.col("v").mean().over("k")))

    # two different partition-key sets in one node
    _cmp(
        facts.lazy().with_columns(
            a=pl.col("v").sum().over("k"),
            b=pl.col("v").max().over("s"),
        )
    )

    # expression partition keys + len()
    _cmp(
        facts.lazy().with_columns(
            c=pl.len().over(pl.col("w") % 5),
        )
    )


def test_dist_window_null_keys(facts):
    # over() groups null keys together: the rewrite join must match nulls
    withnull = facts.with_columns(
        kk=pl.when(pl.col("w") % 7 == 0).then(None).otherwise(pl.col("k")),
    )
    lf = withnull.lazy().with_columns(t=pl.col("v").sum().over("kk"))
    _cmp(lf)


def test_dist_window_above_groupby(facts):
    # window over the OUTPUT of a distributed group-by: one SPMD program
    lf = (
        facts.lazy()
        .group_by("k", "s")
        .agg(t=pl.col("v").sum())
        .with_columns(share=pl.col("t") / pl.col("t").sum().over("s"))
        .sort("k", "s")
    )
    _cmp(lf)


def test_dist_window_unsupported_falls_back(facts):
    # rank().over is NOT a scalar agg: plan must still execute correctly
    # (single-chip materialization of that node)
    lf = facts.lazy().with_columns(r=pl.col("v").rank().over("k")).group_by("k").agg(
        q=pl.col("r").max()
    ).sort("k")
    _cmp(lf)


def test_dist_asof_join(facts, rng_mod, monkeypatch):
    """Distributed asof (VERDICT r3 missing #5 tail): right side broadcast via
    all_gather, local probes never move; strategies + tolerance + by-groups
    all match the single-chip engine exactly."""
    n_r = 500
    quotes = pl.DataFrame({
        "t": np.sort(rng_mod.integers(0, 100_000, n_r)),
        "px": rng_mod.normal(size=n_r),
    })
    trades = pl.DataFrame({
        "t": rng_mod.integers(0, 100_000, 4000),
        "qty": rng_mod.integers(1, 50, 4000),
    }).sort("t")

    monkeypatch.setattr(spmd, "CAPTURE_HLO", True)
    spmd._SPMD_JIT_CACHE.clear()
    for strategy in ("backward", "forward", "nearest"):
        _cmp(trades.lazy().join_asof(quotes.lazy(), on="t", strategy=strategy))
    assert "all_gather" in spmd.LAST_LOWERED

    # tolerance
    _cmp(trades.lazy().join_asof(quotes.lazy(), on="t", tolerance=100))

    # by-groups (composite in-trace key via pmin/pmax span)
    quotes_g = quotes.with_columns(sym=pl.Series((np.arange(n_r) % 3)).cast(pl.Int64))
    trades_g = trades.with_columns(sym=pl.Series((np.arange(4000) % 3)).cast(pl.Int64))
    _cmp(trades_g.lazy().join_asof(quotes_g.lazy(), on="t", by="sym"))

    # asof feeding a distributed group-by: one SPMD program end-to-end
    lf = (
        trades_g.lazy()
        .join_asof(quotes_g.lazy(), on="t", by="sym")
        .group_by("sym")
        .agg(v=(pl.col("px") * pl.col("qty")).sum())
        .sort("sym")
    )
    _cmp(lf)


# ---------------------------------------------------------------------------
# flip-free protocol (VERDICT r4 #6)
# ---------------------------------------------------------------------------


def test_dist_flip_free_zero_readbacks(facts, monkeypatch):
    """The default distributed protocol must perform EXACTLY ONE batched
    readback (pending.finalize) for a multi-segment plan — no per-segment
    device_get (on the TPU backend the first readback permanently degrades
    the session, CLAUDE.md §1)."""
    import jax

    calls = []
    orig = jax.device_get

    def spy(x):
        calls.append(x)
        return orig(x)

    monkeypatch.setattr(jax, "device_get", spy)
    # rank() is not elementwise -> the leaf materializes as its own
    # single-chip segment (deferred, device-count-chained into shard_map)
    lf = (
        facts.lazy()
        .with_columns(r=pl.col("v").rank())
        .group_by("s")
        .agg(t=pl.col("v").sum(), hi=pl.col("r").max())
        .sort("s")
    )
    got = lf.collect(engine="distributed")
    n_gets = len(calls)
    monkeypatch.undo()
    assert n_gets == 1, f"expected 1 batched readback, saw {n_gets}"
    exp = lf.collect()
    pd.testing.assert_frame_equal(
        got.to_pandas().reset_index(drop=True),
        exp.to_pandas().reset_index(drop=True),
    )


def test_dist_flip_free_capacity_proof(facts):
    """Dict/bool-keyed decomposable group-bys PROVE the default capacity
    rung host-side (key cardinality <= bucket capacity) so flip-free runs
    skip the lossless fallback; a distributed sort cannot prove it and must
    run lossless."""
    lf = facts.lazy().group_by("s").agg(t=pl.col("v").sum()).sort("s")
    _cmp(lf)
    assert spmd.LAST_CAP_SCALE == 1  # proven: |dict(s)|+1 << 128

    lf2 = facts.lazy().sort("v")
    _cmp(lf2)
    assert spmd.LAST_CAP_SCALE == 0  # range partition: lossless in flip-free


def test_dist_flip_free_validation_error_still_raises(facts):
    """Deferred execution must not swallow in-trace validation failures: a
    violated m:1 cardinality surfaces at the batched finalize readback."""
    from polars_tpu.errors import ComputeError, InvalidOperationError

    dup = pl.DataFrame({"k": [1, 1, 2], "u": [10.0, 11.0, 12.0]})
    lf = (
        facts.lazy()
        .join(dup.lazy(), on="k", validate="m:1")
        .group_by("s")
        .agg(t=pl.col("u").sum())
    )
    with pytest.raises((ComputeError, InvalidOperationError)):
        lf.collect(engine="distributed")


# ---------------------------------------------------------------------------
# distributed general windows (VERDICT r4 #7)
# ---------------------------------------------------------------------------


def test_dist_window_order_by(facts, monkeypatch):
    """rank/cum_sum/row_number .over(k, order_by=o) distribute via hash
    co-location + local eval + gid restore-sort; results must match the
    single-chip engine ROW FOR ROW (original order restored)."""
    monkeypatch.setattr(spmd, "CAPTURE_HLO", True)
    spmd._SPMD_JIT_CACHE.clear()
    # one partition key set per node (a select distributes when all its
    # windows share the key set); chained nodes fuse into ONE SPMD program
    lf = facts.lazy().with_columns(
        r=pl.col("v").rank().over("k", order_by="w"),
        c=pl.col("v").cum_sum().over("k", order_by="w"),
    ).with_columns(n=pl.col("v").rank("dense").over("s"))
    _cmp(lf)
    assert spmd.LAST_LOWERED is not None and "all_to_all" in spmd.LAST_LOWERED


def test_dist_window_cum_original_order(facts):
    """Order-dependent windows WITHOUT order_by see the original row
    sequence per key (the shuffle preserves global source order)."""
    _cmp(facts.lazy().with_columns(c=pl.col("v").cum_sum().over("k")))
    _cmp(facts.lazy().select(
        pl.col("k"),
        idx=pl.col("v").cum_count().over("k"),
    ))


def test_dist_window_feeding_groupby(facts):
    """Window select fused INSIDE the distributed region: window -> filter
    -> distributed group-by runs as one SPMD program."""
    lf = (
        facts.lazy()
        .with_columns(r=pl.col("v").rank().over("k", order_by="w"))
        .filter(pl.col("r") <= 3.0)
        .group_by("s")
        .agg(t=pl.col("v").sum(), m=pl.col("r").max())
        .sort("s")
    )
    _cmp(lf)


def test_dist_window_scalar_agg_all_null_group(rng_mod):
    """VERDICT r4 weak #8: the scalar-agg window rewrite accepts
    EBinary(EAgg, EAgg) trees — sum(x)/count(x) over a group whose x is
    ALL NULL must match the single-chip broadcast path (null mean, not NaN
    or 0), and mixed-null groups must agree to the ulp."""
    n = 4000
    k = rng_mod.integers(0, 8, n)
    x = rng_mod.normal(size=n)
    x_null = np.where(k == 3, np.nan, x)  # group 3: all null
    x_mixed = np.where((k == 5) & (np.arange(n) % 2 == 0), np.nan, x)
    df = pl.DataFrame({
        "k": k,
        "x": x_null,
        "y": x_mixed,
    }).with_columns(
        x=pl.when(pl.col("x").is_nan()).then(None).otherwise(pl.col("x")),
        y=pl.when(pl.col("y").is_nan()).then(None).otherwise(pl.col("y")),
    )
    lf = df.lazy().with_columns(
        m=(pl.col("x").sum() / pl.col("x").count()).over("k"),
        r=(pl.col("y").sum() / pl.col("y").count()).over("k"),
        s=pl.col("x").sum().over("k"),
    )
    _cmp(lf)
