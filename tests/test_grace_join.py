"""Streamed-join build-side spill (grace hash join): both sides larger than
one batch partition to host spill stores, partition pairs join in memory
(reference: polars-stream/src/nodes/joins/equi_join.rs:403-530 SpillFrame)."""

import numpy as np
import pytest

import polars_tpu as pl


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(7)
    n = 12_000
    left = pl.DataFrame(
        {
            "k": rng.integers(0, 900, n),
            "x": rng.standard_normal(n),
            "s": [f"s{i % 53}" for i in range(n)],
        }
    )
    right = pl.DataFrame({"k": rng.integers(0, 900, n), "y": rng.integers(0, 100, n)})
    return left, right


def _sorted_rows(df, cols):
    return df.sort(cols).rows()


@pytest.mark.parametrize("how", ["inner", "left", "full", "semi", "anti"])
def test_grace_join_matches_memory(frames, how, monkeypatch):
    monkeypatch.setenv("POLARS_TPU_OOC_BUDGET", str(1 << 20))
    left, right = frames
    lf = left.lazy().join(right.lazy(), on="k", how=how)
    cols = [c for c in ("k", "x", "y", "s") if c in lf.collect_schema().names()]
    a = _sorted_rows(lf.collect(), cols)
    b = _sorted_rows(lf.collect(engine="streaming", batch_rows=1000), cols)
    assert a == b


def test_grace_join_with_chain_and_terminal(frames, monkeypatch):
    monkeypatch.setenv("POLARS_TPU_OOC_BUDGET", str(1 << 20))
    left, right = frames
    lf = (
        left.lazy()
        .join(right.lazy(), on="k")
        .filter(pl.col("y") > 50)
        .group_by("s")
        .agg(pl.col("y").sum(), pl.col("x").mean())
        .sort("s")
    )
    a = lf.collect()
    b = lf.collect(engine="streaming", batch_rows=1000)
    assert a["s"].to_list() == b["s"].to_list()
    assert a["y"].to_list() == b["y"].to_list()
    np.testing.assert_allclose(
        np.array(a["x"].to_list()), np.array(b["x"].to_list()), rtol=1e-9
    )


def test_grace_join_string_keys(frames, monkeypatch):
    # dict codes are frame-local: partitioning must hash string VALUES
    left, _ = frames
    right = pl.concat(
        [pl.DataFrame({"s": [f"s{i}" for i in range(53)], "z": list(range(53))})] * 150
    )
    lf = left.lazy().select("s", "x").join(right.lazy(), on="s", how="inner")
    a = lf.collect().height
    b = lf.collect(engine="streaming", batch_rows=1000).height
    assert a == b


def test_grace_disabled_env(frames, monkeypatch):
    monkeypatch.setenv("POLARS_TPU_STREAM_GRACE", "0")
    left, right = frames
    lf = left.lazy().join(right.lazy(), on="k", how="inner")
    a = _sorted_rows(lf.collect(), ["k", "x", "y"])
    b = _sorted_rows(lf.collect(engine="streaming", batch_rows=1000), ["k", "x", "y"])
    assert a == b


def test_grace_forced_partition_count(frames, monkeypatch):
    monkeypatch.setenv("POLARS_TPU_STREAM_JOIN_PARTITIONS", "7")
    left, right = frames
    lf = left.lazy().join(right.lazy(), on="k", how="inner")
    a = _sorted_rows(lf.collect(), ["k", "x", "y"])
    b = _sorted_rows(lf.collect(engine="streaming", batch_rows=1000), ["k", "x", "y"])
    assert a == b
