"""Streaming engine: batch-wise scans must match in-memory results
(reference test pattern: engine cross-checking, SURVEY.md §4)."""

import numpy as np
import pytest

import polars_tpu as pl
from polars_tpu.testing import assert_frame_equal


@pytest.fixture(scope="module")
def parquet_path(tmp_path_factory):
    rng = np.random.default_rng(3)
    n = 50_000
    df = pl.DataFrame(
        {
            "k": rng.integers(0, 40, n),
            "s": np.asarray(["a", "b", "c", "d"], object)[rng.integers(0, 4, n)],
            "v": rng.normal(size=n),
            "q": rng.integers(1, 100, n),
        }
    )
    p = tmp_path_factory.mktemp("stream") / "t.parquet"
    df.write_parquet(p, row_group_size=8192)
    return p


def test_streaming_groupby_matches_inmemory(parquet_path):
    q = (
        pl.scan_parquet(parquet_path)
        .filter(pl.col("q") > 10)
        .group_by("s")
        .agg(
            total=pl.col("v").sum(),
            n=pl.len(),
            avg=pl.col("v").mean(),
            lo=pl.col("v").min(),
            hi=pl.col("v").max(),
        )
        .sort("s")
    )
    mem = q.collect()
    stream = q.collect(engine="streaming", batch_rows=4096)
    assert_frame_equal(mem, stream, rtol=1e-12)


def test_streaming_int_keys(parquet_path):
    q = (
        pl.scan_parquet(parquet_path)
        .group_by("k")
        .agg(c=pl.col("q").count(), s=pl.col("q").sum())
        .sort("k")
    )
    assert_frame_equal(q.collect(), q.collect(engine="streaming", batch_rows=7000))


def test_streaming_fallback_for_unsupported(parquet_path):
    # median is not decomposable -> silently falls back to in-memory
    q = pl.scan_parquet(parquet_path).group_by("s").agg(m=pl.col("v").median()).sort("s")
    assert_frame_equal(q.collect(), q.collect(engine="streaming"))


def test_streaming_batches_iterator(parquet_path):
    from polars_tpu.io.scan_exec import iter_scan_batches
    from polars_tpu.plan import logical as L

    node = L.LScan(sources=(str(parquet_path),), fmt="parquet")
    total = 0
    nb = 0
    for b in iter_scan_batches(node, 8192):
        total += b.height
        nb += 1
    assert total == 50_000
    assert nb >= 6


def test_streaming_mean_all_null_group_is_null():
    # the streaming mean finalizer (sum/count) must yield null, not 0/0=NaN,
    # for groups whose count is zero
    df = pl.DataFrame({"g": ["a", "a", "b"], "x": [1.0, 3.0, None]})
    lf = df.lazy().group_by("g").agg(pl.col("x").mean())
    mem = {r[0]: r[1] for r in lf.collect().rows()}
    st = {r[0]: r[1] for r in lf.collect(engine="streaming", batch_rows=1).rows()}
    assert mem == {"a": 2.0, "b": None}
    assert st == mem
