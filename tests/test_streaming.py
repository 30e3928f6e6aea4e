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


def test_streaming_grace_join_then_groupby_both_sides_large(monkeypatch):
    """VERDICT r3 item 7: join -> group-by fully streamed with BOTH inputs
    bigger than the batch budget: the join grace-partitions both sides, each
    partition pair feeds the group-by combiner — peak resident rows stay
    bounded by ~(total / K + partials), never the whole join output."""
    import numpy as np

    from polars_tpu.engine import streaming as S

    rng = np.random.default_rng(7)
    n_probe, n_build = 20_000, 8_000
    probe = pl.DataFrame({
        "k": rng.integers(0, n_build, n_probe),
        "v": rng.normal(size=n_probe),
    })
    build = pl.DataFrame({
        "k": np.arange(n_build),
        "grp": rng.integers(0, 23, n_build),
        "w": rng.normal(size=n_build),
    })
    lf = (
        probe.lazy()
        .join(build.lazy(), on="k", validate="m:1")
        .group_by("grp")
        .agg(s=pl.col("v").sum(), m=pl.col("w").mean(), n=pl.len())
        .sort("grp")
    )
    grace_calls = []
    orig = S._grace_outputs

    def spy(chain_top, leaf, grace_j, batch_rows):
        grace_calls.append(grace_j)
        # bounded peak: every partition-pair output must be far smaller
        # than the full join output
        for out in orig(chain_top, leaf, grace_j, batch_rows):
            assert out.height < n_probe // 2
            yield out

    monkeypatch.setattr(S, "_grace_outputs", spy)
    batch = 1024  # both sides exceed 4 * batch -> grace partitioning fires
    got = lf.collect(engine="streaming", batch_rows=batch)
    exp = lf.collect()
    assert grace_calls, "grace join did not fire"
    import pandas as pd

    pd.testing.assert_frame_equal(got.to_pandas(), exp.to_pandas())


def test_streaming_two_stateful_nodes_on_spine():
    """group-by -> sort and distinct -> group-by chains stream BOTH stateful
    nodes (the splice recurses through the streaming engine instead of
    finishing in-memory)."""
    import numpy as np

    from polars_tpu.engine import streaming as S

    rng = np.random.default_rng(11)
    n = 30_000
    df = pl.DataFrame({
        "g": rng.integers(0, 5_000, n),
        "x": rng.normal(size=n),
    })
    # group-by (5k groups) then full sort of the aggregate — two terminals
    lf = df.lazy().group_by("g").agg(s=pl.col("x").sum()).sort("s", "g")
    calls = []
    orig = S.collect_streaming

    def spy(node, *, batch_rows=None, **kwargs):
        calls.append(type(node).__name__)
        return orig(node, batch_rows=batch_rows, **kwargs)

    S.collect_streaming = spy
    try:
        got = lf.collect(engine="streaming", batch_rows=2048)
    finally:
        S.collect_streaming = orig
    exp = lf.collect()
    assert len(calls) >= 1  # the spliced sort re-entered the streaming engine
    import pandas as pd

    pd.testing.assert_frame_equal(got.to_pandas(), exp.to_pandas())

    # distinct -> group-by
    lf2 = (
        df.lazy()
        .with_columns(d=pl.col("g") % 97)
        .unique(subset=["d", "g"], keep="any")
        .group_by("d")
        .agg(n=pl.len())
        .sort("d")
    )
    got2 = lf2.collect(engine="streaming", batch_rows=2048)
    exp2 = lf2.collect()
    pd.testing.assert_frame_equal(got2.to_pandas(), exp2.to_pandas())
