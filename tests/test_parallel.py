"""Distributed operator tests on the 8-device virtual CPU mesh (SURVEY.md §4:
shrink chip counts to force shuffle paths on small data)."""

import jax
import numpy as np
import pytest

import polars_tpu as pl
from polars_tpu.parallel import (
    dist_groupby_sum,
    dist_join_inner,
    dist_reduce_sum,
    make_mesh,
    shard_table_arrays,
    shuffle_by_key,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest should provide 8 virtual devices"
    return make_mesh(8)


def test_dist_reduce_sum(mesh, rng):
    n = 10_000
    v = rng.normal(size=n)
    arrays, per = shard_table_arrays(mesh, {"v": v}, n)
    mask = np.zeros(per * 8, bool)
    mask[:n] = True
    marr, _ = shard_table_arrays(mesh, {"m": mask}, per * 8)
    out = dist_reduce_sum(mesh, arrays["v"], marr["m"])
    assert abs(float(out) - v.sum()) < 1e-6


def test_dist_groupby_sum(mesh, rng):
    n = 8_000
    g = rng.integers(0, 40, n)
    v = rng.normal(size=n)
    total = -(-n // 8) * 8
    mask = np.zeros(total, bool)
    mask[:n] = True
    arrays, per = shard_table_arrays(mesh, {"g": g.astype(np.int32), "v": v, "m": mask}, n)
    out = dist_groupby_sum(mesh, arrays["g"], arrays["v"], arrays["m"], 64)
    expected = np.zeros(64)
    np.add.at(expected, g, v)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-9, atol=1e-9)


def test_shuffle_by_key(mesh, rng):
    n = 4_000
    k = rng.integers(0, 500, n).astype(np.int64)
    v = rng.normal(size=n)
    total = -(-n // 8) * 8
    mask = np.zeros(total, bool)
    mask[:n] = True
    arrays, per = shard_table_arrays(mesh, {"k": k, "v": v, "m": mask}, n)
    cap = per  # generous capacity
    gk, (gv,), gm, overflow = shuffle_by_key(mesh, arrays["k"], [arrays["v"]], arrays["m"], cap)
    assert int(np.asarray(overflow)[0]) == 0
    gk_np = np.asarray(gk)
    gm_np = np.asarray(gm)
    gv_np = np.asarray(gv)
    # every original row survives exactly once
    assert gm_np.sum() == n
    assert abs(gv_np[gm_np].sum() - v.sum()) < 1e-6
    # keys with equal value land on the same shard
    shard_of = {}
    rows_per_shard = gk_np.shape[0] // 8
    for i in np.nonzero(gm_np)[0]:
        s = i // rows_per_shard
        key = gk_np[i]
        assert shard_of.setdefault(key, s) == s


def test_dist_join_inner(mesh, rng):
    n = 2_000
    lk = rng.integers(0, 300, n).astype(np.int64)
    rk = rng.integers(0, 300, n).astype(np.int64)
    lv = rng.normal(size=n)
    rv = rng.normal(size=n)
    total = -(-n // 8) * 8
    mask = np.zeros(total, bool)
    mask[:n] = True
    arrays, per = shard_table_arrays(
        mesh, {"lk": lk, "rk": rk, "lv": lv, "rv": rv, "m": mask}, n
    )
    out_cap = 8 * per * 8  # generous
    olk, olv, orv, ok, overflow = dist_join_inner(
        mesh, arrays["lk"], arrays["lv"], arrays["m"],
        arrays["rk"], arrays["rv"], arrays["m"], per, out_cap,
    )
    assert int(np.asarray(overflow)[0]) == 0
    ok_np = np.asarray(ok)
    # expected join cardinality via numpy
    import pandas as pd

    exp = pd.merge(
        pd.DataFrame({"k": lk, "lv": lv}), pd.DataFrame({"k": rk, "rv": rv}), on="k"
    )
    assert ok_np.sum() == len(exp)
    got_sum = np.asarray(olv)[ok_np].sum() + np.asarray(orv)[ok_np].sum()
    assert abs(got_sum - (exp["lv"].sum() + exp["rv"].sum())) < 1e-6


def test_collect_distributed_matches(mesh, rng):
    import pandas as pd

    n = 20_000
    df = pl.DataFrame(
        {
            "k": rng.integers(0, 30, n),
            "s": np.asarray(["a", "b", "c"], object)[rng.integers(0, 3, n)],
            "v": rng.normal(size=n),
        }
    )
    q = (
        df.lazy()
        .filter(pl.col("v") > -1)
        .group_by("s")
        .agg(t=pl.col("v").sum(), c=pl.len(), m=pl.col("v").mean())
        .sort("s")
    )
    from polars_tpu.testing import assert_frame_equal

    assert_frame_equal(q.collect(), q.collect(engine="distributed", mesh=mesh), rtol=1e-12)


def test_collect_distributed_int_keys(mesh, rng):
    n = 9_000
    df = pl.DataFrame({"k": rng.integers(0, 100, n), "v": rng.integers(0, 50, n)})
    q = df.lazy().group_by("k").agg(s=pl.col("v").sum(), mx=pl.col("v").max()).sort("k")
    from polars_tpu.testing import assert_frame_equal

    assert_frame_equal(q.collect(), q.collect(engine="distributed", mesh=mesh))


def test_multihost_assignment():
    """Scan-work assignment + shard bounds (parallel/multihost.py) are
    deterministic, balanced, and collectively exhaustive."""
    from polars_tpu.parallel.multihost import (
        assign_files, init_multihost, local_shard_bounds,
    )

    files = [f"f{i:03d}.parquet" for i in range(10)]
    parts = [assign_files(files, 4, p) for p in range(4)]
    assert sorted(sum(parts, [])) == sorted(files)          # exhaustive
    assert max(map(len, parts)) - min(map(len, parts)) <= 1  # balanced
    assert parts == [assign_files(list(reversed(files)), 4, p) for p in range(4)]
    assert assign_files(files, 1, 0) == files

    spans = [local_shard_bounds(103, 4, p) for p in range(4)]
    assert spans[0][0] == 0 and spans[-1][1] == 103
    assert all(spans[i][1] == spans[i + 1][0] for i in range(3))
    assert max(b - a for a, b in spans) - min(b - a for a, b in spans) <= 1

    assert init_multihost() is False  # no coordinator configured: no-op


def test_checked_barrier_single_process_noop():
    from polars_tpu.parallel import multihost as MH

    MH.checked_barrier("t", timeout_s=0.1)  # single process: returns at once


def test_checked_barrier_detects_straggler(monkeypatch):
    """Failure detection (SURVEY §5): a peer that never arrives turns the
    would-be-infinite collective hang into a ComputeError naming the
    checkpoint-resume recovery path."""
    import time

    import jax
    import pytest

    from polars_tpu.errors import ComputeError
    from polars_tpu.parallel import multihost as MH

    monkeypatch.setattr(jax, "process_count", lambda: 2)

    class _FakeMHU:
        @staticmethod
        def sync_global_devices(tag):
            time.sleep(30)  # the lost-peer hang

    import jax.experimental

    monkeypatch.setattr(jax.experimental, "multihost_utils", _FakeMHU, raising=False)
    t0 = time.perf_counter()
    with pytest.raises(ComputeError, match="timed out.*checkpoint_dir"):
        MH.checked_barrier("t", timeout_s=0.3)
    assert time.perf_counter() - t0 < 5.0
