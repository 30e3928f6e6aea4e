"""Hashed-key string columns (utils/hashstore.py; VERDICT r4 #5).

High-cardinality string ingest stores int64 hashes on device + a row-ordered
spill file, never an O(uniques) host dictionary (reference:
polars-expr/src/hash_keys.rs raw-hash string keys). Equality semantics
(group/join/==/distinct) run in hash space; order-sensitive ops densify; a
64-bit collision among materialized keys raises instead of merging groups."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import polars_tpu as pl
from polars_tpu.utils import hashstore


@pytest.fixture(autouse=True)
def _force_hashed(monkeypatch):
    # threshold 1: every eligible string column ingests hashed
    monkeypatch.setenv("POLARS_TPU_HASHED_STRINGS", "1")
    from polars_tpu.config import config

    config().reload_env_vars()
    yield
    monkeypatch.delenv("POLARS_TPU_HASHED_STRINGS", raising=False)
    config().reload_env_vars()


def _mk(n=4000, seed=0, null_every=9):
    rng = np.random.default_rng(seed)
    import pyarrow as pa

    from polars_tpu.io._arrow import arrow_to_df

    vals = [
        None if (null_every and i % null_every == 0)
        else f"id_{i}_{rng.integers(0, 1 << 30)}"
        for i in range(n)
    ]
    tbl = pa.table({
        "s": pa.array(vals, pa.string()),
        "v": rng.normal(size=n),
        "k": rng.integers(0, 40, n),
    })
    return arrow_to_df(tbl), vals


def test_ingest_is_hashed_no_dictionary():
    df, vals = _mk()
    c = df._get("s")
    assert isinstance(c.table, hashstore.SpilledStrings)
    assert str(c.buffer.values.dtype) == "int64"
    assert not hasattr(c.table, "values")  # the whole point: no host dict


def test_groupby_and_key_materialization_match_pandas():
    df, vals = _mk()
    out = df.lazy().group_by("s").agg(t=pl.col("v").sum(), n=pl.len()).collect()
    pdf = pd.DataFrame({"s": vals, "v": df["v"].to_list()})
    want = pdf.groupby("s", dropna=False)["v"].sum()
    got = {r[0]: r[1] for r in out.rows()}
    assert out.height == len(set(vals))
    for k, w in want.items():
        kk = None if (isinstance(k, float) and np.isnan(k)) else k
        assert abs(got[kk] - w) < 1e-9


def test_equality_filter_and_isnull():
    df, vals = _mk()
    lit = vals[13]
    out = df.lazy().filter(pl.col("s") == lit).collect()
    assert out["s"].to_list() == [lit]
    out2 = df.lazy().filter(pl.col("s") != lit).collect()
    assert out2.height == sum(1 for v in vals if v is not None and v != lit)
    nn = df.lazy().filter(pl.col("s").is_null()).collect()
    assert nn.height == sum(v is None for v in vals)


def test_join_hashed_both_sides_and_vs_dictionary():
    df, vals = _mk()
    df2, _ = _mk(seed=0)  # identical values, DIFFERENT spill store
    right = df2.lazy().unique(subset=["s"]).select("s", w=pl.col("v"))
    j = df.lazy().join(right, on="s", validate="m:1").collect()
    assert j.height == sum(1 for v in vals if v is not None)

    # dictionary side (small frame) joins a hashed side by VALUE
    dim = pl.DataFrame({"s": [vals[11], vals[22], "absent"], "tag": [1, 2, 3]})
    j2 = df.lazy().join(dim.lazy(), on="s", validate="m:1").collect()
    assert sorted(j2["tag"].to_list()) == [1, 2]


def test_order_ops_densify_correctly():
    df, vals = _mk(n=800)
    nn = [v for v in vals if v is not None]
    srt = df.lazy().sort("s", nulls_last=True).collect()["s"].to_list()
    assert [v for v in srt if v is not None] == sorted(nn)
    mn = df.lazy().select(
        lo=pl.col("s").min(), hi=pl.col("s").max()
    ).collect().rows()[0]
    assert mn == (min(nn), max(nn))
    # str.* functions densify too
    ln = df.lazy().select(pl.col("s").str.len_chars().sum()).collect().rows()[0][0]
    assert ln == sum(len(v) for v in nn)


def test_distinct_and_streaming():
    df, vals = _mk()
    assert df.lazy().unique(subset=["s"]).collect().height == len(set(vals))
    got = df.lazy().group_by("s").agg(t=pl.col("v").sum()).collect(
        engine="streaming", batch_rows=512
    )
    assert got.height == len(set(vals))


def test_concat_unions_payloads():
    df, vals = _mk(n=1000, seed=1)
    df2, vals2 = _mk(n=1000, seed=2)
    cc = pl.concat([df, df2], how="vertical")
    g = cc.lazy().group_by("s").agg(n=pl.len()).collect()
    assert g.height == len(set(vals) | set(vals2))
    # round-trip values through the union store
    tail = cc.slice(1000, 5)["s"].to_list()
    assert tail == vals2[:5]


def test_collision_detected_not_silent(monkeypatch):
    """With a deliberately weak hash (first 4 chars), distinct keys collide;
    materializing them must RAISE, never return merged groups."""
    from polars_tpu.errors import ComputeError

    def weak_hash(arr, valid=None):
        obj = np.asarray(arr, dtype=object)
        out = np.empty(len(obj), np.int64)
        for i, v in enumerate(obj.tolist()):
            ok = v is not None and v == v
            out[i] = (hash(str(v)[:4]) & 0x7FFFFFFF) if ok else 0
        return out

    monkeypatch.setattr(hashstore, "hash_values", weak_hash)
    df, vals = _mk(n=500, null_every=0)  # "id_1..", "id_2.." -> collide
    with pytest.raises(ComputeError, match="collision"):
        df.lazy().group_by("s").agg(n=pl.len()).collect()["s"].to_list()


def test_write_roundtrip_materializes():
    import tempfile

    df, vals = _mk(n=600)
    path = tempfile.mktemp(suffix=".parquet")
    df.write_parquet(path)
    back = pl.read_parquet(path)
    # the re-read column may ingest hashed again; values must round-trip
    assert back["s"].to_list() == vals[:]


def test_auto_threshold_respects_cardinality(monkeypatch):
    """LOW-cardinality long columns must keep the dictionary encoding (the
    sample-uniqueness check), hashed mode is for mostly-unique columns."""
    import pyarrow as pa

    from polars_tpu.io._arrow import arrow_to_df

    n = 5000
    vals = [f"cat_{i % 20}" for i in range(n)]
    df = arrow_to_df(pa.table({"s": pa.array(vals, pa.string())}))
    assert not getattr(df._get("s").table, "hashed", False)


def test_filter_literal_collision_backstop():
    """r5 review: col("s") == literal compares hashes and its mask never
    materializes the key — the registered-literal verify must still catch a
    payload string colliding with the literal."""
    from polars_tpu.errors import ComputeError

    df, vals = _mk(n=400, null_every=0)
    store = df._get("s").table
    assert getattr(store, "hashed", False)
    payload = vals[7]
    h = store.find(payload)  # registers the true literal: consistent, fine
    # now register a DIFFERENT literal at a payload value's hash (what a
    # 64-bit collision between a filter literal and a row would look like)
    store._literals.pop(h)
    store.register_literals(np.asarray([h], np.int64), ["not-" + payload])
    with pytest.raises(ComputeError, match="collision"):
        hashstore.verify_pending()
    # verification is one-shot: the pending set drained even on failure
    assert store not in hashstore._PENDING_VERIFY


def test_filter_literal_verify_clean_path():
    """The common case: filtering on a real value verifies cleanly at
    materialization and returns exactly the matching rows."""
    df, vals = _mk(n=400, null_every=0)
    lit = vals[11]
    out = df.lazy().filter(pl.col("s") == lit).collect()
    assert out.height == 1
    assert out["v"].to_list()[0] == df["v"].to_list()[11]


def test_pending_scopes_are_thread_local():
    """r5 review: concurrent collects must not cross-register deferred
    checks into each other's scope."""
    import threading

    from polars_tpu.engine import pending

    errs: list = []
    inner_saw: list = []

    def other_thread():
        try:
            assert not pending.active()
            with pending.scope() as p:
                pending.defer(np.int64(3), label="other")
                inner_saw.append(len(p))
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    with pending.scope() as mine:
        t = threading.Thread(target=other_thread)
        t.start()
        t.join()
        pending.defer(np.int64(5), label="mine")
        assert len(mine) == 1  # the other thread's defer landed in ITS scope
    assert not errs
    assert inner_saw == [1]
