"""Checkpoint/resume for streaming queries (engine/checkpoint.py).

The reference has no in-query checkpointing (SURVEY.md §5: its adjacent
mechanisms are the versioned plan serializer, polars-plan/src/client/mod.rs:7,
and the OOC spill files, polars-ooc/src/spill_file.rs); the crash-resume
story here is the TPU deployment's job-level restart. These tests exercise
the full loop: run with ``checkpoint_dir``, crash mid-scan, resume, and
verify (a) completed batches were skipped, (b) the result is identical, and
(c) a changed query/batch size/decomposition is rejected."""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

import polars_tpu as pl
from polars_tpu.engine import checkpoint as C
from polars_tpu.engine import streaming as S
from polars_tpu.errors import ComputeError

N = 10_000
BATCH = 1024
N_BATCHES = -(-N // BATCH)


class Boom(RuntimeError):
    pass


def _mk_lf():
    rng = np.random.default_rng(3)
    df = pl.DataFrame({
        "g": rng.integers(0, 50, N),
        "x": rng.normal(size=N),
    })
    return df.lazy().group_by("g").agg(
        s=pl.col("x").sum(), n=pl.len()
    ).sort("g")


def _crashing_iter(orig, crash_at: int):
    def it(leaf, batch_rows):
        for i, b in enumerate(orig(leaf, batch_rows)):
            if i == crash_at:
                raise Boom("injected crash")
            yield b
    return it


def test_checkpoint_crash_resume(tmp_path, monkeypatch):
    lf = _mk_lf()
    ck = str(tmp_path / "ck")

    monkeypatch.setattr(S, "_iter_batches", _crashing_iter(S._iter_batches, 3))
    with pytest.raises(Boom):
        lf.collect(engine="streaming", batch_rows=BATCH, checkpoint_dir=ck)
    monkeypatch.undo()

    # the three completed batches are durable
    man = json.loads((Path(ck) / "manifest.json").read_text())
    assert man["done"] == 3
    assert (Path(ck) / "part_00002.parquet").exists()

    # resume: only the remaining batches are computed + persisted
    added = []
    orig_add = C.StreamCheckpoint.add_part

    def spy_add(self, df):
        added.append(self.done)
        return orig_add(self, df)

    monkeypatch.setattr(C.StreamCheckpoint, "add_part", spy_add)
    got = lf.collect(engine="streaming", batch_rows=BATCH, checkpoint_dir=ck)
    monkeypatch.undo()

    assert added == list(range(3, N_BATCHES))  # batches 0-2 skipped
    exp = lf.collect()
    pd.testing.assert_frame_equal(got.to_pandas(), exp.to_pandas())

    # a fully-checkpointed re-run computes nothing new and still matches
    added.clear()
    monkeypatch.setattr(C.StreamCheckpoint, "add_part", spy_add)
    again = lf.collect(engine="streaming", batch_rows=BATCH, checkpoint_dir=ck)
    monkeypatch.undo()
    assert added == []
    pd.testing.assert_frame_equal(again.to_pandas(), exp.to_pandas())


def test_checkpoint_fingerprint_mismatch_raises(tmp_path):
    lf = _mk_lf()
    ck = str(tmp_path / "ck")
    lf.collect(engine="streaming", batch_rows=BATCH, checkpoint_dir=ck)

    # different batch size -> different partial sequence -> reject
    with pytest.raises(ComputeError, match="fingerprint|decomposition|different"):
        lf.collect(engine="streaming", batch_rows=512, checkpoint_dir=ck)

    # different query -> reject
    lf2 = _mk_lf().filter(pl.col("s") > 0)
    with pytest.raises(ComputeError):
        lf2.collect(engine="streaming", batch_rows=BATCH, checkpoint_dir=ck)


def test_checkpoint_decomposition_env_in_fingerprint(tmp_path, monkeypatch):
    """The grace-join env toggles feed the batch decomposition, so they are
    part of the checkpoint identity (ADVICE r4 high): resuming under a
    different POLARS_TPU_STREAM_JOIN_PARTITIONS must be rejected, not
    silently mixed."""
    lf = _mk_lf()
    ck = str(tmp_path / "ck")
    lf.collect(engine="streaming", batch_rows=BATCH, checkpoint_dir=ck)
    monkeypatch.setenv("POLARS_TPU_STREAM_JOIN_PARTITIONS", "7")
    with pytest.raises(ComputeError):
        lf.collect(engine="streaming", batch_rows=BATCH, checkpoint_dir=ck)


def test_checkpoint_topk_terminal(tmp_path, monkeypatch):
    """TopK (sort with limit) partials are reductions -> they checkpoint."""
    rng = np.random.default_rng(7)
    df = pl.DataFrame({"a": rng.integers(0, 1 << 20, N), "b": rng.normal(size=N)})
    lf = df.lazy().sort("a").limit(17)

    ck = str(tmp_path / "ck")
    monkeypatch.setattr(S, "_iter_batches", _crashing_iter(S._iter_batches, 4))
    with pytest.raises(Boom):
        lf.collect(engine="streaming", batch_rows=BATCH, checkpoint_dir=ck)
    monkeypatch.undo()
    man = json.loads((Path(ck) / "manifest.json").read_text())
    assert man["done"] == 4

    got = lf.collect(engine="streaming", batch_rows=BATCH, checkpoint_dir=ck)
    exp = lf.collect()
    pd.testing.assert_frame_equal(got.to_pandas(), exp.to_pandas())


def test_checkpoint_distinct_terminal(tmp_path, monkeypatch):
    rng = np.random.default_rng(9)
    df = pl.DataFrame({"k": rng.integers(0, 300, N)})
    lf = df.lazy().unique(subset=["k"], keep="any").sort("k")

    ck = str(tmp_path / "ck")
    monkeypatch.setattr(S, "_iter_batches", _crashing_iter(S._iter_batches, 2))
    with pytest.raises(Boom):
        lf.collect(engine="streaming", batch_rows=BATCH, checkpoint_dir=ck)
    monkeypatch.undo()

    got = lf.collect(engine="streaming", batch_rows=BATCH, checkpoint_dir=ck)
    exp = lf.collect()
    pd.testing.assert_frame_equal(got.to_pandas(), exp.to_pandas())


def test_checkpoint_fingerprint_no_readback():
    """plan_fingerprint must not materialize device frames (on axon the
    first device->host readback permanently degrades the session — the
    fingerprint runs at query START). Identity comes from schema + height."""
    df = pl.DataFrame({"a": [1, 2, 3], "b": [1.0, 2.0, 3.0]})
    node = df.lazy().group_by("a").agg(pl.col("b").sum())._node

    import polars_tpu.plan.serialize as ser

    def banned(_df):  # pragma: no cover - only hit on regression
        raise AssertionError("fingerprint serialized a frame (device readback)")

    orig = ser._df_to_b64
    ser._df_to_b64 = banned
    try:
        fp1 = C.plan_fingerprint(node, 1024)
        fp2 = C.plan_fingerprint(node, 1024)
        fp3 = C.plan_fingerprint(node, 2048)
    finally:
        ser._df_to_b64 = orig
    assert fp1 == fp2 != fp3
