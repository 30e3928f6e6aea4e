"""Streaming sinks (round-3 verdict #3): sink_* streams batches through
incremental writers instead of collecting the whole result (reference:
polars-stream/src/nodes/io_sinks/mod.rs:27-49)."""

import os

import pytest

import polars_tpu as pl


@pytest.fixture()
def big_scan(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 10_000
    t = pa.table(
        {
            "a": list(range(n)),
            "b": [float(i) * 0.5 for i in range(n)],
            "g": ["x", "y", "z", "w"] * (n // 4),
        }
    )
    p = tmp_path / "in.parquet"
    pq.write_table(t, p)
    return str(p), n


@pytest.mark.parametrize("fmt", ["parquet", "csv", "ipc", "ndjson"])
def test_sink_streams_batches_roundtrip(big_scan, tmp_path, fmt, monkeypatch):
    from polars_tpu.io import sink_stream as ss

    path, n = big_scan
    out = tmp_path / f"out.{fmt}"
    batch_rows = 1024

    seen = []
    orig = ss.IncrementalWriter.write

    def spy(self, df):
        seen.append(df.height)
        return orig(self, df)

    monkeypatch.setattr(ss.IncrementalWriter, "write", spy)

    q = pl.scan_parquet(path).filter(pl.col("a") % 2 == 0).select("a", "b")
    getattr(q, f"sink_{fmt}")(str(out), batch_rows=batch_rows)

    # the writer saw MANY batches, each bounded by batch_rows — never the
    # materialized result
    assert len(seen) >= n // (2 * batch_rows)
    assert max(seen) <= batch_rows

    reader = {
        "parquet": pl.read_parquet,
        "csv": pl.read_csv,
        "ipc": pl.read_ipc,
        "ndjson": pl.read_ndjson,
    }[fmt]
    back = reader(str(out))
    assert back.height == n // 2
    assert back["a"].to_list() == list(range(0, n, 2))


def test_sink_under_small_ooc_budget(big_scan, tmp_path, monkeypatch):
    # a tiny OOC budget: the chain still completes because only one batch is
    # ever resident
    monkeypatch.setenv("POLARS_TPU_OOC_BUDGET", str(256 * 1024))
    path, n = big_scan
    out = tmp_path / "out.parquet"
    pl.scan_parquet(path).filter(pl.col("a") >= 100).select("a").sink_parquet(
        str(out), batch_rows=512
    )
    back = pl.read_parquet(str(out))
    assert back.height == n - 100


def test_sink_partitioned_streaming_rolls_files(big_scan, tmp_path):
    path, n = big_scan
    base = tmp_path / "parts"
    pb = pl.PartitionBy(base, key="g", max_rows_per_file=500)
    pl.scan_parquet(path).sink_parquet(pb, batch_rows=777)
    # 4 keys x 2500 rows @500/file = 5 files each
    dirs = sorted(p.name for p in base.iterdir())
    assert dirs == ["g=w", "g=x", "g=y", "g=z"]
    for d in base.iterdir():
        files = sorted(d.iterdir())
        assert len(files) == 5
    # hive scan reads it back
    back = pl.scan_parquet(str(base / "**/*.parquet"), hive_partitioning=True).collect()
    assert back.height == n
    assert set(back["g"].to_list()) == {"x", "y", "z", "w"}


def test_sink_groupby_terminal_still_works(big_scan, tmp_path):
    path, _ = big_scan
    out = tmp_path / "agg.parquet"
    pl.scan_parquet(path).group_by("g").agg(pl.col("b").sum()).sink_parquet(
        str(out), batch_rows=1024
    )
    back = pl.read_parquet(str(out)).sort("g")
    assert back.height == 4


def test_sink_empty_result_writes_schema(tmp_path):
    df = pl.DataFrame({"x": [1, 2, 3]})
    out = tmp_path / "empty.parquet"
    df.lazy().filter(pl.col("x") > 99).sink_parquet(str(out))
    back = pl.read_parquet(str(out))
    assert back.height == 0
    assert back.columns == ["x"]
