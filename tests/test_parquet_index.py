"""Parquet page-index + bloom pruning (reference:
crates/polars-parquet/src/arrow/read/expr.rs predicate readers; the
Thrift/xxhash/split-block readers live in polars_tpu/io/parquet_index.py
because pyarrow exposes no Python reader for either structure)."""

import numpy as np
import pytest

import polars_tpu as pl
from polars_tpu.io.parquet_index import ParquetIndexReader, _plain_bytes, bloom_might_contain, xxhash64
from polars_tpu.io.scan_exec import reset_scan_metrics, scan_metrics


def test_xxhash64_vectors():
    assert xxhash64(b"") == 0xEF46DB3751D8E999
    assert xxhash64(b"a") == 0xD24EC4F1A98C6E5B
    # >=32-byte input exercises the vector lanes
    assert xxhash64(b"0123456789abcdef" * 4) == xxhash64(b"0123456789abcdef" * 4)


@pytest.fixture(scope="module")
def pq_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("pqidx") / "t.parquet"
    n = 100_000
    df = pl.DataFrame(
        {
            "a": np.arange(n),
            "s": [f"key{i % 1000}" for i in range(n)],
            "v": np.random.default_rng(0).standard_normal(n),
        }
    )
    df.write_parquet(
        p,
        row_group_size=50_000,
        write_page_index=True,
        data_page_size=4096,
        bloom_filter_options={"s": {}},
    )
    return p


def test_bloom_reader_roundtrip(pq_file):
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(pq_file)
    cm = pf.metadata.row_group(0).column(1)  # "s"
    assert cm.bloom_filter_offset is not None
    with ParquetIndexReader(str(pq_file)) as rd:
        bits = rd.bloom_bitset(cm.bloom_filter_offset, cm.bloom_filter_length)
        assert bloom_might_contain(bits, xxhash64(_plain_bytes("key5", "BYTE_ARRAY")))
        assert not bloom_might_contain(bits, xxhash64(_plain_bytes("absent!", "BYTE_ARRAY")))


def test_bloom_skips_row_groups(pq_file):
    # "key500x" is INSIDE the row-group min/max range (stats can't prune it)
    # but absent: only the bloom filter can veto the groups
    reset_scan_metrics()
    out = pl.scan_parquet(pq_file).filter(pl.col("s") == "key500x").collect()
    m = scan_metrics()
    assert out.height == 0
    assert m["bloom_skipped_row_groups"] == 2
    assert m["rows_read"] == 0


def test_bloom_keeps_present_values(pq_file):
    out = pl.scan_parquet(pq_file).filter(pl.col("s") == "key5").collect()
    assert out.height == 100


def test_page_pruning_reads_fewer_rows(pq_file):
    reset_scan_metrics()
    out = pl.scan_parquet(pq_file).filter(pl.col("a") < 100).collect()
    m = scan_metrics()
    assert out.height == 100
    assert sorted(out["a"].to_list()) == list(range(100))
    # the first row group holds 50k rows; the column index narrows the read
    # to the pages that can match
    assert m["rows_read"] < 10_000
    assert m["rows_page_pruned"] > 40_000


def test_page_pruning_mid_range_correct(pq_file):
    out = (
        pl.scan_parquet(pq_file)
        .filter((pl.col("a") >= 60_000) & (pl.col("a") < 60_500))
        .collect()
    )
    assert out.height == 500
    assert out["a"].to_list()[0] == 60_000
    assert out["a"].to_list()[-1] == 60_499


def test_index_pruning_disable_env(pq_file, monkeypatch):
    monkeypatch.setenv("POLARS_TPU_PARQUET_INDEX", "0")
    reset_scan_metrics()
    out = pl.scan_parquet(pq_file).filter(pl.col("a") < 100).collect()
    assert out.height == 100
    assert scan_metrics()["rows_page_pruned"] == 0
