"""fsspec-backed object-store IO (reference: polars-io/src/cloud/
polars_object_store.rs). Zero-egress environment: unit-tested against the
fsspec memory:// filesystem; any fsspec protocol (s3/gs/az/http) rides the
same path with storage_options."""

import uuid

import fsspec
import pytest

import polars_tpu as pl


@pytest.fixture
def bucket():
    return f"memory://b{uuid.uuid4().hex[:8]}"


def test_parquet_remote_roundtrip(bucket):
    df = pl.DataFrame({"a": [1, 2, 3], "s": ["x", "y", "z"]})
    df.write_parquet(f"{bucket}/t.parquet")
    out = pl.read_parquet(f"{bucket}/t.parquet")
    assert out.rows() == df.rows()


def test_scan_parquet_remote_filter_pushdown(bucket):
    df = pl.DataFrame({"a": [1, 2, 3], "s": ["x", "y", "z"]})
    df.write_parquet(f"{bucket}/t.parquet")
    out = pl.scan_parquet(f"{bucket}/t.parquet").filter(pl.col("a") > 1).collect()
    assert out.rows() == [(2, "y"), (3, "z")]


def test_scan_parquet_remote_glob(bucket):
    df = pl.DataFrame({"a": [1, 2, 3]})
    df.write_parquet(f"{bucket}/p1.parquet")
    df.write_parquet(f"{bucket}/p2.parquet")
    assert pl.scan_parquet(f"{bucket}/*.parquet").collect().height == 6


def test_csv_remote(bucket):
    with fsspec.open(f"{bucket}/t.csv", "w") as f:
        f.write("a,b\n1,x\n2,y\n")
    assert pl.read_csv(f"{bucket}/t.csv").rows() == [(1, "x"), (2, "y")]


def test_ndjson_remote(bucket):
    with fsspec.open(f"{bucket}/t.ndjson", "w") as f:
        f.write('{"a": 1}\n{"a": 2}\n')
    assert pl.read_ndjson(f"{bucket}/t.ndjson")["a"].to_list() == [1, 2]


def test_ipc_remote(bucket):
    df = pl.DataFrame({"a": [1, 2], "s": ["x", "y"]})
    with fsspec.open(f"{bucket}/t.ipc", "wb") as f:
        df.write_ipc(f)
    assert pl.read_ipc(f"{bucket}/t.ipc").rows() == df.rows()
