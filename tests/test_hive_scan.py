"""Hive-partitioned multi-file scans: partition columns, pruning (files never
opened), prefetch overlap (round-1 verdict #9; reference:
polars-io/src/hive.rs, multi_scan/mod.rs:31-60)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import polars_tpu as pl


@pytest.fixture(scope="module")
def hive_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("hive")
    rng = np.random.default_rng(0)
    for year in (2022, 2023, 2024):
        for region in ("eu", "us"):
            d = root / f"year={year}" / f"region={region}"
            d.mkdir(parents=True)
            n = 50
            pq.write_table(
                pa.table({
                    "v": rng.normal(size=n),
                    "id": np.arange(n) + year * 1000,
                }),
                d / "part-0.parquet",
            )
    return root


def test_hive_columns_in_schema_and_data(hive_dir):
    lf = pl.scan_parquet(str(hive_dir))
    sch = lf.collect_schema() if hasattr(lf, "collect_schema") else lf.schema
    assert "year" in sch and "region" in sch
    out = lf.collect()
    assert out.height == 300
    assert set(out["year"].to_list()) == {2022, 2023, 2024}
    assert set(out["region"].to_list()) == {"eu", "us"}


def test_hive_pruning_never_opens_pruned_files(hive_dir, monkeypatch):
    import pyarrow.parquet as _pq

    opened = []
    orig = _pq.ParquetFile

    class Spy(orig):
        def __init__(self, path, *a, **k):
            opened.append(str(path))
            super().__init__(path, *a, **k)

    monkeypatch.setattr(_pq, "ParquetFile", Spy)
    out = (
        pl.scan_parquet(str(hive_dir))
        .filter((pl.col("year") == 2023) & (pl.col("region") == "eu"))
        .collect()
    )
    assert out.height == 50
    data_opens = [p for p in opened if p.endswith(".parquet")]
    assert all("year=2023" in p and "region=eu" in p for p in data_opens), data_opens


def test_hive_pruning_streaming_engine(hive_dir, monkeypatch):
    # spy on DATA reads (iter_batches) — metadata-only opens (row counting
    # for spine selection) are allowed on pruned files
    import pyarrow.parquet as _pq

    read = []
    orig = _pq.ParquetFile

    class Spy(orig):
        def __init__(self, path, *a, **k):
            self._spy_path = str(path)
            super().__init__(path, *a, **k)

        def iter_batches(self, *a, **k):
            read.append(self._spy_path)
            return super().iter_batches(*a, **k)

        def read_row_groups(self, *a, **k):
            read.append(self._spy_path)
            return super().read_row_groups(*a, **k)

    monkeypatch.setattr(_pq, "ParquetFile", Spy)
    out = (
        pl.scan_parquet(str(hive_dir))
        .filter(pl.col("year") > 2023)
        .group_by("region")
        .agg(pl.col("v").sum().alias("s"))
        .sort("region")
        .collect(engine="streaming", batch_rows=16)
    )
    assert out.height == 2
    assert read and all("year=2024" in p for p in read), read


def test_hive_range_predicate_and_projection(hive_dir):
    out = (
        pl.scan_parquet(str(hive_dir))
        .filter(pl.col("year") >= 2024)
        .select("region", "id")
        .collect()
    )
    assert out.height == 100 and out.columns == ["region", "id"]


def test_hive_schema_override(hive_dir):
    lf = pl.scan_parquet(str(hive_dir), hive_schema={"year": pl.String, "region": pl.String})
    out = lf.collect()
    assert out["year"].to_list()[0] in ("2022", "2023", "2024")


def test_multi_file_plain_list_matches_single(tmp_path):
    rng = np.random.default_rng(1)
    paths = []
    frames = []
    for i in range(5):
        n = 40
        t = pa.table({"a": rng.integers(0, 10, n), "b": rng.normal(size=n)})
        p = tmp_path / f"f{i}.parquet"
        pq.write_table(t, p)
        paths.append(str(p))
        frames.append(t)
    whole = pa.concat_tables(frames)
    out = pl.scan_parquet(paths).collect()
    assert out.height == whole.num_rows
    assert out["a"].to_list() == whole["a"].to_pylist()

    # streaming (prefetch on) agrees with in-memory
    q_in = pl.scan_parquet(paths).group_by("a").agg(pl.col("b").sum().alias("s")).sort("a")
    a = q_in.collect().to_pandas()
    b = q_in.collect(engine="streaming", batch_rows=16).to_pandas()
    import pandas as pd

    pd.testing.assert_frame_equal(a, b, rtol=1e-12)


def test_prefetch_propagates_errors(tmp_path):
    p = tmp_path / "bad.parquet"
    p.write_text("not a parquet file")
    with pytest.raises(Exception):
        pl.scan_parquet(str(p)).collect(engine="streaming", batch_rows=8)
