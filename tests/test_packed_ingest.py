"""Packed ingest (host->device transfer compression with device-side decode).

The axon tunnel moves ~15 MB/s, so ingest ships the narrowest EXACT encoding
and widens on device (core/buffer._packed_ingest). Reference analogue: the
parquet decoders keep packed encodings as long as possible
(polars-parquet/src/arrow/read/). Every path must be bit-exact.
"""

import numpy as np
import pytest

import polars_tpu as pl
from polars_tpu.core import buffer as B


@pytest.fixture(autouse=True)
def _low_threshold(monkeypatch):
    monkeypatch.setenv("POLARS_TPU_PACK_INGEST_MIN", "1")


def _roundtrip(vals: np.ndarray):
    buf = B.Buffer.from_numpy(vals)
    out, _ = buf.to_numpy()
    assert out.dtype == vals.dtype
    np.testing.assert_array_equal(out, vals)
    return buf


def test_f64_integral_packs_to_int8():
    before = B.pack_stats()["cols"]
    vals = np.array([1.0, 50.0, -3.0, 0.0] * 64, np.float64)
    _roundtrip(vals)
    assert B.pack_stats()["cols"] == before + 1


def test_f64_cents_pack_exactly():
    rng = np.random.default_rng(0)
    cents = rng.integers(-(10**7), 10**7, 4096)
    vals = cents.astype(np.float64) / 100.0  # correctly-rounded decimals
    before = B.pack_stats()["packed_bytes"]
    _roundtrip(vals)
    # int32 cents = 4 bytes/row instead of 8
    assert B.pack_stats()["packed_bytes"] - before == 4096 * 4


def test_f64_f32_exact_path():
    vals = (np.arange(2048) * 0.5).astype(np.float32).astype(np.float64)
    vals[3] = 0.1  # not f32-exact, not fixed-point at tried scales? 0.1*100=10 int!
    vals[3] = np.float64(1) / 3  # genuinely unpackable value
    out, _ = B.Buffer.from_numpy(vals).to_numpy()
    np.testing.assert_array_equal(out, vals)


def test_f64_unpackable_falls_back():
    rng = np.random.default_rng(1)
    vals = rng.normal(size=1024)  # full-precision doubles
    before = B.pack_stats()["cols"]
    _roundtrip(vals)
    assert B.pack_stats()["cols"] == before  # no packing happened


def test_f64_negative_zero_falls_back():
    vals = np.array([0.0, -0.0, 1.0, 2.0] * 64)
    buf = _roundtrip(vals)
    out, _ = buf.to_numpy()
    assert np.signbit(out[1])  # -0.0 preserved


def test_f64_nan_inf_fall_back():
    vals = np.array([1.0, np.nan, np.inf, -np.inf] * 64)
    out, _ = B.Buffer.from_numpy(vals).to_numpy()
    np.testing.assert_array_equal(out, vals)


def test_i64_shift_narrow():
    vals = (np.arange(1024) + 5_000_000_000).astype(np.int64)
    before = B.pack_stats()["cols"]
    _roundtrip(vals)
    assert B.pack_stats()["cols"] == before + 1


def test_i64_wide_range_falls_back():
    vals = np.array([0, 2**62, -(2**62)] * 200, np.int64)
    before = B.pack_stats()["cols"]
    _roundtrip(vals)
    assert B.pack_stats()["cols"] == before


def test_u32_and_date_narrowing():
    _roundtrip(np.arange(9000, 9000 + 512, dtype=np.int32))  # date-like: int16+shift
    _roundtrip((np.arange(512) % 100).astype(np.uint32))


def test_engine_query_on_packed_columns():
    # end-to-end: a PDS-H-shaped aggregate over packed columns matches pandas
    rng = np.random.default_rng(7)
    n = 2000
    df = pl.DataFrame({
        "qty": rng.integers(1, 51, n).astype(np.float64),
        "price": rng.integers(100, 10**6, n).astype(np.float64) / 100.0,
        "flag": rng.integers(0, 3, n),
    })
    out = (
        df.lazy()
        .group_by("flag")
        .agg(s=(pl.col("qty") * pl.col("price")).sum(), n=pl.len())
        .sort("flag")
        .collect()
    )
    import pandas as pd

    pdf = df.to_pandas()
    exp = (
        pdf.assign(v=pdf.qty * pdf.price)
        .groupby("flag")
        .agg(s=("v", "sum"), n=("v", "count"))
        .reset_index()
    )
    np.testing.assert_allclose(out["s"].to_numpy(), exp["s"].to_numpy(), rtol=1e-12)
    np.testing.assert_array_equal(out["n"].to_numpy(), exp["n"].to_numpy())


def test_disabled_by_env(monkeypatch):
    monkeypatch.setenv("POLARS_TPU_PACKED_INGEST", "0")
    before = B.pack_stats()["cols"]
    _roundtrip(np.array([1.0, 2.0] * 512))
    assert B.pack_stats()["cols"] == before


def test_i64_delta_encoding_sorted_keys():
    # sorted key column with a huge range: deltas fit int8 where the
    # shifted range needs int32 (the l_orderkey shape)
    vals = np.cumsum(np.random.default_rng(3).integers(0, 5, 100_000)).astype(np.int64)
    vals += 10**12
    before = B.pack_stats()["packed_bytes"]
    _roundtrip(vals)
    assert B.pack_stats()["packed_bytes"] - before == B.padded_size(100_000)  # 1B/row


def test_i64_delta_negative_steps():
    rng = np.random.default_rng(4)
    vals = (10**10 + np.cumsum(rng.integers(-40, 40, 4096))).astype(np.int64)
    _roundtrip(vals)


def test_i32_delta_vs_shift_chooses_smaller():
    # unsorted small-range: shift wins; sorted big-range: delta wins
    rng = np.random.default_rng(5)
    _roundtrip(rng.integers(0, 200, 4096).astype(np.int32))        # shift->int8
    _roundtrip(np.sort(rng.integers(0, 10**9, 4096)).astype(np.int32))  # delta
