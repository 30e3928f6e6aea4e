"""Plan serialization round-trip + cancellation (round-1 verdict #10).

Reference: polars-plan/src/dsl/serializable_plan.rs (versioned DSL),
py-polars LazyFrame.serialize/deserialize, and InProcessQuery.cancel
(py-polars/src/polars/lazyframe/in_process.py:24-26).
"""

import json

import numpy as np
import pytest

import polars_tpu as pl
from polars_tpu.errors import ComputeError, InvalidOperationError, QueryCancelledError


def _df():
    rng = np.random.default_rng(0)
    n = 500
    return pl.DataFrame({
        "k": rng.integers(0, 20, n),
        "v": rng.normal(size=n),
        "s": np.asarray(["x", "y", "z"], object)[rng.integers(0, 3, n)],
        "t": np.arange(n).astype("datetime64[us]"),
    })


QUERIES = [
    lambda lf: lf.filter(pl.col("v") > 0).select(pl.col("k"), (pl.col("v") * 2).alias("w")),
    lambda lf: lf.group_by("k", "s").agg(pl.col("v").sum().alias("sv"), pl.len()).sort("k", "s"),
    lambda lf: lf.sort("v").head(7),
    lambda lf: lf.with_columns(pl.col("v").rolling_sum_by("t", "10us").alias("r")),
    lambda lf: lf.select(pl.when(pl.col("v") > 0).then(pl.col("k")).otherwise(None).alias("c")),
]


@pytest.mark.parametrize("qi", range(len(QUERIES)))
def test_serialize_roundtrip_matches(qi):
    lf = QUERIES[qi](_df().lazy())
    data = lf.serialize()
    doc = json.loads(data)
    assert doc["format"] == "polars_tpu_plan" and doc["version"] == 1
    lf2 = pl.LazyFrame.deserialize(data)
    a = lf.collect().to_pandas()
    b = lf2.collect().to_pandas()
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)


def test_serialize_rejects_udf_and_bad_version(tmp_path):
    lf = _df().lazy().select(pl.col("v").map_batches(lambda s: s, return_dtype=pl.Float64))
    with pytest.raises(ComputeError, match="UDF"):
        lf.serialize()
    good = _df().lazy().select("k").serialize()
    doc = json.loads(good)
    doc["version"] = 99
    with pytest.raises(InvalidOperationError, match="version"):
        pl.LazyFrame.deserialize(json.dumps(doc))
    # file round-trip
    p = tmp_path / "plan.json"
    _df().lazy().select("k").serialize(str(p))
    out = pl.LazyFrame.deserialize(str(p)).collect()
    assert out.columns == ["k"]


def test_serialize_scan_plan(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    f = tmp_path / "t.parquet"
    pq.write_table(pa.table({"a": [1, 2, 3], "b": ["x", "y", "z"]}), f)
    lf = pl.scan_parquet(str(f)).filter(pl.col("a") > 1).select("b")
    lf2 = pl.LazyFrame.deserialize(lf.serialize())
    assert lf2.collect()["b"].to_list() == ["y", "z"]


def test_cancel_token_stops_at_barrier():
    tok = pl.CancelToken()
    tok.cancel()
    with pytest.raises(QueryCancelledError):
        _df().lazy().group_by("k").agg(pl.col("v").sum()).collect(cancel_token=tok)


def test_timeout_expires():
    with pytest.raises(QueryCancelledError, match="timed out"):
        _df().lazy().select(pl.col("v").sum()).collect(timeout=-1.0)


def test_timeout_generous_passes():
    out = _df().lazy().select(pl.col("v").sum()).collect(timeout=300.0)
    assert out.height == 1
