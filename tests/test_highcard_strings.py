"""High-cardinality string strategy (reference: polars-expr/src/hash_keys.rs:19-104
— raw/hashed string keys for group/join, no global sorted registry).

Ingest keeps Arrow's insertion-order dictionary above POLARS_TPU_ORDINAL_DICT_MAX
(no host sort); equality paths (filter/group/join) run on unordered codes via
C++ hash probes (strtable.index_in); order-sensitive ops (sort, min/max, rank,
range compare) lazily ordinalize through StringTable.ordinal(), cached per table.
"""

from __future__ import annotations

import numpy as np
import pytest

import polars_tpu as pl
from polars_tpu.utils import strtable


@pytest.fixture
def force_unordered(monkeypatch):
    """Every dictionary ingests insertion-ordered (the high-card regime)."""
    from polars_tpu.config import config

    monkeypatch.setattr(config(), "ordinal_dict_max", 0)


def _mixed(n, u, seed=0):
    rng = np.random.default_rng(seed)
    return np.asarray([f"v{int(i):08d}" for i in rng.integers(0, u, n)], object)


def test_ingest_is_unordered_above_threshold(force_unordered):
    s = pl.Series("s", ["b", "a", "c", "a"])
    tbl = s._column.table
    assert tbl is not None and not tbl.sorted_order
    assert tbl.values.tolist() == ["b", "a", "c"]  # insertion order kept


def test_equality_filter_on_unordered(force_unordered):
    df = pl.DataFrame({"s": ["z", "m", "a", "m", None]})
    out = df.filter(pl.col("s") == "m")
    assert out["s"].to_list() == ["m", "m"]
    out2 = df.filter(pl.col("s") != "m")
    assert out2["s"].to_list() == ["z", "a"]


def test_ordering_filter_vs_literal_lut(force_unordered):
    df = pl.DataFrame({"s": ["z", "m", "a", None, "mm"]})
    assert df.filter(pl.col("s") > "m")["s"].to_list() == ["z", "mm"]
    assert df.filter(pl.col("s") <= "m")["s"].to_list() == ["m", "a"]
    # literal on the left flips the operator
    assert df.filter(pl.lit("m") < pl.col("s"))["s"].to_list() == ["z", "mm"]


def test_sort_unordered_is_lexicographic(force_unordered):
    vals = ["pear", "apple", None, "fig", "apple"]
    df = pl.DataFrame({"s": vals, "i": [1, 2, 3, 4, 5]})
    out = df.sort("s")
    assert out["s"].to_list() == [None, "apple", "apple", "fig", "pear"]
    out2 = df.sort("s", descending=True, nulls_last=True)
    assert out2["s"].to_list() == ["pear", "fig", "apple", "apple", None]


def test_min_max_rank_on_unordered(force_unordered):
    s = pl.Series("s", ["pear", "apple", "fig"])
    assert s.min() == "apple"
    assert s.max() == "pear"
    df = pl.DataFrame({"k": [1, 1, 2, 2], "s": ["d", "b", "c", "a"]})
    out = df.group_by("k", maintain_order=True).agg(
        pl.col("s").min().alias("mn"), pl.col("s").max().alias("mx")
    )
    assert out["mn"].to_list() == ["b", "a"]
    assert out["mx"].to_list() == ["d", "c"]
    r = pl.DataFrame({"s": ["b", "c", "a"]}).select(pl.col("s").rank("ordinal"))
    assert r["s"].to_list() == [2, 3, 1]


def test_cross_table_equality_and_join(force_unordered):
    # two frames ingest independent dictionaries with different insertion orders
    left = pl.DataFrame({"k": ["x", "y", "z", "w"], "a": [1, 2, 3, 4]})
    right = pl.DataFrame({"k": ["z", "q", "x"], "b": [30, 99, 10]})
    out = left.lazy().join(right.lazy(), on="k", how="inner").sort("a").collect()
    assert out["k"].to_list() == ["x", "z"]
    assert out["b"].to_list() == [10, 30]
    # left join: unmatched -> null
    out2 = left.lazy().join(right.lazy(), on="k", how="left").sort("a").collect()
    assert out2["b"].to_list() == [10, None, 30, None]
    # full join decodes right-only key values through the merged table
    out3 = (
        left.lazy()
        .join(right.lazy(), on="k", how="full", coalesce=True)
        .sort("k")
        .collect()
    )
    assert out3["k"].to_list() == ["q", "w", "x", "y", "z"]


def test_cross_column_equality_same_frame(force_unordered):
    df = pl.DataFrame({"a": ["p", "q", "r"], "b": ["q", "q", "x"]})
    out = df.select(eq=pl.col("a") == pl.col("b"), ne=pl.col("a") != pl.col("b"))
    assert out["eq"].to_list() == [False, True, False]
    assert out["ne"].to_list() == [True, False, True]


def test_groupby_unordered_highcard(force_unordered):
    vals = _mixed(4000, 500)
    df = pl.DataFrame({"s": vals, "v": np.arange(4000, dtype=np.int64)})
    out = df.group_by("s").agg(pl.col("v").sum()).sort("s")
    import pandas as pd

    exp = (
        pd.DataFrame({"s": vals.astype(str), "v": np.arange(4000)})
        .groupby("s", sort=True)["v"].sum().reset_index()
    )
    assert out["s"].to_list() == exp["s"].tolist()
    assert out["v"].to_list() == exp["v"].tolist()


def test_unify_insertion_merge_identity():
    a = strtable.StringTable(np.asarray(["b", "a", "c"], object), sorted_order=False)
    b = strtable.StringTable(np.asarray(["c", "b"], object), sorted_order=False)
    merged, lmap, rmap = strtable.unify(a, b)
    assert merged is a  # right ⊆ left keeps identity
    assert len(lmap) == 0  # empty = identity
    assert rmap.tolist() == [2, 0]
    c = strtable.StringTable(np.asarray(["d", "a"], object), sorted_order=False)
    merged2, lmap2, rmap2 = strtable.unify(a, c)
    assert merged2.values.tolist() == ["b", "a", "c", "d"]
    assert rmap2.tolist() == [3, 1]
    assert not merged2.sorted_order


def test_ordinal_cached_and_correct():
    t = strtable.StringTable(np.asarray(["b", "c", "a"], object), sorted_order=False)
    st, remap = t.ordinal()
    assert st.values.tolist() == ["a", "b", "c"]
    assert remap.tolist() == [1, 2, 0]
    st2, remap2 = t.ordinal()
    assert st2 is st  # cached


def test_index_in_bytes_and_missing():
    hay = np.asarray([b"x", b"y"], object)
    needles = np.asarray([b"y", b"z", b"x"], object)
    assert strtable.index_in(needles, hay).tolist() == [1, -1, 0]


def test_ingest_scaling_flat_vs_int(tmp_path):
    """Scan+group on a unique-heavy string column: ingest must not host-sort
    the dictionary (VERDICT r3 item 4 'done' criterion, shrunk to CI size)."""
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 200_000
    uniq_strs = np.asarray([f"u{int(i):012d}" for i in range(n)], object)
    pq.write_table(pa.table({"s": pa.array(uniq_strs, pa.string()).dictionary_encode(),
                             "i": np.arange(n, dtype=np.int64)}),
                   tmp_path / "hc.parquet")
    t0 = time.perf_counter()
    lf = pl.scan_parquet(str(tmp_path / "hc.parquet"))
    df = lf.collect()
    t_scan = time.perf_counter() - t0
    col = df._columns[0]
    assert col.table is not None and not col.table.sorted_order  # no host sort
    assert len(col.table) == n
    # group on the high-card column still answers correctly
    out = df.group_by("s").agg(pl.col("i").sum()).sort("i").head(2)
    assert out["i"].to_list() == [0, 1]
    assert t_scan < 30.0  # generous CI bound; the point is no O(u log u) sort
