"""Database + Delta Lake IO (io/database.py, io/delta.py)."""

import json
import os
import sqlite3

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import polars_tpu as pl


def test_read_database_sqlite(tmp_path):
    db = tmp_path / "t.db"
    conn = sqlite3.connect(db)
    conn.execute("create table t (k text, v real, n integer)")
    conn.executemany(
        "insert into t values (?, ?, ?)",
        [("a", 1.5, 1), ("b", 2.5, None), ("a", 3.0, 3)],
    )
    conn.commit()
    out = pl.read_database("select k, sum(v) as s from t group by k order by k", conn)
    assert out["k"].to_list() == ["a", "b"]
    assert out["s"].to_list() == [4.5, 2.5]
    nulls = pl.read_database("select n from t order by rowid", conn)
    assert nulls["n"].to_list() == [1, None, 3]
    conn.close()

    out2 = pl.read_database_uri("select count(*) as c from t", f"sqlite://{db}")
    assert out2["c"].to_list() == [3]


def _write_commit(log_dir, version, actions):
    name = os.path.join(log_dir, f"{version:020d}.json")
    with open(name, "w", encoding="utf-8") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")


_META = {
    "metaData": {
        "id": "meta-1",
        "schemaString": json.dumps({
            "type": "struct",
            "fields": [
                {"name": "x", "type": "long", "nullable": True, "metadata": {}},
                {"name": "y", "type": "double", "nullable": True, "metadata": {}},
                {"name": "p", "type": "integer", "nullable": True, "metadata": {}},
            ],
        }),
        "partitionColumns": ["p"],
    }
}


def _make_delta(tmp_path):
    root = tmp_path / "dtab"
    log = root / "_delta_log"
    log.mkdir(parents=True)
    files = {
        "part-0.parquet": ({"x": [1, 2], "y": [0.5, 1.5]}, "1"),
        "part-1.parquet": ({"x": [3], "y": [2.5]}, "2"),
        "part-2.parquet": ({"x": [9, 9], "y": [9.0, 9.0]}, "1"),  # later removed
    }
    for name, (data, _) in files.items():
        pq.write_table(pa.table(data), root / name)
    _write_commit(log, 0, [
        _META,
        {"add": {"path": "part-0.parquet", "partitionValues": {"p": "1"}, "size": 1, "modificationTime": 0, "dataChange": True}},
        {"add": {"path": "part-2.parquet", "partitionValues": {"p": "1"}, "size": 1, "modificationTime": 0, "dataChange": True}},
    ])
    _write_commit(log, 1, [
        {"add": {"path": "part-1.parquet", "partitionValues": {"p": "2"}, "size": 1, "modificationTime": 0, "dataChange": True}},
        {"remove": {"path": "part-2.parquet", "dataChange": True}},
    ])
    return root


def test_scan_delta_log_replay(tmp_path):
    root = _make_delta(tmp_path)
    out = pl.scan_delta(str(root)).collect().sort("x")
    assert out["x"].to_list() == [1, 2, 3]
    assert out["p"].to_list() == [1, 1, 2]  # typed partition column (integer)
    assert out.schema["p"] == pl.Int32

    # time travel: version 0 still sees part-2 and not part-1
    v0 = pl.read_delta(str(root), version=0).sort("x")
    assert v0["x"].to_list() == [1, 2, 9, 9]

    # predicate on the partition column
    f = pl.scan_delta(str(root)).filter(pl.col("p") == 2).collect()
    assert f["x"].to_list() == [3]


def test_scan_delta_checkpoint(tmp_path):
    root = _make_delta(tmp_path)
    log = root / "_delta_log"
    # compact versions 0-1 into a checkpoint; a later commit adds one file
    add_t = pa.array(
        [
            {"path": "part-0.parquet", "partitionValues": {"p": "1"}},
            {"path": "part-1.parquet", "partitionValues": {"p": "2"}},
            None,
        ],
        type=pa.struct([
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
        ]),
    )
    meta_t = pa.array(
        [None, None, {
            "schemaString": _META["metaData"]["schemaString"],
            "partitionColumns": ["p"],
        }],
        type=pa.struct([
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
        ]),
    )
    pq.write_table(pa.table({"add": add_t, "metaData": meta_t}), log / f"{1:020d}.checkpoint.parquet")
    with open(log / "_last_checkpoint", "w") as f:
        f.write(json.dumps({"version": 1}))
    pq.write_table(pa.table({"x": [7], "y": [7.5]}), root / "part-3.parquet")
    _write_commit(log, 2, [
        {"add": {"path": "part-3.parquet", "partitionValues": {"p": "3"}, "size": 1, "modificationTime": 0, "dataChange": True}},
    ])
    out = pl.scan_delta(str(root)).collect().sort("x")
    assert out["x"].to_list() == [1, 2, 3, 7]
    assert out["p"].to_list() == [1, 1, 2, 3]


def test_scan_delta_unpartitioned(tmp_path):
    root = tmp_path / "flat"
    (root / "_delta_log").mkdir(parents=True)
    pq.write_table(pa.table({"a": [1, 2]}), root / "f0.parquet")
    meta = {
        "metaData": {
            "id": "m",
            "schemaString": json.dumps({
                "type": "struct",
                "fields": [{"name": "a", "type": "long", "nullable": True, "metadata": {}}],
            }),
            "partitionColumns": [],
        }
    }
    _write_commit(root / "_delta_log", 0, [
        meta,
        {"add": {"path": "f0.parquet", "partitionValues": {}, "size": 1, "modificationTime": 0, "dataChange": True}},
    ])
    assert pl.read_delta(str(root))["a"].to_list() == [1, 2]
    with pytest.raises(Exception, match="not a Delta table"):
        pl.scan_delta(str(tmp_path / "nope"))
