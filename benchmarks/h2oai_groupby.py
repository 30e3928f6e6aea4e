"""H2O.ai (db-benchmark) group-by suite on polars_tpu.

Behavioral spec mirrored from the reference's seeded datagen
(/root/reference/py-polars/tests/benchmark/data/h2oai/datagen_groupby.py:1-40)
and the 10 standard group-by questions: K low-cardinality string/int groups,
N/K high-cardinality groups, 5% nulls in id columns.

Usage:  python benchmarks/h2oai_groupby.py [--n 10000000] [--k 100] [--cpu]
Prints one JSON line per question: {"q": .., "ms": .., "rows": N}.

Timing: wall time of collect() (host dispatch + device completion + readback;
on the axon TPU backend the first collect flips the runtime into synchronous
dispatch — see CLAUDE.md §1 — so these are honest end-to-end times from the
second run onward).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def generate(n: int, k: int, nulls: float = 0.05, seed: int = 42) -> dict:
    rng = np.random.default_rng(seed)
    big = max(n // k, 1)

    def stamp_nulls(arr):
        if nulls <= 0:
            return arr
        out = arr.astype(object)
        out[rng.random(n) < nulls] = None
        return out

    small_str = np.char.add("id", np.char.zfill((rng.integers(1, k + 1, n)).astype(str), 3))
    small_str2 = np.char.add("id", np.char.zfill((rng.integers(1, k + 1, n)).astype(str), 3))
    big_str = np.char.add("id", np.char.zfill((rng.integers(1, big + 1, n)).astype(str), 10))
    return {
        "id1": stamp_nulls(small_str),
        "id2": stamp_nulls(small_str2),
        "id3": stamp_nulls(big_str),
        "id4": rng.integers(1, k + 1, n),
        "id5": rng.integers(1, k + 1, n),
        "id6": rng.integers(1, big + 1, n),
        "v1": rng.integers(1, 6, n),
        "v2": rng.integers(1, 16, n),
        "v3": np.round(rng.uniform(0, 100, n), 6),
    }


def questions(pl):
    return [
        ("q1", lambda lf: lf.group_by("id1").agg(pl.col("v1").sum())),
        ("q2", lambda lf: lf.group_by("id1", "id2").agg(pl.col("v1").sum())),
        ("q3", lambda lf: lf.group_by("id3").agg(pl.col("v1").sum(), pl.col("v3").mean())),
        ("q4", lambda lf: lf.group_by("id4").agg(pl.col("v1").mean(), pl.col("v2").mean(), pl.col("v3").mean())),
        ("q5", lambda lf: lf.group_by("id6").agg(pl.col("v1").sum(), pl.col("v2").sum(), pl.col("v3").sum())),
        ("q6", lambda lf: lf.group_by("id4", "id5").agg(pl.col("v3").median().alias("v3_med"), pl.col("v3").std().alias("v3_std"))),
        ("q7", lambda lf: lf.group_by("id3").agg((pl.col("v1").max() - pl.col("v2").min()).alias("range_v1_v2"))),
        ("q8", lambda lf: lf.group_by("id6").agg(pl.col("v3").top_k(2).alias("largest2_v3")).explode("largest2_v3")),
        ("q9", lambda lf: lf.group_by("id2", "id4").agg((pl.corr("v1", "v2") ** 2).alias("r2"))),
        ("q10", lambda lf: lf.group_by("id1", "id2", "id3", "id4", "id5", "id6").agg(pl.col("v3").sum().alias("v3"), pl.len().alias("count"))),
    ]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import polars_tpu as pl

    t0 = time.perf_counter()
    data = generate(args.n, args.k)
    print(f"datagen: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    df = pl.DataFrame(data)
    lf = df.lazy()
    for name, build in questions(pl):
        try:
            build(lf).collect()  # warm (compile)
            best = min(
                (lambda t: (build(lf).collect(), time.perf_counter() - t)[1])(time.perf_counter())
                for _ in range(args.reps)
            )
            print(json.dumps({"q": name, "ms": round(best * 1e3, 2), "rows": args.n}))
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"q": name, "error": str(e)[:120]}))


if __name__ == "__main__":
    main()
