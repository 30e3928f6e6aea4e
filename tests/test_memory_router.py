"""engine="auto" memory routing (engine/memory_router.py, SURVEY 2.12).

Plans whose host-side size estimate exceeds the budget route through the
streaming engine (OOC spill); CPU processes default to budget 0 so every
other test's engine choice is untouched. Reference analogue: the streaming
engine + polars-ooc spill files absorb larger-than-memory plans."""

from __future__ import annotations

import numpy as np
import pytest

import polars_tpu as pl
from polars_tpu.engine import memory_router as MR


@pytest.fixture()
def frame():
    rng = np.random.default_rng(7)
    n = 20000
    return pl.DataFrame({
        "k": rng.integers(0, 40, n),
        "s": [f"c{v}" for v in rng.integers(0, 9, n)],
        "v": rng.normal(size=n),
    })


def test_estimate_covers_leaves_and_projection(frame, tmp_path):
    node = frame.lazy().group_by("k").agg(s=pl.col("v").sum())._node
    est = MR.estimate_plan_bytes(node)
    assert est is not None and est > frame.height * 8

    p = tmp_path / "t.parquet"
    frame.write_parquet(str(p))
    from polars_tpu.plan.optimizer import optimize

    # projection pruning shrinks the estimate
    full = MR.estimate_plan_bytes(optimize(pl.scan_parquet(str(p))._node))
    pruned = MR.estimate_plan_bytes(
        optimize(pl.scan_parquet(str(p)).select("k")._node)
    )
    assert full is not None and pruned is not None and pruned < full


def test_budget_routes_to_streaming(frame, monkeypatch):
    from polars_tpu.config import config

    monkeypatch.setenv("POLARS_TPU_MEMORY_BUDGET", "1024")
    config().reload_env_vars()
    lf = frame.lazy().group_by("k").agg(s=pl.col("v").sum()).sort("k")
    assert MR.route(lf._node) == "streaming"
    out = lf.collect()  # engine="auto" -> streaming
    monkeypatch.setenv("POLARS_TPU_MEMORY_BUDGET", "0")
    config().reload_env_vars()
    assert MR.route(lf._node) == "in-memory"  # CPU default: disabled
    ref = lf.collect()
    assert out.rows() == ref.rows()


def test_cpu_default_disabled(frame):
    assert MR.effective_budget() == 0  # forced-CPU test process
    assert MR.route(frame.lazy()._node) == "in-memory"


def test_oom_falls_back_to_streaming(monkeypatch):
    """round-5 (SURVEY 2.12): when the router's estimate was wrong and the
    in-memory engine hits a device OOM, collect(engine='auto') retries
    through the streaming engine instead of failing."""
    import polars_tpu.engine.run as rr

    df = pl.DataFrame({"k": [1, 1, 2, 2], "v": [1.0, 2.0, 3.0, 4.0]})
    lf = df.lazy().group_by("k").agg(s=pl.col("v").sum()).sort("k")

    calls = {"n": 0}
    orig = rr.execute_plan

    def boom(node, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("RESOURCE_EXHAUSTED: Out of memory allocating 1 bytes")
        return orig(node, **kw)

    # collect() does `from ...run import execute_plan` at CALL time, so the
    # module attribute patch is seen; the streaming engine calls it too (via
    # its own imports), hence the pass-through after the first failure
    monkeypatch.setattr(rr, "execute_plan", boom)
    out = lf.collect(engine="auto")
    assert out["s"].to_list() == [3.0, 7.0]
    # non-OOM errors surface unchanged
    def boom2(node, **kw):
        raise RuntimeError("something else broke")
    monkeypatch.setattr(rr, "execute_plan", boom2)
    with pytest.raises(RuntimeError, match="something else"):
        lf.collect(engine="auto")
