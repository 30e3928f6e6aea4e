"""Test configuration: force CPU with 8 virtual devices so sharding paths run
without TPU hardware (SURVEY.md §4: shrink sizes/chips to force parallel paths
on small data)."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import sys

import numpy as np
import pytest

import polars_tpu as pl

# ---------------------------------------------------------------------------
# Per-worker XLA program budget (VERDICT r4 #9): jaxlib 0.9's XLA:CPU backend
# SIGSEGVs when a long-lived process compiles its ~500th program (observed as
# xdist "worker crashed" on whichever test lands past the cliff). Count every
# backend compile so the margin is MEASURED: each worker prints its total at
# session end, and crossing the soft budget mid-run names the test that did
# it — a later worker crash is then attributable instead of mysterious.
# ---------------------------------------------------------------------------

_COMPILE_BUDGET = 400  # soft: warn above this, the observed cliff is ~500
_compile_count = [0]
_current_test = [""]


def _count_compile(event: str, **kwargs) -> None:
    # exactly one of these fires per compiled XLA program (measured r5;
    # counting every 'backend_compile'-matching event from both listener
    # kinds inflated the totals ~3x — r5 review finding)
    if event != "/jax/core/compile/backend_compile_duration":
        return
    _compile_count[0] += 1
    if _compile_count[0] == _COMPILE_BUDGET:
        wid = os.environ.get("PYTEST_XDIST_WORKER", "main")
        sys.stderr.write(
            f"\n[compile-budget] worker {wid} crossed {_COMPILE_BUDGET} "
            f"compiled XLA programs during {_current_test[0]!r} — the "
            "jaxlib-0.9 late-process compile SIGSEGV cliff is ~500; if this "
            "worker crashes, rebalance compile-heavy files in "
            "tests/conftest.py::pytest_collection_modifyitems\n"
        )


try:
    jax.monitoring.register_event_duration_secs_listener(
        lambda event, duration, **kw: _count_compile(event)
    )
except Exception:  # noqa: BLE001 - monitoring API drift: budget is advisory
    pass


def pytest_runtest_setup(item):
    _current_test[0] = item.nodeid


def pytest_sessionfinish(session, exitstatus):
    wid = os.environ.get("PYTEST_XDIST_WORKER", "main")
    sys.stderr.write(
        f"[compile-budget] worker {wid}: {_compile_count[0]} XLA programs "
        f"compiled (soft budget {_COMPILE_BUDGET}, SIGSEGV cliff ~500)\n"
    )


@pytest.fixture
def df_basic() -> pl.DataFrame:
    return pl.DataFrame(
        {
            "a": [1, 2, 3, 4, 5],
            "b": [1.5, 2.5, None, 4.5, 5.5],
            "s": ["x", "y", "x", "z", "y"],
            "flag": [True, False, True, False, None],
        }
    )


@pytest.fixture
def rng() -> np.random.Generator:
    return np.random.default_rng(42)


def pytest_collection_modifyitems(session, config, items):
    """Front-load and worker-pin the compile-heavy files.

    jaxlib 0.9's XLA:CPU backend intermittently SIGSEGVs when compiling
    programs late in a long-lived process (the r5 compile counters show the
    crash landing in whichever compile-heavy test runs after a worker has
    accumulated many hundreds of programs; every file passes on a fresh
    process). Two defenses, both scheduling: run the heavy files FIRST, and
    pin each to ONE xdist worker (``--dist loadgroup`` + a per-file
    xdist_group) so its compiles happen contiguously at the start of a fresh
    worker's life instead of after someone else's thousand programs.
    """
    front_files = (
        "test_fuzz_differential.py",
        "test_spmd.py",
        "test_parallel.py",
        "test_cross_engine.py",
    )
    for it in items:
        base = it.fspath.basename
        if base in front_files:
            it.add_marker(pytest.mark.xdist_group(base.removesuffix(".py")))
    front = [it for it in items if it.fspath.basename in front_files]
    rest = [it for it in items if it.fspath.basename not in front_files]
    items[:] = front + rest
