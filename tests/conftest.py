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

import numpy as np
import pytest

import polars_tpu as pl


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
    """Run the multi-device shard_map-compile tests FIRST.

    jaxlib 0.9's XLA:CPU backend intermittently SIGSEGVs when compiling large
    8-device SPMD programs late in a long-lived process (hundreds of compiled
    programs accumulated); the same programs compile fine early. Observed at
    tests/test_spmd.py via jax pjit backend_compile_and_load with no Python
    involvement. Fronting the SPMD modules keeps the single-invocation suite
    deterministic until the upstream compiler bug is fixed.
    """
    front_files = ("test_spmd.py", "test_parallel.py", "test_cross_engine.py")
    front = [it for it in items if it.fspath.basename in front_files]
    rest = [it for it in items if it.fspath.basename not in front_files]
    items[:] = front + rest
