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
