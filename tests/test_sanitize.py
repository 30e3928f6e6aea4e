"""Sanitizer mode (POLARS_TPU_DEBUG, utils/sanitize.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

import polars_tpu as pl
from polars_tpu.config import _config
from polars_tpu.core.buffer import Buffer
from polars_tpu.core.column import Column
from polars_tpu.core.frame import DataFrame
from polars_tpu.errors import ShapeError


@pytest.fixture
def debug2():
    old = _config.debug
    _config.debug = 2
    yield
    _config.debug = old


def test_clean_queries_pass_sanitizer(debug2):
    df = pl.DataFrame({
        "k": ["a", "b", "a", None],
        "v": [1.0, None, 3.0, 4.0],
        "l": [[1, 2], [], None, [3]],
    })
    out = (
        df.lazy()
        .filter(pl.col("v").is_not_null())
        .group_by("k")
        .agg(pl.col("v").sum())
        .sort("k")
        .collect()
    )
    assert out.height == 2  # groups: "a" and the null key ("b"'s row filtered)
    assert df.lazy().select(pl.col("l").list.sort()).collect().height == 4


def test_sanitizer_catches_bad_padding(debug2):
    vals = jnp.zeros((100,), jnp.int64)  # not pow2/128-padded
    with pytest.raises(ShapeError, match="pow2"):
        DataFrame._from_columns(
            [Column("x", pl.Int64, Buffer(vals, None, 100))], 100
        )


def test_sanitizer_catches_bad_length_and_dup_names(debug2):
    vals = jnp.zeros((128,), jnp.int64)
    with pytest.raises(ShapeError, match="exceeds padded"):
        DataFrame._from_columns([Column("x", pl.Int64, Buffer(vals, None, 200))], 200)
    with pytest.raises(ShapeError, match="duplicate"):
        DataFrame._from_columns(
            [Column("x", pl.Int64, Buffer(vals, None, 4)),
             Column("x", pl.Int64, Buffer(vals, None, 4))], 4
        )


def test_sanitizer_catches_validity_on_padding(debug2):
    vals = jnp.zeros((128,), jnp.int64)
    validity = jnp.ones((128,), bool)  # True past length 4
    with pytest.raises(ShapeError, match="padding rows"):
        DataFrame._from_columns(
            [Column("x", pl.Int64, Buffer(vals, validity, 4))], 4
        )


def test_sanitizer_catches_dict_code_out_of_range(debug2):
    from polars_tpu.utils.strtable import StringTable

    table = StringTable(np.asarray(["a", "b"], object), sorted_order=True)
    codes = jnp.full((128,), 7, jnp.int32)
    with pytest.raises(ShapeError, match="dict code"):
        DataFrame._from_columns(
            [Column("s", pl.String, Buffer(codes, None, 2), table)], 2
        )


def test_sanitizer_catches_list_word_overflow(debug2):
    child = Column("c", pl.Int64, Buffer(jnp.zeros((128,), jnp.int64), None, 128))
    packed = jnp.full((128,), (200 << 32) | 50, jnp.int64)  # past child extent
    with pytest.raises(ShapeError, match="child bounds"):
        DataFrame._from_columns(
            [Column("l", pl.List(pl.Int64), Buffer(packed, None, 1), None, 0, child)], 1
        )


def test_sanitizer_level1_skips_readback_checks():
    old = _config.debug
    _config.debug = 1
    try:
        from polars_tpu.utils.strtable import StringTable

        table = StringTable(np.asarray(["a"], object), sorted_order=True)
        codes = jnp.full((128,), 7, jnp.int32)  # out of range, but level 1
        DataFrame._from_columns(
            [Column("s", pl.String, Buffer(codes, None, 2), table)], 2
        )
    finally:
        _config.debug = old
