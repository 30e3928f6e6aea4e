"""Bitwise aggregations + leading/trailing bit counts
(reference: polars-ops src/series/ops/bitwise.rs;
py-polars tests/unit/operations/test_bitwise.py)."""

import polars_tpu as pl


def _lz64(x):
    return 64 - int(x & 0xFFFFFFFFFFFFFFFF).bit_length()


def test_leading_trailing_i64():
    vals = [0, 1, 6, -1, 2**40]
    s = pl.Series("a", vals, dtype=pl.Int64())
    assert s.bitwise_leading_zeros().to_list() == [_lz64(v) for v in vals]
    assert s.bitwise_leading_ones().to_list() == [_lz64(~v) for v in vals]
    assert s.bitwise_trailing_zeros().to_list() == [64, 0, 1, 0, 40]
    assert s.bitwise_trailing_ones().to_list() == [0, 1, 0, 64, 0]


def test_leading_trailing_bool_and_u8():
    sb = pl.Series("b", [True, False, None])
    assert sb.bitwise_leading_zeros().to_list() == [0, 1, None]
    assert sb.bitwise_trailing_ones().to_list() == [1, 0, None]
    su = pl.Series("v", [3, 255], dtype=pl.UInt8())
    assert su.bitwise_leading_zeros().to_list() == [6, 0]
    assert su.bitwise_count_ones().to_list() == [2, 8]


def test_bitwise_agg_grouped():
    df = pl.DataFrame(
        {"k": ["a", "a", "a", "b", "b"], "v": [0b1100, 0b1010, 0b1001, 7, None]}
    )
    out = (
        df.group_by("k")
        .agg(
            pl.col("v").bitwise_and().alias("and"),
            pl.col("v").bitwise_or().alias("or"),
            pl.col("v").bitwise_xor().alias("xor"),
        )
        .sort("k")
    )
    assert out.to_dicts() == [
        {"k": "a", "and": 8, "or": 15, "xor": 15},
        {"k": "b", "and": 7, "or": 7, "xor": 7},
    ]


def test_bitwise_agg_select_context_and_series():
    s = pl.Series("v", [12, 10, 9])
    assert s.bitwise_and() == 8
    assert s.bitwise_or() == 15
    assert s.bitwise_xor() == 15
    # empty -> null
    e = pl.DataFrame({"v": pl.Series("v", [], dtype=pl.Int64())})
    assert e.select(pl.col("v").bitwise_and()).to_dicts() == [{"v": None}]


def test_bitwise_agg_bool():
    df = pl.DataFrame({"k": ["a", "a", "b"], "v": [True, False, True]})
    out = (
        df.group_by("k")
        .agg(
            pl.col("v").bitwise_and().alias("and"),
            pl.col("v").bitwise_or().alias("or"),
            pl.col("v").bitwise_xor().alias("xor"),
        )
        .sort("k")
    )
    assert out.to_dicts() == [
        {"k": "a", "and": False, "or": True, "xor": True},
        {"k": "b", "and": True, "or": True, "xor": True},
    ]


def test_bitwise_agg_signed_negative():
    s = pl.Series("v", [-1, -2, -4], dtype=pl.Int64())
    assert s.bitwise_and() == (-1 & -2 & -4)
    assert s.bitwise_or() == (-1 | -2 | -4)
    assert s.bitwise_xor() == (-1 ^ -2 ^ -4)
