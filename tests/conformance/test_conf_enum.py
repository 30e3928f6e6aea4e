"""Enum category-order semantics (reference: py-polars
tests/unit/datatypes/test_enum.py; polars-dtype categorical Enum physical =
category index)."""

import pytest

import polars_tpu as pl

ET = pl.Enum(["lo", "mid", "hi"])


def test_enum_comparison_follows_category_order():
    s = pl.Series("e", ["lo", "hi", "mid", None], dtype=ET)
    assert (s < "hi").to_list() == [True, False, True, None]
    assert (s == "mid").to_list() == [False, False, True, None]
    assert (s >= "mid").to_list() == [False, True, True, None]


def test_enum_sort_min_max():
    s = pl.Series("e", ["hi", "lo", "mid"], dtype=ET)
    assert s.sort().to_list() == ["lo", "mid", "hi"]
    assert s.sort(descending=True).to_list() == ["hi", "mid", "lo"]
    assert s.min() == "lo"
    assert s.max() == "hi"


def test_enum_physical_codes():
    s = pl.Series("e", ["mid", "lo", None], dtype=ET)
    assert s.to_physical().to_list() == [1, 0, None]
    assert s.cast(pl.UInt32()).to_list() == [1, 0, None]
    assert s.cat.get_categories().to_list() == ["lo", "mid", "hi"]


def test_enum_strict_membership():
    with pytest.raises(Exception):
        pl.Series("e", ["nope"], dtype=ET)
    assert pl.Series("e", ["nope", "lo"], dtype=ET, strict=False).to_list() == [None, "lo"]
    # out-of-category literal comparison yields null
    s = pl.Series("e", ["lo"], dtype=ET)
    assert (s == "zzz").to_list() == [None]


def test_enum_group_and_join_keys():
    df = pl.DataFrame(
        {"e": pl.Series("e", ["hi", "lo", "hi"], dtype=ET), "v": [1, 2, 3]}
    )
    out = df.group_by("e").agg(pl.col("v").sum()).sort("e")
    assert out.to_dicts() == [{"e": "lo", "v": 2}, {"e": "hi", "v": 4}]
    other = pl.DataFrame({"e": pl.Series("e", ["hi"], dtype=ET), "w": [9]})
    j = df.join(other, on="e", how="inner")
    assert sorted(j["v"].to_list()) == [1, 3]


def test_enum_string_cast_roundtrip():
    s = pl.Series("e", ["hi", "lo"], dtype=ET)
    assert s.cast(pl.String()).to_list() == ["hi", "lo"]
    back = s.cast(pl.String()).cast(ET)
    assert back.dtype == ET
    assert back.to_list() == ["hi", "lo"]
    assert (back < "hi").to_list() == [False, True]
