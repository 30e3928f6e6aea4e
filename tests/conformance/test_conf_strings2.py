"""Conformance slice: string namespace corners (unicode lengths, regex
groups, expression rhs, strip sets) and frame/selector edge cases."""

import pytest

import polars_tpu as pl
import polars_tpu.selectors as cs


def test_replace_regex_group_reference():
    assert pl.Series(["abc123"]).str.replace(r"(\d+)", "<$1>").to_list() == ["abc<123>"]


def test_replace_first_vs_all():
    assert pl.Series(["aaa"]).str.replace("a", "b").to_list() == ["baa"]
    assert pl.Series(["aaa"]).str.replace_all("a", "b").to_list() == ["bbb"]


def test_strip_chars_is_a_set():
    assert pl.Series(["xyxhixy"]).str.strip_chars("xy").to_list() == ["hi"]
    assert pl.Series(["  hi\t"]).str.strip_chars().to_list() == ["hi"]


def test_unicode_lengths():
    s = pl.Series(["héllo"])
    assert s.str.len_chars().to_list() == [5]
    assert s.str.len_bytes().to_list() == [6]


def test_slice_negative_offset():
    assert pl.Series(["hello"]).str.slice(-3, 2).to_list() == ["ll"]


def test_extract_group_index():
    assert pl.Series(["a1b2"]).str.extract(r"([a-z])(\d)", 2).to_list() == ["1"]
    assert pl.Series(["zzz"]).str.extract(r"(\d)").to_list() == [None]


def test_split_inclusive():
    assert pl.Series(["a,b,c"]).str.split(",", inclusive=True).to_list() == [["a,", "b,", "c"]]


def test_reverse_unicode():
    assert pl.Series(["héllo"]).str.reverse().to_list() == ["olléh"]


def test_head_tail_negative():
    assert pl.Series(["hello"]).str.head(2).to_list() == ["he"]
    assert pl.Series(["hello"]).str.tail(-2).to_list() == ["llo"]


def test_escape_regex():
    assert pl.Series(["a.b"]).str.escape_regex().to_list() == ["a\\.b"]


def test_starts_ends_with_expression_rhs():
    df = pl.DataFrame({"s": ["ab", "cd"], "p": ["a", "d"]})
    assert df.select(pl.col("s").str.starts_with(pl.col("p"))).to_series().to_list() == [True, False]
    assert df.select(pl.col("s").str.ends_with(pl.col("p"))).to_series().to_list() == [False, True]


def test_zfill_sign_aware():
    assert pl.Series(["5", "-5", "123"]).str.zfill(3).to_list() == ["005", "-05", "123"]


def test_find_and_json_path():
    assert pl.Series(["abcb"]).str.find("b").to_list() == [1]
    assert pl.Series(['{"a":{"b":1}}']).str.json_path_match("$.a.b").to_list() == ["1"]


def test_replace_many():
    assert pl.Series(["abc"]).str.replace_many(["a", "c"], ["X", "Y"]).to_list() == ["XbY"]


# ---------------------------------------------------------------- frame edges


def test_select_no_args_is_empty():
    assert pl.DataFrame({"a": [1, 2]}).select().shape == (0, 0)
    assert pl.DataFrame({"a": [1, 2]}).lazy().select().collect().shape == (0, 0)


def test_with_columns_length_mismatch_raises():
    with pytest.raises(pl.exceptions.ShapeError):
        pl.DataFrame({"a": [1, 2]}).with_columns(b=pl.Series([1, 2, 3]))


def test_with_columns_length_one_broadcasts():
    out = pl.DataFrame({"a": [1, 2]}).with_columns(b=pl.Series([9]))
    assert out["b"].to_list() == [9, 9]


def test_int_pow_negative_exponent_raises():
    with pytest.raises(Exception):
        pl.DataFrame({"a": [2]}).select(pl.col("a") ** -1)
    assert pl.DataFrame({"a": [2.0]}).select(pl.col("a") ** -1).item() == 0.5


def test_division_by_zero_semantics():
    df = pl.DataFrame({"a": [1, 0, -7], "z": [0, 0, 0]})
    assert df.select(pl.col("a") // pl.col("z")).to_series().to_list() == [None, None, None]
    assert df.select(pl.col("a") % pl.col("z")).to_series().to_list() == [None, None, None]
    out = df.select(pl.col("a") / pl.col("z")).to_series().to_list()
    assert out[0] == float("inf") and out[1] != out[1] and out[2] == float("-inf")


def test_selector_algebra():
    df = pl.DataFrame({"ai": [1], "bf": [1.5], "cs": ["x"], "dd": [True]})
    assert df.select(cs.by_dtype(pl.Int64, pl.Boolean)).columns == ["ai", "dd"]
    assert df.select(cs.numeric() - cs.integer()).columns == ["bf"]
    assert df.select(cs.integer() | cs.string()).columns == ["ai", "cs"]
    assert df.select(~cs.numeric()).columns == ["cs", "dd"]


def test_file_like_io():
    import io

    assert pl.read_csv(io.StringIO("a,b\n1,x\n")).to_dicts() == [{"a": 1, "b": "x"}]
    assert pl.read_csv(b"a\n2\n").to_dicts() == [{"a": 2}]
    assert pl.read_ndjson(io.StringIO('{"a":1}\n')).to_dicts() == [{"a": 1}]


def test_glimpse_return_as_string():
    s = pl.DataFrame({"a": [1]}).glimpse(return_as_string=True)
    assert "Rows: 1" in s
