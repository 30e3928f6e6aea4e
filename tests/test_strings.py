"""String namespace ops (mirrors py-polars tests/unit/operations/namespaces/string)."""

import polars_tpu as pl


def test_case_ops():
    df = pl.DataFrame({"s": ["Hello", "WORLD", None]})
    out = df.select(
        lo=pl.col("s").str.to_lowercase(),
        up=pl.col("s").str.to_uppercase(),
        ti=pl.col("s").str.to_titlecase(),
    )
    assert out.get_column("lo").to_list() == ["hello", "world", None]
    assert out.get_column("up").to_list() == ["HELLO", "WORLD", None]
    assert out.get_column("ti").to_list() == ["Hello", "World", None]


def test_contains_matches():
    df = pl.DataFrame({"s": ["foobar", "barbaz", "qux"]})
    out = df.select(
        lit=pl.col("s").str.contains("bar", literal=True),
        rx=pl.col("s").str.contains(r"^ba"),
        sw=pl.col("s").str.starts_with("foo"),
        ew=pl.col("s").str.ends_with("az"),
    )
    assert out.get_column("lit").to_list() == [True, True, False]
    assert out.get_column("rx").to_list() == [False, True, False]
    assert out.get_column("sw").to_list() == [True, False, False]
    assert out.get_column("ew").to_list() == [False, True, False]


def test_len_slice():
    df = pl.DataFrame({"s": ["hello", "hi", ""]})
    out = df.select(
        n=pl.col("s").str.len_chars(),
        h=pl.col("s").str.slice(0, 3),
        t=pl.col("s").str.tail(2),
    )
    assert out.get_column("n").to_list() == [5, 2, 0]
    assert out.get_column("h").to_list() == ["hel", "hi", ""]
    assert out.get_column("t").to_list() == ["lo", "hi", ""]


def test_strip_pad():
    df = pl.DataFrame({"s": ["  x  ", "yy"]})
    out = df.select(
        st=pl.col("s").str.strip_chars(),
        pj=pl.col("s").str.strip_chars().str.pad_start(4, "_"),
        zf=pl.lit("7").str.zfill(3),
    )
    assert out.get_column("st").to_list() == ["x", "yy"]
    assert out.get_column("pj").to_list() == ["___x", "__yy"]
    assert out.get_column("zf").to_list() == ["007", "007"]


def test_replace_extract():
    df = pl.DataFrame({"s": ["a1b2", "c3d4"]})
    out = df.select(
        r=pl.col("s").str.replace(r"\d", "#"),
        ra=pl.col("s").str.replace_all(r"\d", "#"),
        ex=pl.col("s").str.extract(r"(\d)", 1),
        cm=pl.col("s").str.count_matches(r"\d"),
    )
    assert out.get_column("r").to_list() == ["a#b2", "c#d4"]
    assert out.get_column("ra").to_list() == ["a#b#", "c#d#"]
    assert out.get_column("ex").to_list() == ["1", "3"]
    assert out.get_column("cm").to_list() == [2, 2]


def test_to_integer_date():
    df = pl.DataFrame({"s": ["12", "x"], "d": ["2024-01-15", "bad"]})
    out = df.select(
        i=pl.col("s").str.to_integer(strict=False),
        d=pl.col("d").str.to_date(strict=False),
    )
    assert out.get_column("i").to_list() == [12, None]
    import datetime as dtm

    assert out.get_column("d").to_list() == [dtm.date(2024, 1, 15), None]


def test_strptime_format():
    df = pl.DataFrame({"d": ["15/01/2024"]})
    out = df.select(pl.col("d").str.to_date("%d/%m/%Y"))
    import datetime as dtm

    assert out.to_series().to_list() == [dtm.date(2024, 1, 15)]


def test_reverse_and_find():
    df = pl.DataFrame({"s": ["abc", "xyz"]})
    out = df.select(
        r=pl.col("s").str.reverse(),
        f=pl.col("s").str.find("b", literal=True),
    )
    assert out.get_column("r").to_list() == ["cba", "zyx"]
    assert out.get_column("f").to_list() == [1, None]


def test_string_group_key_after_transform():
    df = pl.DataFrame({"s": ["A", "a", "B"], "v": [1, 2, 4]})
    out = (
        df.lazy()
        .with_columns(k=pl.col("s").str.to_lowercase())
        .group_by("k")
        .agg(s=pl.col("v").sum())
        .sort("k")
        .collect()
    )
    assert out.get_column("k").to_list() == ["a", "b"]
    assert out.get_column("s").to_list() == [3, 4]


def test_concat_agg():
    df = pl.DataFrame({"g": ["x", "x", "y"], "s": ["a", "b", "c"]})
    out = df.group_by("g").agg(j=pl.col("s").str.join("-")).sort("g")
    assert out.get_column("j").to_list() == ["a-b", "c"]
