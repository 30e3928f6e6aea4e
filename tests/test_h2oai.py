"""H2O.ai (db-benchmark) group-by suite: all 10 questions differential vs
pandas at small scale (reference: py-polars/tests/benchmark/test_group_by.py)."""

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

import polars_tpu as pl

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "benchmarks"))
from h2oai_groupby import generate, questions  # noqa: E402


@pytest.fixture(scope="module")
def data():
    return generate(n=3000, k=10, nulls=0.05, seed=7)


@pytest.fixture(scope="module")
def lf(data):
    return pl.DataFrame(data).lazy()


@pytest.fixture(scope="module")
def pdf(data):
    return pd.DataFrame(data)


def _cmp(got, exp, keys, sort_all=False):
    got = got.to_pandas()
    by = list(got.columns) if sort_all else keys
    got = got.sort_values(by).reset_index(drop=True)
    exp = exp.sort_values(by).reset_index(drop=True)
    assert list(got.columns) == list(exp.columns)
    pd.testing.assert_frame_equal(got, exp, rtol=1e-9, atol=1e-12, check_dtype=False)


QS = dict(questions(pl))


def test_q1(lf, pdf):
    _cmp(QS["q1"](lf).collect(),
         pdf.groupby("id1", dropna=False, as_index=False)["v1"].sum().rename(columns={}), ["id1"])


def test_q2(lf, pdf):
    _cmp(QS["q2"](lf).collect(),
         pdf.groupby(["id1", "id2"], dropna=False, as_index=False)["v1"].sum(), ["id1", "id2"])


def test_q3(lf, pdf):
    exp = pdf.groupby("id3", dropna=False, as_index=False).agg(v1=("v1", "sum"), v3=("v3", "mean"))
    _cmp(QS["q3"](lf).collect(), exp, ["id3"])


def test_q4(lf, pdf):
    exp = pdf.groupby("id4", as_index=False).agg(v1=("v1", "mean"), v2=("v2", "mean"), v3=("v3", "mean"))
    _cmp(QS["q4"](lf).collect(), exp, ["id4"])


def test_q5(lf, pdf):
    exp = pdf.groupby("id6", as_index=False).agg(v1=("v1", "sum"), v2=("v2", "sum"), v3=("v3", "sum"))
    _cmp(QS["q5"](lf).collect(), exp, ["id6"])


def test_q6(lf, pdf):
    exp = pdf.groupby(["id4", "id5"], as_index=False).agg(v3_med=("v3", "median"), v3_std=("v3", "std"))
    _cmp(QS["q6"](lf).collect(), exp, ["id4", "id5"])


def test_q7(lf, pdf):
    exp = pdf.groupby("id3", dropna=False, as_index=False).agg(
        mx=("v1", "max"), mn=("v2", "min"))
    exp["range_v1_v2"] = exp["mx"] - exp["mn"]
    exp = exp[["id3", "range_v1_v2"]]
    _cmp(QS["q7"](lf).collect(), exp, ["id3"])


def test_q8(lf, pdf):
    exp = (
        pdf.sort_values("v3", ascending=False).groupby("id6").head(2)
        [["id6", "v3"]].rename(columns={"v3": "largest2_v3"})
    )
    _cmp(QS["q8"](lf).collect(), exp, ["id6", "largest2_v3"], sort_all=True)


def test_q9(lf, pdf):
    exp = (
        pdf.groupby(["id2", "id4"], dropna=False)
        .apply(lambda s: s["v1"].corr(s["v2"]) ** 2, include_groups=False)
        .reset_index(name="r2")
    )
    _cmp(QS["q9"](lf).collect(), exp, ["id2", "id4"])


def test_q10(lf, pdf):
    exp = pdf.groupby(
        ["id1", "id2", "id3", "id4", "id5", "id6"], dropna=False, as_index=False
    ).agg(v3=("v3", "sum"), count=("v1", "size"))
    _cmp(QS["q10"](lf).collect(), exp, ["id1", "id2", "id3", "id4", "id5", "id6"])
