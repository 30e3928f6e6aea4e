"""PDS-H differential tests vs a pandas oracle (reference test pattern:
polars-lazy/src/tests/pdsh.rs + the BASELINE.json bit-exactness requirement;
pandas stands in as the oracle because the reference engine cannot run here)."""

import datetime as dtm

import numpy as np
import pandas as pd
import pytest

import polars_tpu as pl
from polars_tpu.testing import pdsh


@pytest.fixture(scope="module")
def data():
    raw = pdsh.generate_pdsh(scale=0.003, seed=7)
    frames = {name: pl.DataFrame(tbl) for name, tbl in raw.items()}
    pframes = {name: pd.DataFrame(tbl) for name, tbl in raw.items()}
    for pdf in pframes.values():
        for c in pdf.columns:
            if pdf[c].dtype == "object":
                pdf[c] = pdf[c].astype(str)
    return frames, pframes


def _dates_to_ts(pdf):
    return pdf


def test_q1(data):
    frames, p = data
    out = pdsh.q1(frames["lineitem"]).collect()
    li = p["lineitem"]
    li = li[li["l_shipdate"] <= np.datetime64("1998-09-02")]
    disc = li["l_extendedprice"] * (1 - li["l_discount"])
    charge = disc * (1 + li["l_tax"])
    li = li.assign(disc_price=disc, charge=charge)
    exp = (
        li.groupby(["l_returnflag", "l_linestatus"])
        .agg(
            sum_qty=("l_quantity", "sum"),
            sum_base_price=("l_extendedprice", "sum"),
            sum_disc_price=("disc_price", "sum"),
            sum_charge=("charge", "sum"),
            avg_qty=("l_quantity", "mean"),
            avg_price=("l_extendedprice", "mean"),
            avg_disc=("l_discount", "mean"),
            count_order=("l_quantity", "count"),
        )
        .reset_index()
        .sort_values(["l_returnflag", "l_linestatus"])
    )
    assert out.height == len(exp)
    assert out.get_column("l_returnflag").to_list() == exp["l_returnflag"].tolist()
    np.testing.assert_allclose(
        out.get_column("sum_disc_price").to_list(), exp["sum_disc_price"].to_numpy(), rtol=1e-9
    )
    np.testing.assert_allclose(
        out.get_column("avg_disc").to_list(), exp["avg_disc"].to_numpy(), rtol=1e-9
    )
    assert out.get_column("count_order").to_list() == exp["count_order"].tolist()


def test_q3(data):
    frames, p = data
    out = pdsh.q3(frames["customer"], frames["orders"], frames["lineitem"]).collect()
    d = np.datetime64("1995-03-15")
    c = p["customer"][p["customer"]["c_mktsegment"] == "BUILDING"]
    o = p["orders"][p["orders"]["o_orderdate"] < d]
    li = p["lineitem"][p["lineitem"]["l_shipdate"] > d]
    j = c.merge(o, left_on="c_custkey", right_on="o_custkey").merge(
        li, left_on="o_orderkey", right_on="l_orderkey"
    )
    j = j.assign(rev=j["l_extendedprice"] * (1 - j["l_discount"]))
    exp = (
        j.groupby(["o_orderkey", "o_orderdate", "o_shippriority"])["rev"]
        .sum()
        .reset_index()
        .sort_values(["rev", "o_orderdate"], ascending=[False, True])
        .head(10)
    )
    np.testing.assert_allclose(
        out.get_column("revenue").to_list(), exp["rev"].to_numpy(), rtol=1e-9
    )
    assert out.get_column("l_orderkey").to_list() == exp["o_orderkey"].tolist()


def test_q4(data):
    frames, p = data
    out = pdsh.q4(frames["orders"], frames["lineitem"]).collect()
    o = p["orders"]
    o = o[
        (o["o_orderdate"] >= np.datetime64("1993-07-01"))
        & (o["o_orderdate"] < np.datetime64("1993-10-01"))
    ]
    li = p["lineitem"]
    li = li[li["l_commitdate"] < li["l_receiptdate"]]
    sel = o[o["o_orderkey"].isin(li["l_orderkey"])]
    exp = (
        sel.groupby("o_orderpriority").size().reset_index(name="order_count")
        .sort_values("o_orderpriority")
    )
    assert out.get_column("o_orderpriority").to_list() == exp["o_orderpriority"].tolist()
    assert out.get_column("order_count").to_list() == exp["order_count"].tolist()


def test_q5(data):
    frames, p = data
    out = pdsh.q5(
        frames["customer"], frames["orders"], frames["lineitem"],
        frames["supplier"], frames["nation"], frames["region"],
    ).collect()
    r = p["region"][p["region"]["r_name"] == "ASIA"]
    j = (
        r.merge(p["nation"], left_on="r_regionkey", right_on="n_regionkey")
        .merge(p["customer"], left_on="n_nationkey", right_on="c_nationkey")
        .merge(p["orders"], left_on="c_custkey", right_on="o_custkey")
    )
    j = j[
        (j["o_orderdate"] >= np.datetime64("1994-01-01"))
        & (j["o_orderdate"] < np.datetime64("1995-01-01"))
    ]
    j = j.merge(p["lineitem"], left_on="o_orderkey", right_on="l_orderkey")
    j = j.merge(
        p["supplier"],
        left_on=["l_suppkey", "n_nationkey"],
        right_on=["s_suppkey", "s_nationkey"],
    )
    j = j.assign(rev=j["l_extendedprice"] * (1 - j["l_discount"]))
    exp = j.groupby("n_name")["rev"].sum().reset_index().sort_values("rev", ascending=False)
    assert out.get_column("n_name").to_list() == exp["n_name"].tolist()
    np.testing.assert_allclose(
        out.get_column("revenue").to_list(), exp["rev"].to_numpy(), rtol=1e-9
    )


def test_q6(data):
    frames, p = data
    out = pdsh.q6(frames["lineitem"]).collect()
    li = p["lineitem"]
    m = (
        (li["l_shipdate"] >= np.datetime64("1994-01-01"))
        & (li["l_shipdate"] < np.datetime64("1995-01-01"))
        & (li["l_discount"] >= 0.05)
        & (li["l_discount"] <= 0.07)
        & (li["l_quantity"] < 24)
    )
    exp = (li[m]["l_extendedprice"] * li[m]["l_discount"]).sum()
    assert abs(out.item() - exp) < 1e-6 * max(abs(exp), 1)


def test_q10(data):
    frames, p = data
    out = pdsh.q10(
        frames["customer"], frames["orders"], frames["lineitem"], frames["nation"]
    ).collect()
    o = p["orders"]
    o = o[
        (o["o_orderdate"] >= np.datetime64("1993-10-01"))
        & (o["o_orderdate"] < np.datetime64("1994-01-01"))
    ]
    li = p["lineitem"][p["lineitem"]["l_returnflag"] == "R"]
    j = (
        p["customer"]
        .merge(o, left_on="c_custkey", right_on="o_custkey")
        .merge(li, left_on="o_orderkey", right_on="l_orderkey")
        .merge(p["nation"], left_on="c_nationkey", right_on="n_nationkey")
    )
    j = j.assign(rev=j["l_extendedprice"] * (1 - j["l_discount"]))
    exp = (
        j.groupby(["c_custkey"])["rev"].sum().reset_index()
        .sort_values(["rev", "c_custkey"], ascending=[False, True])
        .head(20)
    )
    assert out.get_column("c_custkey").to_list() == exp["c_custkey"].tolist()
    np.testing.assert_allclose(
        out.get_column("revenue").to_list(), exp["rev"].to_numpy(), rtol=1e-9
    )


def test_q12(data):
    frames, p = data
    out = pdsh.q12(frames["orders"], frames["lineitem"]).collect()
    li = p["lineitem"]
    m = (
        li["l_shipmode"].isin(["MAIL", "SHIP"])
        & (li["l_commitdate"] < li["l_receiptdate"])
        & (li["l_shipdate"] < li["l_commitdate"])
        & (li["l_receiptdate"] >= np.datetime64("1994-01-01"))
        & (li["l_receiptdate"] < np.datetime64("1995-01-01"))
    )
    j = li[m].merge(p["orders"], left_on="l_orderkey", right_on="o_orderkey")
    hi = j["o_orderpriority"].isin(["1-URGENT", "2-HIGH"])
    exp = (
        j.assign(h=hi.astype(int), l=(~hi).astype(int))
        .groupby("l_shipmode")[["h", "l"]]
        .sum()
        .reset_index()
        .sort_values("l_shipmode")
    )
    assert out.get_column("l_shipmode").to_list() == exp["l_shipmode"].tolist()
    assert out.get_column("high_line_count").to_list() == exp["h"].tolist()
    assert out.get_column("low_line_count").to_list() == exp["l"].tolist()


def test_q14(data):
    frames, p = data
    out = pdsh.q14(frames["lineitem"], frames["part"]).collect()
    li = p["lineitem"]
    m = (li["l_shipdate"] >= np.datetime64("1995-09-01")) & (
        li["l_shipdate"] < np.datetime64("1995-10-01")
    )
    j = li[m].merge(p["part"], left_on="l_partkey", right_on="p_partkey")
    rev = j["l_extendedprice"] * (1 - j["l_discount"])
    promo = rev.where(j["p_type"].str.startswith("PROMO"), 0.0)
    exp = 100.0 * promo.sum() / rev.sum()
    assert abs(out.item() - exp) < 1e-9 * max(abs(exp), 1)


def test_q19(data):
    frames, p = data
    out = pdsh.q19(frames["lineitem"], frames["part"]).collect()
    li = p["lineitem"].merge(p["part"], left_on="l_partkey", right_on="p_partkey")
    c1 = (li["p_container"] == "SM CASE") & li["l_quantity"].between(1, 11) & (li["p_size"] <= 5)
    c2 = (li["p_container"] == "MED BAG") & li["l_quantity"].between(10, 20) & (li["p_size"] <= 10)
    c3 = (li["p_container"] == "LG BOX") & li["l_quantity"].between(20, 30) & (li["p_size"] <= 15)
    m = (c1 | c2 | c3) & li["l_shipmode"].isin(["AIR", "REG AIR"]) & (
        li["l_shipinstruct"] == "DELIVER IN PERSON"
    )
    exp = (li[m]["l_extendedprice"] * (1 - li[m]["l_discount"])).sum()
    got = out.item()
    if exp == 0:
        assert got == 0 or got is None
    else:
        assert abs(got - exp) < 1e-9 * abs(exp)


def test_q18(data):
    frames, p = data
    out = pdsh.q18(frames["customer"], frames["orders"], frames["lineitem"], threshold=150).collect()
    li = p["lineitem"]
    sums = li.groupby("l_orderkey")["l_quantity"].sum()
    big = sums[sums > 150].index
    j = (
        p["orders"][p["orders"]["o_orderkey"].isin(big)]
        .merge(p["customer"], left_on="o_custkey", right_on="c_custkey")
        .merge(sums.rename("col_qty").reset_index(), left_on="o_orderkey", right_on="l_orderkey")
    )
    exp = j.sort_values(["o_totalprice", "o_orderdate"], ascending=[False, True]).head(100)
    assert out.get_column("o_orderkey").to_list() == exp["o_orderkey"].tolist()
