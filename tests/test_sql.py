"""SQL front-end (mirrors py-polars tests/unit/sql)."""

import datetime as dtm

import pytest

import polars_tpu as pl


@pytest.fixture
def ctx():
    df = pl.DataFrame(
        {
            "a": [1, 2, 3, 4, 5],
            "b": [1.5, 2.5, 3.5, None, 5.5],
            "s": ["x", "y", "x", "z", "y"],
            "d": [dtm.date(2024, 1, i) for i in range(1, 6)],
        }
    )
    other = pl.DataFrame({"s": ["x", "y"], "label": ["ex", "why"]})
    return pl.SQLContext(t=df, other=other)


def test_select_basic(ctx):
    out = ctx.execute("SELECT a, b FROM t WHERE a > 2").collect()
    assert out.columns == ["a", "b"]
    assert out.get_column("a").to_list() == [3, 4, 5]


def test_select_star(ctx):
    out = ctx.execute("SELECT * FROM t LIMIT 2").collect()
    assert out.height == 2
    assert out.width == 4


def test_select_exprs(ctx):
    out = ctx.execute("SELECT a * 2 AS a2, abs(-a) AS aa FROM t").collect()
    assert out.get_column("a2").to_list() == [2, 4, 6, 8, 10]
    assert out.get_column("aa").to_list() == [1, 2, 3, 4, 5]


def test_group_by(ctx):
    out = ctx.execute(
        "SELECT s, sum(a) AS total, count(*) AS n FROM t GROUP BY s ORDER BY s"
    ).collect()
    assert out.get_column("s").to_list() == ["x", "y", "z"]
    assert out.get_column("total").to_list() == [4, 7, 4]
    assert out.get_column("n").to_list() == [2, 2, 1]


def test_having(ctx):
    out = ctx.execute(
        "SELECT s, sum(a) AS total FROM t GROUP BY s HAVING sum(a) > 4 ORDER BY s"
    ).collect()
    assert out.get_column("s").to_list() == ["y"]


def test_join(ctx):
    out = ctx.execute(
        "SELECT t.a, other.label FROM t JOIN other ON t.s = other.s ORDER BY a"
    ).collect()
    assert out.get_column("label").to_list() == ["ex", "why", "ex", "why"]


def test_left_join(ctx):
    out = ctx.execute(
        "SELECT a, label FROM t LEFT JOIN other ON t.s = other.s ORDER BY a"
    ).collect()
    assert out.get_column("label").to_list() == ["ex", "why", "ex", None, "why"]


def test_case_when(ctx):
    out = ctx.execute(
        "SELECT CASE WHEN a > 3 THEN 'big' WHEN a > 1 THEN 'mid' ELSE 'small' END AS size FROM t"
    ).collect()
    assert out.get_column("size").to_list() == ["small", "mid", "mid", "big", "big"]


def test_agg_whole_table(ctx):
    out = ctx.execute("SELECT sum(a) AS s, avg(b) AS m, max(s) AS mx FROM t").collect()
    assert out.get_column("s").to_list() == [15]
    assert out.get_column("mx").to_list() == ["z"]


def test_string_fns(ctx):
    out = ctx.execute(
        "SELECT upper(s) AS u, length(s) AS l, s || '!' AS e FROM t LIMIT 1"
    ).collect()
    assert out.to_dicts() == [{"u": "X", "l": 1, "e": "x!"}]


def test_in_between_like(ctx):
    out = ctx.execute("SELECT a FROM t WHERE a IN (1, 3)").collect()
    assert out.get_column("a").to_list() == [1, 3]
    out = ctx.execute("SELECT a FROM t WHERE a BETWEEN 2 AND 4").collect()
    assert out.get_column("a").to_list() == [2, 3, 4]
    out = ctx.execute("SELECT s FROM t WHERE s LIKE 'x%'").collect()
    assert out.get_column("s").to_list() == ["x", "x"]


def test_is_null(ctx):
    out = ctx.execute("SELECT a FROM t WHERE b IS NULL").collect()
    assert out.get_column("a").to_list() == [4]
    out = ctx.execute("SELECT count(b) AS c FROM t WHERE b IS NOT NULL").collect()
    assert out.item() == 4


def test_cast(ctx):
    out = ctx.execute("SELECT CAST(a AS double) AS f, a::text AS s2 FROM t LIMIT 1").collect()
    assert out.schema["f"] == pl.Float64
    assert out.get_column("s2").to_list() == ["1"]


def test_date_literal_and_fns(ctx):
    out = ctx.execute(
        "SELECT a FROM t WHERE d >= DATE '2024-01-03' ORDER BY a"
    ).collect()
    assert out.get_column("a").to_list() == [3, 4, 5]
    out = ctx.execute("SELECT year(d) AS y, month(d) AS m FROM t LIMIT 1").collect()
    assert out.to_dicts() == [{"y": 2024, "m": 1}]


def test_union(ctx):
    out = ctx.execute(
        "SELECT a FROM t WHERE a < 2 UNION ALL SELECT a FROM t WHERE a > 4"
    ).collect()
    assert sorted(out.get_column("a").to_list()) == [1, 5]


def test_distinct(ctx):
    out = ctx.execute("SELECT DISTINCT s FROM t ORDER BY s").collect()
    assert out.get_column("s").to_list() == ["x", "y", "z"]


def test_subquery(ctx):
    out = ctx.execute(
        "SELECT s, total FROM (SELECT s, sum(a) AS total FROM t GROUP BY s) sub WHERE total > 4 ORDER BY s"
    ).collect()
    assert out.get_column("s").to_list() == ["y"]


def test_coalesce_fn(ctx):
    out = ctx.execute("SELECT coalesce(b, 0.0) AS c FROM t").collect()
    assert out.get_column("c").to_list() == [1.5, 2.5, 3.5, 0.0, 5.5]


def test_order_limit_offset(ctx):
    out = ctx.execute("SELECT a FROM t ORDER BY a DESC LIMIT 2 OFFSET 1").collect()
    assert out.get_column("a").to_list() == [4, 3]


def test_pl_sql_function():
    my_table = pl.DataFrame({"x": [1, 2, 3]})
    out = pl.sql("SELECT sum(x) AS s FROM my_table", eager=True)
    assert out.item() == 6


def test_tables_registry(ctx):
    assert ctx.tables() == ["other", "t"]


def test_sql_pdsh_q1_equivalence():
    from polars_tpu.testing import pdsh, assert_frame_equal

    raw = pdsh.generate_pdsh(scale=0.002, seed=3)
    lineitem = pl.DataFrame(raw["lineitem"])
    ctx2 = pl.SQLContext(lineitem=lineitem)
    sql_out = ctx2.execute(
        """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               sum(l_extendedprice) AS sum_base_price,
               sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price,
               sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
               avg(l_quantity) AS avg_qty,
               avg(l_extendedprice) AS avg_price,
               avg(l_discount) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= DATE '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    ).collect()
    dsl_out = pdsh.q1(lineitem).collect()
    assert sql_out.columns == dsl_out.columns
    for c in ("sum_disc_price", "avg_disc"):
        a = sql_out.get_column(c).to_list()
        b = dsl_out.get_column(c).to_list()
        assert all(abs(x - y) < 1e-9 * max(abs(y), 1) for x, y in zip(a, b))
    assert (
        sql_out.get_column("count_order").to_list()
        == dsl_out.get_column("count_order").to_list()
    )


def test_sql_function_batch():
    df = pl.DataFrame({"x": [1.0, -4.0, 9.0], "s": ["a,b", "c", "d,e,f"], "t": ["Foo", "bar", "BAZ"]})
    ctx = pl.SQLContext(frames={"t": df})
    out = ctx.execute(
        "SELECT sign(x) AS sg, sqrt(abs(x)) AS r, split_part(s, ',', 2) AS p2 FROM t",
        eager=True,
    )
    assert out["sg"].to_list() == [1.0, -1.0, 1.0]
    assert out["p2"].to_list() == ["b", None, "e"]
    agg = ctx.execute("SELECT bool_or(x > 5) AS any5, string_agg(t, '|') AS cat FROM t", eager=True)
    assert agg["any5"].to_list() == [True]
    assert agg["cat"].to_list() == ["Foo|bar|BAZ"]
    trig = ctx.execute("SELECT even(CAST(x AS INT)) AS ev FROM t", eager=True)
    assert trig["ev"].to_list() == [False, True, False]
