"""SQL conformance slice adapted from the reference suite
(py-polars/tests/unit/sql/: test_set_ops.py, test_table_operations.py,
test_window_functions.py, test_order_by.py)."""

import pytest

import polars_tpu as pl


# -- set operations (reference: test_set_ops.py) ------------------------------


@pytest.fixture
def set_frames():
    df1 = pl.DataFrame({"x": [1, 9, 1, 1], "y": [2, 3, 4, 4], "z": [5, 5, 5, 5]})
    df2 = pl.DataFrame({"x": [1, 9, 1], "y": [2, None, 4], "z": [7, 6, 5]})
    return pl.SQLContext(df1=df1, df2=df2, eager=True)


def test_except(set_frames):
    res = set_frames.execute("SELECT x, y, z FROM df1 EXCEPT SELECT * FROM df2")
    assert sorted(res.rows()) == [(1, 2, 5), (9, 3, 5)]


def test_intersect(set_frames):
    res = set_frames.execute("SELECT * FROM df1 INTERSECT SELECT x, y, z FROM df2")
    assert sorted(res.rows()) == [(1, 4, 5)]


def test_except_table_shorthand(set_frames):
    res = set_frames.execute("SELECT * FROM df2 EXCEPT TABLE df1")
    assert sorted(res.rows()) == [(1, 2, 7), (9, None, 6)]


def test_intersect_values_clause(set_frames):
    res = set_frames.execute(
        """
        SELECT * FROM df2
        INTERSECT
        SELECT x::int8, y::int8, z::int8
          FROM (VALUES (1,2,5),(9,3,5),(1,4,5),(1,4,5)) AS df1(x,y,z)
        """
    )
    assert sorted(res.rows()) == [(1, 4, 5)]


def test_except_null_equality():
    ctx = pl.SQLContext(
        tbl1=pl.DataFrame({"x": [2, 9, 1], "y": [2, None, 4]}),
        tbl2=pl.DataFrame({"x": [1, 9, 1], "y": [2, None, 4]}),
        eager=True,
    )
    res = ctx.execute("SELECT * FROM tbl1 EXCEPT SELECT * FROM tbl2")
    assert res.rows() == [(2, 2)]


def test_union_by_name():
    ctx = pl.SQLContext(
        d3=pl.DataFrame({"a": [1], "b": [2]}),
        d4=pl.DataFrame({"b": [4], "a": [3]}),
        eager=True,
    )
    res = ctx.execute("SELECT * FROM d3 UNION ALL BY NAME SELECT * FROM d4")
    assert res.rows() == [(1, 2), (3, 4)]


def test_union_distinct():
    ctx = pl.SQLContext(t=pl.DataFrame({"a": [1, 2]}), eager=True)
    res = ctx.execute("SELECT a FROM t UNION SELECT a FROM t")
    assert sorted(res["a"].to_list()) == [1, 2]
    res = ctx.execute("SELECT a FROM t UNION ALL SELECT a FROM t")
    assert sorted(res["a"].to_list()) == [1, 1, 2, 2]


# -- table operations (reference: test_table_operations.py) -------------------


def test_create_table_three_ways():
    with pl.SQLContext() as ctx:
        ctx.execute("CREATE TABLE tbl1(colx VARCHAR, coly DATE, colz ARRAY<DOUBLE>)")
        ctx.execute("CREATE TABLE tbl2 AS SELECT * FROM tbl1")
        ctx.execute("CREATE TABLE tbl3 LIKE tbl2")
        df = ctx.execute("SELECT * FROM tbl3", eager=True)
    assert df.schema == pl.Schema(
        {"colx": pl.String(), "coly": pl.Date(), "colz": pl.List(pl.Float64())}
    )
    assert df.height == 0


def test_create_table_as_select():
    ctx = pl.SQLContext(src=pl.DataFrame({"a": [1, 2, 3]}), eager=True)
    out = ctx.execute("CREATE TABLE big AS SELECT a FROM src WHERE a > 1")
    assert out.rows() == [("CREATE TABLE big",)]
    assert ctx.execute("SELECT * FROM big")["a"].to_list() == [2, 3]


def test_create_table_from_read_csv(tmp_path):
    p = tmp_path / "foods.csv"
    pl.DataFrame({"category": ["fruit", "meat"], "calories": [30, 100]}).write_csv(p)
    with pl.SQLContext() as ctx:
        ctx.execute(f"CREATE TABLE foods AS SELECT * FROM READ_CSV('{p}')")
        df = ctx.execute("SELECT * FROM foods", eager=True)
        assert df.schema == pl.Schema({"category": pl.String(), "calories": pl.Int64()})
        assert df.height == 2


def test_show_tables_drop():
    ctx = pl.SQLContext(a=pl.DataFrame({"x": [1]}), b=pl.DataFrame({"x": [2]}), eager=True)
    assert ctx.execute("SHOW TABLES")["name"].to_list() == ["a", "b"]
    ctx.execute("DROP TABLE a")
    assert ctx.execute("SHOW TABLES")["name"].to_list() == ["b"]
    with pytest.raises(Exception):
        ctx.execute("DROP TABLE nope")
    ctx.execute("DROP TABLE IF EXISTS nope")


def test_delete_where_null_kept():
    # rows where the predicate is NULL are NOT deleted (SQL three-valued logic)
    ctx = pl.SQLContext(t=pl.DataFrame({"id": [100, 200, 300], "v": [1, -1, None]}), eager=True)
    ctx.execute("DELETE FROM t WHERE v < 0")
    assert ctx.execute("SELECT id FROM t")["id"].to_list() == [100, 300]


def test_truncate():
    ctx = pl.SQLContext(t=pl.DataFrame({"id": [1, 2]}), eager=True)
    ctx.execute("TRUNCATE TABLE t")
    out = ctx.execute("SELECT * FROM t")
    assert out.height == 0
    assert out.columns == ["id"]


def test_explain():
    ctx = pl.SQLContext(t=pl.DataFrame({"id": [1, 2]}), eager=True)
    out = ctx.execute("EXPLAIN SELECT id FROM t")
    assert out.height > 0


# -- window functions (reference: test_window_functions.py) -------------------


@pytest.fixture
def df_win():
    return pl.DataFrame(
        {
            "id": [1, 2, 3, 4, 5, 6, 7],
            "category": ["A", "A", "A", "B", "B", "B", "C"],
            "value": [20, 10, 30, 15, 40, 25, 35],
        }
    )


def test_over_with_order_by(df_win):
    ctx = pl.SQLContext(frames={"self": df_win}, eager=True)
    out = ctx.execute(
        "SELECT id, value, SUM(value) OVER (ORDER BY value) AS s FROM self ORDER BY id"
    )
    assert out["s"].to_list() == [45, 10, 100, 25, 175, 70, 135]


def test_over_partition_and_named_window(df_win):
    df = df_win.filter(pl.col("id") != 6)
    ctx = pl.SQLContext(frames={"self": df}, eager=True)
    out = ctx.execute(
        """
        SELECT category, value,
            ROW_NUMBER() OVER (PARTITION BY category ORDER BY value) AS row_num,
            COUNT(*) OVER w0 AS cat_count,
            SUM(value) OVER w0 AS cat_sum
        FROM self
        WINDOW w0 AS (PARTITION BY category)
        ORDER BY category, value
        """
    )
    assert out["row_num"].to_list() == [1, 2, 3, 1, 2, 1]
    assert out["cat_count"].to_list() == [3, 3, 3, 2, 2, 1]
    assert out["cat_sum"].to_list() == [60, 60, 60, 55, 55, 35]


def test_cumulative_window_funcs(df_win):
    ctx = pl.SQLContext(frames={"self": df_win}, eager=True)
    out = ctx.execute(
        """
        SELECT category, value,
            SUM(value) OVER (PARTITION BY category ORDER BY value) AS cumsum,
            MIN(value) OVER (PARTITION BY category ORDER BY value) AS cummin,
            MAX(value) OVER (PARTITION BY category ORDER BY value) AS cummax
        FROM self ORDER BY category, value
        """
    )
    assert out["cumsum"].to_list() == [10, 30, 60, 15, 40, 80, 35]
    assert out["cummin"].to_list() == [10, 10, 10, 15, 15, 15, 35]
    assert out["cummax"].to_list() == [10, 20, 30, 15, 25, 40, 35]


def test_window_over_empty(df_win):
    ctx = pl.SQLContext(frames={"self": df_win}, eager=True)
    out = ctx.execute(
        "SELECT id, COUNT(*) OVER () AS tc, SUM(value) OVER () AS ts FROM self ORDER BY id"
    )
    assert out["tc"].to_list() == [7] * 7
    assert out["ts"].to_list() == [175] * 7


def test_rank_functions(df_win):
    ctx = pl.SQLContext(frames={"self": df_win}, eager=True)
    out = ctx.execute(
        """
        SELECT category, value,
            RANK() OVER (PARTITION BY category ORDER BY value DESC) AS r,
            DENSE_RANK() OVER (PARTITION BY category ORDER BY value DESC) AS dr
        FROM self ORDER BY category, value
        """
    )
    assert out["r"].to_list() == [3, 2, 1, 3, 2, 1, 1]
    assert out["dr"].to_list() == [3, 2, 1, 3, 2, 1, 1]


def test_lag_lead_first_value(df_win):
    ctx = pl.SQLContext(frames={"self": df_win}, eager=True)
    out = ctx.execute(
        """
        SELECT category, value,
            LAG(value, 1) OVER (PARTITION BY category ORDER BY value) AS lg,
            LEAD(value, 1, -1) OVER (PARTITION BY category ORDER BY value) AS ld,
            FIRST_VALUE(value) OVER (PARTITION BY category ORDER BY value DESC) AS fv
        FROM self ORDER BY category, value
        """
    )
    assert out["lg"].to_list() == [None, 10, 20, None, 15, 25, None]
    assert out["ld"].to_list() == [20, 30, -1, 25, 40, -1, -1]
    assert out["fv"].to_list() == [30, 30, 30, 40, 40, 40, 35]


def test_ntile(df_win):
    ctx = pl.SQLContext(frames={"self": df_win}, eager=True)
    out = ctx.execute(
        "SELECT id, NTILE(2) OVER (ORDER BY value) AS nt FROM self ORDER BY value"
    )
    assert out["nt"].to_list() == [1, 1, 1, 1, 2, 2, 2]


# -- CTEs / order by extras (reference: test_order_by.py, misc) ---------------


def test_cte(df_win):
    ctx = pl.SQLContext(frames={"self": df_win}, eager=True)
    out = ctx.execute(
        "WITH big AS (SELECT * FROM self WHERE value > 20) SELECT COUNT(*) AS n FROM big"
    )
    assert out["n"].to_list() == [4]


def test_cte_column_aliases(df_win):
    ctx = pl.SQLContext(frames={"self": df_win}, eager=True)
    out = ctx.execute(
        "WITH t(i, c, v) AS (SELECT * FROM self) SELECT i FROM t WHERE v = 35"
    )
    assert out["i"].to_list() == [7]


def test_order_by_unprojected(df_win):
    ctx = pl.SQLContext(frames={"self": df_win}, eager=True)
    out = ctx.execute("SELECT value FROM self ORDER BY id DESC")
    assert out["value"].to_list() == [35, 25, 40, 15, 30, 10, 20]


def test_order_by_all(df_win):
    ctx = pl.SQLContext(frames={"self": df_win}, eager=True)
    out = ctx.execute("SELECT value FROM self ORDER BY ALL DESC")
    assert out["value"].to_list() == [40, 35, 30, 25, 20, 15, 10]


def test_order_by_alias():
    df = pl.DataFrame({"x": [1, 2], "y": [3, 1]})
    ctx = pl.SQLContext(frames={"self": df}, eager=True)
    out = ctx.execute("SELECT x, y AS y2 FROM self ORDER BY y2")
    assert out["x"].to_list() == [2, 1]


def test_values_body():
    ctx = pl.SQLContext(eager=True)
    out = ctx.execute("SELECT * FROM (VALUES (1, 'a'), (2, 'b')) AS t(n, s)")
    assert out.rows() == [(1, "a"), (2, "b")]


def test_table_functions(tmp_path):
    df = pl.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    pq = tmp_path / "t.parquet"
    df.write_parquet(pq)
    ctx = pl.SQLContext(eager=True)
    out = ctx.execute(f"SELECT a FROM read_parquet('{pq}') WHERE a >= 2")
    assert out["a"].to_list() == [2, 3]


def test_register_globals():
    my_frame = pl.DataFrame({"q": [1, 2]})  # noqa: F841
    ctx = pl.SQLContext(register_globals=True, eager=True)
    assert ctx.execute("SELECT COUNT(*) AS n FROM my_frame")["n"].to_list() == [2]


# -- function long tail (reference: polars-sql functions.rs ~150 names) -------


def test_sql_function_long_tail():
    df = pl.DataFrame(
        {
            "a": [30.0, 90.0],
            "i": [5, 12],
            "j": [3, 10],
            "l": [[3, 1, 2, 1], [5]],
            "s": ["a,b", "c"],
            "d": ["2021-01-02", "2022-03-04"],
        }
    )
    ctx = pl.SQLContext(t=df, eager=True)
    out = ctx.execute(
        """SELECT
            SIND(a) AS sd, ATAND(1.0) AS at,
            BIT_AND(i, j) AS ba, BIT_XOR(i, j) AS bx, BIT_COUNT(i) AS bc,
            DIV(i, j) AS dv, CONCAT_WS('-', s, s) AS cw,
            TOTAL(i) OVER () AS tot,
            ARRAY_GET(l, 1) AS ag, ARRAY_UPPER(l) AS au, ARRAY_LOWER(l) AS al,
            ARRAY_MEAN(l) AS am, ARRAY_SUM(l) AS asum,
            ARRAY_TO_STRING(l, '|') AS ats, STRING_TO_ARRAY(s, ',') AS sta,
            DATE(d) AS dd
        FROM t"""
    )
    assert out["at"].to_list() == [45.0, 45.0]
    assert abs(out["sd"].to_list()[0] - 0.5) < 1e-12
    assert out["ba"].to_list() == [1, 8]
    assert out["bx"].to_list() == [6, 6]
    assert out["bc"].to_list() == [2, 2]
    assert out["dv"].to_list() == [1, 1]
    assert out["cw"].to_list() == ["a,b-a,b", "c-c"]
    assert out["tot"].to_list() == [17, 17]
    assert out["ag"].to_list() == [3, 5]
    assert out["au"].to_list() == [3, 5]
    assert out["al"].to_list() == [1, 5]
    assert out["am"].to_list() == [1.75, 5.0]
    assert out["asum"].to_list() == [7, 5]
    assert out["ats"].to_list() == ["3|1|2|1", "5"]
    assert out["sta"].to_list() == [["a", "b"], ["c"]]
    import datetime

    assert out["dd"].to_list() == [datetime.date(2021, 1, 2), datetime.date(2022, 3, 4)]


def test_sql_quantile_and_strptime():
    df = pl.DataFrame({"i": [1, 2, 3, 4], "d": ["2021-01-02 03:04:05"] * 4})
    ctx = pl.SQLContext(t=df, eager=True)
    out = ctx.execute(
        "SELECT QUANTILE_CONT(i, 0.5) AS qc, QUANTILE_DISC(i, 0.5) AS qd FROM t"
    )
    assert out["qc"].to_list() == [2.5]
    out2 = ctx.execute("SELECT STRPTIME(d, '%Y-%m-%d %H:%M:%S') AS ts FROM t")
    import datetime

    assert out2["ts"].to_list()[0] == datetime.datetime(2021, 1, 2, 3, 4, 5)


def test_sql_columns_selector_and_normalize():
    df = pl.DataFrame({"aa": [1], "ab": [2], "bz": [3], "s": ["01²"]})
    ctx = pl.SQLContext(frames={"t": df.lazy()})
    assert ctx.execute("select columns('^a') from t").collect().columns == ["aa", "ab"]
    assert ctx.execute("select columns('^a') + 1 from t").collect().to_dicts() == [{"aa": 2, "ab": 3}]
    assert ctx.execute("select normalize(s, nfkc) as x from t").collect()["x"].to_list() == ["012"]
    assert ctx.execute("select bit_not(aa) as b from t").collect()["b"].to_list() == [-2]


def test_sql_count_distinct_excludes_nulls():
    df = pl.DataFrame({"g": ["a", "a", "b", None]})
    ctx = pl.SQLContext(frames={"t": df.lazy()})
    out = ctx.execute("SELECT COUNT(DISTINCT g) AS c FROM t").collect()
    assert out.rows() == [(2,)]


def test_sql_floor_division():
    df = pl.DataFrame({"x": [7, -7]})
    ctx = pl.SQLContext(frames={"t": df.lazy()})
    out = ctx.execute("SELECT x // 2 AS d FROM t").collect()
    # DuckIntegerDivide: floor_div cast Int64 (polars-sql/src/sql_expr.rs:661)
    assert out.to_series().to_list() == [3, -4]
    assert out.schema["d"] == pl.Int64()


def test_sql_exists_and_in_subquery():
    df = pl.DataFrame({"g": ["a", "a", "b", None], "x": [1, 2, 3, 4]})
    o = pl.DataFrame({"k": [2, 3, None]})
    ctx = pl.SQLContext(frames={"t": df.lazy(), "o": o.lazy()})

    def q(s):
        return ctx.execute(s).collect().rows()

    assert q("SELECT x FROM t WHERE x IN (SELECT k FROM o)") == [(2,), (3,)]
    assert q(
        "SELECT x FROM t WHERE x NOT IN (SELECT k FROM o WHERE k IS NOT NULL)"
    ) == [(1,), (4,)]
    assert q(
        "SELECT x FROM t WHERE EXISTS (SELECT 1 FROM o WHERE o.k = t.x)"
    ) == [(2,), (3,)]
    assert q(
        "SELECT x FROM t WHERE NOT EXISTS (SELECT 1 FROM o WHERE o.k = t.x)"
    ) == [(1,), (4,)]
    # local (inner-only) filters compose with the correlation key
    assert q(
        "SELECT x FROM t WHERE EXISTS (SELECT 1 FROM o WHERE o.k = t.x AND o.k > 2)"
    ) == [(3,)]
    # uncorrelated EXISTS is a constant truth value
    assert q("SELECT x FROM t WHERE EXISTS (SELECT 1 FROM o) AND x = 1") == [(1,)]
    assert q("SELECT x FROM t WHERE EXISTS (SELECT 1 FROM o WHERE k > 100)") == []


def test_sql_scalar_subquery():
    df = pl.DataFrame({"x": [1, 2, 3]})
    o = pl.DataFrame({"k": [10, 20]})
    ctx = pl.SQLContext(frames={"t": df.lazy(), "o": o.lazy()})
    out = ctx.execute("SELECT x, (SELECT MAX(k) FROM o) AS m FROM t").collect()
    assert out.rows() == [(1, 20), (2, 20), (3, 20)]
    out2 = ctx.execute("SELECT x FROM t WHERE x > (SELECT MIN(k) FROM o) - 9").collect()
    assert out2.rows() == [(2,), (3,)]
    # 0 rows -> NULL (broadcast alongside a column)
    out3 = ctx.execute(
        "SELECT x, (SELECT k FROM o WHERE k > 99) AS n FROM t"
    ).collect()
    assert out3.get_column("n").to_list() == [None, None, None]
    with pytest.raises(pl.exceptions.SQLInterfaceError):
        ctx.execute("SELECT (SELECT k FROM o) AS n FROM t").collect()
