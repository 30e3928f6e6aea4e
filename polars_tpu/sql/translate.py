"""SQL AST -> LazyFrame translation (reference: polars-sql/src/{context.rs,
sql_expr.rs,functions.rs} — ~150 SQL functions; the common core here)."""

from __future__ import annotations

import datetime as dtm
from typing import Any

from polars_tpu import datatypes as dt
from polars_tpu.errors import SQLInterfaceError, SQLSyntaxError
from polars_tpu.sql import parser as P

_TYPE_MAP = {
    "int": dt.Int64, "integer": dt.Int64, "bigint": dt.Int64, "smallint": dt.Int16,
    "tinyint": dt.Int8, "int2": dt.Int16, "int4": dt.Int32, "int8": dt.Int64,
    "uint1": dt.UInt8, "uint2": dt.UInt16, "uint4": dt.UInt32, "uint8": dt.UInt64,
    "utinyint": dt.UInt8, "usmallint": dt.UInt16, "uint": dt.UInt32,
    "ubigint": dt.UInt64,
    "float": dt.Float64, "float4": dt.Float32, "float8": dt.Float64,
    "double": dt.Float64, "double precision": dt.Float64, "real": dt.Float32,
    "text": dt.String, "varchar": dt.String, "char": dt.String, "string": dt.String,
    "bool": dt.Boolean, "boolean": dt.Boolean, "date": dt.Date,
    "timestamp": dt.Datetime, "datetime": dt.Datetime, "time": dt.Time,
    "decimal": dt.Float64, "numeric": dt.Float64,
}


def _parse_type(name: str) -> dt.DataType:
    tname = name.strip().lower()
    if tname.startswith("array<") and tname.endswith(">"):
        return dt.List(_parse_type(tname[6:-1]))
    base = tname.split("(")[0].strip()
    if base not in _TYPE_MAP:
        raise SQLSyntaxError(f"unknown type {name!r}")
    return _TYPE_MAP[base]()


# named-WINDOW scopes for the SELECT core currently being translated
_WINDOW_SCOPES: list[dict] = []
_TABLE_SCOPES: list[dict] = []  # table registry stack for scalar subqueries


def translate(query: str, tables: dict[str, Any]):
    stmt = P.parse_sql(query)
    return _statement(stmt, tables)


def _statement(stmt: Any, tables: dict[str, Any]):
    """Statement dispatch (reference: polars-sql context.rs execute:309-322).
    DDL statements mutate the registry dict the caller passed in."""
    import polars_tpu as pl

    if isinstance(stmt, P.Query):
        return _query(stmt, tables)
    if isinstance(stmt, P.CreateTableStmt):
        if stmt.if_not_exists and stmt.name in tables:
            raise SQLInterfaceError(f"relation {stmt.name!r} already exists")
        if stmt.query is not None:
            lf = _query(stmt.query, tables)
        elif stmt.columns is not None:
            schema = {cname: _parse_type(tname) for cname, tname in stmt.columns}
            lf = pl.DataFrame(schema={k: v for k, v in schema.items()}).lazy()
        elif stmt.like is not None:
            if stmt.like not in tables:
                raise SQLInterfaceError(
                    f"table given in LIKE does not exist: {stmt.like}")
            src = tables[stmt.like]
            from polars_tpu.core.frame import DataFrame as _DF

            src_lf = src.lazy() if isinstance(src, _DF) else src
            lf = src_lf.clear()
        else:
            raise SQLInterfaceError(
                "CREATE TABLE expected a query, column definitions, or LIKE clause")
        tables[stmt.name] = lf
        return pl.DataFrame({"Response": [f"CREATE TABLE {stmt.name}"]}).lazy()
    if isinstance(stmt, P.DropTableStmt):
        for n in stmt.names:
            if tables.pop(n, None) is None and not stmt.if_exists:
                raise SQLInterfaceError(f"table {n!r} does not exist")
        return pl.DataFrame().lazy()
    if isinstance(stmt, P.ShowTablesStmt):
        return pl.DataFrame({"name": sorted(tables)}).lazy()
    if isinstance(stmt, P.TruncateStmt):
        if stmt.name not in tables:
            raise SQLInterfaceError(f"table {stmt.name!r} does not exist")
        tables[stmt.name] = _as_lazy(tables[stmt.name]).clear()
        return pl.DataFrame().lazy()
    if isinstance(stmt, P.DeleteStmt):
        if stmt.name not in tables:
            raise SQLInterfaceError(f"table {stmt.name!r} does not exist")
        lf = _as_lazy(tables[stmt.name])
        if stmt.where is None:
            lf = lf.clear()
        else:
            # SQL DELETE keeps rows where the predicate is FALSE OR NULL
            cond = _expr(stmt.where)
            lf = lf.filter(~cond.fill_null(False))
        tables[stmt.name] = lf
        return lf
    if isinstance(stmt, P.ExplainStmt):
        lf = _query(stmt.query, tables)
        lines = lf.explain().splitlines()
        return pl.DataFrame({"Logical Plan": lines}).lazy()
    raise SQLInterfaceError(f"unsupported statement {type(stmt).__name__}")


def _as_lazy(f: Any):
    from polars_tpu.core.frame import DataFrame

    return f.lazy() if isinstance(f, DataFrame) else f


def _query(q: P.Query, tables: dict[str, Any]):
    import polars_tpu as pl

    if q.ctes:
        tables = dict(tables)  # CTEs are scoped to this query
        for name, col_aliases, cq in q.ctes:
            lf = _query(cq, tables)
            if col_aliases:
                lf = lf.rename(dict(zip(lf.collect_schema().names(), col_aliases)))
            tables[name] = lf
    lf = _body(q.body, tables)
    if q.order_by:
        lf = _order(lf, q, tables)
    if q.offset is not None or q.limit is not None:
        lf = lf.slice(q.offset or 0, q.limit)
    return lf


def _referenced_columns(e: Any, out: set | None = None) -> set:
    out = set() if out is None else out
    if isinstance(e, P.SColumn):
        out.add(e.name)
    for c in _children(e):
        _referenced_columns(c, out)
    return out


def _order(lf, q: P.Query, tables: dict[str, Any]):
    """ORDER BY over the query output. Columns/expressions that reference
    pre-projection columns sort via hidden columns (the reference sorts
    before dropping: SELECT * EXCLUDE y ... ORDER BY y works)."""
    import polars_tpu as pl

    out_names = lf.collect_schema().names()
    items = q.body.items if isinstance(q.body, P.SelectStmt) else []
    by, desc, nl = [], [], []
    hidden: list[tuple[Any, str]] = []
    for i, o in enumerate(q.order_by):
        if isinstance(o.expr, P.SStar):
            for n in out_names:
                by.append(pl.col(n))
                desc.append(o.descending)
                nl.append(o.nulls_last if o.nulls_last is not None else False)
            continue
        if isinstance(o.expr, P.SLiteral) and isinstance(o.expr.value, int) and items:
            item = items[o.expr.value - 1]
            by.append(pl.col(item.alias or _default_name(item.expr)))
        elif (
            isinstance(q.body, P.SelectStmt)
            and not q.body.group_by
            and not q.body.distinct
            and not any(_has_agg(it.expr) for it in q.body.items)
            and not _referenced_columns(o.expr) <= set(out_names)
        ):
            name = f"__pl_sql_ord_{i}"
            hidden.append((o.expr, name))
            by.append(pl.col(name))
        else:
            by.append(_expr(o.expr))
        desc.append(o.descending)
        nl.append(o.nulls_last if o.nulls_last is not None else False)
    if hidden:
        import dataclasses

        stmt2 = dataclasses.replace(
            q.body,
            items=q.body.items + [P.SelectItem(e, n) for e, n in hidden],
        )
        lf = _build(stmt2, tables)
        return lf.sort(by, descending=desc, nulls_last=nl).select(
            [pl.col(n) for n in out_names]
        )
    return lf.sort(by, descending=desc, nulls_last=nl)


def _body(b: Any, tables: dict[str, Any]):
    import polars_tpu as pl

    if isinstance(b, P.SelectStmt):
        return _build(b, tables)
    if isinstance(b, P.Query):
        return _query(b, tables)
    if isinstance(b, P.TableRef):
        return _table(b, tables)
    if isinstance(b, P.ValuesTable):
        return _values(b, None)
    if isinstance(b, P.SetOp):
        return _set_op(b, tables)
    raise SQLInterfaceError(f"unsupported query body {type(b).__name__}")


def _values(v: P.ValuesTable, col_names: list[str] | None):
    import polars_tpu as pl

    width = len(v.rows[0]) if v.rows else 0
    names = col_names or [f"column_{i}" for i in range(width)]
    cols: dict = {n: [] for n in names}
    for row in v.rows:
        if len(row) != width:
            raise SQLInterfaceError("VALUES rows have differing widths")
        for n, cell in zip(names, row):
            if isinstance(cell, P.SLiteral) and cell.kind == "plain":
                cols[n].append(cell.value)
            elif isinstance(cell, P.SUnary) and cell.op == "-" and isinstance(
                cell.operand, P.SLiteral
            ):
                cols[n].append(-cell.operand.value)
            else:
                raise SQLInterfaceError("VALUES cells must be literals")
    return pl.DataFrame(cols).lazy()


def _set_op(b: P.SetOp, tables: dict[str, Any]):
    """UNION/EXCEPT/INTERSECT (reference: polars-sql context.rs
    process_union + SetOperator::{Except,Intersect} handling)."""
    import polars_tpu as pl

    lf = _body(b.left, tables)
    rf = _body(b.right, tables)
    lnames = lf.collect_schema().names()
    rnames = rf.collect_schema().names()
    if len(lnames) != len(rnames) and not b.by_name:
        raise SQLInterfaceError(
            f"set operation requires equal column counts ({len(lnames)} vs {len(rnames)})")
    if b.by_name:
        missing = [n for n in lnames if n not in rnames]
        if missing:
            raise SQLInterfaceError(f"{b.op.upper()} BY NAME: missing columns {missing}")
        rf = rf.select([pl.col(n) for n in lnames])
    elif lnames != rnames:
        rf = rf.rename(dict(zip(rnames, lnames)))
    if b.op == "union":
        out = pl.concat([lf, rf])
        if b.quantifier != "all":
            out = out.unique(maintain_order=True)
        return out
    if b.quantifier == "all":
        raise SQLInterfaceError(f"{b.op.upper()} ALL is not supported")
    on = [pl.col(n) for n in lnames]
    how = "semi" if b.op == "intersect" else "anti"
    return lf.unique(maintain_order=True).join(
        rf.unique(maintain_order=True), on=on, how=how, nulls_equal=True
    )


def _build(stmt: P.SelectStmt, tables: dict[str, Any]):
    import polars_tpu as pl

    _WINDOW_SCOPES.append(stmt.windows)
    _TABLE_SCOPES.append(tables)
    try:
        return _build_inner(stmt, tables)
    finally:
        _WINDOW_SCOPES.pop()
        _TABLE_SCOPES.pop()


def _build_inner(stmt: P.SelectStmt, tables: dict[str, Any]):
    import polars_tpu as pl

    if stmt.table is None:
        exprs = [_expr(it.expr, it.alias) for it in stmt.items]
        return pl.DataFrame({"__d": [0]}).lazy().select(exprs)

    lf = _table(stmt.table, tables)
    for j in stmt.joins:
        right = _table(j.table, tables)
        if j.kind == "cross":
            lf = lf.join(right, how="cross")
        elif j.using is not None:
            lf = lf.join(right, on=j.using, how=j.kind if j.kind != "full" else "full")
        else:
            lo, ro = _join_keys(j.on)
            lf = lf.join(right, left_on=lo, right_on=ro, how=j.kind)
    if stmt.where is not None:
        lf = _apply_where(lf, stmt.where, tables)

    has_aggs = any(_has_agg(it.expr) for it in stmt.items)
    if stmt.group_by:
        # keys: column refs, expressions, or positional GROUP BY 1,2...
        keys = []
        key_names: set[str] = set()
        for g in stmt.group_by:
            if isinstance(g, P.SLiteral) and isinstance(g.value, int):
                item = stmt.items[g.value - 1]
                keys.append(_expr(item.expr, item.alias))
                key_names.add(item.alias or _default_name(item.expr))
            else:
                keys.append(_expr(g))
                if isinstance(g, P.SColumn):
                    key_names.add(g.name)
        aggs = []
        for it in stmt.items:
            name = it.alias or _default_name(it.expr)
            if isinstance(it.expr, P.SColumn) and it.expr.name in key_names:
                continue
            if name in key_names:
                continue
            aggs.append(_expr(it.expr, it.alias))
        having_extra = []
        if stmt.having is not None:
            stmt_having, having_extra = _rewrite_having(stmt.having, stmt.items)
        lf = lf.group_by(keys).agg(aggs + [_expr(x, n) for x, n in having_extra])
        out_names = [it.alias or _default_name(it.expr) for it in stmt.items]
        if stmt.having is not None:
            lf = lf.filter(_expr(stmt_having))
        try:
            lf = lf.select([pl.col(n) for n in out_names])
        except Exception:
            pass
    elif has_aggs:
        lf = lf.select([_expr(it.expr, it.alias) for it in stmt.items])
    else:
        exprs = []
        for it in stmt.items:
            if isinstance(it.expr, P.SStar):
                exprs.append(pl.col("*"))
            else:
                exprs.append(_expr(it.expr, it.alias))
        lf = lf.select(exprs)
        if stmt.distinct:
            lf = lf.unique(maintain_order=True)
    return lf


def _split_conjuncts(e: Any) -> list:
    if isinstance(e, P.SBinary) and e.op == "and":
        return _split_conjuncts(e.left) + _split_conjuncts(e.right)
    return [e]


def _ref_scope(e: Any, inner_alias: str | None, inner_names: set, outer_names: set) -> str:
    """'inner' / 'outer' / 'mixed' / 'none' — which scope an expr's column
    refs resolve to (unprefixed names resolve inner-first, SQL scoping)."""
    scopes: set[str] = set()

    def walk(n):
        if isinstance(n, P.SColumn):
            if n.table is not None:
                scopes.add("inner" if n.table == inner_alias else "outer")
            elif n.name in inner_names:
                scopes.add("inner")
            elif n.name in outer_names:
                scopes.add("outer")
            else:
                scopes.add("outer")  # unknown -> be conservative
            return
        for c in _children(n):
            walk(c)

    walk(e)
    if not scopes:
        return "none"
    if len(scopes) > 1:
        return "mixed"
    return scopes.pop()


def _apply_where(lf, where: Any, tables: dict[str, Any]):
    """WHERE with `[NOT] EXISTS` / `[NOT] IN (subquery)` conjuncts lowered to
    semi/anti joins by decorrelating equi-correlation predicates (reference:
    polars-sql/src/subquery.rs rewrite_subquery_conjuncts)."""
    residual = []
    for conj in _split_conjuncts(where):
        node = conj
        neg = False
        while isinstance(node, P.SUnary) and node.op == "not" and isinstance(
            node.operand, (P.SExists, P.SInSubquery)
        ):
            neg = not neg
            node = node.operand
        new = None
        if isinstance(node, P.SExists):
            new = _rewrite_exists(lf, node.query, node.negated ^ neg, tables)
        elif isinstance(node, P.SInSubquery):
            new = _rewrite_in_subquery(lf, node, neg, tables)
        if new is not None:
            lf = new
            continue
        residual.append(conj)
    if residual:
        pred = _expr(residual[0])
        for c in residual[1:]:
            pred = pred & _expr(c)
        lf = lf.filter(pred)
    return lf


def _subquery_select(q) -> "P.SelectStmt | None":
    body = q.body if isinstance(q, P.Query) else q
    while isinstance(body, P.Query):
        body = body.body
    if isinstance(body, P.SelectStmt) and body.table is not None and not body.joins:
        return body
    return None


def _rewrite_exists(lf, query, negated: bool, tables: dict[str, Any]):
    import polars_tpu as pl

    sel = _subquery_select(query)
    if sel is None or sel.group_by:
        return None
    inner_ref = sel.table
    try:
        inner_lf = _table(inner_ref, tables)
    except Exception:
        return None
    inner_alias = inner_ref.alias or inner_ref.name
    inner_names = set(inner_lf.collect_schema().names())
    outer_names = set(lf.collect_schema().names())
    left_on, right_on, local = [], [], []
    conjs = _split_conjuncts(sel.where) if sel.where is not None else []
    for c in conjs:
        if isinstance(c, P.SBinary) and c.op == "=":
            ls = _ref_scope(c.left, inner_alias, inner_names, outer_names)
            rs = _ref_scope(c.right, inner_alias, inner_names, outer_names)
            if {ls, rs} == {"inner", "outer"}:
                inner_side = c.left if ls == "inner" else c.right
                outer_side = c.right if ls == "inner" else c.left
                right_on.append(_expr(inner_side))
                left_on.append(_expr(outer_side))
                continue
        sc = _ref_scope(c, inner_alias, inner_names, outer_names)
        if sc in ("inner", "none"):
            local.append(c)
            continue
        return None  # outer-referencing non-equi correlation: filter path
    for c in local:
        inner_lf = inner_lf.filter(_expr(c))
    if not left_on:
        # uncorrelated EXISTS: constant truth value over the whole frame
        nonempty = inner_lf.limit(1).collect().height > 0
        return lf if (nonempty != negated) else lf.head(0)
    return lf.join(
        inner_lf, left_on=left_on, right_on=right_on,
        how="anti" if negated else "semi",
    )


def _rewrite_in_subquery(lf, node: "P.SInSubquery", extra_neg: bool, tables: dict[str, Any]):
    negated = node.negated ^ extra_neg
    try:
        inner_lf = _query(node.query, tables)
        names = inner_lf.collect_schema().names()
    except Exception:
        return None
    if len(names) != 1:
        raise SQLInterfaceError(
            f"IN (subquery) must select exactly one column, got {len(names)}"
        )
    key = _expr(node.operand)
    import polars_tpu as pl

    return lf.join(
        inner_lf.unique(), left_on=[key], right_on=[pl.col(names[0])],
        how="anti" if negated else "semi",
    )


def _rewrite_having(having: Any, items: list) -> tuple[Any, list]:
    """Replace aggregate subtrees in HAVING with references to SELECT outputs
    (adding hidden agg columns for aggs not already selected)."""
    extra: list = []
    counter = [0]

    def walk(e: Any):
        if isinstance(e, P.SFunc) and e.name in _AGG_FUNCS:
            for it in items:
                if it.expr == e:
                    return P.SColumn(it.alias or _default_name(it.expr))
            name = f"__having_{counter[0]}"
            counter[0] += 1
            extra.append((e, name))
            return P.SColumn(name)
        if isinstance(e, P.SBinary):
            return P.SBinary(walk(e.left), e.op, walk(e.right))
        if isinstance(e, P.SUnary):
            return P.SUnary(e.op, walk(e.operand))
        return e

    return walk(having), extra


_TABLE_FUNCTIONS = {
    # SQL FROM-clause table functions -> scan_* (reference:
    # polars-sql/src/table_functions.rs:56-62)
    "read_csv": "scan_csv",
    "read_parquet": "scan_parquet",
    "read_ipc": "scan_ipc",
    "read_json": "scan_ndjson",
    "read_ndjson": "scan_ndjson",
}


def _table(ref: P.TableRef, tables: dict[str, Any]):
    import polars_tpu as pl

    if ref.subquery is not None:
        if isinstance(ref.subquery, P.ValuesTable):
            return _values(ref.subquery, ref.col_aliases)
        lf = _query(ref.subquery, tables)
        if ref.col_aliases:
            lf = lf.rename(dict(zip(lf.collect_schema().names(), ref.col_aliases)))
        return lf
    if ref.function is not None:
        fname, fargs = ref.function
        if fname not in _TABLE_FUNCTIONS:
            raise SQLInterfaceError(f"unknown table function {fname!r}")
        paths = [a.value for a in fargs if isinstance(a, P.SLiteral)]
        if len(paths) != 1 or not isinstance(paths[0], str):
            raise SQLInterfaceError(f"{fname} expects a single path argument")
        lf = getattr(pl, _TABLE_FUNCTIONS[fname])(paths[0])
        if ref.col_aliases:
            lf = lf.rename(dict(zip(lf.collect_schema().names(), ref.col_aliases)))
        return lf
    try:
        lf = tables[ref.name]
    except KeyError:
        raise SQLInterfaceError(
            f"relation {ref.name!r} not found; registered: {sorted(tables)}"
        ) from None
    lf = _as_lazy(lf)
    if ref.col_aliases:
        lf = lf.rename(dict(zip(lf.collect_schema().names(), ref.col_aliases)))
    return lf


def _join_keys(on: Any):
    """Decompose an ON conjunction of equalities into left/right key lists."""
    import polars_tpu as pl

    conj: list = []

    def flat(e):
        if isinstance(e, P.SBinary) and e.op == "and":
            flat(e.left)
            flat(e.right)
        else:
            conj.append(e)

    flat(on)
    lo, ro = [], []
    for c in conj:
        if not (isinstance(c, P.SBinary) and c.op == "="):
            raise SQLInterfaceError("only equi-join ON clauses are supported")
        a, b = c.left, c.right
        if not (isinstance(a, P.SColumn) and isinstance(b, P.SColumn)):
            raise SQLInterfaceError("join keys must be column references")
        lo.append(pl.col(a.name))
        ro.append(pl.col(b.name))
    return lo, ro


def _has_agg(e: Any) -> bool:
    if isinstance(e, P.SWindow):
        return False  # window functions are row-level, not frame aggregations
    if isinstance(e, P.SFunc) and e.name in _AGG_FUNCS:
        return True
    for child in _children(e):
        if _has_agg(child):
            return True
    return False


def _children(e: Any) -> list:
    if isinstance(e, P.SBinary):
        return [e.left, e.right]
    if isinstance(e, P.SUnary):
        return [e.operand]
    if isinstance(e, P.SFunc):
        return list(e.args)
    if isinstance(e, P.SCase):
        out = [c for b in e.branches for c in b]
        if e.default is not None:
            out.append(e.default)
        return out
    if isinstance(e, (P.SCast, P.SIn, P.SBetween, P.SLike, P.SIsNull)):
        return [e.operand]
    return []


def _default_name(e: Any) -> str:
    if isinstance(e, P.SWindow):
        return _default_name(e.func)
    if isinstance(e, P.SColumn):
        return e.name
    if isinstance(e, P.SFunc):
        for a in e.args:
            n = _default_name(a)
            if n != "literal":
                return n
        return e.name
    if isinstance(e, P.SCast):
        return _default_name(e.operand)
    if isinstance(e, P.SBinary):
        n = _default_name(e.left)
        return n if n != "literal" else _default_name(e.right)
    return "literal"


_AGG_FUNCS = {
    "sum", "avg", "mean", "min", "max", "count", "median", "stddev", "stdev",
    "stddev_samp", "variance", "var_samp", "first", "last", "approx_count_distinct",
    "quantile_cont", "quantile_disc",
}


def _expr(e: Any, alias: str | None = None):
    import polars_tpu as pl

    out = _expr_inner(e)
    if alias:
        out = out.alias(alias)
    return out


def _expr_inner(e: Any):
    import polars_tpu as pl

    if isinstance(e, P.SColumn):
        return pl.col(e.name)
    if isinstance(e, P.SScalarSubquery):
        tables = _TABLE_SCOPES[-1] if _TABLE_SCOPES else {}
        out = _query(e.query, tables).collect()
        if out.width != 1:
            raise SQLInterfaceError(
                f"scalar subquery must select one column, got {out.width}"
            )
        if out.height > 1:
            raise SQLInterfaceError("scalar subquery returned more than one row")
        return pl.lit(out.rows()[0][0] if out.height == 1 else None)
    if isinstance(e, P.SStar):
        return pl.col("*")
    if isinstance(e, P.SLiteral):
        if e.kind == "date":
            return pl.lit(dtm.date.fromisoformat(e.value))
        if e.kind == "timestamp":
            return pl.lit(dtm.datetime.fromisoformat(e.value))
        if e.kind == "interval":
            return _interval(e.value)
        return pl.lit(e.value)
    if isinstance(e, P.SBinary):
        a, b = _expr_inner(e.left), _expr_inner(e.right)
        op = e.op
        if op == "=":
            return a == b
        if op in ("<>", "!="):
            return a != b
        if op == "<":
            return a < b
        if op == "<=":
            return a <= b
        if op == ">":
            return a > b
        if op == ">=":
            return a >= b
        if op == "+":
            return a + b
        if op == "-":
            return a - b
        if op == "*":
            return a * b
        if op == "/":
            return a / b
        if op == "//":
            # sqlparser DuckIntegerDivide: floor_div cast to Int64
            # (polars-sql/src/sql_expr.rs:661)
            from polars_tpu import datatypes as _dt

            return (a // b).cast(_dt.Int64())
        if op == "%":
            return a % b
        if op == "and":
            return a & b
        if op == "or":
            return a | b
        if op == "||":
            return pl.concat_str([a, b])
        raise SQLSyntaxError(f"operator {op!r}")
    if isinstance(e, P.SUnary):
        if e.op == "not":
            return ~_expr_inner(e.operand)
        if e.op == "-":
            return -_expr_inner(e.operand)
    if isinstance(e, P.SIsNull):
        x = _expr_inner(e.operand)
        return x.is_not_null() if e.negated else x.is_null()
    if isinstance(e, P.SIn):
        x = _expr_inner(e.operand)
        vals = [v.value for v in e.items if isinstance(v, P.SLiteral)]
        out = x.is_in(vals)
        return ~out if e.negated else out
    if isinstance(e, P.SBetween):
        x = _expr_inner(e.operand)
        out = x.is_between(_expr_inner(e.low), _expr_inner(e.high))
        return ~out if e.negated else out
    if isinstance(e, P.SLike):
        x = _expr_inner(e.operand)
        import re as _re

        pat = "^" + _re.escape(e.pattern).replace("%", ".*").replace("_", ".") + "$"
        pat = pat.replace("\\%", ".*").replace("\\_", ".")  # escaped by re.escape
        if e.case_insensitive:
            pat = "(?i)" + pat
        out = x.str.contains(pat)
        return ~out if e.negated else out
    if isinstance(e, P.SCase):
        out = None
        for cond, res in e.branches:
            if out is None:
                out = pl.when(_expr_inner(cond)).then(_expr_inner(res))
            else:
                out = out.when(_expr_inner(cond)).then(_expr_inner(res))
        return out.otherwise(_expr_inner(e.default) if e.default is not None else None)
    if isinstance(e, P.SCast):
        tname = e.type_name.lower()
        if tname not in _TYPE_MAP:
            raise SQLSyntaxError(f"unknown type {e.type_name!r}")
        return _expr_inner(e.operand).cast(_TYPE_MAP[tname]())
    if isinstance(e, P.SWindow):
        return _window(e)
    if isinstance(e, P.SFunc):
        return _func(e)
    raise SQLSyntaxError(f"cannot translate {type(e).__name__}")


def _window(e: P.SWindow):
    """OVER (...) lowering (reference: polars-sql functions.rs
    apply_window_spec:2400-2436 + the cumulative mapping at 1912-1922:
    agg + ORDER BY -> cum_* over(order_by=...))."""
    import polars_tpu as pl

    parts, order = e.partition_by, e.order_by
    if e.name is not None:
        scope = _WINDOW_SCOPES[-1] if _WINDOW_SCOPES else {}
        if e.name not in scope:
            raise SQLInterfaceError(f"window {e.name!r} is not defined")
        parts, order = scope[e.name]
    part_exprs = [_expr_inner(p) for p in parts]
    order_exprs = [_expr_inner(o.expr) for o in order]
    desc = [o.descending for o in order]
    # our over() needs at least one partition key; a constant puts every row
    # in one partition (ORDER BY-only windows)
    over_parts = part_exprs or [pl.lit(1)]

    def spec(x, *, force_over: bool = False):
        if order_exprs:
            return x.over(over_parts, order_by=order_exprs, descending=desc)
        if part_exprs or force_over:
            return x.over(over_parts)
        return x

    f = e.func
    name = f.name
    if name in ("row_number", "rank", "dense_rank", "ntile"):
        if not order_exprs:
            raise SQLInterfaceError(f"{name.upper()} requires ORDER BY in its window")
        key = order_exprs[0] if len(order_exprs) == 1 else pl.struct(order_exprs)
        if name == "row_number":
            rn = order_exprs[0].is_not_null().cum_count()
            return rn.over(over_parts, order_by=order_exprs, descending=desc)
        if name == "ntile":
            n_tiles = int(f.args[0].value)
            rn = order_exprs[0].is_not_null().cum_count().over(
                over_parts, order_by=order_exprs, descending=desc)
            cnt = order_exprs[0].count().over(over_parts)
            return ((rn - 1) * n_tiles // cnt + 1).cast(dt.Int64())
        method = "min" if name == "rank" else "dense"
        r = key.rank(method, descending=all(desc) and bool(desc))
        return r.over(over_parts) if part_exprs else r
    if name in ("lag", "lead"):
        if not order_exprs:
            raise SQLInterfaceError(f"{name.upper()} requires ORDER BY in its window")
        x = _expr_inner(f.args[0])
        n = int(f.args[1].value) if len(f.args) > 1 else 1
        if n <= 0:
            raise SQLInterfaceError(f"{name.upper()} offset must be positive")
        if name == "lead":
            n = -n
        fill = None
        if len(f.args) > 2:
            fill = _expr_inner(f.args[2])
        return x.shift(n, fill_value=fill).over(
            over_parts, order_by=order_exprs, descending=desc)
    if name == "first_value":
        x = _expr_inner(f.args[0])
        return spec(x.first(), force_over=True) if not order_exprs else x.first().over(
            over_parts, order_by=order_exprs, descending=desc)
    if name == "last_value":
        # default frame ends at the current row -> the current row's value
        if order_exprs:
            return _expr_inner(f.args[0])
        return _expr_inner(f.args[0]).last().over(over_parts)
    if name == "count":
        star = not f.args or isinstance(f.args[0], P.SStar)
        if order_exprs:
            base = order_exprs[0].is_not_null() if star else _expr_inner(f.args[0]).is_not_null()
            return base.cast(dt.UInt32()).cum_sum().over(
                over_parts, order_by=order_exprs, descending=desc)
        if star:
            # COUNT(*): count rows in the partition (len, not non-null count)
            return spec(pl.len().cast(dt.UInt32()), force_over=True)
        return spec(_expr_inner(f.args[0]).count(), force_over=True)
    _CUM = {"sum": "cum_sum", "min": "cum_min", "max": "cum_max", "total": "cum_sum"}
    if order_exprs:
        if name not in _CUM:
            raise SQLInterfaceError(
                f"{name.upper()} OVER (ORDER BY ...) is not supported; "
                "only SUM/MIN/MAX/COUNT map to cumulative windows")
        x = _expr_inner(f.args[0])
        return getattr(x, _CUM[name])().over(
            over_parts, order_by=order_exprs, descending=desc)
    # any other aggregate broadcasts over the partition
    return spec(_func(f), force_over=True)


def _interval(text: str):
    import polars_tpu as pl

    parts = text.strip().split()
    if len(parts) != 2:
        raise SQLSyntaxError(f"unsupported interval {text!r}")
    n = int(parts[0])
    unit = parts[1].lower().rstrip("s")
    kw = {
        "day": "days", "hour": "hours", "minute": "minutes", "second": "seconds",
        "week": "weeks", "millisecond": "milliseconds", "microsecond": "microseconds",
    }
    if unit in kw:
        return pl.duration(**{kw[unit]: n})
    raise SQLSyntaxError(f"unsupported interval unit {unit!r}")


def _func(e: P.SFunc):
    import polars_tpu as pl

    name = e.name
    if name == "columns":
        # COLUMNS(regex) / COLUMNS(*) column selector
        # (reference: polars-sql functions.rs Columns)
        import polars_tpu.selectors as cs

        if not e.args or isinstance(e.args[0], P.SStar):
            return cs.all()
        arg = e.args[0]
        if isinstance(arg, P.SLiteral) and isinstance(arg.value, str):
            return cs.matches(arg.value)
        from polars_tpu.errors import SQLSyntaxError

        raise SQLSyntaxError("COLUMNS expects a regex string literal or *")
    args = [_expr_inner(a) for a in e.args if not isinstance(a, P.SStar)]
    a0 = args[0] if args else None

    if name == "count":
        if not args or isinstance(e.args[0], P.SStar):
            return pl.len().cast(dt.UInt32())
        if e.distinct:
            # SQL COUNT(DISTINCT x) excludes NULLs (n_unique counts null)
            return a0.drop_nulls().n_unique()
        return a0.count()
    if name in ("sum",):
        return a0.sum()
    if name in ("avg", "mean"):
        return a0.mean()
    if name == "min":
        return a0.min()
    if name == "max":
        return a0.max()
    if name == "median":
        return a0.median()
    if name in ("stddev", "stdev", "stddev_samp"):
        return a0.std()
    if name in ("variance", "var_samp"):
        return a0.var()
    if name == "first":
        return a0.first()
    if name == "last":
        return a0.last()
    if name == "approx_count_distinct":
        return a0.n_unique()
    if name == "abs":
        return a0.abs()
    if name == "round":
        dec = e.args[1].value if len(e.args) > 1 else 0
        return a0.round(dec)
    if name == "floor":
        return a0.floor()
    if name in ("ceil", "ceiling"):
        return a0.ceil()
    if name == "sqrt":
        return a0.sqrt()
    if name in ("ln",):
        return a0.log()
    if name == "log":
        return a0.log10() if len(args) == 1 else args[1].log(e.args[0].value)
    if name == "exp":
        return a0.exp()
    if name in ("pow", "power"):
        return a0 ** args[1]
    if name == "mod":
        return a0 % args[1]
    if name in ("upper", "ucase"):
        return a0.str.to_uppercase()
    if name in ("lower", "lcase"):
        return a0.str.to_lowercase()
    if name in ("length", "char_length", "character_length"):
        return a0.str.len_chars()
    if name in ("substr", "substring"):
        start = e.args[1].value - 1
        length = e.args[2].value if len(e.args) > 2 else None
        return a0.str.slice(start, length)
    if name == "trim":
        return a0.str.strip_chars()
    if name == "ltrim":
        return a0.str.strip_chars_start()
    if name == "rtrim":
        return a0.str.strip_chars_end()
    if name == "replace":
        return a0.str.replace_all(e.args[1].value, e.args[2].value, literal=True)
    if name == "reverse":
        return a0.str.reverse()
    if name == "left":
        return a0.str.slice(0, e.args[1].value)
    if name == "right":
        return a0.str.tail(e.args[1].value)
    if name == "concat":
        return pl.concat_str(args)
    if name == "coalesce":
        return pl.coalesce(*args)
    if name == "nullif":
        return pl.when(a0 == args[1]).then(None).otherwise(a0)
    if name == "ifnull":
        return a0.fill_null(args[1] if not isinstance(e.args[1], P.SLiteral) else pl.lit(e.args[1].value))
    if name == "greatest":
        return pl.max_horizontal(*args)
    if name == "least":
        return pl.min_horizontal(*args)
    if name == "year":
        return a0.dt.year()
    if name == "month":
        return a0.dt.month()
    if name == "day":
        return a0.dt.day()
    if name == "hour":
        return a0.dt.hour()
    if name == "minute":
        return a0.dt.minute()
    if name == "second":
        return a0.dt.second()
    if name in ("dayofweek", "weekday"):
        return a0.dt.weekday()
    if name == "week":
        return a0.dt.week()
    if name == "quarter":
        return a0.dt.quarter()
    if name == "date_trunc":
        every = {"year": "1y", "quarter": "1q", "month": "1mo", "week": "1w",
                 "day": "1d", "hour": "1h", "minute": "1m", "second": "1s"}[e.args[0].value.lower()]
        return args[1].dt.truncate(every)
    if name == "date_part" or name == "extract":
        part = e.args[0].value.lower()
        fn = {"year": "year", "month": "month", "day": "day", "hour": "hour",
              "minute": "minute", "second": "second", "week": "week",
              "quarter": "quarter"}[part]
        return getattr(args[1].dt, fn)()
    if name == "strftime" or name == "to_char":
        return a0.dt.to_string(e.args[1].value)
    if name == "if":
        return pl.when(a0).then(args[1]).otherwise(args[2])
    if name in ("sin", "cos", "tan", "asin", "acos", "atan", "sinh", "cosh",
                "tanh", "cot", "degrees", "radians", "cbrt", "sign"):
        meth = {"asin": "arcsin", "acos": "arccos", "atan": "arctan"}.get(name, name)
        return getattr(a0, meth)()
    if name == "atan2":
        return a0.arctan2(args[1]) if hasattr(a0, "arctan2") else (a0 / args[1]).arctan()
    if name == "log2":
        return a0.log(2)
    if name == "log10":
        return a0.log10()
    if name == "pi":
        import math

        return pl.lit(math.pi)
    if name == "trunc":
        return a0.cast(dt.Int64()).cast(dt.Float64()) if not args[1:] else a0
    if name == "even":
        return (a0 % 2) == 0
    if name == "odd":
        return (a0 % 2) == 1
    if name == "initcap":
        return a0.str.to_titlecase()
    if name == "repeat":
        k = e.args[1].value
        return a0.str.pad_end(0) if False else pl.concat_str([a0] * int(k))
    if name in ("lpad", "rpad"):
        width = int(e.args[1].value)
        fill = e.args[2].value if len(e.args) > 2 else " "
        return (a0.str.pad_start(width, fill) if name == "lpad"
                else a0.str.pad_end(width, fill))
    if name == "split_part":
        sep = e.args[1].value
        idx = int(e.args[2].value) - 1
        # SQL split_part: a missing part is NULL, not an error
        return a0.str.split(sep).list.get(idx, null_on_oob=True)
    if name in ("strpos", "position", "instr"):
        return a0.str.find(e.args[1].value, literal=True) + 1
    if name == "starts_with":
        return a0.str.starts_with(e.args[1].value)
    if name == "ends_with":
        return a0.str.ends_with(e.args[1].value)
    if name in ("regexp_like", "regexp_matches"):
        return a0.str.contains(e.args[1].value)
    if name == "ascii":
        return a0.str.slice(0, 1).str.to_decimal() if False else a0.str.head(1).str.to_uppercase().str.len_bytes() * 0
    if name in ("bit_length",):
        return a0.str.len_bytes() * 8
    if name in ("octet_length",):
        return a0.str.len_bytes()
    if name in ("now", "current_timestamp"):
        return pl.lit(dtm.datetime.now())
    if name == "current_date":
        return pl.lit(dtm.date.today())
    if name in ("datediff", "date_diff"):
        unit = e.args[0].value if isinstance(e.args[0], P.SLiteral) else "day"
        a, b = _expr_inner(e.args[1]), _expr_inner(e.args[2])
        delta = b - a
        return getattr(delta.dt, f"total_{'days' if unit in ('day', 'd') else unit + 's'}")()
    if name in ("string_agg", "group_concat", "listagg"):
        sep = e.args[1].value if len(e.args) > 1 else ","
        return a0.str.concat(sep)
    if name == "bool_and":
        return a0.all()
    if name == "bool_or":
        return a0.any()
    if name == "corr":
        import polars_tpu as _pl

        return _pl.corr(a0, args[1])
    if name in ("covar", "covar_samp"):
        import polars_tpu as _pl

        return _pl.cov(a0, args[1])
    if name in ("nvl",):
        return a0.fill_null(args[1])
    if name in ("iif",):
        return pl.when(a0).then(args[1]).otherwise(args[2])
    if name == "hash":
        return a0.hash()
    if name in ("array_length", "array_size", "cardinality"):
        return a0.list.len()
    if name == "array_contains":
        return a0.list.contains(e.args[1].value)
    if name in ("array_agg",):
        return a0.implode()
    if name == "unnest":
        return a0.explode()
    # ---- degree-argument trig (reference: functions.rs *d variants) --------
    if name in ("sind", "cosd", "tand", "cotd"):
        return getattr(a0.radians(), name[:-1])()
    if name in ("asind", "acosd", "atand"):
        return getattr(a0, "arc" + name[1:-1])().degrees()
    if name == "atan2d":
        base = a0.arctan2(args[1]) if hasattr(a0, "arctan2") else (a0 / args[1]).arctan()
        return base.degrees()
    # ---- bitwise ------------------------------------------------------------
    if name in ("bit_and", "bitand"):
        return a0 & args[1]
    if name in ("bit_or", "bitor"):
        return a0 | args[1]
    if name in ("bit_xor", "bitxor", "xor"):
        return a0.xor(args[1])
    if name in ("bit_count", "bitcount"):
        return a0.bitwise_count_ones()
    if name in ("bit_not", "bitnot"):
        return ~a0
    if name == "normalize":
        # NORMALIZE(s [, NFC|NFD|NFKC|NFKD]) (reference: functions.rs:1017)
        form = "NFC"
        if len(e.args) > 1:
            arg = e.args[1]
            form = (arg.value if isinstance(arg, P.SLiteral) else getattr(arg, "name", "NFC"))
            form = str(form).upper()
        return a0.str.normalize(form)
    if name == "div":
        return a0.floordiv(args[1]).cast(dt.Int64())
    if name == "concat_ws":
        sep = e.args[0].value if isinstance(e.args[0], P.SLiteral) else ""
        return pl.concat_str(args[1:], separator=sep)
    if name in ("covar_pop",):
        import polars_tpu as _pl

        return _pl.cov(a0, args[1], ddof=0)
    if name == "log1p":
        return a0.log1p()
    if name == "total":
        return a0.sum()
    if name == "truncate":
        return a0.cast(dt.Int64()).cast(dt.Float64())
    if name in ("quantile_cont", "quantile_disc"):
        q = e.args[1].value if len(e.args) > 1 else 0.5
        interp = "linear" if name == "quantile_cont" else "nearest"
        return a0.quantile(q, interpolation=interp)
    if name == "strptime":
        fmt = e.args[1].value if len(e.args) > 1 else None
        return a0.str.to_datetime(fmt)
    if name in ("date", "to_date"):
        if len(e.args) > 1:
            return a0.str.to_date(e.args[1].value)
        return a0.str.to_date()
    if name == "string_to_array":
        return a0.str.split(e.args[1].value if len(e.args) > 1 else ",")
    # ---- array long tail ----------------------------------------------------
    if name == "array_get":
        # SQL is 1-indexed; out-of-bounds -> null
        idx = e.args[1].value
        idx = idx - 1 if isinstance(idx, int) and idx > 0 else idx
        return a0.list.get(idx, null_on_oob=True)
    if name in ("array_max", "array_upper"):
        return a0.list.max()
    if name in ("array_min", "array_lower"):
        return a0.list.min()
    if name == "array_mean":
        return a0.list.mean()
    if name == "array_sum":
        return a0.list.sum()
    if name == "array_reverse":
        return a0.list.reverse()
    if name == "array_unique":
        return a0.list.unique(maintain_order=True)
    if name == "array_to_string":
        sep = e.args[1].value if len(e.args) > 1 else ","
        return a0.list.join(sep)
    raise SQLSyntaxError(f"unknown SQL function {name!r}")
