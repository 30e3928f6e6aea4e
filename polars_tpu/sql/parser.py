"""Hand-rolled SQL tokenizer + recursive-descent parser.

The reference rides sqlparser-rs (polars-sql/src/context.rs); no SQL parser
ships in this environment, so this module implements the SELECT grammar subset
polars-sql covers: projections with aliases, FROM with joins, WHERE, GROUP BY,
HAVING, ORDER BY, LIMIT/OFFSET, UNION [ALL], CASE, CAST, IN, BETWEEN, LIKE,
IS [NOT] NULL, scalar/aggregate functions.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

from polars_tpu.errors import SQLSyntaxError

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<num>\d+\.\d*([eE][+-]?\d+)?|\.\d+([eE][+-]?\d+)?|\d+([eE][+-]?\d+)?)
  | (?P<str>'(?:[^']|'')*')
  | (?P<qid>"[^"]*")
  | (?P<id>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<op><>|!=|>=|<=|\|\||::|//|[-+*/%(),.<>=])
    """,
    re.VERBOSE,
)

KEYWORDS = {
    "select", "from", "where", "group", "by", "having", "order", "limit",
    "offset", "as", "and", "or", "not", "in", "between", "like", "ilike", "is",
    "null", "true", "false", "case", "when", "then", "else", "end", "cast",
    "join", "inner", "left", "right", "full", "outer", "cross", "on", "using",
    "union", "all", "distinct", "asc", "desc", "nulls", "first", "last",
    "interval", "date", "timestamp", "time", "exists", "any", "semi", "anti",
    "except", "intersect", "with", "over", "window", "partition", "create",
    "table", "drop", "show", "tables", "truncate", "delete", "values",
    "explain",
}


@dataclass
class Tok:
    kind: str  # num | str | id | kw | op | qid
    value: str


def tokenize(sql: str) -> list[Tok]:
    out: list[Tok] = []
    pos = 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if not m:
            raise SQLSyntaxError(f"unexpected character {sql[pos]!r} at {pos}")
        pos = m.end()
        if m.lastgroup == "ws":
            continue
        kind = m.lastgroup
        val = m.group()
        if kind == "id" and val.lower() in KEYWORDS:
            out.append(Tok("kw", val.lower()))
        elif kind == "qid":
            out.append(Tok("id", val[1:-1]))
        else:
            out.append(Tok(kind, val))
    return out


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass
class SColumn:
    name: str
    table: str | None = None


@dataclass
class SLiteral:
    value: Any
    kind: str = "plain"  # plain | date | timestamp | interval


@dataclass
class SBinary:
    left: Any
    op: str
    right: Any


@dataclass
class SUnary:
    op: str
    operand: Any


@dataclass
class SFunc:
    name: str
    args: list
    distinct: bool = False


@dataclass
class SCase:
    branches: list  # (cond, result)
    default: Any = None


@dataclass
class SCast:
    operand: Any
    type_name: str


@dataclass
class SIn:
    operand: Any
    items: list
    negated: bool = False


@dataclass
class SExists:
    """[NOT] EXISTS (subquery) — rewritten to a semi/anti join when the
    subquery's correlation predicates are equi (reference:
    polars-sql/src/subquery.rs)."""

    query: Any
    negated: bool = False


@dataclass
class SInSubquery:
    operand: Any
    query: Any
    negated: bool = False


@dataclass
class SScalarSubquery:
    """(SELECT ...) used as a scalar expression — must yield one column and
    at most one row (0 rows -> NULL)."""

    query: Any


@dataclass
class SBetween:
    operand: Any
    low: Any
    high: Any
    negated: bool = False


@dataclass
class SLike:
    operand: Any
    pattern: str
    negated: bool = False
    case_insensitive: bool = False


@dataclass
class SIsNull:
    operand: Any
    negated: bool = False


@dataclass
class SStar:
    table: str | None = None


@dataclass
class SWindow:
    """fn(...) OVER ([w] [PARTITION BY ...] [ORDER BY ...]) (reference:
    polars-sql sql_expr.rs WindowSpec handling)."""

    func: Any
    partition_by: list = field(default_factory=list)
    order_by: list = field(default_factory=list)  # list[OrderItem]
    name: str | None = None  # named WINDOW reference


@dataclass
class SelectItem:
    expr: Any
    alias: str | None = None


@dataclass
class TableRef:
    name: str
    alias: str | None = None
    subquery: Any = None  # a Query
    function: tuple[str, list] | None = None  # (read_csv, [literal args])
    col_aliases: list[str] | None = None  # AS t(c1, c2)


@dataclass
class JoinClause:
    table: TableRef
    kind: str  # inner | left | right | full | cross | semi | anti
    on: Any = None
    using: list[str] | None = None


@dataclass
class OrderItem:
    expr: Any
    descending: bool = False
    nulls_last: bool | None = None


@dataclass
class SelectStmt:
    items: list[SelectItem] = field(default_factory=list)
    distinct: bool = False
    table: TableRef | None = None
    joins: list[JoinClause] = field(default_factory=list)
    where: Any = None
    group_by: list = field(default_factory=list)
    having: Any = None
    windows: dict = field(default_factory=dict)  # WINDOW w AS (...): name -> (partition, order)


@dataclass
class SetOp:
    """UNION/EXCEPT/INTERSECT [ALL|DISTINCT] [BY NAME] (reference:
    polars-sql context.rs process_union/except/intersect)."""

    op: str  # union | except | intersect
    quantifier: str  # all | distinct
    by_name: bool
    left: Any
    right: Any


@dataclass
class ValuesTable:
    rows: list = field(default_factory=list)  # list[list[expr]]


@dataclass
class Query:
    body: Any  # SelectStmt | SetOp | TableRef | ValuesTable | Query
    order_by: list[OrderItem] = field(default_factory=list)
    limit: int | None = None
    offset: int | None = None
    ctes: list = field(default_factory=list)  # [(name, col_aliases, Query)]


@dataclass
class CreateTableStmt:
    name: str
    query: Query | None = None
    columns: list | None = None  # [(name, type_name)]
    like: str | None = None
    if_not_exists: bool = False


@dataclass
class DropTableStmt:
    names: list[str] = field(default_factory=list)
    if_exists: bool = False


@dataclass
class ShowTablesStmt:
    pass


@dataclass
class TruncateStmt:
    name: str = ""


@dataclass
class DeleteStmt:
    name: str = ""
    where: Any = None


@dataclass
class ExplainStmt:
    query: Query | None = None


class Parser:
    def __init__(self, tokens: list[Tok]) -> None:
        self.toks = tokens
        self.i = 0

    # -- token helpers -----------------------------------------------------

    def peek(self, offset: int = 0) -> Tok | None:
        j = self.i + offset
        return self.toks[j] if j < len(self.toks) else None

    def next(self) -> Tok:
        t = self.peek()
        if t is None:
            raise SQLSyntaxError("unexpected end of input")
        self.i += 1
        return t

    def accept_kw(self, *words: str) -> bool:
        t = self.peek()
        if t and t.kind == "kw" and t.value in words:
            self.i += 1
            return True
        return False

    def expect_kw(self, word: str) -> None:
        if not self.accept_kw(word):
            t = self.peek()
            raise SQLSyntaxError(f"expected {word.upper()}, got {t.value if t else 'EOF'!r}")

    def accept_op(self, *ops: str) -> str | None:
        t = self.peek()
        if t and t.kind == "op" and t.value in ops:
            self.i += 1
            return t.value
        return None

    def expect_op(self, op: str) -> None:
        if not self.accept_op(op):
            t = self.peek()
            raise SQLSyntaxError(f"expected {op!r}, got {t.value if t else 'EOF'!r}")

    def accept_soft(self, word: str) -> bool:
        """Accept a soft keyword: matches a kw or a bare identifier."""
        t = self.peek()
        if t and t.kind in ("kw", "id") and t.value.lower() == word:
            self.i += 1
            return True
        return False

    def expect_soft(self, word: str) -> None:
        if not self.accept_soft(word):
            t = self.peek()
            raise SQLSyntaxError(f"expected {word.upper()}, got {t.value if t else 'EOF'!r}")

    # -- entry -------------------------------------------------------------

    def parse_statement(self) -> Any:
        t = self.peek()
        if t and t.kind == "kw" and t.value == "create":
            stmt: Any = self.parse_create()
        elif t and t.kind == "kw" and t.value == "drop":
            stmt = self.parse_drop()
        elif t and t.kind == "kw" and t.value == "show":
            self.i += 1
            self.expect_kw("tables")
            stmt = ShowTablesStmt()
        elif t and t.kind == "kw" and t.value == "truncate":
            self.i += 1
            self.accept_kw("table")
            stmt = TruncateStmt(self.next().value)
        elif t and t.kind == "kw" and t.value == "delete":
            self.i += 1
            self.expect_kw("from")
            name = self.next().value
            where = self.parse_expr() if self.accept_kw("where") else None
            stmt = DeleteStmt(name, where)
        elif t and t.kind == "kw" and t.value == "explain":
            self.i += 1
            stmt = ExplainStmt(self.parse_query())
        else:
            stmt = self.parse_query()
        if self.peek() is not None:
            raise SQLSyntaxError(f"trailing tokens starting at {self.peek().value!r}")
        return stmt

    def parse_create(self) -> CreateTableStmt:
        self.expect_kw("create")
        self.expect_kw("table")
        ine = False
        if self.accept_soft("if"):
            self.expect_kw("not")
            self.expect_kw("exists")
            ine = True
        name = self.next().value
        # CREATE TABLE t (col TYPE, ...)
        if self.peek() and self.peek().kind == "op" and self.peek().value == "(":
            self.i += 1
            cols: list = []
            while True:
                cname = self.next().value
                cols.append((cname, self.parse_type_name()))
                if not self.accept_op(","):
                    break
            self.expect_op(")")
            return CreateTableStmt(name, columns=cols, if_not_exists=ine)
        # CREATE TABLE t LIKE other
        if self.accept_kw("like"):
            return CreateTableStmt(name, like=self.next().value, if_not_exists=ine)
        # CREATE TABLE t AS <query>
        self.expect_kw("as")
        return CreateTableStmt(name, query=self.parse_query(), if_not_exists=ine)

    def parse_type_name(self) -> str:
        t = self.next()
        tname = t.value
        # ARRAY<DOUBLE> / parametrized VARCHAR(10) / DECIMAL(10, 2)
        if self.accept_op("<"):
            tname += "<" + self.parse_type_name()
            self.expect_op(">")
            tname += ">"
        elif self.peek() and self.peek().kind == "op" and self.peek().value == "(":
            self.i += 1
            parts = []
            while not self.accept_op(")"):
                tok = self.next()
                if tok.value != ",":
                    parts.append(tok.value)
            tname += "(" + ",".join(parts) + ")"
        else:
            while self.peek() and self.peek().kind == "id":
                tname += " " + self.next().value
        return tname

    def parse_drop(self) -> DropTableStmt:
        self.expect_kw("drop")
        self.expect_kw("table")
        ie = False
        if self.accept_soft("if"):
            self.expect_kw("exists")
            ie = True
        names = [self.next().value]
        while self.accept_op(","):
            names.append(self.next().value)
        return DropTableStmt(names, ie)

    def parse_query(self) -> Query:
        q = Query(body=None)
        if self.accept_kw("with"):
            while True:
                cname = self.next().value
                col_aliases = None
                if self.peek() and self.peek().kind == "op" and self.peek().value == "(":
                    self.i += 1
                    col_aliases = [self.next().value]
                    while self.accept_op(","):
                        col_aliases.append(self.next().value)
                    self.expect_op(")")
                self.expect_kw("as")
                self.expect_op("(")
                q.ctes.append((cname, col_aliases, self.parse_query()))
                self.expect_op(")")
                if not self.accept_op(","):
                    break
        q.body = self.parse_set_body()
        if self.accept_kw("order"):
            self.expect_kw("by")
            t = self.peek()
            if t and t.kind == "kw" and t.value == "all":
                # ORDER BY ALL [ASC|DESC]: sort by every output column
                self.i += 1
                item = OrderItem(SStar())
                if self.accept_kw("desc"):
                    item.descending = True
                else:
                    self.accept_kw("asc")
                if self.accept_kw("nulls"):
                    item.nulls_last = bool(self.accept_kw("last")) or not self.accept_kw("first")
                q.order_by = [item]
            else:
                q.order_by = [self.parse_order_item()]
                while self.accept_op(","):
                    q.order_by.append(self.parse_order_item())
        if self.accept_kw("limit"):
            q.limit = int(self.next().value)
        if self.accept_kw("offset"):
            q.offset = int(self.next().value)
        return q

    def parse_set_body(self) -> Any:
        left = self.parse_set_term()
        while True:
            t = self.peek()
            if not (t and t.kind == "kw" and t.value in ("union", "except")):
                break
            op = self.next().value
            quant = "all" if self.accept_kw("all") else "distinct"
            self.accept_kw("distinct")
            by_name = False
            if self.accept_kw("by"):
                self.expect_soft("name")
                by_name = True
            left = SetOp(op, quant, by_name, left, self.parse_set_term())
        return left

    def parse_set_term(self) -> Any:
        # INTERSECT binds tighter than UNION/EXCEPT (standard SQL precedence)
        left = self.parse_set_atom()
        while self.accept_kw("intersect"):
            quant = "all" if self.accept_kw("all") else "distinct"
            self.accept_kw("distinct")
            by_name = False
            if self.accept_kw("by"):
                self.expect_soft("name")
                by_name = True
            left = SetOp("intersect", quant, by_name, left, self.parse_set_atom())
        return left

    def parse_set_atom(self) -> Any:
        t = self.peek()
        if t and t.kind == "kw" and t.value == "table":
            self.i += 1
            return TableRef(self.next().value)
        if t and t.kind == "kw" and t.value == "values":
            return self.parse_values()
        if t and t.kind == "op" and t.value == "(":
            self.i += 1
            inner = self.parse_query()
            self.expect_op(")")
            return inner
        return self.parse_select()

    def parse_values(self) -> ValuesTable:
        self.expect_kw("values")
        rows: list = []
        while True:
            self.expect_op("(")
            row = [self.parse_expr()]
            while self.accept_op(","):
                row.append(self.parse_expr())
            self.expect_op(")")
            rows.append(row)
            if not self.accept_op(","):
                break
        return ValuesTable(rows)

    def parse_select(self) -> SelectStmt:
        self.expect_kw("select")
        stmt = SelectStmt()
        if self.accept_kw("distinct"):
            stmt.distinct = True
        self.accept_kw("all")
        stmt.items = [self.parse_select_item()]
        while self.accept_op(","):
            stmt.items.append(self.parse_select_item())
        if self.accept_kw("from"):
            stmt.table = self.parse_table_ref()
            while True:
                join = self.parse_join_opt()
                if join is None:
                    break
                stmt.joins.append(join)
        if self.accept_kw("where"):
            stmt.where = self.parse_expr()
        if self.accept_kw("group"):
            self.expect_kw("by")
            stmt.group_by = [self.parse_expr()]
            while self.accept_op(","):
                stmt.group_by.append(self.parse_expr())
        if self.accept_kw("having"):
            stmt.having = self.parse_expr()
        if self.accept_kw("window"):
            while True:
                wname = self.next().value
                self.expect_kw("as")
                self.expect_op("(")
                parts, order = self.parse_window_spec()
                self.expect_op(")")
                stmt.windows[wname] = (parts, order)
                if not self.accept_op(","):
                    break
        return stmt

    def parse_window_spec(self) -> tuple[list, list]:
        parts: list = []
        order: list = []
        if self.accept_kw("partition"):
            self.expect_kw("by")
            parts.append(self.parse_expr())
            while self.accept_op(","):
                parts.append(self.parse_expr())
        if self.accept_kw("order"):
            self.expect_kw("by")
            order.append(self.parse_order_item())
            while self.accept_op(","):
                order.append(self.parse_order_item())
        # frame clause: only the default-equivalent frame is representable
        if self.accept_soft("rows") or self.accept_soft("range"):
            ok = (
                self.accept_kw("between")
                and self.accept_soft("unbounded")
                and self.accept_soft("preceding")
                and self.accept_kw("and")
                and self.accept_soft("current")
                and self.accept_soft("row")
            )
            if not ok:
                raise SQLSyntaxError(
                    "only the default window frame (UNBOUNDED PRECEDING TO "
                    "CURRENT ROW) is supported"
                )
        return parts, order

    def parse_select_item(self) -> SelectItem:
        t = self.peek()
        if t and t.kind == "op" and t.value == "*":
            self.i += 1
            return SelectItem(SStar())
        # table.*
        if (
            t and t.kind == "id"
            and self.peek(1) and self.peek(1).kind == "op" and self.peek(1).value == "."
            and self.peek(2) and self.peek(2).kind == "op" and self.peek(2).value == "*"
        ):
            self.i += 3
            return SelectItem(SStar(table=t.value))
        expr = self.parse_expr()
        alias = None
        if self.accept_kw("as"):
            alias = self.next().value
        elif self.peek() and self.peek().kind == "id":
            alias = self.next().value
        return SelectItem(expr, alias)

    def _table_alias(self) -> tuple[str | None, list[str] | None]:
        alias = None
        col_aliases = None
        if self.accept_kw("as"):
            alias = self.next().value
        elif self.peek() and self.peek().kind == "id":
            alias = self.next().value
        if alias and self.peek() and self.peek().kind == "op" and self.peek().value == "(":
            self.i += 1
            col_aliases = [self.next().value]
            while self.accept_op(","):
                col_aliases.append(self.next().value)
            self.expect_op(")")
        return alias, col_aliases

    def parse_table_ref(self) -> TableRef:
        if self.accept_op("("):
            sub = self.parse_query()
            self.expect_op(")")
            alias, col_aliases = self._table_alias()
            return TableRef(name=alias or "_subquery", alias=alias, subquery=sub,
                            col_aliases=col_aliases)
        name = self.next().value
        # table function: read_csv('path'), read_parquet(...), ...
        if self.peek() and self.peek().kind == "op" and self.peek().value == "(":
            self.i += 1
            fargs = []
            if not self.accept_op(")"):
                fargs.append(self.parse_expr())
                while self.accept_op(","):
                    fargs.append(self.parse_expr())
                self.expect_op(")")
            alias, col_aliases = self._table_alias()
            return TableRef(name=alias or name, alias=alias,
                            function=(name.lower(), fargs), col_aliases=col_aliases)
        alias, col_aliases = self._table_alias()
        return TableRef(name=name, alias=alias, col_aliases=col_aliases)

    def parse_join_opt(self) -> JoinClause | None:
        kind = None
        if self.accept_kw("inner"):
            kind = "inner"
        elif self.accept_kw("left"):
            self.accept_kw("outer")
            kind = "left"
        elif self.accept_kw("right"):
            self.accept_kw("outer")
            kind = "right"
        elif self.accept_kw("full"):
            self.accept_kw("outer")
            kind = "full"
        elif self.accept_kw("cross"):
            kind = "cross"
        elif self.accept_kw("semi"):
            kind = "semi"
        elif self.accept_kw("anti"):
            kind = "anti"
        elif self.peek() and self.peek().kind == "kw" and self.peek().value == "join":
            kind = "inner"
        if kind is None:
            return None
        self.expect_kw("join")
        table = self.parse_table_ref()
        on = None
        using = None
        if self.accept_kw("on"):
            on = self.parse_expr()
        elif self.accept_kw("using"):
            self.expect_op("(")
            using = [self.next().value]
            while self.accept_op(","):
                using.append(self.next().value)
            self.expect_op(")")
        return JoinClause(table, kind, on, using)

    def parse_order_item(self) -> OrderItem:
        e = self.parse_expr()
        desc = False
        if self.accept_kw("desc"):
            desc = True
        else:
            self.accept_kw("asc")
        nl = None
        if self.accept_kw("nulls"):
            if self.accept_kw("last"):
                nl = True
            elif self.accept_kw("first"):
                nl = False
        return OrderItem(e, desc, nl)

    # -- expressions (precedence climbing) ---------------------------------

    def parse_expr(self) -> Any:
        return self.parse_or()

    def parse_or(self) -> Any:
        left = self.parse_and()
        while self.accept_kw("or"):
            left = SBinary(left, "or", self.parse_and())
        return left

    def parse_and(self) -> Any:
        left = self.parse_not()
        while self.accept_kw("and"):
            left = SBinary(left, "and", self.parse_not())
        return left

    def _parse_exists(self, negated: bool) -> SExists:
        self.expect_kw("exists")
        self.expect_op("(")
        q = self.parse_query()
        self.expect_op(")")
        return SExists(q, negated)

    def parse_not(self) -> Any:
        t = self.peek()
        if t and t.kind == "kw" and t.value == "exists":
            return self._parse_exists(False)
        if t and t.kind == "kw" and t.value == "not":
            nxt = self.peek(1)
            if nxt and nxt.kind == "kw" and nxt.value == "exists":
                self.i += 1
                return self._parse_exists(True)
        if self.accept_kw("not"):
            return SUnary("not", self.parse_not())
        return self.parse_comparison()

    def parse_comparison(self) -> Any:
        left = self.parse_additive()
        t = self.peek()
        if t and t.kind == "op" and t.value in ("=", "<>", "!=", "<", "<=", ">", ">="):
            self.i += 1
            return SBinary(left, t.value, self.parse_additive())
        negated = False
        if t and t.kind == "kw" and t.value == "not":
            nxt = self.peek(1)
            if nxt and nxt.kind == "kw" and nxt.value in ("in", "between", "like", "ilike"):
                self.i += 1
                negated = True
                t = self.peek()
        if t and t.kind == "kw":
            if t.value == "in":
                self.i += 1
                self.expect_op("(")
                nx = self.peek()
                if nx and nx.kind == "kw" and nx.value in ("select", "with"):
                    q = self.parse_query()
                    self.expect_op(")")
                    return SInSubquery(left, q, negated)
                items = [self.parse_expr()]
                while self.accept_op(","):
                    items.append(self.parse_expr())
                self.expect_op(")")
                return SIn(left, items, negated)
            if t.value == "between":
                self.i += 1
                low = self.parse_additive()
                self.expect_kw("and")
                high = self.parse_additive()
                return SBetween(left, low, high, negated)
            if t.value in ("like", "ilike"):
                ci = t.value == "ilike"
                self.i += 1
                pat = self.next()
                if pat.kind != "str":
                    raise SQLSyntaxError("LIKE pattern must be a string literal")
                return SLike(left, pat.value[1:-1].replace("''", "'"), negated, ci)
            if t.value == "is":
                self.i += 1
                neg = self.accept_kw("not")
                self.expect_kw("null")
                return SIsNull(left, neg)
        return left

    def parse_additive(self) -> Any:
        left = self.parse_multiplicative()
        while True:
            op = self.accept_op("+", "-", "||")
            if op is None:
                break
            left = SBinary(left, op, self.parse_multiplicative())
        return left

    def parse_multiplicative(self) -> Any:
        left = self.parse_unary()
        while True:
            op = self.accept_op("*", "//", "/", "%")
            if op is None:
                break
            left = SBinary(left, op, self.parse_unary())
        return left

    def parse_unary(self) -> Any:
        if self.accept_op("-"):
            return SUnary("-", self.parse_unary())
        if self.accept_op("+"):
            return self.parse_unary()
        return self.parse_postfix()

    def parse_postfix(self) -> Any:
        e = self.parse_primary()
        while True:
            if self.accept_op("::"):
                e = SCast(e, self.parse_type_name())
                continue
            if isinstance(e, SFunc) and self.accept_kw("over"):
                t = self.peek()
                if t and t.kind == "id":
                    self.i += 1
                    e = SWindow(e, name=t.value)
                else:
                    self.expect_op("(")
                    parts, order = self.parse_window_spec()
                    self.expect_op(")")
                    e = SWindow(e, parts, order)
                continue
            break
        return e

    def parse_primary(self) -> Any:
        t = self.next()
        if t.kind == "num":
            if any(c in t.value for c in ".eE"):
                return SLiteral(float(t.value))
            return SLiteral(int(t.value))
        if t.kind == "str":
            return SLiteral(t.value[1:-1].replace("''", "'"))
        if t.kind == "kw":
            if t.value == "null":
                return SLiteral(None)
            if t.value == "true":
                return SLiteral(True)
            if t.value == "false":
                return SLiteral(False)
            if t.value in ("date", "timestamp", "time"):
                nxt = self.peek()
                if nxt and nxt.kind == "str":
                    self.i += 1
                    return SLiteral(nxt.value[1:-1], t.value)
                if nxt and nxt.kind == "op" and nxt.value == "(":
                    return self.parse_func_call(t.value)  # DATE(x) etc.
                raise SQLSyntaxError(f"expected string after {t.value.upper()}")
            if t.value == "interval":
                nxt = self.next()
                if nxt.kind != "str":
                    raise SQLSyntaxError("expected string after INTERVAL")
                return SLiteral(nxt.value[1:-1], "interval")
            if t.value == "case":
                branches = []
                default = None
                while self.accept_kw("when"):
                    cond = self.parse_expr()
                    self.expect_kw("then")
                    res = self.parse_expr()
                    branches.append((cond, res))
                if self.accept_kw("else"):
                    default = self.parse_expr()
                self.expect_kw("end")
                return SCase(branches, default)
            if t.value == "cast":
                self.expect_op("(")
                inner = self.parse_expr()
                self.expect_kw("as")
                type_name = self.next().value
                # allow e.g. DOUBLE PRECISION / parametrized types
                while self.peek() and self.peek().kind in ("id",):
                    type_name += " " + self.next().value
                if self.accept_op("("):
                    while not self.accept_op(")"):
                        self.next()
                self.expect_op(")")
                return SCast(inner, type_name)
            if t.value in ("left", "right"):  # also string functions
                if self.peek() and self.peek().kind == "op" and self.peek().value == "(":
                    return self.parse_func_call(t.value)
            raise SQLSyntaxError(f"unexpected keyword {t.value.upper()}")
        if t.kind == "op" and t.value == "(":
            nx = self.peek()
            if nx and nx.kind == "kw" and nx.value in ("select", "with"):
                q = self.parse_query()
                self.expect_op(")")
                return SScalarSubquery(q)
            e = self.parse_expr()
            self.expect_op(")")
            return e
        if t.kind == "op" and t.value == "*":
            return SStar()
        if t.kind == "id":
            nxt = self.peek()
            if nxt and nxt.kind == "op" and nxt.value == "(":
                return self.parse_func_call(t.value)
            if nxt and nxt.kind == "op" and nxt.value == ".":
                self.i += 1
                col = self.next().value
                return SColumn(col, table=t.value)
            return SColumn(t.value)
        raise SQLSyntaxError(f"unexpected token {t.value!r}")

    def parse_func_call(self, name: str) -> SFunc:
        self.expect_op("(")
        distinct = self.accept_kw("distinct")
        args: list = []
        if self.accept_op(")"):
            return SFunc(name.lower(), args, distinct)
        t = self.peek()
        if t and t.kind == "op" and t.value == "*":
            self.i += 1
            args.append(SStar())
        else:
            args.append(self.parse_expr())
        while self.accept_op(","):
            args.append(self.parse_expr())
        self.expect_op(")")
        return SFunc(name.lower(), args, distinct)


def parse_sql(sql: str) -> SelectStmt:
    return Parser(tokenize(sql.strip().rstrip(";"))).parse_statement()
