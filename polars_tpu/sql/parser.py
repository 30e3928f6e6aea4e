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
  | (?P<op><>|!=|>=|<=|\|\||::|[-+*/%(),.<>=])
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
    "except", "intersect", "with",
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
class SelectItem:
    expr: Any
    alias: str | None = None


@dataclass
class TableRef:
    name: str
    alias: str | None = None
    subquery: Any = None


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
    order_by: list[OrderItem] = field(default_factory=list)
    limit: int | None = None
    offset: int | None = None
    union: tuple[str, "SelectStmt"] | None = None  # ("all"|"distinct", stmt)


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

    # -- entry -------------------------------------------------------------

    def parse_statement(self) -> SelectStmt:
        stmt = self.parse_select()
        if self.peek() is not None:
            raise SQLSyntaxError(f"trailing tokens starting at {self.peek().value!r}")
        return stmt

    def parse_select(self) -> SelectStmt:
        self.expect_kw("select")
        stmt = SelectStmt()
        if self.accept_kw("distinct"):
            stmt.distinct = True
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
        if self.accept_kw("union"):
            how = "all" if self.accept_kw("all") else "distinct"
            stmt.union = (how, self.parse_select())
        if self.accept_kw("order"):
            self.expect_kw("by")
            stmt.order_by = [self.parse_order_item()]
            while self.accept_op(","):
                stmt.order_by.append(self.parse_order_item())
        if self.accept_kw("limit"):
            stmt.limit = int(self.next().value)
        if self.accept_kw("offset"):
            stmt.offset = int(self.next().value)
        return stmt

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

    def parse_table_ref(self) -> TableRef:
        if self.accept_op("("):
            sub = self.parse_select()
            self.expect_op(")")
            alias = None
            if self.accept_kw("as"):
                alias = self.next().value
            elif self.peek() and self.peek().kind == "id":
                alias = self.next().value
            return TableRef(name=alias or "_subquery", alias=alias, subquery=sub)
        name = self.next().value
        alias = None
        if self.accept_kw("as"):
            alias = self.next().value
        elif self.peek() and self.peek().kind == "id":
            alias = self.next().value
        return TableRef(name=name, alias=alias)

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

    def parse_not(self) -> Any:
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
            op = self.accept_op("*", "/", "%")
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
        while self.accept_op("::"):
            e = SCast(e, self.next().value)
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
