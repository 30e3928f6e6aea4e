"""Expression AST nodes.

Reference: the ``Expr`` enum (polars-plan/src/dsl/expr/mod.rs:66-190) and the
``FunctionExpr`` op catalog (plans/aexpr/function_expr/mod.rs). Nodes are
immutable, hashable dataclasses so that (a) common-subexpression elimination is
a dict lookup, and (b) whole plans can key a global XLA-compilation cache —
the TPU replacement for the reference's per-query physical-expr arena.

Generic operations go through :class:`EFunction` with a string opcode resolved
against the kernel registry in engine/compiler.py — the FunctionExpr pattern —
instead of one node class per op.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

# ---------------------------------------------------------------------------
# base
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ENode:
    """Base expression node."""

    def children(self) -> tuple[ENode, ...]:
        return ()


@dataclass(frozen=True)
class EColumn(ENode):
    name: str


@dataclass(frozen=True)
class EColumns(ENode):
    """Multi-column selector (``pl.col("a", "b")`` / wildcard) — expanded at
    dsl->ir time (reference: conversion/expr_expansion)."""

    names: tuple[str, ...]  # () means wildcard (all columns)


@dataclass(frozen=True)
class EDtypeColumns(ENode):
    """Select all columns of the given dtypes (pl.col(pl.Int64))."""

    dtypes: tuple[Any, ...]


@dataclass(frozen=True)
class ESelector(ENode):
    """Set-algebra column selector (py-polars selectors.py)."""

    kind: str  # "numeric" | "string" | "temporal" | ... | "by_name" | "matches"
    args: tuple[Any, ...] = ()
    # set ops
    op: str | None = None  # "union" | "difference" | "intersection" | "complement"
    left: ENode | None = None
    right: ENode | None = None

    def children(self) -> tuple[ENode, ...]:
        out = []
        if self.left is not None:
            out.append(self.left)
        if self.right is not None:
            out.append(self.right)
        return tuple(out)


@dataclass(frozen=True)
class ELiteral(ENode):
    value: Any  # hashable python scalar (or None)
    dtype: Any = None  # optional DataType


@dataclass(frozen=True)
class ESeriesLit(ENode):
    """A literal Series (identity-hashed; column payload lives on device)."""

    column: Any = field(hash=False, compare=False)
    ident: int = 0  # id() of the column for hashing

    def __hash__(self) -> int:  # dataclass would use ident only anyway
        return hash(("ESeriesLit", self.ident))


@dataclass(frozen=True)
class EBinary(ENode):
    left: ENode
    op: str  # "+", "-", "*", "/", "//", "%", "**", "==","!=","<","<=",">",">=","&","|","^","eq_missing","ne_missing"
    right: ENode

    def children(self) -> tuple[ENode, ...]:
        return (self.left, self.right)


@dataclass(frozen=True)
class ECast(ENode):
    input: ENode
    dtype: Any
    strict: bool = True

    def children(self) -> tuple[ENode, ...]:
        return (self.input,)


@dataclass(frozen=True)
class EAlias(ENode):
    input: ENode
    name: str

    def children(self) -> tuple[ENode, ...]:
        return (self.input,)


@dataclass(frozen=True)
class EKeepName(ENode):
    input: ENode

    def children(self) -> tuple[ENode, ...]:
        return (self.input,)


@dataclass(frozen=True)
class ERenameFn(ENode):
    """name.prefix/suffix/map — options carries the transform."""

    input: ENode
    kind: str  # "prefix" | "suffix" | "to_lowercase" | "to_uppercase" | "map"
    arg: Any = None

    def children(self) -> tuple[ENode, ...]:
        return (self.input,)


@dataclass(frozen=True)
class EAgg(ENode):
    """Aggregation (reference: Expr::Agg, dsl/expr/mod.rs AggExpr)."""

    input: ENode
    kind: str  # sum|mean|min|max|median|count|len|std|var|first|last|n_unique|quantile|implode|any|all|arg_min|arg_max|product
    options: tuple[tuple[str, Any], ...] = ()

    def children(self) -> tuple[ENode, ...]:
        return (self.input,)

    def opt(self, key: str, default: Any = None) -> Any:
        for k, v in self.options:
            if k == key:
                return v
        return default


@dataclass(frozen=True)
class ETernary(ENode):
    predicate: ENode
    truthy: ENode
    falsy: ENode

    def children(self) -> tuple[ENode, ...]:
        return (self.predicate, self.truthy, self.falsy)


@dataclass(frozen=True)
class EFunction(ENode):
    """Catch-all op with string opcode (reference: FunctionExpr)."""

    name: str
    inputs: tuple[ENode, ...]
    options: tuple[tuple[str, Any], ...] = ()

    def children(self) -> tuple[ENode, ...]:
        return self.inputs

    def opt(self, key: str, default: Any = None) -> Any:
        for k, v in self.options:
            if k == key:
                return v
        return default


@dataclass(frozen=True)
class ESort(ENode):
    input: ENode
    descending: bool = False
    nulls_last: bool = False

    def children(self) -> tuple[ENode, ...]:
        return (self.input,)


@dataclass(frozen=True)
class ESortBy(ENode):
    input: ENode
    by: tuple[ENode, ...]
    descending: tuple[bool, ...]
    nulls_last: tuple[bool, ...]

    def children(self) -> tuple[ENode, ...]:
        return (self.input, *self.by)


@dataclass(frozen=True)
class EFilter(ENode):
    """Expression-level filter (within agg context): col(x).filter(cond)."""

    input: ENode
    by: ENode

    def children(self) -> tuple[ENode, ...]:
        return (self.input, self.by)


@dataclass(frozen=True)
class EWindow(ENode):
    """Window expression: function.over(partition_by) (reference: Expr::Over,
    polars-expr/src/expressions/window.rs)."""

    function: ENode
    partition_by: tuple[ENode, ...]
    order_by: tuple[ENode, ...] = ()
    mapping_strategy: str = "group_to_rows"
    order_descending: tuple[bool, ...] = ()

    def children(self) -> tuple[ENode, ...]:
        return (self.function, *self.partition_by, *self.order_by)


@dataclass(frozen=True)
class ESlice(ENode):
    input: ENode
    offset: int
    length: int | None

    def children(self) -> tuple[ENode, ...]:
        return (self.input,)


@dataclass(frozen=True)
class ELen(ENode):
    """Row count (pl.len())."""


@dataclass(frozen=True)
class EGather(ENode):
    input: ENode
    indices: ENode

    def children(self) -> tuple[ENode, ...]:
        return (self.input, self.indices)


@dataclass(frozen=True)
class EAnonymous(ENode):
    """User-defined function via map_batches (host callback; identity-hashed)."""

    input: tuple[ENode, ...]
    function: Any = field(hash=False, compare=False)
    return_dtype: Any = None
    ident: int = 0
    returns_scalar: bool = False  # group context: emit scalar vs implode List

    def __hash__(self) -> int:
        return hash(("EAnonymous", self.ident))

    def children(self) -> tuple[ENode, ...]:
        return self.input


# ---------------------------------------------------------------------------
# traversal helpers
# ---------------------------------------------------------------------------


def walk(node: ENode):
    """Depth-first pre-order traversal."""
    yield node
    for c in node.children():
        yield from walk(c)


def output_name(node: ENode, *, raise_on_multi: bool = True) -> str | None:
    """Resolve the output column name (reference: expr_output_name,
    plans/aexpr/mod.rs / py Expr.meta.output_name)."""
    if isinstance(node, EAlias):
        return node.name
    if isinstance(node, EColumn):
        return node.name
    if isinstance(node, ELen):
        return "len"
    if isinstance(node, ELiteral):
        return "literal"
    if isinstance(node, ESeriesLit):
        return node.column.name or "literal"
    if isinstance(node, EKeepName):
        return _leftmost_column(node.input)
    if isinstance(node, ERenameFn):
        base = output_name(node.input, raise_on_multi=raise_on_multi)
        if base is None:
            return None
        if node.kind == "prefix":
            return f"{node.arg}{base}"
        if node.kind == "suffix":
            return f"{base}{node.arg}"
        if node.kind == "to_lowercase":
            return base.lower()
        if node.kind == "to_uppercase":
            return base.upper()
        if node.kind == "map":
            return node.arg(base)
        if node.kind == "replace":
            import re as _re

            pattern, value, literal = node.arg
            if literal:
                return base.replace(pattern, value)
            return _re.sub(pattern, value, base)
    for c in node.children():
        n = output_name(c, raise_on_multi=raise_on_multi)
        if n is not None:
            return n
    return None


def _leftmost_column(node: ENode) -> str | None:
    for n in walk(node):
        if isinstance(n, EColumn):
            return n.name
    return None


def root_column_names(node: ENode) -> list[str]:
    """All referenced input columns (for projection pushdown). A
    ``dtype_of("x")`` inside a cast depends on column x's TYPE, so x must
    survive projection pruning even though no value is read."""
    from polars_tpu.datatypes import DataTypeExpr

    out: list[str] = []
    seen = set()

    def add(name: str) -> None:
        if name not in seen:
            seen.add(name)
            out.append(name)

    def dtype_cols(d: Any) -> None:
        if isinstance(d, DataTypeExpr):
            if d.kind == "col":
                add(d.arg)
            elif d.kind == "struct":
                for _, sub in d.arg:
                    dtype_cols(sub)

    for n in walk(node):
        if isinstance(n, EColumn):
            add(n.name)
        elif isinstance(n, ECast):
            dtype_cols(n.dtype)
    return out


def has_agg(node: ENode) -> bool:
    return any(isinstance(n, (EAgg, ELen)) for n in walk(node))


def reduces_in_agg(node: ENode) -> bool:
    """Static AggState analysis (reference: AggregationContext,
    polars-expr/src/expressions/mod.rs:65-156): True when the expr yields ONE
    value per group — an aggregation root, or elementwise combinations of
    aggregations/literals. A bare column path outside any aggregation keeps
    ROW length, so the whole agg expr implodes to a List per group."""
    from polars_tpu.engine.registry import ELEMENTWISE_FNS, _ensure_loaded

    _ensure_loaded()

    def rec(e: ENode) -> bool:
        while isinstance(e, (EAlias, EKeepName, ERenameFn)):
            e = e.input
        if isinstance(e, EAgg):
            # mode "can return multiple values" (reference Expr.mode): in a
            # group context it implodes to a List per group via the apply path
            return e.kind != "mode"
        if isinstance(e, ELen):
            return True
        if isinstance(e, EAnonymous):
            return bool(e.returns_scalar)
        if isinstance(e, (ELiteral, ESeriesLit)):
            return True
        if isinstance(e, ECast):
            return rec(e.input)
        if isinstance(e, EBinary):
            return rec(e.left) and rec(e.right)
        if isinstance(e, ETernary):
            return rec(e.predicate) and rec(e.truthy) and rec(e.falsy)
        if isinstance(e, EFunction) and e.name in ELEMENTWISE_FNS:
            return all(rec(c) for c in e.inputs)
        if isinstance(e, EFunction) and e.name.split(".")[0] in (
            "list", "arr", "struct", "str", "bin", "cat", "dt"
        ):
            # namespace ops are length-preserving per parent row: an agg
            # result stays one-per-group through them (implode().list.len())
            return all(rec(c) for c in e.inputs if isinstance(c, ENode))
        return False

    return rec(node)


def is_elementwise(node: ENode) -> bool:
    """True if the expr maps rows independently (streamable through a Select —
    the reference's ExprCache.is_elementwise, lower_expr.rs:39-53)."""
    from polars_tpu.engine.registry import ELEMENTWISE_FNS, _ensure_loaded

    _ensure_loaded()
    for n in walk(node):
        if isinstance(n, (EAgg, ELen, EWindow, ESort, ESortBy, ESlice, EFilter, EGather)):
            return False
        if isinstance(n, EFunction) and n.name not in ELEMENTWISE_FNS:
            return False
        if isinstance(n, EAnonymous):
            return False
    return True
