"""dsl -> ir conversion machinery: selector expansion, dtype resolution,
supertype lattice, node schema resolution.

Reference: polars-plan/src/plans/conversion/dsl_to_ir/mod.rs:48-157 (schema
resolution + wildcard/selector expansion) and conversion/type_coercion/.
"""

from __future__ import annotations

import dataclasses
import functools
import re
from typing import Any

from polars_tpu import datatypes as dt
from polars_tpu.core.schema import Schema
from polars_tpu.errors import (
    ColumnNotFoundError,
    DuplicateError,
    InvalidOperationError,
    SchemaError,
)
from polars_tpu.plan import exprs as E
from polars_tpu.plan import logical as L

# ---------------------------------------------------------------------------
# supertype lattice (reference: polars-core/src/utils/supertype.rs)
# ---------------------------------------------------------------------------

_INT_ORDER = ["Int8", "Int16", "Int32", "Int64"]
_UINT_ORDER = ["UInt8", "UInt16", "UInt32", "UInt64"]
_INT_BITS = {"Int8": 8, "Int16": 16, "Int32": 32, "Int64": 64,
             "UInt8": 8, "UInt16": 16, "UInt32": 32, "UInt64": 64}


def supertype(a: dt.DataType, b: dt.DataType) -> dt.DataType:
    if a == b:
        return a
    an, bn = type(a).__name__, type(b).__name__
    if an == "Null":
        return b
    if bn == "Null":
        return a
    if an == "Unknown":
        return b
    if bn == "Unknown":
        return a
    # bool promotes to any numeric
    if an == "Boolean" and b.is_numeric():
        return b
    if bn == "Boolean" and a.is_numeric():
        return a
    if an == "Struct" and bn == "Struct":
        # same field names in order -> struct of field supertypes
        a_names = [f.name for f in a.fields]
        if a_names == [f.name for f in b.fields]:
            return dt.Struct(
                [
                    (fa.name, supertype(fa.dtype, fb.dtype))
                    for fa, fb in zip(a.fields, b.fields)
                ]
            )
    if an == "Decimal" and bn == "Decimal":
        # reference: decimal arithmetic unifies to max scale at max precision
        # (polars-core arithmetic/decimal.rs: scale = left_s.max(right_s))
        prec = None if (a.precision is None or b.precision is None) else max(a.precision, b.precision)
        return dt.Decimal(prec, max(a.scale, b.scale))
    if an == "Decimal" and b.is_numeric():
        return a if b.is_integer() else dt.Float64()
    if bn == "Decimal" and a.is_numeric():
        return b if a.is_integer() else dt.Float64()
    if a.is_numeric() and b.is_numeric():
        if a.is_float() or b.is_float():
            if an == "Float32" and bn == "Float32":
                return dt.Float32()
            if {an, bn} <= {"Float32", "Int8", "Int16", "UInt8", "UInt16"}:
                return dt.Float32()
            return dt.Float64()
        a_signed, b_signed = a.is_signed_integer(), b.is_signed_integer()
        ab, bb = _INT_BITS[an], _INT_BITS[bn]
        if a_signed == b_signed:
            order = _INT_ORDER if a_signed else _UINT_ORDER
            winner = order[max(order.index(an), order.index(bn))]
            return getattr(dt, winner)()
        # mixed sign: need signed type one step wider than the unsigned one
        unsigned_bits = bb if a_signed else ab
        signed_bits = ab if a_signed else bb
        need = max(signed_bits, unsigned_bits * 2)
        if need > 64:
            return dt.Float64()
        return {8: dt.Int8(), 16: dt.Int16(), 32: dt.Int32(), 64: dt.Int64()}[need]
    if {an, bn} == {"Date", "Datetime"}:
        d = a if an == "Datetime" else b
        return d
    if an == "Datetime" and bn == "Datetime":
        units = {"ms": 0, "us": 1, "ns": 2}
        finer = a if units[a.time_unit] >= units[b.time_unit] else b
        return finer
    if an == "Duration" and bn == "Duration":
        units = {"ms": 0, "us": 1, "ns": 2}
        return a if units[a.time_unit] >= units[b.time_unit] else b
    if {an, bn} <= {"String", "Categorical", "Enum"}:
        return dt.String()
    if (an == "Date" and b.is_integer()) or (bn == "Date" and a.is_integer()):
        return dt.Int32()
    if (an in ("Datetime", "Duration", "Time") and b.is_integer()) or (
        bn in ("Datetime", "Duration", "Time") and a.is_integer()
    ):
        return dt.Int64()
    if a.is_numeric() and bn == "String":
        return dt.String()
    if b.is_numeric() and an == "String":
        return dt.String()
    raise SchemaError(f"no supertype of {a!r} and {b!r}")


# ---------------------------------------------------------------------------
# selector expansion
# ---------------------------------------------------------------------------


def selector_columns(node: E.ENode, schema: Schema) -> list[str]:
    """Columns matched by a selector-ish node, in schema order."""
    names = schema.names()
    if isinstance(node, E.EColumns):
        if not node.names:
            return names
        missing = [n for n in node.names if n not in schema]
        if missing:
            raise ColumnNotFoundError(f"{missing[0]!r} not found; available: {names}")
        return list(node.names)
    if isinstance(node, E.EDtypeColumns):
        return [n for n in names if any(schema[n] == d for d in node.dtypes)]
    if isinstance(node, E.ESelector):
        return _selector_match(node, schema)
    raise InvalidOperationError(f"not a selector: {node!r}")


def _selector_match(sel: E.ESelector, schema: Schema) -> list[str]:
    names = schema.names()
    k = sel.kind
    if k == "set":
        left = set(selector_columns(sel.left, schema)) if sel.left is not None else set()
        right = set(selector_columns(sel.right, schema)) if sel.right is not None else set()
        if sel.op == "union":
            keep = left | right
        elif sel.op == "difference":
            keep = left - right
        elif sel.op == "intersection":
            keep = left & right
        elif sel.op == "complement":
            keep = set(names) - left
        else:
            raise InvalidOperationError(f"unknown selector op {sel.op!r}")
        return [n for n in names if n in keep]
    if k == "all":
        return names
    if k == "none":
        return []
    if k == "by_name":
        return [n for n in names if n in set(sel.args)]
    if k == "nth":
        out = []
        for i in sel.args:
            j = i if i >= 0 else len(names) + i
            if 0 <= j < len(names):
                out.append(names[j])
        return out
    if k == "matches":
        pat = re.compile(sel.args[0])
        return [n for n in names if pat.search(n)]
    if k == "starts_with":
        return [n for n in names if any(n.startswith(p) for p in sel.args)]
    if k == "ends_with":
        return [n for n in names if any(n.endswith(p) for p in sel.args)]
    if k == "contains":
        return [n for n in names if any(p in n for p in sel.args)]
    if k == "by_dtype":
        targets = [dt.parse_into_dtype(d) for d in sel.args]
        return [n for n in names if any(schema[n] == d for d in targets)]
    preds = {
        "numeric": lambda d: d.is_numeric(),
        "integer": lambda d: d.is_integer(),
        "signed_integer": lambda d: d.is_signed_integer(),
        "unsigned_integer": lambda d: d.is_unsigned_integer(),
        "float": lambda d: d.is_float(),
        "string": lambda d: isinstance(d, dt.String),
        "boolean": lambda d: isinstance(d, dt.Boolean),
        "temporal": lambda d: d.is_temporal(),
        "date": lambda d: isinstance(d, dt.Date),
        "datetime": lambda d: isinstance(d, dt.Datetime),
        "duration": lambda d: isinstance(d, dt.Duration),
        "time": lambda d: isinstance(d, dt.Time),
        "categorical": lambda d: isinstance(d, dt.Categorical),
        "binary": lambda d: isinstance(d, dt.Binary),
        "decimal": lambda d: isinstance(d, dt.Decimal),
        "enum": lambda d: isinstance(d, dt.Enum),
        "list": lambda d: isinstance(d, dt.List),
        "array": lambda d: isinstance(d, dt.Array),
        "struct": lambda d: isinstance(d, dt.Struct),
        "nested": lambda d: isinstance(d, (dt.List, dt.Array, dt.Struct)),
    }
    if k in preds:
        return [n for n in names if preds[k](schema[n])]
    raise InvalidOperationError(f"unknown selector kind {k!r}")


def _is_selector_node(node: E.ENode) -> bool:
    return isinstance(node, (E.EColumns, E.EDtypeColumns, E.ESelector))


def _substitute(node: E.ENode, target: E.ENode, replacement: E.ENode) -> E.ENode:
    if node is target or node == target:
        return replacement
    kids = node.children()
    if not kids:
        return node
    new_kids = tuple(_substitute(k, target, replacement) for k in kids)
    if new_kids == kids:
        return node
    return _rebuild_expr(node, new_kids)


def _rebuild_expr(node: E.ENode, kids: tuple[E.ENode, ...]) -> E.ENode:
    if isinstance(node, E.EBinary):
        return dataclasses.replace(node, left=kids[0], right=kids[1])
    if isinstance(node, (E.ECast, E.EAlias, E.EKeepName, E.ERenameFn, E.EAgg, E.ESort, E.ESlice)):
        return dataclasses.replace(node, input=kids[0])
    if isinstance(node, E.ETernary):
        return dataclasses.replace(node, predicate=kids[0], truthy=kids[1], falsy=kids[2])
    if isinstance(node, E.EFunction):
        return dataclasses.replace(node, inputs=kids)
    if isinstance(node, E.ESortBy):
        return dataclasses.replace(node, input=kids[0], by=kids[1:])
    if isinstance(node, E.EFilter):
        return dataclasses.replace(node, input=kids[0], by=kids[1])
    if isinstance(node, E.EGather):
        return dataclasses.replace(node, input=kids[0], indices=kids[1])
    if isinstance(node, E.EWindow):
        np_ = len(node.partition_by)
        return dataclasses.replace(
            node,
            function=kids[0],
            partition_by=kids[1 : 1 + np_],
            order_by=kids[1 + np_ :],
        )
    if isinstance(node, E.EAnonymous):
        return dataclasses.replace(node, input=kids)
    raise InvalidOperationError(f"cannot rebuild {type(node).__name__}")


def _selector_roots(node: E.ENode) -> list[E.ENode]:
    """Outermost selector nodes (don't descend into set-selector children)."""
    if _is_selector_node(node):
        return [node]
    out: list[E.ENode] = []
    for c in node.children():
        out.extend(_selector_roots(c))
    return out


_HORIZONTAL_FNS = {
    "sum_horizontal", "mean_horizontal", "min_horizontal", "max_horizontal",
    "any_horizontal", "all_horizontal", "concat_str", "concat_list",
    "coalesce", "as_struct", "fold", "reduce",
}


def _splice_horizontal(node: E.ENode, schema: Schema) -> E.ENode:
    """Selectors inside horizontal/variadic functions expand INTO the input
    list (one fn over all matched columns), not into per-column copies of the
    whole expression (reference: polars' FunctionFlags::INPUT_WILDCARD_EXPANSION)."""
    kids = node.children()
    if kids:
        new_kids = tuple(_splice_horizontal(k, schema) for k in kids)
        if new_kids != kids:
            node = _rebuild_expr(node, new_kids)
    if isinstance(node, E.EFunction) and node.name in _HORIZONTAL_FNS:
        new_inputs: list[E.ENode] = []
        changed = False
        for i in node.inputs:
            if _selector_roots(i):
                for e in expand_expr(i, schema):
                    new_inputs.append(e)
                changed = True
            else:
                new_inputs.append(i)
        if changed:
            node = dataclasses.replace(node, inputs=tuple(new_inputs))
    if isinstance(node, E.EFunction) and node.name in ("fold", "reduce"):
        # expansion-time macro: compose the user function over the (now
        # selector-expanded) inputs — pl.fold/pl.reduce
        from polars_tpu.expr.expr import Expr as _Expr

        fn = node.opt("function")
        inputs = node.inputs
        acc = inputs[0]
        for x in inputs[1:]:
            acc = fn(_Expr(acc), _Expr(x))._node
        return acc
    return node


def expand_expr(node: E.ENode, schema: Schema) -> list[E.ENode]:
    """Expand selector roots into one expression per matched column."""
    node = _splice_horizontal(node, schema)
    # struct.unnest expands to one struct.field expr per field (reference:
    # py-polars expr/struct.py unnest)
    if isinstance(node, E.EFunction) and node.name == "struct.unnest":
        d = expr_dtype(node.inputs[0], schema)
        if not isinstance(d, dt.Struct):
            raise InvalidOperationError(f"struct.unnest needs a Struct, got {d!r}")
        return [
            E.EAlias(
                E.EFunction("struct.field", node.inputs, (("name", f.name),)),
                f.name,
            )
            for f in d.fields
        ]
    if isinstance(node, E.EFunction) and node.name == "struct.multifield":
        # field("*") / field("a", "b") — one output column per matched field
        d = expr_dtype(node.inputs[0], schema)
        if not isinstance(d, dt.Struct):
            raise InvalidOperationError(f"struct.field needs a Struct, got {d!r}")
        want = node.opt("names", ())
        names = (
            [f.name for f in d.fields]
            if "*" in want
            else [n for n in want]
        )
        return [
            E.EAlias(
                E.EFunction("struct.field", node.inputs, (("name", n),)), n
            )
            for n in names
        ]
    selectors = _selector_roots(node)
    if not selectors:
        return [node]
    # distinct selector nodes (hash-equal collapse)
    uniq: list[E.ENode] = []
    for s in selectors:
        if not any(s == u for u in uniq):
            uniq.append(s)
    matches = [selector_columns(s, schema) for s in uniq]
    n_out = len(matches[0])
    for m in matches[1:]:
        if len(m) != n_out:
            raise InvalidOperationError(
                "selectors in one expression matched differing column counts"
            )
    out = []
    for i in range(n_out):
        e = node
        for s, m in zip(uniq, matches):
            e = _substitute(e, s, E.EColumn(m[i]))
        out.append(e)
    return out


def expand_exprs(nodes: tuple[E.ENode, ...], schema: Schema) -> tuple[E.ENode, ...]:
    out: list[E.ENode] = []
    for n in nodes:
        out.extend(expand_expr(n, schema))
    return tuple(out)


# ---------------------------------------------------------------------------
# expression dtype resolution
# ---------------------------------------------------------------------------

_CMP = {"==", "!=", "<", "<=", ">", ">=", "eq_missing", "ne_missing"}
_BOOLOPS = {"&", "|", "^"}


def expr_dtype(node: E.ENode, schema: Schema, *, in_agg: bool = False) -> dt.DataType:
    if isinstance(node, E.EColumn):
        return schema[node.name]
    if isinstance(node, E.ELiteral):
        if node.dtype is not None:
            return dt.parse_into_dtype(node.dtype)
        return _literal_dtype(node.value)
    if isinstance(node, E.ESeriesLit):
        return node.column.dtype
    if isinstance(node, E.EAlias):
        return expr_dtype(node.input, schema, in_agg=in_agg)
    if isinstance(node, (E.EKeepName, E.ERenameFn)):
        return expr_dtype(node.input, schema, in_agg=in_agg)
    if isinstance(node, E.ECast):
        if isinstance(node.dtype, dt.DataTypeExpr):
            return node.dtype._resolve(
                schema, expr_dtype(node.input, schema, in_agg=in_agg)
            )
        return dt.parse_into_dtype(node.dtype)
    if isinstance(node, E.EBinary):
        lt = expr_dtype(node.left, schema, in_agg=in_agg)
        rt = expr_dtype(node.right, schema, in_agg=in_agg)
        lt, rt = adapt_dyn_literal_dtypes((node.left, node.right), [lt, rt])
        return binary_dtype(node.op, lt, rt)
    if isinstance(node, E.ETernary):
        tt = expr_dtype(node.truthy, schema, in_agg=in_agg)
        ft = expr_dtype(node.falsy, schema, in_agg=in_agg)
        tt, ft = adapt_dyn_literal_dtypes((node.truthy, node.falsy), [tt, ft])
        return supertype(tt, ft)
    if isinstance(node, E.EAgg):
        return agg_dtype(node, schema)
    if isinstance(node, E.ELen):
        return dt.UInt32()
    if isinstance(node, E.EFunction):
        from polars_tpu.engine.registry import get_spec

        in_dts = [expr_dtype(i, schema, in_agg=in_agg) for i in node.inputs]
        in_dts = adapt_dyn_literal_dtypes(node.inputs, in_dts)
        return get_spec(node.name).dtype_rule(in_dts, dict(node.options))
    if isinstance(node, (E.ESort, E.ESlice)):
        return expr_dtype(node.input, schema, in_agg=in_agg)
    if isinstance(node, E.ESortBy):
        return expr_dtype(node.input, schema, in_agg=in_agg)
    if isinstance(node, E.EFilter):
        return expr_dtype(node.input, schema, in_agg=in_agg)
    if isinstance(node, E.EWindow):
        inner_dt = expr_dtype(node.function, schema, in_agg=True)
        if node.mapping_strategy == "join":
            return dt.List(inner_dt)
        return inner_dt
    if isinstance(node, E.EGather):
        return expr_dtype(node.input, schema, in_agg=in_agg)
    if isinstance(node, E.EAnonymous):
        if node.return_dtype is not None:
            return node.return_dtype
        return dt.Unknown()
    raise InvalidOperationError(f"cannot resolve dtype of {type(node).__name__}")


def dyn_literal_value(node: E.ENode):
    """The python value of an UNTYPED numeric literal (the reference's
    Unknown(UnknownKind::Int/Float) dynamic literal), else None."""
    n = node
    while isinstance(n, (E.EAlias, E.EKeepName)):
        n = n.input
    if (
        isinstance(n, E.ELiteral)
        and n.dtype is None
        and not isinstance(n.value, bool)
        and isinstance(n.value, (int, float))
    ):
        return n.value
    return None


def fit_dyn_dtype(value, target: dt.DataType) -> dt.DataType | None:
    """Unify a dynamic numeric literal with a concrete numeric dtype
    (reference: get_supertype Unknown(Int(v)) arm, supertype.rs:514-536 —
    supertype(target, smallest dtype fitting v))."""
    import numpy as np

    if isinstance(value, float):
        return target if target.is_float() else None
    if not isinstance(value, int):
        return None
    if target.is_float():
        return target
    if not target.is_integer():
        return None
    if target.is_unsigned_integer() and value >= 0:
        ladder = [dt.UInt8(), dt.UInt16(), dt.UInt32(), dt.UInt64()]
    else:
        ladder = [dt.Int8(), dt.Int16(), dt.Int32(), dt.Int64()]
    smallest = None
    for d in ladder:
        info = np.iinfo(dt.dtype_to_numpy(d))
        if info.min <= value <= info.max:
            smallest = d
            break
    if smallest is None:
        return None
    return supertype(target, smallest)


def adapt_dyn_literal_dtypes(nodes, dts: list) -> list:
    """Adapt untyped numeric literals to the first concrete numeric operand's
    dtype (col_i8 + 1 stays Int8; fill_null(0) keeps the column dtype)."""
    target = None
    for n, d in zip(nodes, dts):
        if dyn_literal_value(n) is None and d.is_numeric():
            target = d
            break
    if target is None:
        return list(dts)
    out = list(dts)
    for i, n in enumerate(nodes):
        v = dyn_literal_value(n)
        if v is None:
            continue
        nd = fit_dyn_dtype(v, target)
        if nd is not None:
            out[i] = nd
    return out


def _literal_dtype(value: Any) -> dt.DataType:
    if value is None:
        return dt.Null()
    if isinstance(value, bool):
        return dt.Boolean()
    if isinstance(value, int):
        return dt.Int32() if -(2**31) <= value < 2**31 else dt.Int64()
    if isinstance(value, float):
        return dt.Float64()
    if isinstance(value, str):
        return dt.String()
    if isinstance(value, bytes):
        return dt.Binary()
    import decimal as _decimal

    if isinstance(value, _decimal.Decimal):
        exp = value.as_tuple().exponent
        return dt.Decimal(38, -exp if isinstance(exp, int) and exp < 0 else 0)
    raise InvalidOperationError(f"unsupported literal {value!r}")


def binary_dtype(op: str, lt: dt.DataType, rt: dt.DataType) -> dt.DataType:
    if op in _CMP:
        return dt.Boolean()
    if op in _BOOLOPS:
        if isinstance(lt, dt.Boolean) and isinstance(rt, dt.Boolean):
            return dt.Boolean()
        if lt.is_integer() and rt.is_integer():
            return supertype(lt, rt)
        if isinstance(lt, dt.Null) or isinstance(rt, dt.Null):
            return dt.Boolean()
        raise SchemaError(f"cannot apply {op!r} to {lt!r} and {rt!r}")
    ln, rn = type(lt).__name__, type(rt).__name__
    # temporal arithmetic
    if op == "-":
        if ln == "Date" and rn == "Date":
            return dt.Duration("ms")
        if ln == "Datetime" and rn == "Datetime":
            return dt.Duration(supertype(lt, rt).time_unit)
        if ln == "Datetime" and rn == "Duration":
            return lt
        if ln == "Date" and rn == "Duration":
            return dt.Datetime(rt.time_unit) if rt.time_unit != "ms" else dt.Date()
        if ln == "Duration" and rn == "Duration":
            return supertype(lt, rt)
        if ln == "Time" and rn == "Time":
            return dt.Duration("ns")
    if op == "+":
        if {ln, rn} == {"Date", "Duration"}:
            return lt if ln == "Date" else rt
        if "Datetime" in (ln, rn) and "Duration" in (ln, rn):
            return lt if ln == "Datetime" else rt
        if ln == "Duration" and rn == "Duration":
            return supertype(lt, rt)
        if ln == "String" and rn == "String":
            return dt.String()
        if ln == "Binary" and rn == "Binary":
            return dt.Binary()
    if op == "/":
        if ln == "Duration" and rt.is_numeric():
            return lt
        if ln == "Decimal" and (rn == "Decimal" or rt.is_integer()):
            return supertype(lt, rt if rn == "Decimal" else dt.Decimal(None, 0))
        if rn == "Decimal" and lt.is_integer():
            return supertype(dt.Decimal(None, 0), rt)
        if lt.is_numeric() or rt.is_numeric():
            st = supertype(lt, rt)
            return dt.Float32() if isinstance(st, dt.Float32) else dt.Float64()
    if op == "//":
        st = supertype(lt, rt)
        return st
    if op == "**":
        if lt.is_integer() and rt.is_integer():
            return lt
        st = supertype(lt, rt)
        return dt.Float32() if isinstance(st, dt.Float32) else dt.Float64()
    if op in ("*",):
        if ln == "Duration" and rt.is_numeric():
            return lt
        if rn == "Duration" and lt.is_numeric():
            return rt
    return supertype(lt, rt)


_SMALL_INTS = ("Int8", "Int16", "UInt8", "UInt16")


def agg_dtype(node: E.EAgg, schema: Schema) -> dt.DataType:
    in_dt = expr_dtype(node.input, schema, in_agg=True)
    k = node.kind
    name = type(in_dt).__name__
    if k == "sum":
        if isinstance(in_dt, dt.Boolean):
            return dt.UInt32()
        if name in _SMALL_INTS:
            return dt.Int64()
        return in_dt
    if k == "product":
        return dt.Int64() if in_dt.is_integer() else in_dt
    if k in ("mean", "median"):
        if in_dt.is_temporal():
            return in_dt if name != "Date" else dt.Datetime("ms")
        return dt.Float32() if name == "Float32" else dt.Float64()
    if k == "quantile":
        return dt.Float32() if name == "Float32" else dt.Float64()
    if k in ("std", "var", "skew", "kurtosis", "entropy"):
        return dt.Float32() if name == "Float32" else dt.Float64()
    if k in ("min", "max", "first", "last", "mode", "item",
             "bitwise_and", "bitwise_or", "bitwise_xor"):
        return in_dt
    if k == "is_sorted":
        return dt.Boolean()
    if k in ("count", "len", "null_count", "n_unique", "arg_min", "arg_max"):
        return dt.UInt32()
    if k in ("any", "all"):
        return dt.Boolean()
    if k == "implode":
        return dt.List(in_dt)
    if k == "str_concat":
        return dt.String()
    if k in ("corr", "cov"):
        return dt.Float64()
    if k == "agg_groups":
        return dt.List(dt.UInt32())
    raise InvalidOperationError(f"unknown aggregation {k!r}")


# ---------------------------------------------------------------------------
# output name+dtype of a list of (expanded) exprs
# ---------------------------------------------------------------------------


def exprs_schema(nodes: tuple[E.ENode, ...], schema: Schema) -> Schema:
    out = Schema()
    for n in nodes:
        name = E.output_name(n) or "literal"
        if name in out:
            raise DuplicateError(
                f"the name {name!r} is duplicate\n\nIt's possible that multiple "
                "expressions are returning the same default column name. If this "
                "is the case, try renaming the columns with "
                '`.alias("new_name")` to avoid duplicate column names.'
            )
        out[name] = expr_dtype(n, schema)
    return out


# ---------------------------------------------------------------------------
# node schema resolution (memoized)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8192)
def node_schema(node: L.LNode) -> Schema:
    return _node_schema(node)


def _node_schema(node: L.LNode) -> Schema:
    if isinstance(node, L.LCache):
        return node_schema(node.input)
    if isinstance(node, L.LDataFrameScan):
        s = node.df.schema
        if node.projection is not None:
            return Schema([(n, s[n]) for n in node.projection])
        return s
    if isinstance(node, L.LScan):
        from polars_tpu.io.scan_schema import scan_schema

        s = scan_schema(node)
        if node.projection is not None:
            s = Schema([(n, s[n]) for n in node.projection if n in s])
        if node.row_index is not None:
            s2 = Schema([(node.row_index[0], dt.UInt32())])
            for n, d in s.items():
                s2[n] = d
            s = s2
        return s
    if isinstance(node, L.LSelect):
        in_s = node_schema(node.input)
        ex = expand_exprs(node.expressions, in_s)
        return exprs_schema(ex, in_s)
    if isinstance(node, L.LWithColumns):
        in_s = node_schema(node.input)
        ex = expand_exprs(node.expressions, in_s)
        out = in_s.copy()
        for n in ex:
            name = E.output_name(n) or "literal"
            out[name] = expr_dtype(n, in_s)
        return out
    if isinstance(node, (L.LFilter, L.LSlice, L.LDistinct)):
        return node_schema(node.input)
    if isinstance(node, L.LGroupBy):
        in_s = node_schema(node.input)
        keys = expand_exprs(node.keys, in_s)
        aggs = expand_exprs(node.aggs, in_s)
        out = Schema()
        for k in keys:
            name = E.output_name(k) or "literal"
            out[name] = expr_dtype(k, in_s)
        for a in aggs:
            name = E.output_name(a) or "literal"
            if name in out:
                raise DuplicateError(f"the name {name!r} is duplicate")
            d = expr_dtype(a, in_s, in_agg=True)
            # non-reducing agg exprs (bare columns, rank, x - x.mean()...)
            # implode to a List per group (the reference's AggState::
            # AggregatedList, polars-expr/src/expressions/mod.rs:139)
            out[name] = d if E.reduces_in_agg(a) else dt.List(d)
        return out
    if isinstance(node, L.LJoin):
        ls = node_schema(node.input_left)
        rs = node_schema(node.input_right)
        out = ls.copy()
        if node.how in ("semi", "anti"):
            return out
        coalesce = node.coalesce
        if coalesce is None:
            coalesce = node.how in ("inner", "left", "right")
        right_keys = {E.output_name(e) for e in node.right_on}
        left_keys = [E.output_name(e) for e in node.left_on]
        if node.how == "right" and coalesce:
            # right join keeps right key columns, drops left keys
            out = Schema([(n, d) for n, d in ls.items() if n not in set(left_keys)])
        for n, d in rs.items():
            if coalesce and n in right_keys and node.how != "right":
                # coalesced into the left key column
                idx = [E.output_name(e) for e in node.right_on].index(n)
                if left_keys[idx] in out:
                    continue
            if n in out:
                if n + node.suffix in out:
                    raise DuplicateError(
                        f"column with name {n + node.suffix!r} already exists; "
                        "pass a different `suffix`"
                    )
                out[n + node.suffix] = d
            else:
                out[n] = d
        return out
    if isinstance(node, L.LJoinWhere):
        ls = node_schema(node.input_left)
        rs = node_schema(node.input_right)
        out = ls.copy()
        for n, d in rs.items():
            if n in out:
                out[n + node.suffix] = d
            else:
                out[n] = d
        return out
    if isinstance(node, L.LAsofJoin):
        ls = node_schema(node.input_left)
        rs = node_schema(node.input_right)
        out = ls.copy()
        right_key = E.output_name(node.right_on)
        by_right = {E.output_name(e) for e in node.by_right}
        for n, d in rs.items():
            if n == right_key or n in by_right:
                continue
            if n in out:
                out[n + node.suffix] = d
            else:
                out[n] = d
        return out
    if isinstance(node, L.LSort):
        return node_schema(node.input)
    if isinstance(node, L.LUnion):
        schemas = [node_schema(i) for i in node.inputs_]
        out = schemas[0].copy()
        for s in schemas[1:]:
            for n, d in s.items():
                if n in out:
                    out[n] = supertype(out[n], d)
        return out
    if isinstance(node, L.LHConcat):
        out = Schema()
        for i in node.inputs_:
            for n, d in node_schema(i).items():
                out[n] = d
        return out
    if isinstance(node, L.LRename):
        in_s = node_schema(node.input)
        mapping = dict(node.mapping)
        if node.strict:
            missing = set(mapping) - set(in_s.names())
            if missing:
                raise ColumnNotFoundError(f"{sorted(missing)} not found")
        out = Schema([(mapping.get(n, n), d) for n, d in in_s.items()])
        if len(out) != len(in_s):
            raise DuplicateError("rename would create duplicate columns")
        return out
    if isinstance(node, L.LDrop):
        in_s = node_schema(node.input)
        if node.strict:
            missing = set(node.columns) - set(in_s.names())
            if missing:
                raise ColumnNotFoundError(f"{sorted(missing)} not found")
        return Schema([(n, d) for n, d in in_s.items() if n not in set(node.columns)])
    if isinstance(node, L.LWithRowIndex):
        in_s = node_schema(node.input)
        out = Schema([(node.name, dt.UInt32())])
        for n, d in in_s.items():
            out[n] = d
        return out
    if isinstance(node, L.LExplode):
        in_s = node_schema(node.input)
        out = in_s.copy()
        for c in node.columns:
            d = in_s[c]
            if isinstance(d, (dt.List, dt.Array)):
                out[c] = d.inner
        return out
    if isinstance(node, L.LUnpivot):
        in_s = node_schema(node.input)
        on = node.on if node.on is not None else tuple(
            n for n in in_s.names() if n not in set(node.index)
        )
        value_dt = None
        for c in on:
            value_dt = in_s[c] if value_dt is None else supertype(value_dt, in_s[c])
        out = Schema([(n, in_s[n]) for n in node.index])
        out[node.variable_name] = dt.String()
        out[node.value_name] = value_dt if value_dt is not None else dt.Null()
        return out
    if isinstance(node, L.LMapFunction):
        if node.schema_fn is not None:
            return node.schema_fn(node_schema(node.input))
        return node_schema(node.input)
    if isinstance(node, L.LSink):
        return node_schema(node.input)
    raise InvalidOperationError(f"cannot resolve schema of {type(node).__name__}")
