"""Expression tracer: AST node -> traced JAX computation.

The TPU replacement for ``create_physical_expr`` + ``PhysicalExpr::evaluate``
(polars-expr/src/{planner.rs,expressions/mod.rs:695}): instead of building a
physical-expression object tree interpreted per batch, expressions trace
directly into the enclosing XLA program; AggState tracking becomes the
``Val.domain`` tag; aggregation in group context lowers to the segmented
reductions in engine/groupby.py (GroupedReduction analogue).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from polars_tpu.kernels.fastmath import div_any, floordiv_any, mod_any
import numpy as np

from polars_tpu import datatypes as dt
from polars_tpu.engine import groupby as G
from polars_tpu.engine.cast import cast_val
from polars_tpu.engine.common import (
    GROUP,
    ROW,
    SCALAR,
    EvalCtx,
    GroupCtx,
    Val,
    broadcast_pair,
    combine_validity,
)
from polars_tpu.engine.registry import get_spec
from polars_tpu.engine.strings import unify_vals
from polars_tpu.errors import InvalidOperationError, ShapeError
from polars_tpu.plan import exprs as E
from polars_tpu.plan.schema_resolve import binary_dtype, supertype
from polars_tpu.utils import strtable

_ARITH = {"+", "-", "*", "/", "//", "%", "**"}
_CMP = {"==", "!=", "<", "<=", ">", ">=", "eq_missing", "ne_missing"}


def eval_expr(node: E.ENode, ctx: EvalCtx) -> Val:
    if isinstance(node, E.EColumn):
        try:
            return ctx.cols[node.name]
        except KeyError:
            from polars_tpu.errors import ColumnNotFoundError

            raise ColumnNotFoundError(
                f"{node.name!r} not found; available: {list(ctx.cols)}"
            ) from None
    if isinstance(node, E.ELiteral):
        return _eval_literal(node, ctx)
    # trace-time CSE: structurally-equal subtrees evaluate once per context
    # (sound: contexts are immutable during expression evaluation and every
    # new evaluation environment — window/group — gets a fresh EvalCtx)
    memo = ctx.memo
    if memo is not None:
        try:
            hit = memo.get(node)
        except TypeError:  # unhashable payload (list option etc.)
            memo = None
        else:
            if hit is not None:
                return hit
    val = _eval_expr_uncached(node, ctx)
    if memo is not None:
        memo[node] = val
    return val


def _eval_expr_uncached(node: E.ENode, ctx: EvalCtx) -> Val:
    if isinstance(node, E.ESeriesLit):
        col = node.column
        values = col.buffer.values
        if len(col) == 1:
            return Val(values[:1], None if col.buffer.validity is None else col.buffer.validity[:1], col.dtype, col.table, SCALAR)
        if values.shape[0] != ctx.padded:
            from polars_tpu.core.buffer import pad_to

            values = pad_to(values, ctx.padded)
            validity = None if col.buffer.validity is None else pad_to(col.buffer.validity, ctx.padded)
        else:
            validity = col.buffer.validity
        return Val(values, validity, col.dtype, col.table, ROW)
    if isinstance(node, (E.EAlias, E.EKeepName, E.ERenameFn)):
        return eval_expr(node.input, ctx)
    if isinstance(node, E.ECast):
        v = eval_expr(node.input, ctx)
        target = dt.resolve_dtype(node.dtype, ctx.schema, v.dtype)
        out = cast_val(v, target, strict=node.strict)
        if node.strict and ctx.flags is not None and out.validity is not None and out.validity is not v.validity:
            # strict semantics: any value the cast had to null out (overflow,
            # unparsable, not-in-enum) raises at the segment's count sync
            # (reference: strict CastColumn, polars-core cast with
            # CastOptions::Strict). Rows null BEFORE the cast stay legal.
            lost = v.valid_or_true() & ~out.validity
            if out.domain == ROW:
                lost = lost & ctx.rowmask
            elif out.domain == GROUP and ctx.groups is not None:
                lost = lost & ctx.groups.group_valid
            ctx.add_flag(
                jnp.any(lost),
                f"conversion from `{v.dtype!r}` to `{target!r}` failed in strict "
                "cast (overflow/unparsable values); use strict=False to "
                "produce nulls",
            )
        return out
    if isinstance(node, E.EBinary):
        return _eval_binary(node, ctx)
    if isinstance(node, E.ETernary):
        return _eval_ternary(node, ctx)
    if isinstance(node, E.EAgg):
        return _eval_agg(node, ctx)
    if isinstance(node, E.ELen):
        if ctx.groups is not None:
            counts = G.seg_count(ctx.rowmask, ctx.groups.gids, ctx.groups.capacity)
            return Val(counts.astype(jnp.uint32), None, dt.UInt32(), None, GROUP)
        return Val(
            jnp.asarray(ctx.length, jnp.uint32).reshape(1), None, dt.UInt32(), None, SCALAR
        )
    if isinstance(node, E.EFunction):
        spec = get_spec(node.name)
        args = [eval_expr(i, ctx) for i in node.inputs]
        if len(args) > 1:
            args = _adapt_dyn_literal_vals(node.inputs, args, ctx)
        if spec.elementwise and len(args) > 1:
            args = _align_group_row(ctx, args)
        return spec.impl(ctx, args, dict(node.options))
    if isinstance(node, E.EWindow):
        return _eval_window(node, ctx)
    if isinstance(node, E.ESort):
        return _eval_sort(node, ctx)
    if isinstance(node, E.ESortBy):
        return _eval_sort_by(node, ctx)
    if isinstance(node, E.EFilter):
        raise InvalidOperationError(
            "filter() inside expressions is only supported in aggregation context"
        )
    if isinstance(node, E.EGather):
        v = eval_expr(node.input, ctx)
        idx = eval_expr(node.indices, ctx)
        gathered = v.values[jnp.clip(idx.values.astype(jnp.int64), 0, v.values.shape[0] - 1)]
        gval = None if v.validity is None else v.validity[jnp.clip(idx.values.astype(jnp.int64), 0, v.values.shape[0] - 1)]
        dom = SCALAR if idx.domain == SCALAR else idx.domain
        return Val(gathered, combine_validity(gval, idx.validity), v.dtype, v.table, dom)
    if isinstance(node, E.ESlice):
        raise InvalidOperationError("expression-level slice is handled by the executor")
    if isinstance(node, E.EAnonymous):
        raise InvalidOperationError("UDFs are host ops (hoisted by the executor)")
    raise InvalidOperationError(f"cannot evaluate {type(node).__name__}")


# ---------------------------------------------------------------------------
# literals
# ---------------------------------------------------------------------------


def _eval_literal(node: E.ELiteral, ctx: EvalCtx) -> Val:
    value = node.value
    dtype = dt.parse_into_dtype(node.dtype) if node.dtype is not None else None
    if value is None:
        d = dtype if dtype is not None else dt.Null()
        table = strtable.empty_table() if type(d).__name__ in ("String", "Categorical", "Enum", "Binary") else None
        np_d = jnp.int32 if table is not None else (
            jnp.dtype(dt.dtype_to_numpy(d)) if not isinstance(d, dt.Null) else jnp.int32
        )
        return Val(jnp.zeros((1,), np_d), jnp.zeros((1,), bool), d, table, SCALAR)
    if isinstance(value, str) and (dtype is None or isinstance(dtype, (dt.String, dt.Categorical, dt.Enum))):
        table = strtable.StringTable(np.asarray([value], object), sorted_order=True)
        return Val(jnp.zeros((1,), jnp.int32), None, dtype or dt.String(), table, SCALAR)
    if isinstance(value, str) and dtype is not None and dtype.is_temporal():
        # ISO datetime literal -> epoch int (static at trace time)
        iv = _parse_temporal_literal(value, dtype)
        np_d = jnp.dtype(dt.dtype_to_numpy(dtype))
        return Val(jnp.asarray([iv], np_d), None, dtype, None, SCALAR)
    import decimal as _decimal

    if isinstance(value, _decimal.Decimal):
        d = dtype if isinstance(dtype, dt.Decimal) else _lit_dtype(value)
        iv = int(value.scaleb(d.scale).to_integral_value(_decimal.ROUND_HALF_EVEN))
        return Val(jnp.asarray([iv], jnp.int64), None, d, None, SCALAR)
    # numeric/bool/temporal-int literal: traced scalar when pre-collected
    if node in ctx.literals:
        arr = ctx.literals[node]
        d = dtype if dtype is not None else _lit_dtype(value)
        return Val(arr.reshape(1), None, d, None, SCALAR)
    d = dtype if dtype is not None else _lit_dtype(value)
    np_d = jnp.dtype(dt.dtype_to_numpy(d))
    return Val(jnp.asarray([value], np_d), None, d, None, SCALAR)


def _lit_dtype(value) -> dt.DataType:
    if isinstance(value, bool):
        return dt.Boolean()
    if isinstance(value, int):
        return dt.Int32() if -(2**31) <= value < 2**31 else dt.Int64()
    if isinstance(value, float):
        return dt.Float64()
    import decimal as _decimal

    if isinstance(value, _decimal.Decimal):
        exp = value.as_tuple().exponent
        return dt.Decimal(38, -exp if isinstance(exp, int) and exp < 0 else 0)
    raise InvalidOperationError(f"unsupported literal {value!r}")


def _parse_temporal_literal(value: str, dtype: dt.DataType):
    if isinstance(dtype, dt.Date):
        return int(np.datetime64(value, "D").astype(np.int64))
    if isinstance(dtype, dt.Datetime):
        import datetime as _pydt

        if isinstance(value, _pydt.datetime) and value.tzinfo is not None:
            # normalize to the stored representation: naive UTC instant
            value = value.astimezone(_pydt.timezone.utc).replace(tzinfo=None)
        return int(np.datetime64(value, dtype.time_unit).astype(np.int64))
    raise InvalidOperationError(f"cannot parse temporal literal for {dtype!r}")


def literal_host_value(node: E.ELiteral):
    """Host value + numpy dtype for a traceable literal (executor side)."""
    value = node.value
    dtype = dt.parse_into_dtype(node.dtype) if node.dtype is not None else None
    if value is None or isinstance(value, str):
        return None
    d = dtype if dtype is not None else _lit_dtype(value)
    return np.asarray(value, dt.dtype_to_numpy(d))


def collect_literals(nodes) -> list[E.ELiteral]:
    """Deterministic list of traceable literal nodes in a set of exprs."""
    seen: dict[E.ELiteral, None] = {}
    for n in nodes:
        for sub in E.walk(n):
            if isinstance(sub, E.ELiteral) and literal_host_value(sub) is not None:
                seen.setdefault(sub)
    return list(seen)


# ---------------------------------------------------------------------------
# binary ops
# ---------------------------------------------------------------------------


def _group_broadcast(v: Val, ctx: EvalCtx) -> Val:
    """Broadcast a GROUP-domain value back to rows via the group map — the
    reference's AggregatedScalar-combined-with-NotAggregated behavior in group
    context (e.g. ``x - x.mean()`` demeaning inside agg,
    polars-expr/src/expressions/mod.rs AggState handling)."""
    g = ctx.groups
    vals = v.values[g.gids]
    valid = None if v.validity is None else v.validity[g.gids]
    return v.with_(values=vals, validity=valid, domain=ROW)


def _align_group_row(ctx: EvalCtx, vals):
    """If GROUP- and ROW-domain values meet inside a group context, map the
    GROUP side back to rows so elementwise ops can combine them."""
    doms = {v.domain for v in vals}
    if ctx.groups is not None and GROUP in doms and ROW in doms:
        return [(_group_broadcast(v, ctx) if v.domain == GROUP else v) for v in vals]
    return list(vals)


def _adapt_dyn_literal_vals(nodes, vals, ctx: EvalCtx):
    """Runtime mirror of schema_resolve.adapt_dyn_literal_dtypes: untyped
    numeric literals take the first concrete numeric operand's dtype so the
    traced program matches the resolved schema (col_i8 + 1 stays Int8)."""
    from polars_tpu.plan.schema_resolve import dyn_literal_value, fit_dyn_dtype

    target = None
    for n, v in zip(nodes, vals):
        if dyn_literal_value(n) is None and v.dtype.is_numeric():
            target = v.dtype
            break
    if target is None:
        return list(vals)
    out = list(vals)
    for i, n in enumerate(nodes):
        lv = dyn_literal_value(n)
        if lv is None:
            continue
        nd = fit_dyn_dtype(lv, target)
        if nd is not None and nd != out[i].dtype:
            out[i] = cast_val(out[i], nd, strict=False)
    return out


def _eval_binary(node: E.EBinary, ctx: EvalCtx) -> Val:
    op = node.op
    a = eval_expr(node.left, ctx)
    b = eval_expr(node.right, ctx)
    a, b = _adapt_dyn_literal_vals((node.left, node.right), (a, b), ctx)
    a, b = _align_group_row(ctx, (a, b))
    a, b, dom = broadcast_pair(a, b)

    if op in ("&", "|") and all(
        isinstance(v.dtype, (dt.Boolean, dt.Null)) for v in (a, b)
    ) and any(isinstance(v.dtype, dt.Boolean) for v in (a, b)):
        def as_bool(v):
            if isinstance(v.dtype, dt.Null):
                return Val(
                    jnp.zeros(v.values.shape, bool),
                    jnp.zeros(v.values.shape, bool),
                    dt.Boolean(), None, v.domain,
                )
            return v

        return _kleene(op, as_bool(a), as_bool(b), dom)

    if op in _CMP:
        return _eval_compare(op, a, b, dom)

    # strings only support comparison
    if a.table is not None or b.table is not None:
        raise InvalidOperationError(f"operator {op!r} not supported for strings")

    out_dt = binary_dtype(op, a.dtype, b.dtype)
    if op == "**" and out_dt.is_integer():
        # reference raises on negative integer exponents (pow of int dtype is
        # int; a negative exponent would need a float result) — count-sync
        # error channel, no readback inside the trace
        ctx.add_flag(
            jnp.any(b.values < 0),
            "InvalidOperationError: exponent of an integer pow must be >= 0; "
            "cast to Float64 for negative exponents",
        )
    a2, b2, values, validity = _arith(op, a, b, out_dt)
    if validity is not None and validity.shape != values.shape:
        validity = jnp.broadcast_to(validity, values.shape)
    return Val(values, validity, out_dt, None, dom)


def _div_half_even(n, d):
    """Integer division rounding half to even (banker's), signed-safe; d != 0.
    Mirrors dec128_div/dec128_mul rounding (polars-compute decimal.rs:525-570)."""
    sign = jnp.where(d < 0, jnp.int64(-1), jnp.int64(1))
    n2 = n * sign
    d2 = d * sign  # > 0
    q = floordiv_any(n2, d2)
    r = n2 - q * d2  # 0 <= r < d2
    twice = 2 * r
    roundup = (twice > d2) | ((twice == d2) & ((q & 1) == 1))
    return q + roundup.astype(q.dtype)


def _div_pow10_half_even(n, s: int):
    if s == 0:
        return n
    return _div_half_even(n, jnp.full(n.shape, 10 ** s, jnp.int64))


def _arith(op: str, a: Val, b: Val, out_dt: dt.DataType):
    an, bn = type(a.dtype).__name__, type(b.dtype).__name__
    on = type(out_dt).__name__
    validity = combine_validity(a.validity, b.validity)

    # temporal arithmetic keeps integer epochs; unify time units via cast rules
    if on == "Duration" and op in ("-", "+") and an in ("Date", "Datetime", "Duration", "Time") :
        av, bv = _temporal_pair(a, b, out_dt)
        values = av - bv if op == "-" else av + bv
        return a, b, values, validity
    if an in ("Date", "Datetime") and bn == "Duration" or bn in ("Date", "Datetime") and an == "Duration":
        if on == "Date":
            # compute in microseconds, then floor back to whole days
            work = dt.Datetime("us")
            av, bv = _temporal_pair(a, b, work)
            values = av + bv if op == "+" else av - bv
            values = floordiv_any(values, 86_400_000_000).astype(jnp.int32)
        else:
            av, bv = _temporal_pair(a, b, out_dt)
            values = av + bv if op == "+" else av - bv
        return a, b, values, validity
    if on == "Duration" and op in ("*", "/") :
        av = a.values.astype(jnp.int64)
        bv = b.values
        if op == "*":
            values = (av * bv).astype(jnp.int64) if bn != "Duration" else av * bv
        else:
            values = floordiv_any(av, jnp.maximum(bv, 1)).astype(jnp.int64)
            validity = combine_validity(validity, b.values != 0)
        return a, b, values, validity

    if on == "Decimal" and op in ("+", "-", "*", "/"):
        # reference semantics (polars-core arithmetic/decimal.rs): both sides
        # rescale to scale = max(s_l, s_r); mul = round_half_even(l*r/10^s);
        # div = round_half_even(l*10^s/r). Physical storage is scaled int64.
        s_out = out_dt.scale

        def resc(v: Val):
            s = v.dtype.scale if isinstance(v.dtype, dt.Decimal) else 0
            x = v.values.astype(jnp.int64)
            if s < s_out:
                x = x * jnp.int64(10 ** (s_out - s))
            return x

        av, bv = resc(a), resc(b)
        if op == "+":
            values = av + bv
        elif op == "-":
            values = av - bv
        elif op == "*":
            values = _div_pow10_half_even(av * bv, s_out)
        else:  # "/"
            nz = bv != 0
            safe_b = jnp.where(nz, bv, jnp.ones((), bv.dtype))
            values = _div_half_even(av * jnp.int64(10 ** s_out), safe_b)
            validity = combine_validity(validity, nz)
        return a, b, values, validity

    st = supertype(a.dtype, b.dtype) if not out_dt.is_float() or a.dtype.is_float() or b.dtype.is_float() else out_dt
    if op == "/":
        st = out_dt  # float division
    ac = cast_val(a, st, strict=False) if a.dtype != st else a
    bc = cast_val(b, st, strict=False) if b.dtype != st else b
    av, bv = ac.values, bc.values

    if op == "+":
        values = av + bv
    elif op == "-":
        values = av - bv
    elif op == "*":
        values = av * bv
    elif op == "/":
        values = div_any(av, bv) if st.is_float() or out_dt.is_float() else av / bv
    elif op == "//":
        if st.is_float():
            values = jnp.floor(div_any(av, bv))
            validity = validity
        else:
            values = floordiv_any(av, jnp.where(bv == 0, jnp.ones((), bv.dtype), bv))
            validity = combine_validity(validity, bv != 0)
    elif op == "%":
        if st.is_float():
            values = mod_any(av, bv)
        else:
            values = mod_any(av, jnp.where(bv == 0, jnp.ones((), bv.dtype), bv))
            validity = combine_validity(validity, bv != 0)
    elif op == "**":
        if out_dt.is_integer():
            values = jnp.power(av, bv)
        else:
            values = jnp.power(av.astype(jnp.dtype(dt.dtype_to_numpy(out_dt))), bv)
    elif op == "^":
        values = av ^ bv
    elif op == "&":
        values = av & bv
    elif op == "|":
        values = av | bv
    else:
        raise InvalidOperationError(f"unknown operator {op!r}")
    if values.dtype != jnp.dtype(dt.dtype_to_numpy(out_dt)) and out_dt.is_numeric():
        values = values.astype(jnp.dtype(dt.dtype_to_numpy(out_dt)))
    return ac, bc, values, validity


def _temporal_pair(a: Val, b: Val, out_dt: dt.DataType):
    """Align two temporal vals on a common integer timescale."""
    target_unit = getattr(out_dt, "time_unit", "us")

    def to_unit(v: Val):
        n = type(v.dtype).__name__
        x = v.values.astype(jnp.int64)
        if n == "Date":
            factor = {"ms": 86_400_000, "us": 86_400_000_000, "ns": 86_400_000_000_000}[target_unit]
            return x * factor
        if n in ("Datetime", "Duration"):
            src = v.dtype.time_unit
            f = {"ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}
            if src == target_unit:
                return x
            if f[target_unit] > f[src]:
                return x * (f[target_unit] // f[src])
            return floordiv_any(x, f[src] // f[target_unit])
        if n == "Time":
            f = {"ms": 1_000_000, "us": 1_000, "ns": 1}[target_unit]
            return floordiv_any(x, f)
        return x

    return to_unit(a), to_unit(b)


def _enum_remap(v: Val, etable) -> Val:
    """Remap a dict-coded Val's codes into an Enum table's category-index
    space; values absent from the categories become null."""
    if v.table is etable:
        return v
    pos = {u: i for i, u in enumerate(etable.values.tolist())}
    src = v.table.values.tolist()
    lut = np.full(max(len(src), 1), -1, np.int32)
    for i, u in enumerate(src):
        lut[i] = pos.get(u, -1)
    codes = jnp.asarray(lut)[jnp.clip(v.values, 0, max(len(src) - 1, 0))]
    ok = codes >= 0
    return v.with_(
        values=jnp.maximum(codes, 0),
        validity=combine_validity(v.validity, ok),
        table=etable,
    )


def _scalar_one_table(v: Val) -> Val | None:
    """The Val if it is a SCALAR with a single-entry dictionary (i.e. a string
    literal whose value is host-known at trace time), else None."""
    if (
        v.domain == SCALAR
        and v.table is not None
        and not getattr(v.table, "hashed", False)
        and len(v.table) == 1
    ):
        return v
    return None


def _compare_vs_scalar_lut(base: str, a: Val, b: Val, dom: str) -> Val:
    """Ordering compare of a dict column against ONE host-known value via a
    host bool LUT over the dictionary — O(|dict|) elementwise compares, no
    ordinalization (the high-cardinality literal-filter path)."""
    flip = {"<": ">", ">": "<", "<=": ">=", ">=": "<="}
    if _scalar_one_table(b) is not None and _scalar_one_table(a) is None:
        col, lit_val, opx = a, b, base
    else:
        col, lit_val, opx = b, a, flip[base]
    lit = lit_val.table.values[0]
    vals = col.table.values
    if opx == "<":
        lut_np = vals < lit
    elif opx == "<=":
        lut_np = vals <= lit
    elif opx == ">":
        lut_np = vals > lit
    else:
        lut_np = vals >= lit
    lut = jnp.asarray(np.asarray(lut_np, dtype=bool))
    values = lut[jnp.clip(col.values, 0, max(len(vals) - 1, 0))]
    validity = combine_validity(
        a.validity if a.validity is None else jnp.broadcast_to(a.validity, values.shape),
        b.validity if b.validity is None else jnp.broadcast_to(b.validity, values.shape),
    )
    return Val(values, validity, dt.Boolean(), None, dom)


def _eval_compare(op: str, a: Val, b: Val, dom: str) -> Val:
    if (a.table is not None) != (b.table is not None):
        # string vs non-string: cast the non-string? polars errors; so do we
        raise InvalidOperationError(
            f"cannot compare {a.dtype!r} with {b.dtype!r}"
        )
    base = {"eq_missing": "==", "ne_missing": "!="}.get(op, op)
    if a.table is not None:
        if getattr(a.table, "hashed", False) or getattr(b.table, "hashed", False):
            # hashed-key column (utils/hashstore.py): equality compares in
            # hash space; a dictionary/literal operand maps in by hashing
            # its (small) table. Ordering needs byte order — the engine
            # pre-pass densifies such columns before the trace, so reaching
            # here with an ordering op is a gating bug, not a user error.
            if base not in ("==", "!="):
                raise InvalidOperationError(
                    "ordering comparison on a hashed string column reached "
                    "the trace — the densify pre-pass must cover this plan "
                    "shape (engine/run.py _densify_hashed_leaves)"
                )

            def _hash_space(v: Val) -> jax.Array:
                if getattr(v.table, "hashed", False):
                    return v.values
                from polars_tpu.utils import hashstore

                harr = (
                    hashstore.hash_values(v.table.values)
                    if len(v.table) else np.zeros(1, np.int64)
                )
                lut = jnp.asarray(harr)
                return lut[jnp.clip(v.values, 0, len(harr) - 1)]

            av, bv = _hash_space(a), _hash_space(b)
        elif isinstance(a.dtype, dt.Enum) or isinstance(b.dtype, dt.Enum):
            # align onto the enum's category-order code space; values outside
            # the categories compare as null (reference: enum vs str cmp)
            e = a if isinstance(a.dtype, dt.Enum) else b
            a, b = (_enum_remap(a, e.table), _enum_remap(b, e.table))
            av, bv = a.values, b.values
        elif base in ("==", "!="):
            # equality never needs ordinal codes: hash-probe the smaller
            # dictionary into the bigger one's code space (-1 = absent, which
            # can never equal a valid code) — O(u), no host sort
            if a.table is b.table:
                av, bv = a.values, b.values
            elif len(a.table) == 0 or len(b.table) == 0:
                # an empty dictionary (all-null literal): codes never equal
                av = a.values
                bv = jnp.full(b.values.shape, -1, a.values.dtype)
            elif len(b.table) <= len(a.table):
                rmap = strtable.index_in(b.table.values, a.table.values)
                bv = jnp.asarray(rmap)[jnp.clip(b.values, 0, len(rmap) - 1)]
                av = a.values
            else:
                lmap = strtable.index_in(a.table.values, b.table.values)
                av = jnp.asarray(lmap)[jnp.clip(a.values, 0, len(lmap) - 1)]
                bv = b.values
        else:
            from polars_tpu.engine.strings import ensure_ordinal_val, needs_ordinal

            lit = _scalar_one_table(b) or _scalar_one_table(a)
            if lit is not None and (needs_ordinal(a) or needs_ordinal(b)):
                # ordering compare vs ONE value on a big unordered dict: a
                # host bool LUT over the dictionary beats ordinalizing it
                return _compare_vs_scalar_lut(base, a, b, dom)
            a, b = ensure_ordinal_val(a), ensure_ordinal_val(b)
            a, b = unify_vals(a, b, require_ordinal=True)
            av, bv = a.values, b.values
    else:
        st = supertype(a.dtype, b.dtype)
        ac = cast_val(a, st, strict=False) if a.dtype != st else a
        bc = cast_val(b, st, strict=False) if b.dtype != st else b
        av, bv = ac.values, bc.values

    if base == "==":
        values = av == bv
    elif base == "!=":
        values = av != bv
    elif base == "<":
        values = av < bv
    elif base == "<=":
        values = av <= bv
    elif base == ">":
        values = av > bv
    else:
        values = av >= bv

    va = a.valid_or_true() if a.validity is not None else None
    vb = b.valid_or_true() if b.validity is not None else None
    if op in ("eq_missing", "ne_missing"):
        an = jnp.zeros(av.shape, bool) if va is None else ~va
        bn_ = jnp.zeros(bv.shape, bool) if vb is None else ~vb
        both_null = an & bn_
        either_null = an | bn_
        if op == "eq_missing":
            values = jnp.where(either_null, both_null, values)
        else:
            values = jnp.where(either_null, ~both_null, values)
        return Val(values, None, dt.Boolean(), None, dom)
    validity = combine_validity(va, vb)
    if validity is not None and validity.shape != values.shape:
        validity = jnp.broadcast_to(validity, values.shape)
    return Val(values, validity, dt.Boolean(), None, dom)


def _kleene(op: str, a: Val, b: Val, dom: str) -> Val:
    """SQL three-valued logic for boolean &/| (reference:
    polars-compute/src/boolean.rs Kleene kernels)."""
    av = a.values.astype(bool)
    bv = b.values.astype(bool)
    an = None if a.validity is None else ~a.validity
    bn = None if b.validity is None else ~b.validity
    if op == "&":
        values = av & bv
        if an is None and bn is None:
            validity = None
        else:
            a_false = av == False  # noqa: E712
            b_false = bv == False  # noqa: E712
            an_ = jnp.zeros(av.shape, bool) if an is None else an
            bn_ = jnp.zeros(bv.shape, bool) if bn is None else bn
            known_false = (~an_ & a_false) | (~bn_ & b_false)
            validity = known_false | (~an_ & ~bn_)
            values = jnp.where(an_ | bn_, False, values)
    else:
        values = av | bv
        if an is None and bn is None:
            validity = None
        else:
            an_ = jnp.zeros(av.shape, bool) if an is None else an
            bn_ = jnp.zeros(bv.shape, bool) if bn is None else bn
            known_true = (~an_ & av) | (~bn_ & bv)
            validity = known_true | (~an_ & ~bn_)
            values = jnp.where(known_true, True, values)
    return Val(values, validity, dt.Boolean(), None, dom)


# ---------------------------------------------------------------------------
# ternary
# ---------------------------------------------------------------------------


def _eval_ternary(node: E.ETernary, ctx: EvalCtx) -> Val:
    p = eval_expr(node.predicate, ctx)
    t = eval_expr(node.truthy, ctx)
    f = eval_expr(node.falsy, ctx)
    t, f = _adapt_dyn_literal_vals((node.truthy, node.falsy), (t, f), ctx)
    p, t, f = _align_group_row(ctx, (p, t, f))
    t, f = _unify_branches(t, f)
    # reconcile domains
    doms = {p.domain, t.domain, f.domain} - {SCALAR}
    dom = doms.pop() if doms else SCALAR
    if len(doms) > 0:
        raise ShapeError("mixed domains in when/then/otherwise")
    pv = p.values.astype(bool)
    if p.validity is not None:
        # a null predicate picks the OTHERWISE branch (reference:
        # if_then_else kernels; tests/unit/functions/test_when_then.py
        # test_when_then_parametric builds its oracle with `t if m else f`)
        pv = pv & p.validity
    values = jnp.where(pv, t.values, f.values)
    tv = t.validity
    fv = f.validity
    if tv is None and fv is None:
        validity = None
    else:
        tv_ = jnp.ones(t.values.shape, bool) if tv is None else tv
        fv_ = jnp.ones(f.values.shape, bool) if fv is None else fv
        validity = jnp.where(pv, tv_, fv_)
    return Val(values, validity, t.dtype, t.table, dom)


def _unify_branches(t: Val, f: Val) -> tuple[Val, Val]:
    if t.table is not None or f.table is not None:
        if t.table is not None and f.table is not None:
            t2, f2 = unify_vals(t, f)
            return t2, f2
        # one side is a null literal
        if isinstance(t.dtype, dt.Null):
            return t.with_(dtype=f.dtype, table=f.table), f
        if isinstance(f.dtype, dt.Null):
            return t, f.with_(dtype=t.dtype, table=t.table)
        raise InvalidOperationError("when/then branches mix string and non-string")
    st = supertype(t.dtype, f.dtype)
    t2 = cast_val(t, st, strict=False) if t.dtype != st else t
    f2 = cast_val(f, st, strict=False) if f.dtype != st else f
    return t2, f2


# ---------------------------------------------------------------------------
# aggregation
# ---------------------------------------------------------------------------


def _group_of(ctx: EvalCtx) -> tuple[jax.Array, jax.Array, int]:
    """(gids, contrib rowmask, capacity) — scalar aggs use a single group."""
    if ctx.groups is not None:
        return ctx.groups.gids, ctx.rowmask, ctx.groups.capacity
    return jnp.zeros((ctx.padded,), jnp.int32), ctx.rowmask, 1


def _seg_avg_rank(values, vdtype, m, gids) -> jax.Array:
    """Average (tie-sharing) 1-based rank of each valid row within its group,
    computed in-trace via one stable word-sort (the spearman rank step;
    reference polars-ops/src/series/ops/rank.rs average method)."""
    from polars_tpu.kernels.argsort import (
        boundaries_from_words,
        key_words,
        stable_argsort_words,
    )

    n = values.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    gw = jnp.where(m, gids, jnp.int32(2**31 - 1))
    words = [(~m).astype(jnp.int8), gw, *key_words(values, vdtype)]
    perm = stable_argsort_words(words)
    gid_s = gw[perm]
    newg = jnp.concatenate(
        [jnp.ones((1,), bool), gid_s[1:] != gid_s[:-1]]
    )
    gstart = jax.lax.associative_scan(jnp.maximum, jnp.where(newg, iota, 0))
    newv = boundaries_from_words(words, perm)
    rstart = jax.lax.associative_scan(jnp.maximum, jnp.where(newv, iota, 0))
    rlen = jnp.zeros((n,), jnp.int32).at[rstart].add(1)[rstart]
    avg = (
        (rstart - gstart).astype(jnp.float64)
        + (rlen.astype(jnp.float64) - 1.0) / 2.0
        + 1.0
    )
    return jnp.zeros((n,), jnp.float64).at[perm].set(avg, unique_indices=True)


def _eval_agg(node: E.EAgg, ctx: EvalCtx) -> Val:
    if ctx.precomputed is not None and node in ctx.precomputed:
        return ctx.precomputed[node]
    kind = node.kind
    input_node = node.input
    extra_mask = None
    if isinstance(input_node, E.EFilter):
        cond = eval_expr(input_node.by, ctx)
        extra_mask = cond.values.astype(bool)
        if cond.validity is not None:
            extra_mask = extra_mask & cond.validity
        input_node = input_node.input

    gids, rowmask, cap = _group_of(ctx)
    if extra_mask is not None:
        rowmask = rowmask & extra_mask
    dom = GROUP if ctx.groups is not None else SCALAR
    out_valid_all = None if ctx.groups is not None else None

    if (
        kind in ("corr", "cov")
        and isinstance(input_node, E.EFunction)
        and input_node.name == "pack_pair"
    ):
        # Pearson/Spearman corr / covariance over rows where BOTH inputs are
        # valid (reference: polars-ops pearson_corr / spearman_rank_corr)
        method = node.opt("method", "pearson")
        if kind == "corr" and method not in ("pearson", "spearman"):
            raise InvalidOperationError(f"corr: unknown method {method!r}")
        a = eval_expr(input_node.inputs[0], ctx)
        b = eval_expr(input_node.inputs[1], ctx)
        m = rowmask
        for s in (a, b):
            if s.validity is not None:
                m = m & s.validity
        if kind == "corr" and method == "spearman":
            # rank (average method) within group, then pearson on the ranks
            x = _seg_avg_rank(a.values, a.dtype, m, gids)
            y = _seg_avg_rank(b.values, b.dtype, m, gids)
        else:
            x = a.values.astype(jnp.float64)
            y = b.values.astype(jnp.float64)
        zero = jnp.float64(0.0)
        n = G.seg_count(m, gids, cap).astype(jnp.float64)
        sx = G.seg_sum(jnp.where(m, x, zero), m, gids, cap)
        sy = G.seg_sum(jnp.where(m, y, zero), m, gids, cap)
        sxy = G.seg_sum(jnp.where(m, x * y, zero), m, gids, cap)
        if kind == "cov":
            ddof = int(node.opt("ddof", 1))
            num = sxy - div_any(sx * sy, jnp.maximum(n, 1.0))
            out = div_any(num, n - ddof)
            has = n > ddof
            return Val(out, has, dt.Float64(), None, dom)
        sxx = G.seg_sum(jnp.where(m, x * x, zero), m, gids, cap)
        syy = G.seg_sum(jnp.where(m, y * y, zero), m, gids, cap)
        varx = n * sxx - sx * sx
        vary = n * syy - sy * sy
        denom = jnp.sqrt(jnp.maximum(varx, 0.0) * jnp.maximum(vary, 0.0))
        out = jnp.where(denom > 0.0, div_any(n * sxy - sx * sy, denom), jnp.nan)
        has = n >= 1
        return Val(out, has, dt.Float64(), None, dom)

    if kind == "len":
        counts = G.seg_count(rowmask, gids, cap)
        return Val(counts.astype(jnp.uint32), None, dt.UInt32(), None, dom)

    v = eval_expr(input_node, ctx)
    if isinstance(v.dtype, dt.Decimal) and kind in (
        "mean", "median", "quantile", "std", "var", "skew", "kurtosis", "entropy",
    ):
        # float-valued aggs of Decimal operate on the logical value, not the
        # scaled-int physical (reference: decimal mean -> f64)
        v = v.with_(
            values=v.values.astype(jnp.float64) * (10.0 ** -v.dtype.scale),
            dtype=dt.Float64(),
        )
    if v.domain == GROUP:
        raise InvalidOperationError("nested aggregations are not supported")
    if v.domain == SCALAR:
        # broadcast scalar to rows (e.g. lit(1).sum() over groups)
        v = v.with_(
            values=jnp.broadcast_to(v.values, (ctx.padded,)),
            validity=None if v.validity is None else jnp.broadcast_to(v.validity, (ctx.padded,)),
            domain=ROW,
        )
    data_mask = rowmask if v.validity is None else (rowmask & v.validity)

    if kind == "count":
        counts = G.seg_count(data_mask, gids, cap)
        return Val(counts.astype(jnp.uint32), None, dt.UInt32(), None, dom)
    if kind == "null_count":
        nulls = rowmask & (~v.validity if v.validity is not None else jnp.zeros((ctx.padded,), bool))
        counts = G.seg_count(nulls, gids, cap)
        return Val(counts.astype(jnp.uint32), None, dt.UInt32(), None, dom)
    if kind == "sum":
        out_dt = _agg_out_dtype(node, v.dtype)
        acc = v.values
        if isinstance(v.dtype, dt.Boolean):
            acc = acc.astype(jnp.uint32)
        elif out_dt != v.dtype:
            acc = acc.astype(jnp.dtype(dt.dtype_to_numpy(out_dt)))
        s = G.seg_sum(acc, data_mask, gids, cap)
        # polars: sum of all-null/empty = 0 (not null)
        return Val(s, None, out_dt, None, dom)
    if kind == "product":
        out_dt = _agg_out_dtype(node, v.dtype)
        acc = v.values.astype(jnp.dtype(dt.dtype_to_numpy(out_dt)))
        one = jnp.ones((), acc.dtype)
        x = jnp.where(data_mask, acc, one)
        logsum = jnp.ones((cap,), acc.dtype)
        # product via scatter-multiply is unsupported; use exp-log for floats,
        # fori for ints is wasteful -> use segment trick: prod = exp(seg_sum(log|x|)) * sign
        if out_dt.is_float():
            absx = jnp.abs(x)
            logs = jnp.where(data_mask, jnp.log(jnp.maximum(absx, 1e-300)), 0.0)
            s = jnp.exp(G.seg_sum(logs, data_mask, gids, cap))
            negs = G.seg_count(data_mask & (x < 0), gids, cap)
            zeros = G.seg_count(data_mask & (x == 0), gids, cap)
            sign = jnp.where((negs & 1) == 1, -1.0, 1.0)
            p = jnp.where(zeros > 0, 0.0, s * sign)
            return Val(p, None, out_dt, None, dom)
        # integer product: iterative doubling over sorted segments is overkill;
        # fall back to float path then round (exact for small products)
        fx = x.astype(jnp.float64)
        logs = jnp.where(data_mask, jnp.log(jnp.maximum(jnp.abs(fx), 1e-300)), 0.0)
        s = jnp.exp(G.seg_sum(logs, data_mask, gids, cap))
        negs = G.seg_count(data_mask & (fx < 0), gids, cap)
        zeros = G.seg_count(data_mask & (fx == 0), gids, cap)
        sign = jnp.where((negs & 1) == 1, -1.0, 1.0)
        p = jnp.where(zeros > 0, 0.0, jnp.round(s) * sign)
        return Val(p.astype(jnp.int64), None, dt.Int64(), None, dom)
    if kind in ("min", "max"):
        from polars_tpu.engine.strings import ensure_ordinal_val

        v = ensure_ordinal_val(v)  # lex min/max on unordered dicts
        fn = G.seg_min if kind == "min" else G.seg_max
        has = G.seg_count(data_mask, gids, cap) > 0
        out = fn(v.values, data_mask, gids, cap)
        return Val(out, has, v.dtype, v.table, dom)
    if kind == "mean":
        if v.dtype.is_temporal():
            m, has = G.seg_mean(v.values.astype(jnp.float64), data_mask, gids, cap)
            out_dt = _agg_out_dtype(node, v.dtype)
            return Val(m.astype(jnp.int64), has, out_dt, None, dom)
        m, has = G.seg_mean(v.values, data_mask, gids, cap)
        out_dt = _agg_out_dtype(node, v.dtype)
        return Val(m.astype(jnp.dtype(dt.dtype_to_numpy(out_dt))), has, out_dt, None, dom)
    if kind in ("var", "std"):
        ddof = node.opt("ddof", 1)
        var, ok = G.seg_var(v.values, data_mask, gids, cap, ddof)
        out = jnp.sqrt(var) if kind == "std" else var
        out_dt = _agg_out_dtype(node, v.dtype)
        return Val(out.astype(jnp.dtype(dt.dtype_to_numpy(out_dt))), ok, out_dt, None, dom)
    if kind in ("first", "last"):
        # polars first/last include nulls: pick by row position among in-group
        # rows — or by over(order_by=...) position when order words are set
        # (SQL FIRST_VALUE semantics).
        g = ctx.groups
        if g is not None and g.order_words:
            from polars_tpu.kernels.argsort import stable_argsort_words

            n = rowmask.shape[0]
            gkey = jnp.where(rowmask, gids, jnp.int32(2**31 - 1))
            operm = stable_argsort_words([gkey] + list(g.order_words))
            iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
            pos = jnp.zeros((n,), jnp.int32).at[operm].set(iota, unique_indices=True)
            score = pos if kind == "first" else (jnp.int32(n - 1) - pos)
            score = jnp.where(rowmask, score, jnp.int32(n))
            best = jnp.full((cap,), n, jnp.int32).at[gids].min(score, mode="drop")
            has = best < n
            bpos = best if kind == "first" else jnp.int32(n - 1) - best
            idx = operm[jnp.clip(bpos, 0, n - 1)]
        else:
            fn = G.seg_first_idx if kind == "first" else G.seg_last_idx
            idx, has = fn(rowmask, gids, cap)
        out = v.values[idx]
        validity = has if v.validity is None else (has & v.validity[idx])
        return Val(out, validity, v.dtype, v.table, dom)
    if kind in ("arg_min", "arg_max"):
        from polars_tpu.engine.strings import ensure_ordinal_val

        v = ensure_ordinal_val(v)
        # sort-free: find the extreme value per group, then its first row index
        ext = (G.seg_min if kind == "arg_min" else G.seg_max)(
            v.values, data_mask, gids, cap
        )
        is_best = data_mask & (v.values == ext[gids])
        if v.dtype.is_float():
            # NaN is greatest: if a group's max is NaN, match NaN rows
            if kind == "arg_max":
                has_nan = G.seg_any(jnp.isnan(v.values), data_mask, gids, cap)
                is_best = data_mask & jnp.where(
                    has_nan[gids], jnp.isnan(v.values), v.values == ext[gids]
                )
        idx, has = G.seg_first_idx(is_best, gids, cap)
        # polars returns the position WITHIN the group's element list (post
        # expression filter, nulls counted as elements), not the global row
        # index: count in-group rows preceding the winner.
        n = rowmask.shape[0]
        iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
        before = rowmask & (iota < idx[gids])
        pos = G.seg_count(before, gids, cap)
        return Val(pos.astype(jnp.uint32), has, dt.UInt32(), None, dom)
    if kind in ("any", "all"):
        bv = v.values.astype(bool)
        fn = G.seg_any if kind == "any" else G.seg_all
        out = fn(bv, data_mask, gids, cap)
        if node.opt("ignore_nulls", True) or v.validity is None:
            return Val(out, None, dt.Boolean(), None, dom)
        # Kleene: any -> null when no true but nulls present; all -> null
        # when no false but nulls present (reference BooleanChunked any/all
        # with ignore_nulls=False)
        has_null = G.seg_any(~v.validity, rowmask, gids, cap)
        if kind == "any":
            validity = out | ~has_null
        else:
            validity = ~out | ~has_null
        return Val(out, validity, dt.Boolean(), None, dom)
    if kind == "item":
        # exactly one row (reference: Expr.item) — >1 always errors, 0 errors
        # unless allow_empty, which yields null
        cnt = G.seg_count(rowmask, gids, cap)
        ctx.add_flag(jnp.any(cnt > 1), "can only call `.item()` if the dataframe is of shape (1, 1)")
        if not node.opt("allow_empty", False):
            ctx.add_flag(jnp.any(cnt == 0), "can only call `.item()` if the dataframe is of shape (1, 1)")
        idx, has = G.seg_first_idx(rowmask, gids, cap)
        out = v.values[idx]
        validity = has if v.validity is None else (has & v.validity[idx])
        return Val(out, validity, v.dtype, v.table, dom)
    if kind == "is_sorted":
        from polars_tpu.engine.strings import ensure_ordinal_val

        v = ensure_ordinal_val(v)
        desc_opt = node.opt("descending", False)
        nl_opt = node.opt("nulls_last", False)
        iota = jax.lax.broadcasted_iota(jnp.int32, (ctx.padded, 1), 0).squeeze(-1)
        prev_all = jax.lax.cummax(jnp.where(rowmask, iota, jnp.int32(-1)))
        # previous in-mask row STRICTLY before i: shift the inclusive cummax
        prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), prev_all[:-1]])
        pi = jnp.clip(prev, 0, ctx.padded - 1)
        applies = rowmask & (prev >= 0) & (gids[pi] == gids)

        def sorted_ok(descending, nulls_last):
            from polars_tpu.kernels.argsort import key_words

            words = list(key_words(v.values, v.dtype, descending=bool(descending)))
            # fold null ordering in as a leading word; zero value words on
            # null rows so null-null pairs don't compare garbage payloads
            if v.validity is not None:
                nullw = jnp.where(v.validity, 0, 1) if nulls_last else jnp.where(v.validity, 1, 0)
                words = [nullw.astype(jnp.int32)] + [
                    jnp.where(v.validity, w, jnp.zeros((), w.dtype)) for w in words
                ]
            gt = jnp.zeros((ctx.padded,), bool)  # prev > cur decided so far
            lt = jnp.zeros((ctx.padded,), bool)
            for w in words:
                pw = w[pi]
                gt = gt | (~lt & (pw > w))
                lt = lt | (~gt & (pw < w))
            return G.seg_all(~gt | ~applies, rowmask, gids, cap)

        descs = [desc_opt] if desc_opt is not None else [False, True]
        nls = [nl_opt] if nl_opt is not None else [False, True]
        acc = None
        for d_ in descs:
            for nl_ in nls:
                r = sorted_ok(d_, nl_)
                acc = r if acc is None else (acc | r)
        return Val(acc, None, dt.Boolean(), None, dom)
    if kind in ("bitwise_and", "bitwise_or", "bitwise_xor"):
        # bit-sliced reduction: per-bit scatter-add counts, then recombine —
        # AND = (count == group size), OR = (count > 0), XOR = parity
        # (reference: polars-ops src/series/ops/bitwise.rs and_reduce/or/xor)
        has = G.seg_count(data_mask, gids, cap) > 0
        if isinstance(v.dtype, dt.Boolean):
            bv = v.values.astype(bool)
            if kind == "bitwise_and":
                out = G.seg_all(bv, data_mask, gids, cap)
            elif kind == "bitwise_or":
                out = G.seg_any(bv, data_mask, gids, cap)
            else:
                cnt1 = G.seg_count(data_mask & bv, gids, cap)
                out = (cnt1 & 1) == 1
            return Val(out, has, dt.Boolean(), None, dom)
        if not v.dtype.is_integer():
            raise InvalidOperationError(f"{kind} expects an integer or boolean column")
        ivals = v.values
        nbits = ivals.dtype.itemsize * 8
        shifts = jnp.arange(nbits, dtype=ivals.dtype)
        bits = ((ivals[:, None] >> shifts[None, :]) & 1).astype(jnp.int32)
        bits = jnp.where(data_mask[:, None], bits, 0)
        sums = jnp.zeros((cap, nbits), jnp.int32).at[gids].add(bits, mode="drop")
        cnt = G.seg_count(data_mask, gids, cap)
        if kind == "bitwise_and":
            outbits = sums == cnt[:, None]
        elif kind == "bitwise_or":
            outbits = sums > 0
        else:
            outbits = (sums & 1) == 1
        # disjoint bit patterns: summing shifted bits is carry-free, so
        # wraparound int addition reconstructs the word exactly
        out = (outbits.astype(ivals.dtype) << shifts[None, :]).sum(
            axis=1, dtype=ivals.dtype
        )
        return Val(out, has, v.dtype, None, dom)
    if kind == "n_unique":
        out = G.seg_nunique(v.values, v.validity, rowmask, gids, cap, v.dtype)
        return Val(out.astype(jnp.uint32), None, dt.UInt32(), None, dom)
    if kind in ("median", "quantile"):
        q = 0.5 if kind == "median" else float(node.opt("quantile", 0.5))
        interp = "linear" if kind == "median" else node.opt("interpolation", "nearest")
        out, has = G.seg_quantile(v.values, data_mask, gids, cap, q, interp)
        out_dt = _agg_out_dtype(node, v.dtype)
        if v.dtype.is_temporal():
            return Val(out.astype(jnp.int64), has, out_dt, None, dom)
        return Val(out.astype(jnp.dtype(dt.dtype_to_numpy(out_dt))), has, out_dt, None, dom)
    if kind == "mode":
        from polars_tpu.engine.strings import ensure_ordinal_val

        v = ensure_ordinal_val(v)  # tie-break picks the lex-smallest value
        # sort by (gid, value); the mode of each gid is the longest equal-run
        # (ties -> smallest value, polars' convention for a single mode)
        from polars_tpu.kernels.argsort import (
            boundaries_from_words,
            key_words,
            stable_argsort_words,
        )

        n = v.values.shape[0]
        logn = int(np.log2(n))
        iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
        invalid = ~data_mask
        words = [invalid.astype(jnp.int8), jnp.where(data_mask, gids, 2**31 - 1),
                 *key_words(v.values, v.dtype)]
        perm = stable_argsort_words(words)
        newval = boundaries_from_words(words, perm)
        pos = iota
        run_start = jax.lax.associative_scan(jnp.maximum, jnp.where(newval, pos, 0))
        run_len = jnp.zeros((n,), jnp.int32).at[run_start].add(1)[run_start]
        valid_s = data_mask[perm]
        score = run_len.astype(jnp.int64) * n + (n - 1 - run_start).astype(jnp.int64)
        best = (
            jnp.full((cap,), -1, jnp.int64)
            .at[jnp.where(valid_s, gids[perm], cap)]
            .max(jnp.where(valid_s, score, -1), mode="drop")
        )
        best_start = n - 1 - (best & (n - 1)).astype(jnp.int32)
        winner_row = perm[jnp.clip(best_start, 0, n - 1)]
        out = v.values[winner_row]
        has = best >= 0
        return Val(out, has, v.dtype, v.table, dom)
    if kind in ("corr", "cov"):
        raise InvalidOperationError("corr/cov pending pack_pair support")
    if kind in ("skew", "kurtosis"):
        acc = v.values.astype(jnp.float64)
        mean, has = G.seg_mean(acc, data_mask, gids, cap)
        c = G.seg_count(data_mask, gids, cap).astype(jnp.float64)
        d = acc - mean[gids]
        cinv = div_any(1.0, jnp.maximum(c, 1))
        m2 = G.seg_sum(jnp.where(data_mask, d * d, 0.0), data_mask, gids, cap) * cinv
        m3 = G.seg_sum(jnp.where(data_mask, d**3, 0.0), data_mask, gids, cap) * cinv
        m4 = G.seg_sum(jnp.where(data_mask, d**4, 0.0), data_mask, gids, cap) * cinv
        if kind == "skew":
            out = div_any(m3, jnp.maximum(m2, 1e-300) ** 1.5)
            if not node.opt("bias", True):
                out = out * jnp.sqrt(c * (c - 1)) * div_any(1.0, jnp.maximum(c - 2, 1))
            return Val(out, has, dt.Float64(), None, dom)
        g2 = div_any(m4, jnp.maximum(m2 * m2, 1e-300))
        if node.opt("fisher", True):
            g2 = g2 - 3.0
        return Val(g2, has, dt.Float64(), None, dom)
    if kind == "entropy":
        # -sum(p ln p); normalize=True (default) scales x to a distribution
        # (reference: Expr.entropy; polars-ops entropy.rs)
        acc = v.values.astype(jnp.float64)
        base = float(node.opt("base", math.e))
        normalize = bool(node.opt("normalize", True))
        s = G.seg_sum(jnp.where(data_mask, acc, 0.0), data_mask, gids, cap)
        p = div_any(acc, jnp.maximum(s[gids], 1e-300)) if normalize else acc
        plogp = jnp.where(data_mask & (p > 0), p * jnp.log(jnp.maximum(p, 1e-300)), 0.0)
        ent = -G.seg_sum(plogp, data_mask, gids, cap) / math.log(base)
        has = G.seg_count(data_mask, gids, cap) > 0
        return Val(ent, has, dt.Float64(), None, dom)
    raise InvalidOperationError(f"aggregation {kind!r} not implemented")


def _agg_out_dtype(node: E.EAgg, in_dt: dt.DataType) -> dt.DataType:
    from polars_tpu.core.schema import Schema
    from polars_tpu.plan.schema_resolve import agg_dtype

    fake = Schema([("__x", in_dt)])
    fake_node = E.EAgg(E.EColumn("__x"), node.kind, node.options)
    return agg_dtype(fake_node, fake)


# ---------------------------------------------------------------------------
# windows
# ---------------------------------------------------------------------------


def _eval_window(node: E.EWindow, ctx: EvalCtx) -> Val:
    if ctx.groups is not None:
        raise InvalidOperationError("over() inside group_by aggregation is not supported")
    keys = [eval_expr(k, ctx) for k in node.partition_by]
    from polars_tpu.engine.common import SCALAR as _SCALAR

    keys = [
        k.with_(values=jnp.broadcast_to(k.values, (ctx.padded,)),
                validity=None if k.validity is None
                else jnp.broadcast_to(k.validity, (ctx.padded,)),
                domain=ROW)
        if k.domain == _SCALAR or k.values.ndim == 0 or k.values.shape[0] != ctx.padded
        else k
        for k in keys
    ]
    gctx = G.sorted_group_ctx(keys, ctx.rowmask)
    if node.order_by:
        from polars_tpu.kernels.argsort import key_words

        desc = node.order_descending or (False,) * len(node.order_by)
        owords: list = []
        from polars_tpu.engine.strings import ensure_ordinal_val

        for ob, d in zip(node.order_by, desc):
            ov = ensure_ordinal_val(eval_expr(ob, ctx))
            owords.extend(key_words(ov.values, ov.dtype, descending=bool(d)))
        gctx.order_words = owords
    inner = EvalCtx(
        cols=ctx.cols,
        rowmask=ctx.rowmask,
        length=ctx.length,
        padded=ctx.padded,
        schema=ctx.schema,
        literals=ctx.literals,
        groups=gctx,
        memo={},
        flags=ctx.flags,
    )
    res = eval_expr(node.function, inner)
    if node.mapping_strategy == "join":
        return _window_join_lists(res, gctx, ctx)
    if res.domain == GROUP:
        values = res.values[gctx.gids]
        validity = None if res.validity is None else res.validity[gctx.gids]
        return Val(values, validity, res.dtype, res.table, ROW)
    if res.domain == ROW:
        # order-aware ops already produced per-row results
        return res
    # scalar: broadcast
    return res.with_(domain=ROW)


def _window_join_lists(res: Val, gctx, ctx: EvalCtx) -> Val:
    """mapping_strategy='join': every row receives its GROUP's values as a
    List (reference expressions/window.rs Join strategy). Rows of one group
    SHARE the child range — packed (start,len) pairs are position-independent
    so that is legal in the TracedChild layout."""
    from polars_tpu.engine.common import TracedChild
    from polars_tpu.kernels.argsort import stable_argsort_words

    n = ctx.padded
    gids = gctx.gids
    cap = gctx.capacity
    gkey = jnp.where(ctx.rowmask, gids, jnp.int32(2**31 - 1))
    if res.domain == GROUP:
        # aggregate: one-element list per row, child = per-group values
        counts = jnp.ones((cap,), jnp.int32)
        gstart = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).squeeze(-1)
        child_vals = res.values
        child_ok = jnp.ones((cap,), bool) if res.validity is None else res.validity
        total = jnp.int32(cap)
    else:
        if res.domain != ROW:
            res = res.with_(values=jnp.broadcast_to(res.values, (n,)), domain=ROW)
        perm = stable_argsort_words([gkey])
        child_vals = res.values[perm]
        ok = ctx.rowmask if res.validity is None else (ctx.rowmask & res.validity)
        child_ok = ok[perm]
        counts = G.seg_count(ctx.rowmask, gids, cap)
        csum = jnp.cumsum(counts)
        gstart = (csum - counts).astype(jnp.int32)
        total = csum[-1].astype(jnp.int32)
    packed = (gstart[gids].astype(jnp.int64) << 32) | counts[gids].astype(jnp.int64)
    child = TracedChild(child_vals, child_ok, res.dtype, res.table, total, None, None)
    return Val(packed, None, dt.List(res.dtype), None, ROW, child)


# ---------------------------------------------------------------------------
# expression-level sorts
# ---------------------------------------------------------------------------


def _grouped_reorder(
    v: Val, key_words_list: list, ctx: EvalCtx
) -> Val:
    """Reorder values WITHIN each group by the given key words: the k-th
    in-group row (original order) receives the k-th in-group value in key
    order. Two stable word sorts + one scatter — no per-group loops."""
    from polars_tpu.kernels.argsort import stable_argsort_words

    g = ctx.groups
    gkey = jnp.where(ctx.rowmask, g.gids, jnp.int32(2**31 - 1))
    perm_vals = stable_argsort_words([gkey] + key_words_list)
    perm_slots = stable_argsort_words([gkey])
    out_vals = jnp.zeros_like(v.values).at[perm_slots].set(v.values[perm_vals], unique_indices=True)
    if v.validity is not None:
        out_valid = (
            jnp.zeros(v.validity.shape, bool)
            .at[perm_slots]
            .set(v.validity[perm_vals])
        )
    else:
        out_valid = None
    return v.with_(values=out_vals, validity=out_valid, domain=ROW)


def _eval_sort(node: E.ESort, ctx: EvalCtx) -> Val:
    from polars_tpu.engine.sort import apply_perm, sort_perm, sort_words_for_key

    v = eval_expr(node.input, ctx)
    if v.domain != ROW:
        raise InvalidOperationError("sort() requires a row-domain expression")
    if ctx.groups is not None:
        # within-group sort (the reference sorts the group's element list)
        words = sort_words_for_key(v, node.descending, node.nulls_last, None)
        return _grouped_reorder(v, words, ctx)
    perm = sort_perm([v], [node.descending], [node.nulls_last], ctx.rowmask)
    return apply_perm(v, perm).with_(domain=ROW)


def _eval_sort_by(node: E.ESortBy, ctx: EvalCtx) -> Val:
    from polars_tpu.engine.sort import apply_perm, sort_perm, sort_words_for_key

    v = eval_expr(node.input, ctx)
    keys = [eval_expr(b, ctx) for b in node.by]
    if ctx.groups is not None:
        words: list = []
        for k, desc, nl in zip(keys, list(node.descending), list(node.nulls_last)):
            words.extend(sort_words_for_key(k, desc, nl, None))
        return _grouped_reorder(v, words, ctx)
    perm = sort_perm(keys, list(node.descending), list(node.nulls_last), ctx.rowmask)
    return apply_perm(v, perm).with_(domain=ROW)
