"""Function-op registry (the FunctionExpr catalog analogue,
polars-plan/src/plans/aexpr/function_expr/mod.rs).

Each opcode registers an implementation (traced against :class:`Val` inputs)
and a dtype rule (used by schema resolution without tracing). Namespaced ops
use dotted names ("str.contains", "dt.year").
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

from polars_tpu import datatypes as dt


@dataclass
class FnSpec:
    impl: Callable  # (ctx, args: list[Val], opts: dict) -> Val
    dtype_rule: Callable  # (in_dtypes: list[DataType], opts: dict) -> DataType
    elementwise: bool = True


REGISTRY: dict[str, FnSpec] = {}
ELEMENTWISE_FNS: set[str] = set()


def register(name: str, dtype_rule: Any, *, elementwise: bool = True):
    """Decorator: @register("abs", SAME) etc."""

    def deco(fn: Callable) -> Callable:
        rule = dtype_rule
        if isinstance(dtype_rule, dt.DataType) or isinstance(dtype_rule, dt.DataTypeClass):
            fixed = dt.parse_into_dtype(dtype_rule)
            rule = lambda dts, opts: fixed  # noqa: E731
        REGISTRY[name] = FnSpec(fn, rule, elementwise)
        if elementwise:
            ELEMENTWISE_FNS.add(name)
        return fn

    return deco


def get_spec(name: str) -> FnSpec:
    _ensure_loaded()
    try:
        return REGISTRY[name]
    except KeyError:
        from polars_tpu.errors import InvalidOperationError

        raise InvalidOperationError(f"unknown function op {name!r}") from None


# common dtype rules
def SAME(dts, opts):
    return dts[0]


def FLOAT(dts, opts):
    return dt.Float32() if isinstance(dts[0], dt.Float32) else dt.Float64()


def BOOL(dts, opts):
    return dt.Boolean()


def SUPER(dts, opts):
    from polars_tpu.plan.schema_resolve import supertype

    out = dts[0]
    for d in dts[1:]:
        out = supertype(out, d)
    return out


_LOADED = False


def _ensure_loaded() -> None:
    global _LOADED
    if _LOADED:
        return
    _LOADED = True
    import polars_tpu.engine.fn_core  # noqa: F401
    import polars_tpu.engine.fn_nested  # noqa: F401
    import polars_tpu.engine.fn_position  # noqa: F401
    import polars_tpu.engine.fn_strings  # noqa: F401
    import polars_tpu.engine.fn_temporal  # noqa: F401
