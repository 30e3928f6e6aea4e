"""Interop / conversion long tail (reference: py-polars convert/general.py,
io/json/normalize.py, lazyframe/opt_flags.py, _utils/deferred.py)."""

from __future__ import annotations

import re
from typing import Any, Callable

from polars_tpu import datatypes as dt


def from_torch(tensor: Any, schema: Any = None):
    """DataFrame/Series from a torch Tensor (convert/general.py from_torch):
    1-D -> Series, 2-D -> one column per trailing-dim slice."""
    arr = tensor.detach().cpu().numpy()
    from polars_tpu.core.frame import DataFrame
    from polars_tpu.core.series import Series

    if arr.ndim == 1 and schema is None:
        return Series("", arr)
    return DataFrame(arr, schema=schema)


_DTYPE_TOKENS = {
    "i8": dt.Int8(), "i16": dt.Int16(), "i32": dt.Int32(), "i64": dt.Int64(),
    "u8": dt.UInt8(), "u16": dt.UInt16(), "u32": dt.UInt32(), "u64": dt.UInt64(),
    "f32": dt.Float32(), "f64": dt.Float64(), "bool": dt.Boolean(),
    "str": dt.String(), "date": dt.Date(), "time": dt.Time(),
    "datetime[us]": dt.Datetime("us"), "datetime[ms]": dt.Datetime("ms"),
    "datetime[ns]": dt.Datetime("ns"), "duration[us]": dt.Duration("us"),
    "duration[ms]": dt.Duration("ms"), "duration[ns]": dt.Duration("ns"),
    "binary": dt.Binary(), "null": dt.Null(), "cat": dt.Categorical(),
}


def _parse_cell(tok: str, dtype: dt.DataType):
    tok = tok.strip()
    if tok in ("null", ""):
        return None
    name = type(dtype).__name__
    if name in ("Float32", "Float64"):
        return float("nan") if tok == "NaN" else float(tok)
    if dtype.is_integer():
        return int(tok)
    if name == "Boolean":
        return tok == "true"
    if name == "Date":
        import datetime as _d

        return _d.date.fromisoformat(tok)
    if name == "Datetime":
        import datetime as _d

        return _d.datetime.fromisoformat(tok)
    if name == "Time":
        import datetime as _d

        return _d.time.fromisoformat(tok)
    if name == "String" and len(tok) >= 2 and tok[0] == '"' and tok[-1] == '"':
        return tok[1:-1]
    return tok


def _parse_dtype_token(tok: str) -> dt.DataType | None:
    if tok in _DTYPE_TOKENS:
        return _DTYPE_TOKENS[tok]
    m = re.fullmatch(r"(Datetime|Duration)\(time_unit='(\w+)'.*\)", tok)
    if m:
        return (dt.Datetime if m.group(1) == "Datetime" else dt.Duration)(m.group(2))
    simple = {
        "Int8": dt.Int8(), "Int16": dt.Int16(), "Int32": dt.Int32(),
        "Int64": dt.Int64(), "UInt8": dt.UInt8(), "UInt16": dt.UInt16(),
        "UInt32": dt.UInt32(), "UInt64": dt.UInt64(), "Float32": dt.Float32(),
        "Float64": dt.Float64(), "Boolean": dt.Boolean(), "String": dt.String(),
        "Date": dt.Date(), "Time": dt.Time(), "Binary": dt.Binary(),
        "Null": dt.Null(), "Categorical": dt.Categorical(),
        "datetime[μs]": dt.Datetime("us"), "datetime[us]": dt.Datetime("us"),
        "datetime[ms]": dt.Datetime("ms"), "datetime[ns]": dt.Datetime("ns"),
    }
    return simple.get(tok)


def from_repr(data: str):
    """Rebuild a DataFrame from its printed repr (convert/general.py:805).
    Handles both this library's box table (| separators throughout) and
    polars' UTF8_FULL format (┆ body separators); truncated markers (…)
    are skipped."""
    rows = [ln for ln in data.splitlines() if "│" in ln or "┆" in ln]
    if not rows:
        raise ValueError("from_repr: no table found in input")

    def split(ln: str) -> list[str]:
        ln = ln.strip().strip("│")
        sep = "┆" if "┆" in ln else "│"
        return [c.strip() for c in ln.split(sep)]

    header = split(rows[0])
    body_start = 1
    dts: list[dt.DataType] | None = None
    if len(rows) > 2 and split(rows[1]) == ["---"] * len(header):
        toks = split(rows[2])
        dts = [_parse_dtype_token(t) or dt.String() for t in toks]
        body_start = 3
    elif len(rows) > 1:
        toks = split(rows[1])
        parsed = [_parse_dtype_token(t) for t in toks]
        if all(p is not None for p in parsed):
            dts = parsed  # type: ignore[assignment]
            body_start = 2
    use_dts = dts or [dt.String()] * len(header)
    cols: dict[str, list] = {h: [] for h in header}
    for ln in rows[body_start:]:
        cells = split(ln)
        if len(cells) != len(header) or all(c == "…" for c in cells):
            continue
        for h, c, d in zip(header, cells, use_dts):
            cols[h].append(_parse_cell(c, d))
    from polars_tpu.core.frame import DataFrame

    return DataFrame(
        {h: vals for h, vals in cols.items()},
        schema={h: d for h, d in zip(header, use_dts)} if dts else None,
    )


def json_normalize(
    data: Any,
    *,
    separator: str = ".",
    max_level: int | None = None,
    schema: Any = None,
    strict: bool = True,
    infer_schema_length: int | None = 100,
):
    """Flatten nested dicts into dotted columns (io/json/normalize.py)."""
    if isinstance(data, dict):
        data = [data]

    def flatten(d: dict, prefix: str = "", level: int = 0) -> dict:
        out = {}
        for k, v in d.items():
            key = f"{prefix}{separator}{k}" if prefix else str(k)
            if isinstance(v, dict) and (max_level is None or level < max_level):
                out.update(flatten(v, key, level + 1))
            else:
                out[key] = v
        return out

    flat = [flatten(d) for d in data]
    keys: list[str] = []
    for d in flat:
        for k in d:
            if k not in keys:
                keys.append(k)
    from polars_tpu.core.frame import DataFrame

    return DataFrame({k: [d.get(k) for d in flat] for k in keys}, schema=schema)


def defer(
    function: Callable[[], Any],
    *,
    schema: Any,
    validate_schema: bool = True,
) -> Any:
    """Lazily-deferred eager source: the function runs at collect time
    (reference: _utils/deferred.py pl.defer)."""
    class _Deferred:
        def __init__(self) -> None:
            self._out = None

        def frame(self) -> DataFrame:
            if self._out is None:
                self._out = function()
                if validate_schema and schema is not None:
                    got = dict(self._out.schema)
                    want = {k: dt.parse_into_dtype(v) for k, v in dict(schema).items()}
                    if got != want:
                        from polars_tpu.errors import SchemaError

                        raise SchemaError(f"defer: schema mismatch {got} != {want}")
            return self._out

    return _DeferredLazy(_Deferred(), schema)


class _DeferredLazy:
    """Minimal LazyFrame-quacking wrapper that materializes on collect."""

    def __init__(self, deferred, schema) -> None:
        self._deferred = deferred
        self._schema = schema

    def collect(self, **kwargs):
        return self._deferred.frame()

    def lazy(self):
        return self._deferred.frame().lazy()

    def __getattr__(self, name):
        return getattr(self._deferred.frame().lazy(), name)


class QueryOptFlags:
    """Optimizer toggle set (reference: lazyframe/opt_flags.py).

    ``collect(optimizations=...)`` / ``explain(optimizations=...)`` pass these
    to ``plan.optimizer.optimize``, which gates each pass on its toggle:
    simplify_expression, comm_subexpr_elim (cross-segment expression CSE,
    optimizer/cse_expr.py), check_order_observe (sort collapse),
    predicate_pushdown, collapse_joins (filtered-cross-join -> equi-join,
    optimizer/collapse_joins.py), fast_projection (COUNT(*) from file
    metadata, optimizer/count_star.py), projection_pushdown, slice_pushdown,
    comm_subplan_elim. cluster_with_columns is accepted and ignored: XLA
    fusion subsumes it."""

    def __init__(
        self,
        *,
        predicate_pushdown: bool = True,
        projection_pushdown: bool = True,
        simplify_expression: bool = True,
        slice_pushdown: bool = True,
        comm_subplan_elim: bool = True,
        comm_subexpr_elim: bool = True,
        cluster_with_columns: bool = True,
        collapse_joins: bool = True,
        check_order_observe: bool = True,
        fast_projection: bool = True,
        type_coercion: bool = True,
        type_check: bool = True,
    ) -> None:
        self.predicate_pushdown = predicate_pushdown
        self.projection_pushdown = projection_pushdown
        self.simplify_expression = simplify_expression
        self.slice_pushdown = slice_pushdown
        self.comm_subplan_elim = comm_subplan_elim
        self.comm_subexpr_elim = comm_subexpr_elim
        self.cluster_with_columns = cluster_with_columns
        self.collapse_joins = collapse_joins
        self.check_order_observe = check_order_observe
        self.fast_projection = fast_projection
        self.type_coercion = type_coercion
        self.type_check = type_check

    @classmethod
    def none(cls) -> QueryOptFlags:
        return cls(**{k: False for k in (
            "predicate_pushdown", "projection_pushdown", "simplify_expression",
            "slice_pushdown", "comm_subplan_elim", "comm_subexpr_elim",
            "cluster_with_columns", "collapse_joins", "check_order_observe",
            "fast_projection",
        )})

    def no_optimizations(self) -> QueryOptFlags:
        return self.none()


class GPUEngine:
    """Engine-config object accepted by collect(engine=...) for API
    compatibility (reference: lazyframe/engine_config.py). This build targets
    TPU; a GPUEngine request routes to the default in-memory TPU engine."""

    def __init__(self, *, device: int | None = None, memory_resource: Any = None, **config: Any) -> None:
        self.device = device
        self.memory_resource = memory_resource
        self.config = config


class CompatLevel:
    """Arrow format compat level (reference: _utils/compat_level.py)."""

    def __init__(self, level: int = 1) -> None:
        self._level = level

    @classmethod
    def newest(cls) -> CompatLevel:
        return cls(1)

    @classmethod
    def oldest(cls) -> CompatLevel:
        return cls(0)
