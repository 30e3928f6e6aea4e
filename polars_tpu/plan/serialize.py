"""Versioned plan serialization (JSON).

The serializable-DSL analogue (reference:
polars-plan/src/dsl/serializable_plan.rs and py-polars
LazyFrame.serialize/deserialize): a logical plan round-trips through a
versioned JSON document — the foundation for plan shipping in a future
multi-host control plane (reference: polars-plan/src/client/mod.rs:7-23).

Every LNode/ENode is a frozen dataclass, so the codec is generic: a tagged
object per node, plus explicit codecs for DataTypes and in-memory payloads
(DataFrames/Series travel as base64 Arrow IPC, like the reference's
DataFrameScan serialization). Host UDFs (map_batches / LMapFunction) do not
serialize — matching the reference, which refuses python UDFs in the
versioned format.
"""

from __future__ import annotations

import base64
import dataclasses
import io
import json
from typing import Any

from polars_tpu import datatypes as dt
from polars_tpu.errors import ComputeError, InvalidOperationError
from polars_tpu.plan import exprs as E
from polars_tpu.plan import logical as L

FORMAT = "polars_tpu_plan"
VERSION = 1

_PARAM_DTYPES = {
    "Decimal": ("precision", "scale"),
    "Categorical": ("ordering",),
    "Datetime": ("time_unit", "time_zone"),
    "Duration": ("time_unit",),
}


def _dtype_to_json(d: Any) -> Any:
    if isinstance(d, dt.DataTypeClass):
        d = dt.parse_into_dtype(d)
    name = type(d).__name__
    if name in _PARAM_DTYPES:
        return {"t": name, "args": [getattr(d, a) for a in _PARAM_DTYPES[name]]}
    if isinstance(d, dt.Enum):
        return {"t": "Enum", "args": [list(d.categories)]}
    if isinstance(d, dt.List):
        return {"t": "List", "inner": _dtype_to_json(d.inner)}
    if isinstance(d, dt.Array):
        return {"t": "Array", "inner": _dtype_to_json(d.inner), "size": d.size}
    if isinstance(d, dt.Struct):
        return {
            "t": "Struct",
            "fields": [[f.name, _dtype_to_json(f.dtype)] for f in d.fields],
        }
    return {"t": name}


def _dtype_from_json(o: Any) -> Any:
    name = o["t"]
    if name in _PARAM_DTYPES:
        return getattr(dt, name)(*o["args"])
    if name == "Enum":
        return dt.Enum(o["args"][0])
    if name == "List":
        return dt.List(_dtype_from_json(o["inner"]))
    if name == "Array":
        return dt.Array(_dtype_from_json(o["inner"]), size=o["size"])
    if name == "Struct":
        return dt.Struct([(n, _dtype_from_json(f)) for n, f in o["fields"]])
    return getattr(dt, name)()


def _df_to_b64(df) -> str:
    import pyarrow.ipc as ipc

    table = df.to_arrow()
    sink = io.BytesIO()
    with ipc.new_stream(sink, table.schema) as w:
        w.write_table(table)
    return base64.b64encode(sink.getvalue()).decode()


def _df_from_b64(b64: str):
    import pyarrow.ipc as ipc

    from polars_tpu.io._arrow import arrow_to_df

    table = ipc.open_stream(io.BytesIO(base64.b64decode(b64))).read_all()
    return arrow_to_df(table, {})


def _value_to_json(v: Any) -> Any:
    """One dataclass field value -> JSON-safe form."""
    if isinstance(v, L.LNode):
        return {"__lnode__": type(v).__name__, "f": _fields_to_json(v)}
    if isinstance(v, E.ENode):
        return {"__enode__": type(v).__name__, "f": _fields_to_json(v)}
    if isinstance(v, (dt.DataType, dt.DataTypeClass)):
        return {"__dtype__": _dtype_to_json(v)}
    if isinstance(v, tuple):
        return {"__tuple__": [_value_to_json(x) for x in v]}
    if v is None or isinstance(v, (bool, int, float, str)):
        return v
    raise ComputeError(
        f"plan value of type {type(v).__name__} is not serializable "
        "(host UDFs / opaque payloads cannot travel in the versioned format)"
    )


def _fields_to_json(node: Any) -> dict:
    out = {}
    if isinstance(node, L.LDataFrameScan):
        return {
            "df": {"__frame__": _df_to_b64(node.df)},
            "projection": _value_to_json(node.projection),
        }
    if isinstance(node, E.ESeriesLit):
        from polars_tpu.core.frame import DataFrame

        col = node.column
        one = DataFrame._from_columns([col.rename(col.name or "s")], len(col))
        return {"column": {"__series__": _df_to_b64(one)}}
    if isinstance(node, (L.LMapFunction, E.EAnonymous)):
        raise ComputeError(
            "plans containing python UDFs (map_batches / map) do not "
            "serialize — the reference's versioned DSL refuses them too"
        )
    for f in dataclasses.fields(node):
        out[f.name] = _value_to_json(getattr(node, f.name))
    return out


def _value_from_json(v: Any) -> Any:
    if isinstance(v, dict):
        if "__lnode__" in v:
            return _node_from_json(v, L, "__lnode__")
        if "__enode__" in v:
            return _node_from_json(v, E, "__enode__")
        if "__dtype__" in v:
            return _dtype_from_json(v["__dtype__"])
        if "__tuple__" in v:
            return tuple(_value_from_json(x) for x in v["__tuple__"])
        if "__frame__" in v:
            return _df_from_b64(v["__frame__"])
        if "__series__" in v:
            df = _df_from_b64(v["__series__"])
            return df._columns[0]
    return v


def _node_from_json(o: dict, mod: Any, tag: str) -> Any:
    cls = getattr(mod, o[tag], None)
    if cls is None:
        raise InvalidOperationError(f"unknown plan node {o[tag]!r} in serialized plan")
    fields = {k: _value_from_json(v) for k, v in o["f"].items()}
    if cls is L.LDataFrameScan:
        from polars_tpu.utils.tokens import obj_token

        df = fields.pop("df")
        return L.LDataFrameScan(df=df, ident=obj_token(df), projection=fields.get("projection"))
    if cls is E.ESeriesLit:
        from polars_tpu.utils.tokens import obj_token

        col = fields.pop("column")
        return E.ESeriesLit(column=col, ident=obj_token(col))
    return cls(**fields)


def serialize_expr(node: E.ENode) -> str:
    """Versioned JSON form of one expression (reference:
    py-polars Expr.meta.serialize / Expr.deserialize)."""
    return json.dumps(
        {
            "format": "polars_tpu_expr",
            "version": VERSION,
            "expr": _value_to_json(node),
        }
    )


def deserialize_expr(data: str | bytes) -> E.ENode:
    doc = json.loads(data if isinstance(data, str) else data.decode())
    if doc.get("format") != "polars_tpu_expr":
        raise InvalidOperationError("not a serialized polars_tpu expression")
    if doc.get("version") != VERSION:
        raise InvalidOperationError(
            f"serialized expression version {doc.get('version')} is not supported "
            f"(this build reads version {VERSION})"
        )
    return _value_from_json(doc["expr"])


def serialize_plan(node: L.LNode) -> str:
    """Plan -> versioned JSON string."""
    doc = {
        "format": FORMAT,
        "version": VERSION,
        "plan": _value_to_json(node),
    }
    return json.dumps(doc)


def deserialize_plan(data: str | bytes) -> L.LNode:
    """Versioned JSON string -> plan. Rejects unknown formats/versions."""
    doc = json.loads(data)
    if not isinstance(doc, dict) or doc.get("format") != FORMAT:
        raise InvalidOperationError("not a serialized polars_tpu plan")
    if doc.get("version") != VERSION:
        raise InvalidOperationError(
            f"serialized plan version {doc.get('version')} is not supported "
            f"by this build (expected {VERSION})"
        )
    return _value_from_json(doc["plan"])
