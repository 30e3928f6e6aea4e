"""Eager combination functions (reference: py-polars functions/eager.py)."""

from __future__ import annotations

from typing import Any

import numpy as np

from polars_tpu import datatypes as dt
from polars_tpu.core.buffer import concat_buffers
from polars_tpu.core.column import Column
from polars_tpu.core.frame import DataFrame
from polars_tpu.errors import InvalidOperationError, SchemaError, ShapeError
from polars_tpu.utils import strtable


def concat_series(series_list: list) -> Any:
    from polars_tpu.core.series import Series

    cols = [s._column for s in series_list]
    return Series._from_column(_concat_columns(cols, cols[0].name))


def _concat_columns(cols: list[Column], name: str) -> Column:
    from polars_tpu.ops.cast import cast_column

    if any(isinstance(c.dtype, dt.List) for c in cols):
        # lists: rebuild via host values (children differ per input frame)
        vals = [v for c in cols for v in c.to_pylist()]
        target = cols[0].dtype
        return Column.from_values(name, vals, target)

    # supercast to a common dtype
    target = cols[0].dtype
    for c in cols[1:]:
        target = _supertype(target, c.dtype)
    cols = [cast_column(c, target, strict=False) if c.dtype != target else c for c in cols]
    table = None
    if cols[0].table is not None:
        if any(getattr(c.table, "hashed", False) for c in cols):
            # hashed-key members: hash space is globally comparable (fixed
            # hash key), so codes never remap — dictionary members map INTO
            # hash space and the payloads union (utils/hashstore.py)
            from polars_tpu.core.buffer import Buffer as _Buf
            from polars_tpu.utils import hashstore

            if all(c.table is cols[0].table for c in cols):
                table = cols[0].table
            else:
                import jax.numpy as _jnp

                new_cols = []
                for c in cols:
                    if getattr(c.table, "hashed", False):
                        new_cols.append(c)
                        continue
                    harr = (
                        hashstore.hash_values(c.table.values)
                        if len(c.table) else np.zeros(1, np.int64)
                    )
                    lut = _jnp.asarray(harr)
                    v64 = lut[_jnp.clip(c.buffer.values, 0, len(harr) - 1)]
                    if c.buffer.validity is not None:
                        # null rows canonicalize to hash 0 (hashed ingest
                        # does the same) so null keys group as ONE key
                        v64 = _jnp.where(c.buffer.validity, v64, 0)
                    new_cols.append(Column(
                        c.name, c.dtype,
                        _Buf(v64, c.buffer.validity, c.buffer.length),
                        c.table,
                    ))
                cols = new_cols
                table = hashstore.UnionSpilledStrings([c.table for c in cols])
        else:
            # unify dictionaries pairwise, remapping codes on device
            from polars_tpu.engine.strings import remap_column_codes

            table = cols[0].table
            new_cols = [cols[0]]
            for c in cols[1:]:
                table, lmap, rmap = strtable.unify(table, c.table)
                new_cols = [remap_column_codes(x, lmap, table) for x in new_cols]
                new_cols.append(remap_column_codes(c, rmap, table))
            cols = new_cols
    buf = concat_buffers([c.buffer for c in cols])
    return Column(name, cols[0].dtype, buf, cols[0].table if table is None else table)


def _supertype(a: dt.DataType, b: dt.DataType) -> dt.DataType:
    from polars_tpu.plan.schema_resolve import supertype

    return supertype(a, b)


def concat(items: Any, *, how: str = "vertical", rechunk: bool = False, parallel: bool = True):
    items = list(items)
    if not items:
        raise ValueError("cannot concat empty list")
    from polars_tpu.core.series import Series
    from polars_tpu.lazyframe import LazyFrame

    if isinstance(items[0], Series):
        return concat_series(items)
    if isinstance(items[0], LazyFrame):
        if len(items) == 1:
            return items[0]
        return LazyFrame._concat(items, how=how)
    if not isinstance(items[0], DataFrame):
        raise TypeError(f"cannot concat items of type {type(items[0]).__name__}")

    if how in ("vertical", "vertical_relaxed", "diagonal", "diagonal_relaxed"):
        frames: list[DataFrame] = items
        if how.startswith("diagonal"):
            all_names: list[str] = []
            dtypes: dict[str, dt.DataType] = {}
            for f in frames:
                for c in f._columns:
                    if c.name not in dtypes:
                        all_names.append(c.name)
                        dtypes[c.name] = c.dtype
            frames = [
                DataFrame(
                    {
                        n: (f.get_column(n).to_list() if n in f.columns else [None] * f.height)
                        for n in all_names
                    },
                    schema_overrides={n: dtypes[n] for n in all_names if n not in f.columns},
                )
                for f in frames
            ]
        names = frames[0].columns
        for f in frames[1:]:
            if f.columns != names and not how.endswith("relaxed") and how == "vertical":
                raise SchemaError(
                    f"column name mismatch in vertical concat: {names} vs {f.columns}"
                )
        cols = []
        for i, n in enumerate(names):
            cols.append(_concat_columns([f._columns[i] for f in frames], n))
        return DataFrame._from_columns(cols, sum(f.height for f in frames))

    if how in ("align", "align_full", "align_left", "align_right"):
        # outer-join on the common columns, sorted by them
        # (reference: py-polars functions/eager.py concat how="align")
        common = [n for n in items[0].columns if all(n in f.columns for f in items[1:])]
        if not common:
            raise InvalidOperationError(
                "'align' strategy requires at least one common column"
            )
        join_how = {"align": "full", "align_full": "full", "align_left": "left", "align_right": "right"}[how]
        out = items[0]
        for f in items[1:]:
            out = out.join(f, on=common, how=join_how, coalesce=True)
        return out.sort(common)

    if how == "horizontal":
        seen: set[str] = set()
        cols = []
        height = max(f.height for f in items)
        for f in items:
            if f.height != height and f.height != 0:
                raise ShapeError("horizontal concat requires equal heights")
            for c in f._columns:
                if c.name in seen:
                    from polars_tpu.errors import DuplicateError

                    raise DuplicateError(f"column {c.name!r} occurs in multiple frames")
                seen.add(c.name)
                cols.append(c)
        return DataFrame._from_columns(cols, height)

    raise ValueError(f"unsupported concat strategy {how!r}")
