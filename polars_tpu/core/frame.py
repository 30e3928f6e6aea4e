"""Eager DataFrame.

Reference: polars-core/src/frame/dataframe.rs:84 (``height + Vec<Column>``) and
the py-polars user API (py-polars/src/polars/dataframe/frame.py). Eager query
operations delegate to the lazy engine (``self.lazy()...collect()``) exactly as
py-polars does for filter/sort/join/group_by — one engine, two entry points.
"""

from __future__ import annotations

import functools as _functools
from collections.abc import Iterable, Mapping, Sequence
from typing import TYPE_CHECKING, Any

import numpy as np

from polars_tpu import datatypes as dt
from polars_tpu.core.column import Column, full_column
from polars_tpu.core.schema import Schema
from polars_tpu.errors import (
    ColumnNotFoundError,
    DuplicateError,
    ShapeError,
)

if TYPE_CHECKING:
    from polars_tpu.core.series import Series
    from polars_tpu.lazyframe import LazyFrame


class DataFrame:
    """A height-aligned collection of typed device columns."""

    # _device_count: optional device scalar holding the TRUE row count of a
    # frame whose _height is a padded upper bound (flip-free deferred
    # execution, engine/pending.py) — consumed as the traced height argument
    # by downstream segments, resolved in ONE batched readback at finalize
    __slots__ = ("_columns", "_height", "_pt_token", "_device_count")

    def __init__(
        self,
        data: Any = None,
        schema: Any = None,
        *,
        schema_overrides: Mapping[str, Any] | None = None,
        strict: bool = True,
        orient: str | None = None,
    ) -> None:
        self._columns: list[Column] = []
        self._height = 0
        if data is None:
            if schema is not None:
                for name, dtype in _schema_items(schema):
                    self._columns.append(Column.from_values(name, [], dtype))
            return
        cols = _build_columns(data, schema, schema_overrides, strict, orient)
        heights = {len(c) for c in cols}
        if len(heights) > 1:
            # broadcast unit-length columns
            max_h = max(heights)
            if heights <= {1, max_h}:
                cols = [
                    c
                    if len(c) == max_h
                    else full_column(c.name, c.to_pylist()[0] if len(c) else None, max_h, c.dtype)
                    for c in cols
                ]
            else:
                raise ShapeError(f"could not create DataFrame: columns have differing lengths {sorted(heights)}")
        names = [c.name for c in cols]
        if len(set(names)) != len(names):
            seen = set()
            dup = next(n for n in names if n in seen or seen.add(n))
            raise DuplicateError(f"column {dup!r} appears more than once")
        self._columns = cols
        self._height = len(cols[0]) if cols else 0

    # -- internal ---------------------------------------------------------------

    @classmethod
    def _from_columns(cls, columns: list[Column], height: int | None = None) -> DataFrame:
        df = cls.__new__(cls)
        df._columns = columns
        df._height = height if height is not None else (len(columns[0]) if columns else 0)
        from polars_tpu.config import _config

        if _config.debug:  # sanitizer mode (POLARS_TPU_DEBUG, utils/sanitize.py)
            from polars_tpu.utils.sanitize import check_frame

            check_frame(df._columns, df._height, _config.debug)
        return df

    def _get(self, name: str) -> Column:
        for c in self._columns:
            if c.name == name:
                return c
        raise ColumnNotFoundError(f"{name!r} not found; available: {self.columns}")

    # -- properties ---------------------------------------------------------------

    @property
    def height(self) -> int:
        return self._height

    @property
    def width(self) -> int:
        return len(self._columns)

    @property
    def shape(self) -> tuple[int, int]:
        return (self._height, len(self._columns))

    @property
    def columns(self) -> list[str]:
        return [c.name for c in self._columns]

    @property
    def dtypes(self) -> list[dt.DataType]:
        return [c.dtype for c in self._columns]

    @property
    def schema(self) -> Schema:
        return Schema([(c.name, c.dtype) for c in self._columns])

    def __len__(self) -> int:
        return self._height

    def is_empty(self) -> bool:
        return self._height == 0

    # -- column access -----------------------------------------------------------

    def get_column(self, name: str) -> Series:
        from polars_tpu.core.series import Series

        return Series._from_column(self._get(name))

    def __getitem__(self, key: Any) -> Any:
        from polars_tpu.core.series import Series

        if isinstance(key, str):
            return self.get_column(key)
        if isinstance(key, int):
            return self.slice(key if key >= 0 else self._height + key, 1)
        if isinstance(key, slice):
            start, stop, step = key.indices(self._height)
            if step == 1:
                return self.slice(start, stop - start)
            return self.gather(np.arange(start, stop, step))
        if isinstance(key, (list, np.ndarray)):
            key_l = list(key) if not isinstance(key, np.ndarray) else key.tolist()
            if key_l and all(isinstance(k, str) for k in key_l):
                return self.select(key_l)
            return self.gather(np.asarray(key, dtype=np.int64))
        if isinstance(key, Series):
            if key.dtype == dt.Boolean:
                return self.filter(key)
            return self.gather(key.to_numpy())
        if isinstance(key, tuple) and len(key) == 2:
            rows, cols = key
            out = self[cols] if not isinstance(cols, (int, np.integer)) else Series._from_column(self._columns[int(cols)])
            if isinstance(out, Series):
                return out[rows]
            return out[rows]
        raise TypeError(f"cannot index DataFrame with {key!r}")

    def to_series(self, index: int = 0) -> Series:
        from polars_tpu.core.series import Series

        return Series._from_column(self._columns[index])

    def get_columns(self) -> list[Series]:
        from polars_tpu.core.series import Series

        return [Series._from_column(c) for c in self._columns]

    def get_column_index(self, name: str) -> int:
        return self.schema.index_of(name)

    # -- lazy bridge ----------------------------------------------------------------

    def lazy(self) -> LazyFrame:
        from polars_tpu.lazyframe import LazyFrame

        return LazyFrame._from_df(self)

    # -- query ops (delegate to the one engine) ----------------------------------------

    def select(self, *exprs: Any, **named_exprs: Any) -> DataFrame:
        return self.lazy().select(*exprs, **named_exprs).collect()

    def with_columns(self, *exprs: Any, **named_exprs: Any) -> DataFrame:
        self._check_series_heights(exprs, named_exprs)
        return self.lazy().with_columns(*exprs, **named_exprs).collect()

    def _check_series_heights(self, exprs, named_exprs) -> None:
        """Eager contexts raise on length-mismatched Series inputs
        (reference ShapeError; length-1 broadcasts)."""
        from polars_tpu.core.series import Series as _S
        from polars_tpu.errors import ShapeError

        for v in (*exprs, *named_exprs.values()):
            if isinstance(v, _S) and len(v) not in (1, self._height):
                raise ShapeError(
                    f"unable to add a column of length {len(v)} to a "
                    f"DataFrame of height {self._height}"
                )

    def filter(self, *predicates: Any, **constraints: Any) -> DataFrame:
        return self.lazy().filter(*predicates, **constraints).collect()

    def sort(
        self,
        by: Any,
        *more_by: Any,
        descending: bool | Sequence[bool] = False,
        nulls_last: bool | Sequence[bool] = False,
        maintain_order: bool = False,
        multithreaded: bool = True,
    ) -> DataFrame:
        return (
            self.lazy()
            .sort(
                by,
                *more_by,
                descending=descending,
                nulls_last=nulls_last,
                maintain_order=maintain_order,
            )
            .collect()
        )


    # -- py-polars parity batch (round 1) -------------------------------------

    def shift(self, n: int = 1, *, fill_value: Any = None) -> DataFrame:
        import polars_tpu as pl

        return self.select(pl.all().shift(n, fill_value=fill_value))

    def interpolate(self) -> DataFrame:
        import polars_tpu as pl

        return self.select(pl.all().interpolate())

    def product(self) -> DataFrame:
        import polars_tpu as pl

        return self.select(pl.all().product())

    def sum_horizontal(self, *, ignore_nulls: bool = True):
        import polars_tpu as pl
        from polars_tpu.core.series import Series

        out = self.select(pl.sum_horizontal(pl.all()).alias("sum"))
        return Series._from_column(out._columns[0])

    def mean_horizontal(self, *, ignore_nulls: bool = True):
        import polars_tpu as pl
        from polars_tpu.core.series import Series

        out = self.select(pl.mean_horizontal(pl.all()).alias("mean"))
        return Series._from_column(out._columns[0])

    def min_horizontal(self):
        import polars_tpu as pl
        from polars_tpu.core.series import Series

        out = self.select(pl.min_horizontal(pl.all()).alias("min"))
        return Series._from_column(out._columns[0])

    def max_horizontal(self):
        import polars_tpu as pl
        from polars_tpu.core.series import Series

        out = self.select(pl.max_horizontal(pl.all()).alias("max"))
        return Series._from_column(out._columns[0])

    def is_duplicated(self):
        import polars_tpu as pl
        from polars_tpu.core.series import Series

        out = self.select((pl.len().over(self.columns) > 1).alias("dup"))
        return Series._from_column(out._columns[0])

    def is_unique(self):
        import polars_tpu as pl
        from polars_tpu.core.series import Series

        out = self.select((pl.len().over(self.columns) == 1).alias("uniq"))
        return Series._from_column(out._columns[0])

    def drop_nans(self, subset: Any = None) -> DataFrame:
        import polars_tpu as pl

        names = _flatten_names([subset]) if subset is not None else [
            c.name for c in self._columns if c.dtype.is_float()
        ]
        if not names:
            return self
        pred = None
        for n in names:
            p = ~pl.col(n).is_nan()
            pred = p if pred is None else (pred & p)
        return self.filter(pred)

    def approx_n_unique(self) -> DataFrame:
        import polars_tpu as pl

        return self.select(pl.all().n_unique())

    def pipe(self, function: Any, *args: Any, **kwargs: Any):
        return function(self, *args, **kwargs)

    def melt(self, id_vars: Any = None, value_vars: Any = None,
             variable_name: str | None = None, value_name: str | None = None) -> DataFrame:
        return self.unpivot(
            on=value_vars, index=id_vars,
            variable_name=variable_name or "variable", value_name=value_name or "value",
        )

    def set_sorted(self, column: str, *, descending: bool = False) -> DataFrame:
        from polars_tpu.core.column import SORTED_ASC, SORTED_DESC

        flag = SORTED_DESC if descending else SORTED_ASC
        cols = [
            c.with_buffer(c.buffer, sorted_flag=flag) if c.name == column else c
            for c in self._columns
        ]
        return DataFrame._from_columns(cols, self._height)

    @property
    def flags(self) -> dict:
        from polars_tpu.core.column import SORTED_ASC, SORTED_DESC

        return {
            c.name: {
                "SORTED_ASC": c.sorted_flag == SORTED_ASC,
                "SORTED_DESC": c.sorted_flag == SORTED_DESC,
            }
            for c in self._columns
        }

    def is_sorted(self, by: Any, *more_by: str, descending: Any = False, nulls_last: Any = False) -> bool:
        """Whether rows are sorted by the given columns (reference:
        DataFrame.is_sorted). Multi-column = lexicographic."""
        names = ([by] if isinstance(by, str) else list(by)) + list(more_by)
        k = len(names)
        descs = [descending] * k if isinstance(descending, bool) else list(descending)
        nls = [nulls_last] * k if isinstance(nulls_last, bool) else list(nulls_last)
        if k == 1:
            from polars_tpu.core.series import Series

            return Series._from_column(self._get(names[0])).is_sorted(
                descending=descs[0], nulls_last=nls[0]
            )
        cols = [self._get(n).to_pylist() for n in names]

        def key_for(i):
            out = []
            for j in range(k):
                v = cols[j][i]
                null_rank = 1 if (v is None) == bool(nls[j]) and v is None else 0
                # encode: null first/last, then value with direction
                if v is None:
                    out.append((1 if nls[j] else -1, 0, 0))
                else:
                    out.append((0, -1 if descs[j] else 1, v))
            return out

        def cmp_rows(a, b):
            for j in range(k):
                (na, da, va), (nb, db, vb) = a[j], b[j]
                if na != nb:
                    return -1 if na < nb else 1
                if na == 0 and va != vb:
                    lt = (va < vb) if da == 1 else (va > vb)
                    return -1 if lt else 1
            return 0

        prev = None
        for i in range(self._height):
            cur = key_for(i)
            if prev is not None and cmp_rows(prev, cur) > 0:
                return False
            prev = cur
        return True

    def map_columns(self, column_names: Any, function: Any, *args: Any, **kwargs: Any) -> DataFrame:
        from polars_tpu.core.series import Series

        names = [column_names] if isinstance(column_names, str) else list(column_names)
        cols = []
        for c in self._columns:
            if c.name in names:
                out = function(Series._from_column(c), *args, **kwargs)
                cols.append(out._column.rename(c.name))
            else:
                cols.append(c)
        return DataFrame._from_columns(cols, self._height)

    def map_rows(self, function: Any, return_dtype: Any = None, *, inference_size: int = 256) -> DataFrame:
        rows = self.rows()
        outs = [function(r) for r in rows]
        if outs and isinstance(outs[0], (tuple, list)):
            k = len(outs[0])
            data = {
                f"column_{i}": [o[i] for o in outs] for i in range(k)
            }
            return DataFrame(data)
        from polars_tpu.core.column import Column as _C

        return DataFrame._from_columns(
            [_C.from_values("map", outs, dt.parse_into_dtype(return_dtype) if return_dtype else None)],
            len(outs),
        )

    def remove(self, *predicates: Any, **constraints: Any) -> DataFrame:
        return self.lazy().remove(*predicates, **constraints).collect()

    def match_to_schema(self, schema: Any, **kwargs: Any) -> DataFrame:
        return self.lazy().match_to_schema(schema, **kwargs).collect()

    def rows_by_key(self, key: Any, *, named: bool = False, include_key: bool = False, unique: bool = False) -> dict:
        names = [key] if isinstance(key, str) else list(key)
        single = len(names) == 1
        keys_rows = [tuple(self._get(n).to_pylist()) for n in names]
        data_cols = [
            c.name for c in self._columns if include_key or c.name not in names
        ]
        rows = self.select(data_cols).rows(named=named) if data_cols else [
            ({} if named else ()) for _ in range(self._height)
        ]
        out: dict = {}
        for i in range(self._height):
            kv = keys_rows[0][i] if single else tuple(col[i] for col in keys_rows)
            if unique:
                out[kv] = rows[i]
            else:
                out.setdefault(kv, []).append(rows[i])
        return out

    def select_seq(self, *exprs: Any, **named_exprs: Any) -> DataFrame:
        return self.select(*exprs, **named_exprs)

    def with_columns_seq(self, *exprs: Any, **named_exprs: Any) -> DataFrame:
        return self.with_columns(*exprs, **named_exprs)

    def show(self, limit: int = 5, **kwargs: Any) -> None:
        print(self.head(limit) if limit is not None else self)

    def n_chunks(self, strategy: str = "first"):
        return 1 if strategy == "first" else [1] * len(self._columns)

    def to_init_repr(self, n: int = 1000) -> str:
        from polars_tpu.core.series import Series

        inner = ",\n        ".join(
            Series._from_column(c.rename(c.name)).to_init_repr(n) for c in self._columns
        )
        return f"pl.DataFrame(\n    [\n        {inner},\n    ]\n)"

    @property
    def plot(self):
        from polars_tpu.core.series import _PlotShim

        return _PlotShim()

    @property
    def style(self):
        from polars_tpu.core.series import _PlotShim

        return _PlotShim()

    def serialize(self, file: Any = None, *, format: str = "binary"):
        """Serialize the frame's data (reference: DataFrame.serialize —
        binary = Arrow IPC payload; json = row-oriented document)."""
        if format == "json":
            import json as _json

            data: Any = _json.dumps(
                {"columns": [
                    {"name": c.name, "datatype": repr(c.dtype), "values": _json_safe(c.to_pylist())}
                    for c in self._columns
                ]}
            )
        else:
            import io as _io

            buf = _io.BytesIO()
            self.write_ipc(buf)
            data = buf.getvalue()
        if file is None:
            return data
        mode = "w" if isinstance(data, str) else "wb"
        if hasattr(file, "write"):
            file.write(data)
        else:
            with open(file, mode) as f:
                f.write(data)
        return None

    @classmethod
    def deserialize(cls, source: Any, *, format: str = "binary") -> DataFrame:
        if hasattr(source, "read"):
            source = source.read()
        if format == "json":
            import json as _json

            if isinstance(source, bytes):
                source = source.decode()
            doc = _json.loads(source)
            return cls({c["name"]: c["values"] for c in doc["columns"]})
        import io as _io

        import polars_tpu as pl
        import pyarrow.ipc as pa_ipc

        buf = _io.BytesIO(bytes(source)) if isinstance(source, (bytes, bytearray)) else source
        tbl = pa_ipc.open_file(buf).read_all()
        return pl.from_arrow(tbl)

    def unstack(self, *, step: int, how: str = "vertical", columns: Any = None, fill_values: Any = None) -> DataFrame:
        """Long -> wide without aggregation (reference: DataFrame.unstack)."""
        import math

        sel = self if columns is None else self.select(columns)
        n_cols = math.ceil(self._height / step) if step else 0
        cols_out = []
        for c in sel._columns:
            vals = c.to_pylist()
            pad = n_cols * step - len(vals)
            vals = vals + [None] * pad
            from polars_tpu.core.column import Column as _C

            if how == "vertical":
                chunks = [vals[i * step : (i + 1) * step] for i in range(n_cols)]
            else:  # horizontal
                chunks = [vals[i::n_cols] for i in range(n_cols)]
            for i, ch in enumerate(chunks):
                cols_out.append(_C.from_values(f"{c.name}_{i}", ch, c.dtype))
        return DataFrame._from_columns(cols_out, step)

    def upsample(self, time_column: str, *, every: str, group_by: Any = None, maintain_order: bool = False) -> DataFrame:
        """Insert missing regular time steps as null rows (reference:
        DataFrame.upsample) — implemented as a range frame + left join."""
        import polars_tpu as pl

        tcol = self._get(time_column)
        gb = [group_by] if isinstance(group_by, str) else list(group_by or [])

        def _range_frame(sub: DataFrame) -> DataFrame:
            t = sub._get(time_column).to_pylist()
            ts = [v for v in t if v is not None]
            if not ts:
                return sub.clear()
            lo, hi = min(ts), max(ts)
            if isinstance(tcol.dtype, dt.Date):
                rng = pl.date_range(lo, hi, interval=every, eager=True)
            else:
                rng = pl.datetime_range(lo, hi, interval=every, eager=True)
            return DataFrame({time_column: rng.to_list()}).with_columns(
                pl.col(time_column).cast(tcol.dtype)
            )

        if not gb:
            grid = _range_frame(self)
            return grid.join(self, on=time_column, how="left").sort(time_column)
        parts = []
        for kv, sub in self.partition_by(gb, as_dict=True).items():
            grid = _range_frame(sub)
            kv_t = kv if isinstance(kv, tuple) else (kv,)
            grid = grid.with_columns(
                *[pl.lit(v).alias(g) for g, v in zip(gb, kv_t)]
            )
            parts.append(grid.join(sub, on=[*gb, time_column], how="left").sort(time_column))
        return pl.concat(parts)

    def write_ipc_stream(self, file: Any, *, compression: str | None = "uncompressed", **kwargs: Any) -> None:
        import pyarrow as pa
        import pyarrow.ipc as pa_ipc

        tbl = self.to_arrow()
        with pa_ipc.new_stream(file, tbl.schema) as w:
            w.write_table(tbl)

    def write_avro(self, file: Any, compression: str = "uncompressed", **kwargs: Any) -> None:
        from polars_tpu.io.extra import _missing_dep

        try:
            import fastavro  # noqa: F401
        except ImportError:
            _missing_dep("write_avro", "fastavro")

    def write_excel(self, workbook: Any = None, worksheet: Any = None, **kwargs: Any):
        from polars_tpu.io.extra import _missing_dep

        try:
            import xlsxwriter  # noqa: F401
        except ImportError:
            _missing_dep("write_excel", "xlsxwriter")

    def write_clipboard(self, *, separator: str = "\t", **kwargs: Any) -> None:
        from polars_tpu.io.extra import _missing_dep

        _missing_dep("write_clipboard", "a clipboard backend (headless environment)")

    def write_database(self, table_name: str, connection: Any, *, if_table_exists: str = "fail", engine: str = "sqlalchemy", **kwargs: Any) -> int:
        """Write via a DBAPI/SQLAlchemy connection through the pandas bridge
        (reference: DataFrame.write_database)."""
        pdf = self.to_pandas()
        pdf.to_sql(table_name, connection, if_exists={"fail": "fail", "append": "append", "replace": "replace"}[if_table_exists], index=False)
        return self._height

    def write_delta(self, target: Any, *, mode: str = "error", **kwargs: Any):
        from polars_tpu.io.extra import _missing_dep

        try:
            import deltalake
        except ImportError:
            _missing_dep("write_delta", "deltalake")
        deltalake.write_deltalake(target, self.to_arrow(), mode=mode, **kwargs)

    def write_iceberg(self, target: Any, *, mode: str = "append", **kwargs: Any):
        from polars_tpu.io.extra import _missing_dep

        try:
            import pyiceberg  # noqa: F401
        except ImportError:
            _missing_dep("write_iceberg", "pyiceberg")

    def collect_schema(self):
        return self.schema

    def fold(self, operation: Any):
        from polars_tpu.core.series import Series

        acc = Series._from_column(self._columns[0])
        for c in self._columns[1:]:
            acc = operation(acc, Series._from_column(c))
        return acc.rename(self._columns[0].name)

    def hash_rows(self, seed: int = 0, **kwargs: Any):
        import polars_tpu as pl
        from polars_tpu.core.series import Series

        h = None
        for c in self.columns:
            e = pl.col(c).hash(seed=seed)
            h = e if h is None else (h ^ e)
        out = self.select(h.alias("hash"))
        return Series._from_column(out._columns[0])

    def iter_columns(self):
        from polars_tpu.core.series import Series

        for c in self._columns:
            yield Series._from_column(c)

    def iter_slices(self, n_rows: int = 10000):
        for off in range(0, self._height, n_rows):
            yield self.slice(off, n_rows)

    def to_dummies(self, columns: Any = None, *, separator: str = "_", drop_first: bool = False) -> DataFrame:
        names = _flatten_names([columns]) if columns is not None else [
            c.name for c in self._columns
        ]
        cols: list = []
        for c in self._columns:
            if c.name not in names:
                cols.append(c)
                continue
            from polars_tpu.core.series import Series

            vals = c.to_pylist()
            uniq = sorted({v for v in vals if v is not None}, key=lambda x: (str(type(x)), x))
            if drop_first:
                uniq = uniq[1:]
            for u in uniq:
                cols.append(
                    Column.from_values(
                        f"{c.name}{separator}{u}", [int(v == u) for v in vals], dt.UInt8()
                    )
                )
        return DataFrame._from_columns(cols, self._height)

    def corr(self, **kwargs: Any) -> DataFrame:
        import numpy as np

        arrs = [c.to_numpy().astype(np.float64) for c in self._columns]
        mat = np.corrcoef(np.vstack(arrs)) if len(arrs) > 1 else np.ones((1, 1))
        return DataFrame({c.name: mat[i] for i, c in enumerate(self._columns)})

    def to_jax(self, return_type: str = "dict", *, dtype: Any = None):
        """Export as jax arrays (reference: py-polars ml/jax export). The
        columns are ALREADY device arrays — this is zero-copy."""
        if return_type == "dict":
            return {c.name: c.buffer.values[: self._height] for c in self._columns}
        import jax.numpy as jnp

        return jnp.stack([c.buffer.values[: self._height].astype(jnp.float32) for c in self._columns], axis=1)

    def to_torch(self, return_type: str = "dict"):
        """Export to torch (host copy; reference: py-polars ml/torch)."""
        import torch

        if return_type == "dict":
            return {c.name: torch.from_numpy(np.array(c.to_numpy(), copy=True)) for c in self._columns}
        return torch.from_numpy(np.array(self.to_numpy(), dtype=np.float32, copy=True))

    def sql(self, query: str, *, table_name: str = "self") -> DataFrame:
        from polars_tpu.sql.context import SQLContext

        ctx = SQLContext(frames={table_name: self})
        out = ctx.execute(query)
        from polars_tpu.lazyframe import LazyFrame

        return out.collect() if isinstance(out, LazyFrame) else out

    def group_by(self, *by: Any, maintain_order: bool = False, **named_by: Any):
        from polars_tpu.groupby import GroupBy

        return GroupBy(self, by, named_by, maintain_order=maintain_order)

    def unnest(self, columns: Any, *more: Any) -> DataFrame:
        """Expand Struct columns into their fields (reference: DataFrame.unnest)."""
        from polars_tpu.core.frame import _flatten_names
        from polars_tpu.engine.gather import gather_column

        names = set(_flatten_names([columns, *more]))
        cols: list = []
        for c in self._columns:
            if c.name in names:
                import numpy as np

                from polars_tpu import datatypes as dtypes

                if not isinstance(c.dtype, dtypes.Struct):
                    raise InvalidOperationError(f"unnest needs Struct columns, got {c.dtype!r}")
                from polars_tpu.engine.gather import gather_struct_field

                for f in c.child or []:
                    cols.append(gather_struct_field(c, f))
            else:
                cols.append(c)
        return DataFrame._from_columns(cols, self._height)

    def rolling(self, index_column: Any, **kwargs: Any):
        """Eager wrapper over LazyFrame.rolling (agg() collects)."""
        lazy_r = self.lazy().rolling(index_column, **kwargs)

        class _Eager:
            def agg(self, *aggs: Any, **named: Any):
                return lazy_r.agg(*aggs, **named).collect()

        return _Eager()

    def group_by_dynamic(self, index_column: Any, **kwargs: Any):
        """Eager wrapper over LazyFrame.group_by_dynamic (agg() collects)."""
        lazy_gb = self.lazy().group_by_dynamic(index_column, **kwargs)

        class _Eager:
            def agg(self, *aggs: Any, **named: Any):
                return lazy_gb.agg(*aggs, **named).collect()

        return _Eager()

    def join(
        self,
        other: DataFrame,
        on: Any = None,
        how: str = "inner",
        *,
        left_on: Any = None,
        right_on: Any = None,
        suffix: str = "_right",
        validate: str = "m:m",
        nulls_equal: bool = False,
        coalesce: bool | None = None,
        maintain_order: str | None = None,
    ) -> DataFrame:
        return (
            self.lazy()
            .join(
                other.lazy(),
                on=on,
                how=how,
                left_on=left_on,
                right_on=right_on,
                suffix=suffix,
                validate=validate,
                nulls_equal=nulls_equal,
                coalesce=coalesce,
                maintain_order=maintain_order,
            )
            .collect()
        )

    def unique(
        self,
        subset: Any = None,
        *,
        keep: str = "any",
        maintain_order: bool = False,
    ) -> DataFrame:
        return self.lazy().unique(subset, keep=keep, maintain_order=maintain_order).collect()

    def drop_nulls(self, subset: Any = None) -> DataFrame:
        return self.lazy().drop_nulls(subset).collect()

    def fill_null(self, value: Any = None, strategy: str | None = None, limit: int | None = None, *, matches_supertype: bool = True) -> DataFrame:
        return self.lazy().fill_null(value, strategy, limit).collect()

    def fill_nan(self, value: Any) -> DataFrame:
        return self.lazy().fill_nan(value).collect()

    def cast(self, dtypes: Any, *, strict: bool = True) -> DataFrame:
        return self.lazy().cast(dtypes, strict=strict).collect()

    def explode(self, columns: Any, *more_columns: Any) -> DataFrame:
        return self.lazy().explode(columns, *more_columns).collect()

    def unpivot(
        self,
        on: Any = None,
        *,
        index: Any = None,
        variable_name: str = "variable",
        value_name: str = "value",
    ) -> DataFrame:
        return (
            self.lazy()
            .unpivot(on, index=index, variable_name=variable_name, value_name=value_name)
            .collect()
        )

    def pivot(
        self,
        on: Any,
        *,
        index: Any = None,
        values: Any = None,
        aggregate_function: str | None = None,
        maintain_order: bool = True,
        sort_columns: bool = False,
        separator: str = "_",
    ) -> DataFrame:
        """Wide reshape (reference: polars-ops/src/frame/pivot/): group by
        ``index``, one output column per distinct ``on`` value."""
        on_names = _flatten_names(on if isinstance(on, (list, tuple)) else [on])
        if len(on_names) != 1:
            raise InvalidOperationError("pivot supports a single `on` column for now")
        on_name = on_names[0]
        if index is None:
            known = set(on_names) | (
                set(_flatten_names(values if isinstance(values, (list, tuple)) else [values]))
                if values is not None
                else set()
            )
            index_names = [c for c in self.columns if c not in known]
        else:
            index_names = _flatten_names(index if isinstance(index, (list, tuple)) else [index])
        if values is None:
            value_names = [c for c in self.columns if c not in set(index_names) | {on_name}]
        else:
            value_names = _flatten_names(values if isinstance(values, (list, tuple)) else [values])

        import polars_tpu as pl

        agg = aggregate_function or "first"
        aggs = [getattr(pl.col(v), agg)().alias(v) for v in value_names]
        base = self.group_by(*index_names, on_name, maintain_order=maintain_order).agg(aggs)

        on_vals = self.get_column(on_name).unique(maintain_order=maintain_order).to_list()
        if sort_columns:
            on_vals = sorted(on_vals, key=lambda x: (x is None, x))

        # Device scatter path (reference: polars-ops/src/frame/pivot/mod.rs —
        # there a parallel row-index kernel; here ONE batched scatter per value
        # column): each base row lands at cell (group_id, on_id) of a dense
        # (n_on, n_out) matrix. group_id/on_id come from m:1 joins against the
        # distinct-index / distinct-on frames, so no per-row Python runs.
        work = base
        if index_names:
            idx_frame = base.select(index_names).unique(maintain_order=maintain_order)
            n_out = idx_frame.height
            idx_with_id = idx_frame.with_row_index("__pv_gid")
            work = work.join(idx_with_id, on=index_names, how="left", nulls_equal=True)
            cols = list(idx_frame._columns)
        else:
            n_out = 1
            cols = []
        on_col = Column.from_values(on_name, on_vals, base.schema[on_name], strict=False)
        onf = DataFrame._from_columns([on_col], len(on_vals)).with_row_index("__pv_oid")
        work = work.join(onf, on=on_name, how="left", nulls_equal=True)

        import jax.numpy as jnp

        from polars_tpu.core.buffer import Buffer, padded_size as _psize

        oid_buf = work.get_column("__pv_oid")._column.buffer
        keep = oid_buf.valid_mask()
        oid = oid_buf.values
        if index_names:
            gid_buf = work.get_column("__pv_gid")._column.buffer
            keep = keep & gid_buf.valid_mask()
            gid = gid_buf.values
        else:
            gid = jnp.zeros_like(oid)

        out_padded = _psize(n_out)
        scat = _pivot_scatter(len(on_vals), out_padded)
        for vn in value_names:
            c = work.get_column(vn)._column
            buf = c.buffer
            out, valid = scat(buf.values, buf.valid_mask(), gid, oid, keep)
            for j, v in enumerate(on_vals):
                name = str(v) if len(value_names) == 1 else f"{vn}{separator}{v}"
                vb = Buffer(out[j], valid[j], n_out)
                cols.append(Column(name, c.dtype, vb, table=c.table, child=c.child))
        return DataFrame._from_columns(cols, n_out)

    def transpose(self, *, include_header: bool = False, header_name: str = "column", column_names: Any = None) -> DataFrame:
        rows = self.rows()
        names = list(column_names) if column_names is not None else [
            f"column_{i}" for i in range(self.height)
        ]
        data: dict[str, Any] = {header_name: self.columns} if include_header else {}
        for i in range(self.height):
            data[names[i]] = list(rows[i])
        return DataFrame(data, strict=False)

    def top_k(self, k: int, *, by: Any, reverse: Any = False) -> DataFrame:
        return self.lazy().top_k(k, by=by, reverse=reverse).collect()

    def bottom_k(self, k: int, *, by: Any, reverse: Any = False) -> DataFrame:
        return self.lazy().bottom_k(k, by=by, reverse=reverse).collect()

    def with_row_index(self, name: str = "index", offset: int = 0) -> DataFrame:
        return self.lazy().with_row_index(name, offset).collect()

    def with_row_count(self, name: str = "row_nr", offset: int = 0) -> DataFrame:
        return self.with_row_index(name, offset)

    def join_where(self, other: DataFrame, *predicates: Any, suffix: str = "_right") -> DataFrame:
        return self.lazy().join_where(other.lazy(), *predicates, suffix=suffix).collect()

    def update(self, other: DataFrame, on: Any = None, how: str = "left", **kwargs: Any) -> DataFrame:
        return self.lazy().update(other.lazy(), on, how, **kwargs).collect()

    def merge_sorted(self, other: DataFrame, key: str) -> DataFrame:
        return self.lazy().merge_sorted(other.lazy(), key).collect()

    def join_asof(self, other: DataFrame, **kwargs: Any) -> DataFrame:
        return self.lazy().join_asof(other.lazy(), **kwargs).collect()

    # -- direct (cheap) ops ------------------------------------------------------------

    def slice(self, offset: int, length: int | None = None) -> DataFrame:
        if offset < 0:
            offset = max(0, self._height + offset)
        if length is None:
            length = self._height - offset
        length = max(0, min(length, self._height - offset))
        cols = [c.with_buffer(c.buffer.slice(offset, length), sorted_flag=c.sorted_flag) for c in self._columns]
        return DataFrame._from_columns(cols, length)

    def head(self, n: int = 5) -> DataFrame:
        if n < 0:
            n = max(0, self._height + n)
        return self.slice(0, n)

    def tail(self, n: int = 5) -> DataFrame:
        if n < 0:
            n = max(0, self._height + n)
        return self.slice(max(0, self._height - n), n)

    def limit(self, n: int = 5) -> DataFrame:
        return self.head(n)

    def first(self) -> DataFrame:
        return self.head(1)

    def last(self) -> DataFrame:
        return self.tail(1)

    def reverse(self) -> DataFrame:
        return self.gather(np.arange(self._height - 1, -1, -1))

    def gather(self, indices: Any) -> DataFrame:
        from polars_tpu.engine.gather import gather_frame

        idx = np.asarray(indices)
        return DataFrame._from_columns(gather_frame(self._columns, idx), len(idx))

    def gather_every(self, n: int, offset: int = 0) -> DataFrame:
        return self.gather(np.arange(offset, self._height, n))

    def drop(self, *columns: Any, strict: bool = True) -> DataFrame:
        names = set(_flatten_names(columns))
        if strict:
            missing = names - set(self.columns)
            if missing:
                raise ColumnNotFoundError(f"{sorted(missing)} not found")
        cols = [c for c in self._columns if c.name not in names]
        return DataFrame._from_columns(cols, self._height)

    def rename(self, mapping: Mapping[str, str], *, strict: bool = True) -> DataFrame:
        if strict:
            missing = set(mapping) - set(self.columns)
            if missing:
                raise ColumnNotFoundError(f"{sorted(missing)} not found")
        cols = [c.rename(mapping.get(c.name, c.name)) for c in self._columns]
        names = [c.name for c in cols]
        if len(set(names)) != len(names):
            raise DuplicateError("rename would create duplicate column names")
        return DataFrame._from_columns(cols, self._height)

    def clone(self) -> DataFrame:
        return DataFrame._from_columns(list(self._columns), self._height)

    def clear(self, n: int = 0) -> DataFrame:
        out = DataFrame(schema=self.schema)
        if n > 0:
            out = DataFrame(
                {name: [None] * n for name in self.columns},
                schema=self.schema,
            )
        return out

    def rechunk(self) -> DataFrame:
        return self

    def shrink_to_fit(self) -> DataFrame:
        return self

    def hstack(self, columns: Any, *, in_place: bool = False) -> DataFrame:
        from polars_tpu.core.series import Series

        if isinstance(columns, DataFrame):
            new_cols = columns._columns
        else:
            new_cols = [c._column if isinstance(c, Series) else c for c in columns]
        for c in new_cols:
            if len(c) != self._height and self._height > 0:
                raise ShapeError("hstack column height mismatch")
        cols = self._columns + list(new_cols)
        if in_place:
            self._columns = cols
            return self
        return DataFrame._from_columns(cols, self._height if self._columns else (len(new_cols[0]) if new_cols else 0))

    def vstack(self, other: DataFrame, *, in_place: bool = False) -> DataFrame:
        from polars_tpu.functions.eager import concat

        out = concat([self, other], how="vertical")
        if in_place:
            self._columns = out._columns
            self._height = out._height
            return self
        return out

    def extend(self, other: DataFrame) -> DataFrame:
        return self.vstack(other, in_place=True)

    def insert_column(self, index: int, column: Series) -> DataFrame:
        cols = list(self._columns)
        cols.insert(index, column._column)
        return DataFrame._from_columns(cols, self._height)

    def replace_column(self, index: int, column: Series) -> DataFrame:
        cols = list(self._columns)
        cols[index] = column._column
        return DataFrame._from_columns(cols, self._height)

    def drop_in_place(self, name: str) -> Series:
        from polars_tpu.core.series import Series

        col = self._get(name)
        self._columns = [c for c in self._columns if c.name != name]
        return Series._from_column(col)

    def partition_by(
        self, by: Any, *more_by: Any, maintain_order: bool = True, include_key: bool = True, as_dict: bool = False
    ):
        names = _flatten_names((by, *more_by))
        uniq = self.select(names).unique(maintain_order=maintain_order)
        frames = []
        keys = []
        import polars_tpu as pl

        for row in uniq.iter_rows():
            pred = None
            for n, v in zip(names, row):
                p = pl.col(n).eq_missing(pl.lit(v, dtype=self.schema[n]))
                pred = p if pred is None else (pred & p)
            sub = self.filter(pred)
            if not include_key:
                sub = sub.drop(*names)
            frames.append(sub)
            keys.append(tuple(row))
        if as_dict:
            return dict(zip(keys, frames))
        return frames

    # -- frame-level reductions -----------------------------------------------------------

    def _agg_all(self, method: str, **kwargs: Any) -> DataFrame:
        import polars_tpu as pl

        exprs = []
        for c in self._columns:
            e = pl.col(c.name)
            try:
                exprs.append(getattr(e, method)(**kwargs))
            except Exception:
                exprs.append(pl.lit(None).alias(c.name))
        return self.select(exprs)

    def sum(self) -> DataFrame:
        return self._agg_all("sum")

    def mean(self) -> DataFrame:
        return self._agg_all("mean")

    def min(self) -> DataFrame:
        return self._agg_all("min")

    def max(self) -> DataFrame:
        return self._agg_all("max")

    def median(self) -> DataFrame:
        return self._agg_all("median")

    def std(self, ddof: int = 1) -> DataFrame:
        return self._agg_all("std", ddof=ddof)

    def var(self, ddof: int = 1) -> DataFrame:
        return self._agg_all("var", ddof=ddof)

    def quantile(self, quantile: float, interpolation: str = "nearest") -> DataFrame:
        return self._agg_all("quantile", quantile=quantile, interpolation=interpolation)

    def count(self) -> DataFrame:
        return self._agg_all("count")

    def null_count(self) -> DataFrame:
        cols = [
            Column.from_values(c.name, [c.null_count()], dt.UInt32())
            for c in self._columns
        ]
        return DataFrame._from_columns(cols, 1)

    def n_unique(self, subset: Any = None) -> int:
        target = self if subset is None else self.select(subset)
        return target.unique().height

    def item(self, row: int | None = None, column: int | str | None = None) -> Any:
        if row is None and column is None:
            if self.shape != (1, 1):
                raise ValueError(f"can only call .item() on a 1x1 frame, got {self.shape}")
            return self._columns[0].to_pylist()[0]
        col = self._columns[column] if isinstance(column, int) else self._get(column)
        return col.to_pylist()[row]

    # -- output conversion --------------------------------------------------------------------

    def _prefetch_host(self) -> None:
        """Fetch every column's device buffers to host in ONE batched
        device_get (async copies overlap, then each array's host-value cache
        is warm, so the per-column np.asarray calls below transfer nothing).
        Per-column reads would each pay a ~26ms tunnel round trip once the
        process has done any device->host readback — see CLAUDE.md §1."""
        import jax

        from polars_tpu.utils import hashstore

        # hashed-string equality backstop: any literal compared in hash
        # space must be proven collision-free before results are shown
        hashstore.verify_pending()

        arrs = []
        for c in self._columns:
            arrs.append(c.buffer.values)
            if c.buffer.validity is not None:
                arrs.append(c.buffer.validity)
        if arrs:
            jax.device_get(arrs)

    def to_dict(self, *, as_series: bool = True) -> dict:
        if as_series:
            from polars_tpu.core.series import Series

            return {c.name: Series._from_column(c) for c in self._columns}
        self._prefetch_host()
        return {c.name: c.to_pylist() for c in self._columns}

    def to_dicts(self) -> list[dict]:
        self._prefetch_host()
        lists = [(c.name, c.to_pylist()) for c in self._columns]
        return [
            {name: vals[i] for name, vals in lists} for i in range(self._height)
        ]

    def rows(self, *, named: bool = False) -> list:
        if named:
            return self.to_dicts()
        self._prefetch_host()
        lists = [c.to_pylist() for c in self._columns]
        return [tuple(vals[i] for vals in lists) for i in range(self._height)]

    def iter_rows(self, *, named: bool = False):
        return iter(self.rows(named=named))

    def row(self, index: int | None = None, *, by_predicate: Any = None, named: bool = False):
        if by_predicate is not None:
            sub = self.filter(by_predicate)
            if sub.height != 1:
                from polars_tpu.errors import NoDataError

                if sub.height == 0:
                    raise NoDataError("no rows matched predicate")
                raise ValueError("predicate matched multiple rows")
            return sub.row(0, named=named)
        rows = self.slice(index, 1).rows(named=named)
        return rows[0]

    def to_numpy(self, *, structured: bool = False) -> np.ndarray:
        self._prefetch_host()
        arrs = [c.to_numpy() for c in self._columns]
        if structured:
            dtypes = [(c.name, a.dtype if a.dtype != object else object) for c, a in zip(self._columns, arrs)]
            out = np.empty(self._height, dtype=dtypes)
            for c, a in zip(self._columns, arrs):
                out[c.name] = a
            return out
        if not arrs:
            return np.empty((0, 0))
        return np.column_stack(arrs) if len(arrs) > 1 else arrs[0].reshape(-1, 1)

    def to_pandas(self) -> Any:
        self._prefetch_host()
        import pandas as pd

        return pd.DataFrame({c.name: c.to_numpy() for c in self._columns})

    def __dataframe__(self, nan_as_null: bool = False, allow_copy: bool = True) -> Any:
        """Dataframe interchange protocol (via the Arrow implementation) —
        consumable by pandas/duckdb/vaex etc. (reference: py-polars
        interchange/dataframe.py)."""
        return self.to_arrow().__dataframe__(nan_as_null, allow_copy)

    def __arrow_c_stream__(self, requested_schema: Any = None) -> Any:
        """Arrow PyCapsule C-stream export (Arrow C-data FFI; reference:
        polars-arrow ffi + py-polars __arrow_c_stream__)."""
        return self.to_arrow().__arrow_c_stream__(requested_schema)

    def to_arrow(self) -> Any:
        self._prefetch_host()
        import pyarrow as pa

        from polars_tpu.io._arrow import column_to_arrow

        if not self._columns:
            return pa.table({})
        return pa.table({c.name: column_to_arrow(c) for c in self._columns})

    def to_struct(self, name: str = "") -> Series:
        """All columns as one Struct series (reference: DataFrame.to_struct)."""
        import numpy as np_

        from polars_tpu.core.buffer import Buffer
        from polars_tpu.core.series import Series

        ids = Buffer.from_numpy(np_.arange(self._height, dtype=np_.int64), None)
        fields = dt.Struct([(c.name, c.dtype) for c in self._columns])
        col = Column(name, fields, ids, None, 0, list(self._columns))
        return Series._from_column(col)

    # -- IO ------------------------------------------------------------------------------------

    def write_parquet(self, file: Any, **kwargs: Any) -> None:
        from polars_tpu.io.parquet import write_parquet

        write_parquet(self, file, **kwargs)

    def write_csv(self, file: Any = None, **kwargs: Any):
        from polars_tpu.io.csv import write_csv

        return write_csv(self, file, **kwargs)

    def write_ipc(self, file: Any, **kwargs: Any) -> None:
        from polars_tpu.io.ipc import write_ipc

        write_ipc(self, file, **kwargs)

    def write_ndjson(self, file: Any = None, **kwargs: Any):
        from polars_tpu.io.ndjson import write_ndjson

        return write_ndjson(self, file, **kwargs)

    def write_json(self, file: Any = None, **kwargs: Any):
        from polars_tpu.io.ndjson import write_json

        return write_json(self, file, **kwargs)

    # -- comparison ------------------------------------------------------------------------------

    def equals(self, other: DataFrame, *, null_equal: bool = True) -> bool:
        if self.shape != other.shape or self.columns != other.columns:
            return False
        if self.dtypes != other.dtypes:
            return False
        for a, b in zip(self._columns, other._columns):
            la, lb = a.to_pylist(), b.to_pylist()
            for x, y in zip(la, lb):
                if x is None or y is None:
                    if not (null_equal and x is None and y is None):
                        return False
                elif isinstance(x, float) and isinstance(y, float):
                    if x != y and not (x != x and y != y):
                        return False
                elif x != y:
                    return False
        return True

    # -- sampling / misc -----------------------------------------------------------------------------

    def sample(
        self,
        n: int | None = None,
        *,
        fraction: float | None = None,
        with_replacement: bool = False,
        shuffle: bool = False,
        seed: int | None = None,
    ) -> DataFrame:
        rng = np.random.default_rng(seed)
        if n is None:
            n = self._height if fraction is None else int(self._height * fraction)
        if with_replacement:
            idx = rng.integers(0, self._height, size=n)
        else:
            idx = rng.choice(self._height, size=min(n, self._height), replace=False)
            if not shuffle:
                idx = np.sort(idx)
        return self.gather(idx)

    def estimated_size(self, unit: str = "b") -> float:
        total = 0
        for c in self._columns:
            total += c.buffer.values.nbytes
            if c.buffer.validity is not None:
                total += c.buffer.validity.nbytes
        factor = {"b": 1, "kb": 1024, "mb": 1024**2, "gb": 1024**3, "tb": 1024**4}[unit]
        return total / factor

    def describe(self, percentiles: Sequence[float] = (0.25, 0.5, 0.75)) -> DataFrame:
        import polars_tpu as pl

        stats = ["count", "null_count", "mean", "std", "min", "max"]
        rows: list[list] = []
        num_cols = [c for c in self._columns]
        rows.append(["count"] + [float(self._height - c.null_count()) for c in num_cols])
        rows.append(["null_count"] + [float(c.null_count()) for c in num_cols])
        for stat in ("mean", "std", "min", "max"):
            vals = []
            for c in num_cols:
                if c.dtype.is_numeric() or (stat in ("min", "max")):
                    try:
                        v = getattr(self.get_column(c.name), stat)()
                        vals.append(v if not hasattr(v, "item") else v)
                    except Exception:
                        vals.append(None)
                else:
                    vals.append(None)
            rows.append([stat] + vals)
        data = {"statistic": [r[0] for r in rows]}
        for i, c in enumerate(num_cols):
            data[c.name] = [r[i + 1] for r in rows]
        return DataFrame(data, strict=False)

    def glimpse(
        self, *, max_items_per_column: int = 10,
        max_colname_length: int = 50, return_as_string: bool = False,
    ) -> str | None:
        lines = [f"Rows: {self._height}", f"Columns: {self.width}"]
        for c in self._columns:
            vals = self.get_column(c.name).head(max_items_per_column).to_list()
            name = c.name[:max_colname_length]
            lines.append(f"$ {name:<15} <{c.dtype!r}> {vals}")
        out = "\n".join(lines)
        if return_as_string:
            return out
        print(out)
        return None

    # -- repr ----------------------------------------------------------------------------------------

    def __repr__(self) -> str:
        from polars_tpu.utils.fmt import format_table

        return format_table(self)

    def __str__(self) -> str:
        return self.__repr__()

    def __eq__(self, other: object) -> Any:
        if isinstance(other, DataFrame):
            return self.equals(other)
        return NotImplemented

    def __contains__(self, name: str) -> bool:
        return name in self.columns

    def __iter__(self):
        return iter(self.get_columns())


def _json_safe(values: list) -> list:
    out = []
    for v in values:
        if v is None or isinstance(v, (bool, int, float, str)):
            out.append(v)
        elif isinstance(v, (list, tuple)):
            out.append(_json_safe(list(v)))
        elif isinstance(v, dict):
            out.append({k: _json_safe([x])[0] for k, x in v.items()})
        else:
            out.append(str(v))
    return out


def _schema_items(schema: Any) -> list[tuple[str, Any]]:
    if schema is None:
        return []
    if isinstance(schema, (Schema, Mapping)):
        return list(schema.items())
    out = []
    for entry in schema:
        if isinstance(entry, str):
            out.append((entry, None))
        else:
            out.append((entry[0], entry[1]))
    return out


def _flatten_names(items: Any) -> list[str]:
    out: list[str] = []
    if isinstance(items, str):
        return [items]
    for it in items:
        if isinstance(it, str):
            out.append(it)
        elif hasattr(it, "meta_output_name"):
            out.append(it.meta_output_name())
        elif isinstance(it, Iterable):
            out.extend(_flatten_names(it))
        else:
            out.append(str(it))
    return out


def _build_columns(
    data: Any,
    schema: Any,
    schema_overrides: Mapping[str, Any] | None,
    strict: bool,
    orient: str | None,
) -> list[Column]:
    from polars_tpu.core.series import Series

    overrides = dict(schema_overrides or {})
    items = _schema_items(schema)
    schema_names = [n for n, _ in items]
    schema_dtypes = {n: d for n, d in items if d is not None}
    schema_dtypes.update(overrides)

    def dtype_for(name: str):
        d = schema_dtypes.get(name)
        return dt.parse_into_dtype(d) if d is not None else None

    # pandas (incl. pandas>=3.0 StringDtype: NA sentinels -> None)
    if type(data).__name__ == "DataFrame" and type(data).__module__.startswith("pandas"):
        import pandas as pd

        def _pd_col(s):
            arr = s.to_numpy()
            if arr.dtype.kind in ("O", "U", "T"):
                return np.asarray(
                    [None if pd.isna(x) else x for x in arr], dtype=object
                )
            return arr

        data = {str(k): _pd_col(data[k]) for k in data.columns}

    # pyarrow
    if type(data).__name__ in ("Table", "RecordBatch") and type(data).__module__.startswith("pyarrow"):
        from polars_tpu.io._arrow import arrow_to_columns

        return arrow_to_columns(data, schema_dtypes)

    if isinstance(data, Mapping):
        cols = []
        for name, values in data.items():
            if isinstance(values, Series):
                c = values._column.rename(str(name))
                d = dtype_for(str(name))
                if d is not None and d != c.dtype:
                    from polars_tpu.ops.cast import cast_column

                    c = cast_column(c, d, strict=strict)
                cols.append(c)
            else:
                cols.append(Column.from_values(str(name), values, dtype_for(str(name)), strict=strict))
        return cols

    if isinstance(data, np.ndarray):
        if data.ndim == 1:
            name = schema_names[0] if schema_names else "column_0"
            return [Column.from_values(name, data, dtype_for(name), strict=strict)]
        if data.ndim == 2:
            if orient == "row":
                data = data.T
            names = schema_names or [f"column_{i}" for i in range(data.shape[1])]
            return [
                Column.from_values(names[i], data[:, i], dtype_for(names[i]), strict=strict)
                for i in range(data.shape[1])
            ]
        raise ShapeError("numpy input must be 1-D or 2-D")

    if isinstance(data, Sequence) and not isinstance(data, str):
        data = list(data)
        if not data:
            return [Column.from_values(n, [], dtype_for(n)) for n in schema_names]
        first = data[0]
        if isinstance(first, Series):
            cols = []
            for i, s in enumerate(data):
                name = schema_names[i] if i < len(schema_names) else (s.name or f"column_{i}")
                c = s._column.rename(name)
                d = dtype_for(name)
                if d is not None and d != c.dtype:
                    from polars_tpu.ops.cast import cast_column

                    c = cast_column(c, d, strict=strict)
                cols.append(c)
            return cols
        if isinstance(first, Column):
            return list(data)
        if isinstance(first, dict):
            names = schema_names or list(dict.fromkeys(k for row in data for k in row))
            return [
                Column.from_values(
                    n, [row.get(n) for row in data], dtype_for(n), strict=strict
                )
                for n in names
            ]
        if isinstance(first, (list, tuple)) and orient != "col":
            # rows orientation (default for list of tuples/lists)
            ncols = len(first)
            names = schema_names or [f"column_{i}" for i in range(ncols)]
            return [
                Column.from_values(
                    names[i], [row[i] for row in data], dtype_for(names[i]), strict=strict
                )
                for i in range(ncols)
            ]
        if isinstance(first, (list, tuple)) and orient == "col":
            names = schema_names or [f"column_{i}" for i in range(len(data))]
            return [
                Column.from_values(names[i], list(col), dtype_for(names[i]), strict=strict)
                for i, col in enumerate(data)
            ]
        # flat sequence -> single column
        name = schema_names[0] if schema_names else "column_0"
        return [Column.from_values(name, data, dtype_for(name), strict=strict)]

    raise TypeError(f"cannot create DataFrame from {type(data).__name__}")


@_functools.lru_cache(maxsize=None)
def _pivot_scatter(n_on: int, out_padded: int):
    """Jitted dense cell scatter for :meth:`DataFrame.pivot` (reference:
    polars-ops/src/frame/pivot/positioning.rs — there a parallel row-index
    kernel, here one batched XLA scatter). Cached per output shape so repeated
    pivots reuse one compiled program (CLAUDE.md rule 3)."""
    import jax
    import jax.numpy as jnp

    def fn(vals, src_valid, gid, oid, keep):
        # dropped rows are routed out of bounds; mode="drop" discards them
        o = jnp.where(keep, oid.astype(jnp.int32), n_on)
        g = jnp.where(keep, gid.astype(jnp.int32), out_padded)
        out = jnp.zeros((n_on, out_padded), dtype=vals.dtype)
        out = out.at[o, g].set(vals, mode="drop")
        valid = jnp.zeros((n_on, out_padded), dtype=bool)
        valid = valid.at[o, g].set(src_valid, mode="drop")
        return out, valid

    return jax.jit(fn)
