"""polars_tpu: a TPU-native DataFrame query engine with the capabilities of
Polars (reference: pola-rs/polars, see SURVEY.md).

Public API parity target: py-polars/src/polars/__init__.py. Compute path:
expressions trace to XLA programs over padded device columns; hot kernels in
Pallas; multi-chip execution via jax.sharding (polars_tpu.parallel).
"""

from __future__ import annotations

import jax as _jax

# Polars semantics default to 64-bit ints/floats; TPU executes them via XLA's
# wide-type emulation (hot paths downcast explicitly where safe).
_jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: query-shape compiles amortize across
# processes (the TPU backend's compile service is slow for large programs).
import os as _os

def _host_fingerprint() -> str:
    """Host-CPU feature fingerprint. XLA:CPU AOT cache entries embed the
    compile machine's features but the cache KEY does not include them, so a
    cache written on a wider-ISA host (e.g. AVX512+AMX) SIGILLs/segfaults when
    loaded elsewhere. Salting the directory per host CPU keeps TPU entries
    (machine-independent: compiled by the remote service) shareable per host
    while isolating incompatible CPU artifacts."""
    base = None
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    base = line
                    break
    except OSError:
        pass
    if base is None:
        import platform

        base = platform.machine()
    # ALSO salt by the process's JAX configuration: XLA:CPU AOT entries embed
    # tuning flags (+prefer-no-gather/-scatter) that vary with the backend
    # setup — a forced-host-platform (multichip dryrun / test) process and a
    # TPU-plugin process produce mutually unloadable CPU artifacts even on
    # the SAME machine (round-2 MULTICHIP dryrun warnings; the round-1 suite
    # segfault mechanism).
    import hashlib

    cfg = "|".join(
        (
            _os.environ.get("JAX_PLATFORMS", ""),
            _os.environ.get("XLA_FLAGS", ""),
            getattr(_jax, "__version__", ""),
        )
    )
    return hashlib.sha1((base + "##" + cfg).encode()).hexdigest()[:12]


def _want_persistent_cache() -> bool:
    """The persistent cache exists for the TPU backend's slow remote compile
    service (40s-6min/program). On the CPU backend compiles are fast and the
    cache is actively DANGEROUS: XLA:CPU AOT entries embed the compile
    process's machine features + tuning flags but the cache key does not, so
    a stale/foreign entry SIGILLs/SIGSEGVs ON LOAD — measured r5: suite
    workers each compile 1300-1500 programs and the intermittent "worker
    crashed" moves between tests exactly like a poisoned-entry load (the
    cpu_aot_loader feature-mismatch errors say so verbatim), not like a
    compile-count cliff. So: cache only when the process is NOT forced to
    CPU. Override with POLARS_TPU_CPU_COMPILE_CACHE=1."""
    if _os.environ.get("POLARS_TPU_CPU_COMPILE_CACHE") == "1":
        return True
    try:
        cfg = _jax.config.jax_platforms or ""
    except Exception:  # noqa: BLE001
        cfg = ""
    env = _os.environ.get("JAX_PLATFORMS", "")
    return not (cfg.startswith("cpu") or env.startswith("cpu"))


_cache_dir = _os.environ.get(
    "POLARS_TPU_COMPILE_CACHE", f"/tmp/polars_tpu_xla_cache_{_host_fingerprint()}"
)
if _want_persistent_cache():
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # noqa: BLE001
        pass

from polars_tpu import api
from polars_tpu import exceptions
from polars_tpu import plugins
from polars_tpu import datatypes
from polars_tpu import selectors
from polars_tpu.config import Config
from polars_tpu.core.frame import DataFrame
from polars_tpu.core.schema import Schema
from polars_tpu.core.series import Series
from polars_tpu.datatypes import (
    Array,
    Binary,
    Boolean,
    Categorical,
    DataType,
    Date,
    Datetime,
    Decimal,
    Duration,
    Enum,
    Field,
    Float16,
    Float32,
    Float64,
    Int8,
    Int16,
    Int32,
    Int64,
    Int128,
    List,
    Null,
    Object,
    String,
    Struct,
    Time,
    UInt8,
    UInt16,
    UInt32,
    UInt64,
    UInt128,
    BaseExtension,
    Categories,
    DataTypeExpr,
    Extension,
    get_extension_type,
    register_extension_type,
    unregister_extension_type,
    dtype_of,
    self_dtype,
    struct_with_fields,
    Unknown,
    Utf8,
)
from polars_tpu.engine.cancel import CancelToken
from polars_tpu.errors import (
    ColumnNotFoundError,
    ComputeError,
    DuplicateError,
    InvalidOperationError,
    NoDataError,
    OutOfBoundsError,
    PolarsError,
    QueryCancelledError,
    SchemaError,
    SchemaFieldNotFoundError,
    ShapeError,
    SQLInterfaceError,
    SQLSyntaxError,
)
from polars_tpu.expr.expr import Expr
from polars_tpu.functions import (
    all,
    all_horizontal,
    any,
    any_horizontal,
    approx_n_unique,
    arange,
    arg_sort_by,
    arg_where,
    coalesce,
    col,
    concat,
    concat_arr,
    concat_list,
    concat_str,
    corr,
    count,
    cov,
    cum_sum,
    date,
    date_range,
    date_ranges,
    datetime,
    datetime_range,
    datetime_ranges,
    duration,
    element,
    exclude,
    first,
    fold,
    format,
    head,
    implode,
    int_range,
    int_ranges,
    linear_spaces,
    last,
    len,
    lit,
    max,
    max_horizontal,
    mean,
    mean_horizontal,
    median,
    min,
    min_horizontal,
    n_unique,
    nth,
    ones,
    quantile,
    reduce,
    repeat,
    select,
    std,
    struct,
    sum,
    sum_horizontal,
    tail,
    var,
    when,
    zeros,
    StringCache,
    align_frames,
    arctan2,
    arctan2d,
    build_info,
    business_day_count,
    collect_all,
    collect_all_async,
    cum_count,
    cum_fold,
    cum_reduce,
    cum_sum_horizontal,
    disable_string_cache,
    enable_string_cache,
    escape_regex,
    explain_all,
    field,
    from_epoch,
    groups,
    get_index_type,
    linear_space,
    list,
    map_batches,
    map_groups,
    merge_sorted,
    rolling_corr,
    rolling_cov,
    row_index,
    set_random_seed,
    show_versions,
    sql_expr,
    thread_pool_size,
    threadpool_size,
    time,
    time_range,
    time_ranges,
    union,
    using_string_cache,
)
from polars_tpu.functions.interop import (
    CompatLevel,
    GPUEngine,
    QueryOptFlags,
    defer,
    from_repr,
    from_torch,
    json_normalize,
)
from polars_tpu.io.partition import FileProviderArgs, PartitionBy
from polars_tpu.io.scan_options import ScanCastOptions
from polars_tpu.io.cloud import (
    Catalog,
    CredentialProvider,
    CredentialProviderAWS,
    CredentialProviderAzure,
    CredentialProviderFunction,
    CredentialProviderFunctionReturn,
    CredentialProviderGCP,
)
from polars_tpu.io import (
    read_csv,
    read_database,
    read_database_uri,
    read_delta,
    read_avro,
    read_clipboard,
    read_csv_batched,
    read_excel,
    read_ipc,
    read_ipc_schema,
    read_ipc_stream,
    read_lines,
    read_ndjson,
    read_ods,
    read_parquet_metadata,
    read_parquet,
    read_parquet_schema,
    scan_csv,
    scan_delta,
    scan_iceberg,
    scan_arrow_c_stream,
    scan_ipc,
    scan_lines,
    scan_ndjson,
    scan_pyarrow_dataset,
    scan_parquet,
)
from polars_tpu.io.ndjson import read_json
from polars_tpu.lazyframe import LazyFrame
from polars_tpu.sql import SQLContext

__version__ = "0.1.0"


def from_pandas(df, **kwargs):
    return DataFrame(df, **kwargs)


def from_arrow(data, **kwargs):
    import pyarrow as pa

    if isinstance(data, (pa.Table, pa.RecordBatch)):
        return DataFrame(data, **kwargs)
    if isinstance(data, (pa.Array, pa.ChunkedArray)):
        from polars_tpu.io._arrow import arrow_array_to_column

        return Series._from_column(arrow_array_to_column("", data))
    raise TypeError(f"cannot create from {type(data).__name__}")


def from_dataframe(df, *, allow_copy: bool = True):
    """Build a DataFrame from any object implementing the dataframe
    interchange protocol (reference: py-polars from_dataframe); Arrow
    PyCapsule (``__arrow_c_stream__``) producers work too."""
    import pyarrow as pa

    if isinstance(df, DataFrame):
        return df
    if hasattr(df, "__arrow_c_stream__"):
        return DataFrame(pa.table(df))
    if hasattr(df, "__dataframe__"):
        from pyarrow.interchange import from_dataframe as _fd

        return DataFrame(_fd(df, allow_copy=allow_copy))
    raise TypeError(
        f"{type(df).__name__} implements neither the interchange protocol "
        "nor the Arrow C-stream protocol"
    )


def from_numpy(data, schema=None, **kwargs):
    return DataFrame(data, schema=schema, **kwargs)


def from_dict(data, schema=None, **kwargs):
    return DataFrame(data, schema=schema, **kwargs)


def from_dicts(data, schema=None, **kwargs):
    return DataFrame(list(data), schema=schema, **kwargs)


def from_records(data, schema=None, **kwargs):
    return DataFrame(data, schema=schema, orient="row", **kwargs)


def sql(query: str, *, eager: bool = False):
    """Run SQL against frames found in the caller's globals (reference:
    py-polars functions/sql.py)."""
    import inspect

    frame = inspect.currentframe().f_back
    ctx = SQLContext()
    seen = {}
    for scope in (frame.f_globals, frame.f_locals):
        for name, v in scope.items():
            if isinstance(v, (DataFrame, LazyFrame)) and name not in seen:
                seen[name] = v
                ctx.register(name, v)
    out = ctx.execute(query)
    return out.collect() if eager else out


__all__ = [n for n in dir() if not n.startswith("_")]
