"""Database IO: DB-API2 / ADBC / SQLAlchemy query ingestion.

Reference surface: py-polars read_database / read_database_uri
(/root/reference/py-polars/src/polars/io/database/). The reference rides
connectorx/ADBC for the URI path; here the core path is driver-agnostic
DB-API2 (cursor/description/fetchall) with fast paths for Arrow-native
drivers (ADBC `fetch_arrow_table`, turbodbc `fetchallarrow`), and a native
sqlite3 handler for `sqlite://` URIs so local databases need no extra
dependency.
"""

from __future__ import annotations

from typing import Any

from polars_tpu.errors import ComputeError, InvalidOperationError


def _from_arrow_table(tbl):
    from polars_tpu.io._arrow import arrow_to_df

    return arrow_to_df(tbl)


def _from_cursor(cursor) -> Any:
    """Build a DataFrame from an executed DB-API2 cursor."""
    import polars_tpu as pl

    # Arrow-native fast paths (ADBC, turbodbc): zero host transposition
    for meth in ("fetch_arrow_table", "fetchallarrow"):
        fn = getattr(cursor, meth, None)
        if fn is not None:
            return _from_arrow_table(fn())
    desc = cursor.description
    if desc is None:
        raise ComputeError("query returned no result set")
    names = [d[0] for d in desc]
    rows = cursor.fetchall()
    data = {n: [r[i] for r in rows] for i, n in enumerate(names)}
    return pl.DataFrame(data)


def read_database(
    query: str,
    connection: Any,
    *,
    iter_batches: bool = False,
    batch_size: int | None = None,
    schema_overrides: Any = None,
    infer_schema_length: int | None = None,
    execute_options: dict | None = None,
) -> Any:
    """Run ``query`` against an open connection and return a DataFrame.

    Accepts DB-API2 connections (sqlite3, psycopg, mysqlclient, ADBC,
    turbodbc...) and SQLAlchemy engines/connections."""
    if iter_batches:
        raise InvalidOperationError("iter_batches is not supported yet")
    opts = execute_options or {}

    # SQLAlchemy engine/connection: drop to the raw DB-API connection
    conn = connection
    if hasattr(conn, "raw_connection"):  # sqlalchemy Engine
        conn = conn.raw_connection()
    elif type(conn).__module__.startswith("sqlalchemy") and hasattr(conn, "connection"):
        conn = conn.connection  # sqlalchemy Connection -> DBAPI wrapper
        conn = getattr(conn, "dbapi_connection", conn)

    if not hasattr(conn, "cursor"):
        raise InvalidOperationError(
            f"unsupported connection type {type(connection).__name__!r}: "
            "expected a DB-API2 connection or SQLAlchemy engine"
        )
    cursor = conn.cursor()
    try:
        args = opts.get("parameters")
        cursor.execute(query, *( (args,) if args is not None else () ))
        df = _from_cursor(cursor)
    finally:
        try:
            cursor.close()
        except Exception:  # noqa: BLE001
            pass
    if schema_overrides:
        import polars_tpu as pl

        df = df.with_columns(
            *(pl.col(n).cast(d) for n, d in dict(schema_overrides).items())
        )
    return df


def read_database_uri(
    query: str,
    uri: str,
    *,
    partition_on: str | None = None,
    partition_num: int | None = None,
    engine: str | None = None,
    schema_overrides: Any = None,
    execute_options: dict | None = None,
) -> Any:
    """Run ``query`` against a database URI.

    ``sqlite://`` URIs are handled natively via the stdlib; other schemes
    need connectorx or adbc-driver-* installed."""
    scheme = uri.split(":", 1)[0].lower()
    if scheme in ("sqlite", "sqlite3", "file"):
        import sqlite3

        path = uri.split("://", 1)[-1] if "://" in uri else uri.split(":", 1)[1]
        conn = sqlite3.connect(path)
        try:
            return read_database(
                query, conn,
                schema_overrides=schema_overrides, execute_options=execute_options,
            )
        finally:
            conn.close()
    try:
        import connectorx  # noqa: F401
    except ImportError:
        raise ImportError(
            f"read_database_uri on {scheme!r} URIs requires `connectorx` or an "
            "ADBC driver; pass an open connection to read_database instead"
        ) from None
    tbl = connectorx.read_sql(uri, query, return_type="arrow")
    return _from_arrow_table(tbl)
