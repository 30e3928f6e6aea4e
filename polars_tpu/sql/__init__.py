"""SQL front-end (reference: polars-sql). Round-1: a stub context registering
tables; the translator lands with the SQL milestone."""

from polars_tpu.sql.context import SQLContext

__all__ = ["SQLContext"]
