"""Exception namespace alias (reference: py-polars pl.exceptions)."""

from polars_tpu.errors import (  # noqa: F401
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

# polars name aliases
PolarsDataTypeError = SchemaError


class ModuleUpgradeRequiredError(ModuleNotFoundError):
    """A dependency is too old (reference: exceptions.py)."""


class ParameterCollisionError(PolarsError):
    """Conflicting parameters passed (reference: exceptions.py)."""


class RowsError(PolarsError):
    """Wrong number of returned rows (reference: exceptions.py)."""


class NoRowsReturnedError(RowsError):
    """No rows returned when at least one was expected."""


class TooManyRowsReturnedError(RowsError):
    """More rows returned than expected."""


class StringCacheMismatchError(ComputeError):
    """Categoricals from incompatible string caches (N/A here: the dict
    tables unify automatically, kept for API parity)."""


class StructFieldNotFoundError(SchemaFieldNotFoundError):
    """A struct field was not found."""


class UnsuitableSQLError(SQLInterfaceError):
    """SQL query not suitable for the given frame."""


class PanicException(PolarsError):
    """The reference's Rust-panic surface; this engine raises typed errors
    instead, kept so `except pl.exceptions.PanicException` parses."""


class PolarsWarning(Warning):
    """Base class for polars warnings."""


class CategoricalRemappingWarning(PolarsWarning):
    pass


class ChronoFormatWarning(PolarsWarning):
    pass


class CustomUFuncWarning(PolarsWarning):
    pass


class DataOrientationWarning(PolarsWarning):
    pass


class MapWithoutReturnDtypeWarning(PolarsWarning):
    pass


class PerformanceWarning(PolarsWarning):
    pass


class PolarsInefficientMapWarning(PerformanceWarning):
    pass


class UnstableWarning(PolarsWarning):
    pass
