"""Testing asserts (reference: py-polars testing/asserts/)."""

from polars_tpu.testing.asserts import (
    assert_frame_equal,
    assert_frame_not_equal,
    assert_series_equal,
    assert_series_not_equal,
)


def assert_schema_equal(left_schema, right_schema, *, check_column_order=True, check_dtypes=True):
    """Assert two schemas are equal (reference: testing/asserts/schema.py:16)."""
    li = list(left_schema.items()) if hasattr(left_schema, "items") else list(left_schema)
    ri = list(right_schema.items()) if hasattr(right_schema, "items") else list(right_schema)
    if not check_column_order:
        li, ri = sorted(li, key=lambda t: t[0]), sorted(ri, key=lambda t: t[0])
    ln = [n for n, _ in li]
    rn = [n for n, _ in ri]
    if ln != rn:
        raise AssertionError(f"schema column names differ: {ln} != {rn}")
    if check_dtypes:
        for (n, ld), (_, rd) in zip(li, ri):
            if ld != rd:
                raise AssertionError(f"schema dtype differs for {n!r}: {ld!r} != {rd!r}")


__all__ = [
    "assert_frame_equal",
    "assert_frame_not_equal",
    "assert_schema_equal",
    "assert_series_equal",
    "assert_series_not_equal",
]
