"""Testing asserts (reference: py-polars testing/asserts/)."""

from polars_tpu.testing.asserts import assert_frame_equal, assert_series_equal

__all__ = ["assert_frame_equal", "assert_series_equal"]
