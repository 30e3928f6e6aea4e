"""Native C++ runtime tests (buffer pool spill, dict interning, row sort)."""

import numpy as np
import pytest

from polars_tpu.utils import native


pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native library unavailable"
)


def test_buffer_pool_spill_reload():
    pool = native.BufferPool()
    bid = pool.alloc(4096)
    v = pool.view(bid, 4096)
    v[:] = np.arange(4096) % 251
    before = v.copy()
    pool.spill_all()
    assert pool.spilled_bytes() >= 4096
    v2 = pool.view(bid, 4096)  # reload from disk
    assert np.array_equal(v2, before)
    pool.free(bid)


def test_buffer_pool_budget_forces_spill():
    pool = native.BufferPool(budget_bytes=1 << 20)
    ids = [pool.alloc(512 * 1024) for _ in range(4)]  # 2 MiB > 1 MiB budget
    assert pool.in_memory_bytes() <= (1 << 20) + 512 * 1024
    for b in ids:
        pool.free(b)
    native.get_lib().pool_set_budget(1 << 34)


def test_dict_encode():
    import pyarrow as pa

    arr = pa.array(["z", "a", "z", "b", "a", ""] * 100)
    codes, uniq = native.dict_encode_arrow(arr)
    assert uniq == ["z", "a", "b", ""]
    decoded = [uniq[c] for c in codes]
    assert decoded == arr.to_pylist()


def test_rowsort_multikey():
    rng = np.random.default_rng(5)
    a = rng.integers(0, 5, 500).astype(np.int64)
    b = rng.normal(size=500)
    idx = native.rowsort_host([(a, None), (b, None)])
    exp = np.lexsort((b, a))
    assert np.array_equal(idx, exp)


def test_rowsort_nulls_first():
    vals = np.array([3, 1, 2], np.int64)
    validity = np.array([1, 0, 1], np.uint8)
    idx = native.rowsort_host([(vals, validity)])
    assert idx.tolist() == [1, 2, 0]  # null first, then 2, 3
