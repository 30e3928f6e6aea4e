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
