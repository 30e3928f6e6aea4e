"""Pallas TPU kernel: selection-vector compaction (filter materialization).

The TPU analogue of the reference's AVX-512 VBMI2 compress-store filter kernel
(polars-compute/src/filter/avx512.rs:48-90). One pass over HBM: the grid walks
row blocks sequentially (Mosaic grids run in order on a core), each step
builds the block's compaction PERMUTATION as a one-hot matrix and contracts it
on the MXU (dynamic scatter is unsupported in Mosaic; a 512x512 f32 one-hot
matmul costs ~1ns/row on the MXU, cheaper than a round-trip to XLA sort), then
DMA-writes the packed block at the running global offset carried in SMEM.

f64 payloads split into hi/lo f32 pairs: each output element receives exactly
one input's hi and lo parts, so f64(hi)+f64(lo) reconstructs the value EXACTLY.

Fallback: XLA stable-sort compaction (used on CPU and for odd sizes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BLOCK = 512

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # noqa: BLE001
    _PALLAS_OK = False


def _compact_kernel(mask_ref, hi_ref, lo_ref, out_hi_ref, out_lo_ref, cnt_ref, off_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        off_ref[0] = 0

    m = mask_ref[:].astype(jnp.int32)  # (BLOCK,)
    incl = jnp.cumsum(m)
    excl = incl - m
    n_sel = incl[-1]
    # permutation one-hot: P[i, j] = mask[i] and excl[i] == j
    cols = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 1)
    onehot = ((excl[:, None] == cols) & (m[:, None] == 1)).astype(jnp.float32)
    packed_hi = jax.lax.dot_general(
        onehot, hi_ref[:, :], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    packed_lo = jax.lax.dot_general(
        onehot, lo_ref[:, :], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    base = off_ref[0]
    out_hi_ref[pl.ds(base, BLOCK), :] = packed_hi
    out_lo_ref[pl.ds(base, BLOCK), :] = packed_lo
    off_ref[0] = base + n_sel

    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        cnt_ref[0] = off_ref[0]


def compact_xla(values: jax.Array, mask: jax.Array) -> tuple[jax.Array, jax.Array]:
    """XLA fallback: stable sort by ~mask moves survivors to the front."""
    n = values.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    _, perm = jax.lax.sort(
        [jnp.logical_not(mask).astype(jnp.int8), iota], num_keys=1, is_stable=True
    )
    return values[perm], jnp.sum(mask.astype(jnp.int32))


def compact_columns_pallas(
    values: jax.Array, mask: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Compact (n, k) f64 columns by mask; returns ((n+BLOCK, k) packed, count).
    Rows past count are garbage."""
    n, k = values.shape
    assert n % BLOCK == 0
    hi = values.astype(jnp.float32)
    lo = (values - hi.astype(jnp.float64)).astype(jnp.float32)
    out_hi, out_lo, cnt = pl.pallas_call(
        _compact_kernel,
        grid=(n // BLOCK,),
        in_specs=[
            pl.BlockSpec((BLOCK,), lambda i: (i,)),
            pl.BlockSpec((BLOCK, k), lambda i: (i, 0)),
            pl.BlockSpec((BLOCK, k), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n + BLOCK, k), jnp.float32),
            jax.ShapeDtypeStruct((n + BLOCK, k), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )(mask, hi, lo)
    packed = out_hi.astype(jnp.float64) + out_lo.astype(jnp.float64)
    return packed, cnt[0]


def compact(values: jax.Array, mask: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(compacted values, count); survivors keep relative order.

    DEMOTED to the XLA path on purpose (v5e, 2026-08):
    - the engine compacts at materialization with ONE stable radix argsort
      permutation amortized over every output column (executors.run_segment);
      the Pallas kernel compacts one (n, k) f64 block per call, so per-query
      it would run the mask pass once per dtype group instead of once;
    - the hi/lo f32 carry reconstructs f64 only to ~47 mantissa bits — not
      bit-exact for i64 payloads (Polars semantics), so it could serve only
      float columns, further fragmenting the pass;
    - XLA's sort-based compaction already runs at memory bandwidth here.
    The kernel stays as a validated alternate for a future single-column
    filter fast path (mask + one wide column, where one-hot-on-MXU wins).
    """
    return compact_xla(values, mask)
