"""Pallas TPU kernel: selection-vector compaction (filter materialization).

The TPU analogue of the reference's AVX-512 VBMI2 compress-store filter kernel
(polars-compute/src/filter/avx512.rs:48-90). A boolean row mask + column are
compacted so selected rows become the leading prefix, in ONE pass over HBM:
the grid walks row blocks sequentially (Mosaic grids are sequential on a
core), each step computes an in-block prefix sum on the VPU and writes the
block's survivors at the running global offset carried in SMEM.

Fallback: the XLA path (stable sort by ~mask) used on CPU/interpret.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BLOCK = 1024
LANES = 128


def _compact_kernel(mask_ref, vals_ref, out_ref, cnt_ref, off_ref):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        off_ref[0] = 0

    m = mask_ref[:].astype(jnp.int32)
    v = vals_ref[:]
    # in-block exclusive prefix sum of the mask (VPU cumsum)
    incl = jnp.cumsum(m)
    excl = incl - m
    base = off_ref[0]
    n_sel = incl[-1]
    # scatter survivors to out[base + excl] — emulated with a gather-based
    # compact: build the permutation that sorts (~mask) stably, take prefix
    order = jnp.argsort(jnp.logical_not(mask_ref[:]), stable=True)
    packed = v[order]
    out_ref[pl.ds(0, BLOCK)] = jnp.zeros((BLOCK,), v.dtype)
    # write full packed block at the running offset (over-write region past
    # n_sel is repaired by later blocks / bounded by total count)
    out_ref[pl.ds(base, BLOCK)] = packed
    off_ref[0] = base + n_sel

    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        cnt_ref[0] = off_ref[0]


try:  # import guard so CPU-only environments can still import the module
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # noqa: BLE001
    _PALLAS_OK = False


def compact_xla(values: jax.Array, mask: jax.Array) -> tuple[jax.Array, jax.Array]:
    """XLA fallback: stable sort by ~mask moves survivors to the front."""
    n = values.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    _, perm = jax.lax.sort(
        [jnp.logical_not(mask).astype(jnp.int8), iota], num_keys=1, is_stable=True
    )
    return values[perm], jnp.sum(mask.astype(jnp.int32))


def compact(values: jax.Array, mask: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(compacted values, count). Survivors keep relative order."""
    if not _PALLAS_OK or jax.default_backend() != "tpu" or values.shape[0] % BLOCK != 0:
        return compact_xla(values, mask)
    return _compact_pallas(values, mask)


@functools.partial(jax.jit, static_argnames=())
def _compact_pallas(values: jax.Array, mask: jax.Array):
    n = values.shape[0]
    grid = n // BLOCK
    out, cnt = pl.pallas_call(
        _compact_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((BLOCK,), lambda i: (i,)),
            pl.BlockSpec((BLOCK,), lambda i: (i,)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n,), values.dtype),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ],
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
    )(mask, values)
    return out, cnt[0]
