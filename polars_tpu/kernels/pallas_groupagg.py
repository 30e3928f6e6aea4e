"""Pallas TPU kernel: fused multi-column group aggregation on the MXU.

The hot inner loop of hash aggregation (reference: GroupedReduction::update,
polars-expr/src/reduce/ + the hot-table preagg, polars-stream/src/nodes/
group_by.rs:102-124) mapped to TPU hardware: for bounded group counts
(dictionary keys — the north star's dense path), per-block one-hot matrices
contract against the value columns ON THE MXU:

    acc[CAP, K] += onehot(gids_block)[BLOCK, CAP]^T @ values_block[BLOCK, K]

One pass over HBM computes every sum/count column of the aggregate at once;
XLA's scatter-add path reads the input once PER AGG COLUMN and serializes
updates. f64 inputs use the double-single (hi/lo f32 pair) trick so MXU f32
arithmetic keeps ~47 mantissa bits of the column plus exact block partials.

Grid steps are sequential on a TPU core, so the VMEM scratch accumulator needs
no atomics (the same property the reference's per-pipeline local tables rely
on).

Validated on v5e (re-run 2026-08-20): compiles and runs via the remote
compile service. Requires the enable_x64(False) trace context below (Mosaic
rejects x64 index types), cap <= 1024 (BLOCK x cap one-hot must fit the 16MB
scoped-vmem limit; 4096 measured 18.49M AOT OOM), and Precision.HIGHEST on
the contractions (the Mosaic default computes f32 dots through bf16 — one-hot
sums of values showed 1.6e-3 rel err before the fix). The measured
pallas-vs-XLA comparison lives in BENCH detail.ops (bench.py _build_ops_cmp);
XLA's batched scatter-add remains the default engine path.

"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BLOCK = 2048

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # noqa: BLE001
    _PALLAS_OK = False


def _kernel(cap: int, k: int, gids_ref, hi_ref, lo_ref, out_hi_ref, out_lo_ref,
            acc_hi, acc_lo):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        acc_hi[:, :] = jnp.zeros((cap, k), jnp.float32)
        acc_lo[:, :] = jnp.zeros((cap, k), jnp.float32)

    g = gids_ref[:]  # (BLOCK,)
    cap_ids = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, cap), 1)
    onehot = (g[:, None] == cap_ids).astype(jnp.bfloat16)  # (BLOCK, cap)

    def _scatter_sum(x):
        # DEFAULT (bf16) dot precision rounds the value side (measured 1.6e-3
        # rel err); per-operand precision tuples are unsupported in Mosaic —
        # decompose values into 3 bf16 planes (24 mantissa bits = full f32),
        # the 0/1 one-hot side is exact, products accumulate in f32
        p1 = x.astype(jnp.bfloat16)
        r1 = x - p1.astype(jnp.float32)
        p2 = r1.astype(jnp.bfloat16)
        p3 = (r1 - p2.astype(jnp.float32)).astype(jnp.bfloat16)
        out = None
        for p in (p1, p2, p3):
            d = jax.lax.dot_general(
                onehot, p, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out = d if out is None else out + d
        return out

    acc_hi[:, :] += _scatter_sum(hi_ref[:, :])
    acc_lo[:, :] += _scatter_sum(lo_ref[:, :])

    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        out_hi_ref[:, :] = acc_hi[:, :]
        out_lo_ref[:, :] = acc_lo[:, :]


def groupagg_sums_pallas(
    gids: jax.Array, values: jax.Array, mask: jax.Array, cap: int
) -> jax.Array:
    """(cap, k) f64 per-group sums of masked value columns via MXU one-hot
    contraction. ``values`` is (n, k) f64/f32; rows where ~mask contribute 0.
    Requires n % BLOCK == 0 and cap % 128 == 0 (callers pad)."""
    n, k = values.shape
    assert n % BLOCK == 0 and cap % 128 == 0
    x = jnp.where(mask[:, None], values, 0.0)
    if values.dtype == jnp.float64:
        hi = x.astype(jnp.float32)
        lo = (x - hi.astype(jnp.float64)).astype(jnp.float32)
    else:
        hi = x.astype(jnp.float32)
        lo = jnp.zeros_like(hi)
    g = jnp.where(mask, gids, cap - 1)  # masked rows hit an arbitrary slot with 0s

    kernel = functools.partial(_kernel, cap, k)
    # Mosaic rejects the i64 index types jax_enable_x64 introduces — run the
    # kernel trace in 32-bit mode (all operands here are f32/i32/bool)
    with jax.enable_x64(False):
        out_hi, out_lo = _call(kernel, n, k, cap, g, hi, lo)
    return out_hi.astype(jnp.float64) + out_lo.astype(jnp.float64)


def _call(kernel, n, k, cap, g, hi, lo):
    out_hi, out_lo = pl.pallas_call(
        kernel,
        grid=(n // BLOCK,),
        in_specs=[
            pl.BlockSpec((BLOCK,), lambda i: (i,)),
            pl.BlockSpec((BLOCK, k), lambda i: (i, 0)),
            pl.BlockSpec((BLOCK, k), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((cap, k), lambda i: (0, 0)),
            pl.BlockSpec((cap, k), lambda i: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cap, k), jnp.float32),
            jax.ShapeDtypeStruct((cap, k), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((cap, k), jnp.float32),
            pltpu.VMEM((cap, k), jnp.float32),
        ],
    )(g.astype(jnp.int32), hi, lo)
    return out_hi, out_lo


def groupagg_sums_xla(
    gids: jax.Array, values: jax.Array, mask: jax.Array, cap: int
) -> jax.Array:
    """Reference/fallback: one batched scatter-add in f64."""
    x = jnp.where(mask[:, None], values.astype(jnp.float64), 0.0)
    return jnp.zeros((cap, values.shape[1]), jnp.float64).at[gids].add(x, mode="drop")


def groupagg_sums(
    gids: jax.Array, values: jax.Array, mask: jax.Array, cap: int
) -> jax.Array:
    n, k = values.shape
    if (
        _PALLAS_OK
        and jax.default_backend() == "tpu"
        and n % BLOCK == 0
        and cap % 128 == 0
        # BLOCK x cap f32 one-hot must fit scoped VMEM (16MB): cap 4096
        # measured 18.49M AOT OOM; 1024 -> 8MB
        and cap <= 1024
    ):
        return groupagg_sums_pallas(gids, values, mask, cap)
    return groupagg_sums_xla(gids, values, mask, cap)
