"""Pallas TPU kernel: selection-vector compaction (filter materialization).

The TPU analogue of the reference's AVX-512 VBMI2 compress-store filter kernel
(polars-compute/src/filter/avx512.rs:48-90). One pass over HBM: the grid walks
row blocks sequentially (Mosaic grids run in order on a core), each step
builds the block's compaction PERMUTATION as a one-hot matrix and contracts it
on the MXU (dynamic scatter is unsupported in Mosaic; a 512x512 f32 one-hot
matmul costs ~1ns/row on the MXU, cheaper than a round-trip to XLA sort), then
DMA-writes the packed block at the running global offset carried in SMEM.

Layout is COLUMN-MAJOR (k, n) — the engine's native stack-of-columns shape,
and the only one Mosaic can DMA at a dynamic row offset (the minor dim of an
HBM slice must be 128-aligned; rows are, a k=4 column axis is not).

f64 payloads split into hi/lo f32 pairs: each output element receives exactly
one input's hi and lo parts, so f64(hi)+f64(lo) reconstructs the value EXACTLY.

Fallback: XLA stable-sort compaction (used on CPU and for odd sizes).

Mosaic/JAX-0.9 constraints baked in (all measured on v5e via the remote
compile service, 2026-08-19):
- jnp.cumsum does not lower (KernelType.TC): prefix sums run as a
  lower-triangular ones contraction on the MXU;
- scalar jnp.sum re-enters jnp.sum WITHOUT a dtype inside Mosaic's reduce
  proxy at lowering time, where ambient x64 promotes to the unsupported
  i64 — totals come from the prefix sum's last lane instead;
- ANY-space (HBM) outputs only accept explicit async DMA from VMEM scratch;
- the kernel must trace under jax.enable_x64(False) (i64 index types).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# 1024: XLA lays out the 1-D mask operand at tile T(1024); smaller blocks
# fail Mosaic's operand-layout verification
BLOCK = 1024

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # noqa: BLE001
    _PALLAS_OK = False


def _compact_kernel(
    mask_ref, hi_ref, lo_ref, out_hi_ref, out_lo_ref, cnt_ref,
    off_ref, cc_ref, st_hi, st_lo, ca_hi, ca_lo, sem_h, sem_l,
):
    """Aligned compress-store: survivors land in a (k, 2*BLOCK) staging window
    at carry_count + prefix-rank; full BLOCK-aligned chunks DMA out (HBM DMA
    offsets must be provably 128-aligned — ``pl.multiple_of`` carries the
    proof, truthfully: the offset only ever advances by BLOCK), the partial
    tail stays in a VMEM carry for the next grid step."""
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        off_ref[0] = 0
        cc_ref[0] = 0

    m = mask_ref[:].astype(jnp.int32)  # (BLOCK,)
    # inclusive prefix sum via tril-ones on the MXU. DEFAULT (bf16) precision
    # is EXACT here: both operands are 0/1 (exact in bf16) and the MXU
    # accumulates in f32 (sums <= BLOCK). Per-operand precision tuples are
    # unsupported in Mosaic, and two-sided HIGHEST blows the 16MB scoped-vmem
    # limit (measured 32.24M) — so every dot in this kernel runs DEFAULT with
    # 0/1 right-hand sides and manually bf16-plane-decomposed values.
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, BLOCK), 1)
    tril = (cols <= rows_i).astype(jnp.bfloat16)
    # minor-dim insertion is 32-bit-only in Mosaic: reshape in f32, then cast
    mcol = m.astype(jnp.float32)[:, None].astype(jnp.bfloat16)
    incl = jax.lax.dot_general(
        tril, mcol,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )[:, 0].astype(jnp.int32)
    excl = incl - m
    n_sel = incl[BLOCK - 1]
    cc = cc_ref[0]
    # permutation one-hots, one per staging half (avoids a (BLOCK, 2*BLOCK)
    # iota + one-hot): row i -> lane cc + excl[i]
    sel = m[:, None] == 1
    tgt = (excl + cc)[:, None]
    oh0 = ((tgt == cols) & sel).astype(jnp.bfloat16)           # lanes [0, B)
    oh1 = ((tgt - BLOCK == cols) & sel).astype(jnp.bfloat16)   # lanes [B, 2B)

    def _sel(x, oh):
        # exact f32 selection at DEFAULT precision: decompose the value side
        # into 3 bf16 planes (8x3 = 24 mantissa bits = full f32); the one-hot
        # side is exact; each output lane receives exactly one row's planes
        p1 = x.astype(jnp.bfloat16)
        r1 = x - p1.astype(jnp.float32)
        p2 = r1.astype(jnp.bfloat16)
        p3 = (r1 - p2.astype(jnp.float32)).astype(jnp.bfloat16)
        out = None
        for p in (p1, p2, p3):
            d = jax.lax.dot_general(
                p, oh, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out = d if out is None else out + d
        return out

    hi = hi_ref[:, :]
    lo = lo_ref[:, :]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (hi.shape[0], BLOCK), 1)
    merged0_hi = jnp.where(lanes < cc, ca_hi[:, :], _sel(hi, oh0))
    merged0_lo = jnp.where(lanes < cc, ca_lo[:, :], _sel(lo, oh0))
    merged1_hi = _sel(hi, oh1)  # lanes >= BLOCK > cc: never carry
    merged1_lo = _sel(lo, oh1)
    total = cc + n_sel

    @pl.when(total >= BLOCK)
    def _():
        st_hi[:, :] = merged0_hi
        st_lo[:, :] = merged0_lo
        base = pl.multiple_of(off_ref[0], BLOCK)
        cp_h = pltpu.make_async_copy(st_hi, out_hi_ref.at[:, pl.ds(base, BLOCK)], sem_h)
        cp_l = pltpu.make_async_copy(st_lo, out_lo_ref.at[:, pl.ds(base, BLOCK)], sem_l)
        cp_h.start()
        cp_l.start()
        cp_h.wait()
        cp_l.wait()
        ca_hi[:, :] = merged1_hi
        ca_lo[:, :] = merged1_lo
        off_ref[0] = off_ref[0] + BLOCK
        cc_ref[0] = total - BLOCK

    @pl.when(total < BLOCK)
    def _():
        ca_hi[:, :] = merged0_hi
        ca_lo[:, :] = merged0_lo
        cc_ref[0] = total

    @pl.when(step == pl.num_programs(0) - 1)
    def _():
        # flush the carry remainder (lanes past cc_ref are garbage — rows
        # past the returned count are unspecified by contract)
        st_hi[:, :] = ca_hi[:, :]
        st_lo[:, :] = ca_lo[:, :]
        base = pl.multiple_of(off_ref[0], BLOCK)
        cp_h = pltpu.make_async_copy(st_hi, out_hi_ref.at[:, pl.ds(base, BLOCK)], sem_h)
        cp_l = pltpu.make_async_copy(st_lo, out_lo_ref.at[:, pl.ds(base, BLOCK)], sem_l)
        cp_h.start()
        cp_l.start()
        cp_h.wait()
        cp_l.wait()
        cnt_ref[0] = off_ref[0] + cc_ref[0]


def compact_xla(values: jax.Array, mask: jax.Array) -> tuple[jax.Array, jax.Array]:
    """XLA fallback: stable sort by ~mask moves survivors to the front."""
    n = values.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    _, perm = jax.lax.sort(
        [jnp.logical_not(mask).astype(jnp.int8), iota], num_keys=1, is_stable=True
    )
    return values[perm], jnp.sum(mask.astype(jnp.int32))


def compact_columns_xla(values: jax.Array, mask: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(k, n) column-stack form of :func:`compact_xla` (same layout as the
    Pallas kernel, for like-for-like comparison)."""
    n = values.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    _, perm = jax.lax.sort(
        [jnp.logical_not(mask).astype(jnp.int8), iota], num_keys=1, is_stable=True
    )
    return values[:, perm], jnp.sum(mask.astype(jnp.int32))


def compact_columns_pallas(
    values: jax.Array, mask: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Compact (k, n) f64 column stack by mask along n; returns
    ((k, n+BLOCK) packed, count). Rows past count are garbage."""
    k, n = values.shape
    assert n % BLOCK == 0
    hi = values.astype(jnp.float32)
    lo = (values - hi.astype(jnp.float64)).astype(jnp.float32)
    # Mosaic rejects the i64 index types jax_enable_x64 introduces — trace
    # the kernel in 32-bit mode (operands here are f32/bool only)
    with jax.enable_x64(False):
        out_hi, out_lo, cnt = _call_compact(mask, hi, lo, n, k)
    packed = out_hi.astype(jnp.float64) + out_lo.astype(jnp.float64)
    return packed, cnt[0]


def _call_compact(mask, hi, lo, n, k):
    return pl.pallas_call(
        _compact_kernel,
        grid=(n // BLOCK,),
        in_specs=[
            pl.BlockSpec((BLOCK,), lambda i: (i,)),
            pl.BlockSpec((k, BLOCK), lambda i: (0, i)),
            pl.BlockSpec((k, BLOCK), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, n + BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((k, n + BLOCK), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.int32),   # off (BLOCK-aligned write pos)
            pltpu.SMEM((1,), jnp.int32),   # carry count
            pltpu.VMEM((k, BLOCK), jnp.float32),  # DMA staging hi
            pltpu.VMEM((k, BLOCK), jnp.float32),  # DMA staging lo
            pltpu.VMEM((k, BLOCK), jnp.float32),  # carry hi
            pltpu.VMEM((k, BLOCK), jnp.float32),  # carry lo
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )(mask, hi, lo)


def compact(values: jax.Array, mask: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(compacted values, count); survivors keep relative order.

    DEMOTED to the XLA path on purpose (v5e, 2026-08):
    - the engine compacts at materialization with ONE stable radix argsort
      permutation amortized over every output column (executors.run_segment);
      the Pallas kernel compacts one (k, n) f64 block per call, so per-query
      it would run the mask pass once per dtype group instead of once;
    - the hi/lo f32 carry reconstructs f64 only to ~47 mantissa bits — not
      bit-exact for i64 payloads (Polars semantics), so it could serve only
      float columns, further fragmenting the pass;
    - XLA's sort-based compaction already runs at memory bandwidth here.
    The kernel stays as an alternate for a future single-column filter fast
    path; BENCH detail.ops records the measured comparison (VERDICT r3 #9).
    """
    return compact_xla(values, mask)
