"""Group machinery: key -> group-id assignment + segmented reductions.

TPU-native replacement for the reference's hash group-by stack
(``Grouper``/``HotGrouper`` polars-expr/src/{groups,hot_groups}/,
``group_tuples`` polars-core/src/frame/group_by/into_groups.rs): instead of
hash tables with pointers, rows are sorted by their order-encoded keys with
``lax.sort`` (multi-operand, stable), group boundaries are a vectorized
neighbour compare, and every aggregation is a masked scatter ("segmented
reduction") into capacity-bounded dense arrays. A dictionary-coded fast path
("dense") skips the sort entirely when the key domain is small — the perfect-
hash analogue of the reference's hot table (nodes/group_by.rs:28-31).

Everything here is shape-static and traceable; the only data-dependent value is
``num_groups``, carried as a traced scalar until the executor's compaction
barrier.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from polars_tpu import datatypes as dt
from polars_tpu.engine.common import GroupCtx, Val

_IDENT_BIG = {
    jnp.float64: jnp.inf, jnp.float32: jnp.inf,
    jnp.int64: jnp.iinfo(jnp.int64).max, jnp.int32: jnp.iinfo(jnp.int32).max,
    jnp.int16: jnp.iinfo(jnp.int16).max, jnp.int8: jnp.iinfo(jnp.int8).max,
    jnp.uint64: jnp.iinfo(jnp.uint64).max, jnp.uint32: jnp.iinfo(jnp.uint32).max,
    jnp.uint16: jnp.iinfo(jnp.uint16).max, jnp.uint8: jnp.iinfo(jnp.uint8).max,
}


def _big(dtype) -> jax.Array:
    if dtype == jnp.bool_:
        return jnp.asarray(True)
    return jnp.asarray(_IDENT_BIG[jnp.dtype(dtype).type], dtype)


def _small(dtype) -> jax.Array:
    if dtype == jnp.bool_:
        return jnp.asarray(False)
    if jnp.dtype(dtype).kind == "f":
        return jnp.asarray(-jnp.inf, dtype)
    return jnp.asarray(jnp.iinfo(dtype).min, dtype)


# ---------------------------------------------------------------------------
# group id assignment
# ---------------------------------------------------------------------------


def dense_group_ctx(keys: list[Val], rowmask: jax.Array, sizes: list[int]) -> GroupCtx:
    """Perfect-hash grouping for small dictionary-coded key domains.

    ``sizes[i]`` is the exclusive upper bound of key i's code (+1 slot for
    null). Capacity = prod(sizes) must be small (config.max dense capacity is
    enforced by the caller).
    """
    cap = 1
    gid = jnp.zeros(rowmask.shape, jnp.int32)
    for k, size in zip(keys, sizes):
        code = k.values.astype(jnp.int32) + 1  # 0 reserved for null
        if k.validity is not None:
            code = jnp.where(k.validity, code, 0)
        gid = gid * (size + 1) + jnp.clip(code, 0, size)
        cap *= size + 1
    # mark which dense slots are occupied, then rank them to dense gids
    if _use_stack(cap):
        occupied = _stack_seg_red(rowmask, gid, cap, jnp.max, False)
    else:
        occupied = jnp.zeros((cap,), bool).at[gid].max(rowmask, mode="drop")
    rank = jnp.cumsum(occupied.astype(jnp.int32)) - 1
    num_groups = rank[-1] + 1
    dense_gid = rank[gid]
    cap_groups = cap
    group_valid = (
        jax.lax.broadcasted_iota(jnp.int32, (cap_groups, 1), 0).squeeze(-1) < num_groups
    )
    return GroupCtx(
        gids=dense_gid,
        num_groups=num_groups.astype(jnp.int32),
        capacity=cap_groups,
        group_valid=group_valid,
    )


def sorted_group_ctx(keys: list[Val], rowmask: jax.Array) -> GroupCtx:
    """General sort-based grouping over order-encoded key words (radix
    argsort; see kernels/argsort.py for why not multi-operand lax.sort)."""
    from polars_tpu.kernels.argsort import (
        boundaries_from_words,
        key_words,
        stable_argsort_words,
    )

    n = rowmask.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    words: list = [(~rowmask).astype(jnp.int8)]  # invalid rows last
    for k in keys:
        invalid = (
            jnp.zeros((n,), jnp.int8)
            if k.validity is None
            else (~k.validity).astype(jnp.int8)
        )
        words.append(invalid)  # nulls-first within valid rows
        words.extend(key_words(k.values, k.dtype))
    perm = stable_argsort_words(words)
    valid_sorted = rowmask[perm]
    boundary = valid_sorted & boundaries_from_words(words[1:], perm)
    gid_sorted = jnp.clip(jnp.cumsum(boundary.astype(jnp.int32)) - 1, 0, None)
    num_groups = jnp.sum(boundary.astype(jnp.int32))
    gids = jnp.zeros((n,), jnp.int32).at[perm].set(gid_sorted)
    group_valid = (
        jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1) < num_groups
    )
    return GroupCtx(
        gids=gids,
        num_groups=num_groups.astype(jnp.int32),
        capacity=n,
        group_valid=group_valid,
        sort_perm=perm,
    )


def reorder_by_first_occurrence(ctx: GroupCtx, rowmask: jax.Array) -> GroupCtx:
    """Renumber groups by first appearance (maintain_order=True semantics)."""
    n = ctx.gids.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    big = 2**31 - 1
    masked_iota = jnp.where(rowmask, iota, big)
    if _use_stack(ctx.capacity):
        first_row = _stack_seg_red(masked_iota, ctx.gids, ctx.capacity, jnp.min, jnp.int32(big))
    else:
        first_row = (
            jnp.full((ctx.capacity,), big, jnp.int32)
            .at[ctx.gids]
            .min(masked_iota, mode="drop")
        )
    from polars_tpu.kernels.argsort import key_words, stable_argsort_words

    order = stable_argsort_words(key_words(first_row, dt.Int32()))  # empty slots (big) last
    inv = jnp.zeros((ctx.capacity,), jnp.int32).at[order].set(
        jax.lax.broadcasted_iota(jnp.int32, (ctx.capacity, 1), 0).squeeze(-1)
    )
    return GroupCtx(
        gids=inv[ctx.gids],
        num_groups=ctx.num_groups,
        capacity=ctx.capacity,
        group_valid=ctx.group_valid,
        sort_perm=None,
    )


# ---------------------------------------------------------------------------
# segmented reductions (GroupedReduction analogue, polars-expr/src/reduce/)
# ---------------------------------------------------------------------------


# capacity bound for the one-hot matmul path: chunk(64Ki) x cap x 8B stays
# well under VMEM-friendly sizes, and beyond a few thousand groups the
# scatter's collision rate drops enough that it stops being the bottleneck
_ONEHOT_CAP = 4096
_ONEHOT_CHUNK = 1 << 16


def _onehot_seg_sum(x: jax.Array, gids: jax.Array, cap: int) -> jax.Array:
    """Segment sum as a chunked one-hot contraction — scatter-add with
    colliding indices SERIALIZES on TPU (XLA lowers it to a sequential
    loop), while a (chunk x cap) 0/1 matmul rides the MXU. The 0/1 matrix
    is exact in any matmul precision; the VALUE operand gets
    Precision.HIGHEST (f32 dot defaults to bf16 inputs on TPU).
    Accumulation order is blockwise — like the reference's pairwise sums,
    not elementwise-identical to the scatter order."""
    n = x.shape[0]
    c = min(_ONEHOT_CHUNK, n)
    if n % c:
        pad = c - n % c
        x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
        gids = jnp.concatenate([gids, jnp.full((pad,), cap, gids.dtype)])
        n = x.shape[0]
    nb = n // c
    xb = x.reshape(nb, c)
    gb = gids.reshape(nb, c)
    iota_cap = jnp.arange(cap, dtype=gids.dtype)

    def body(carry, inp):
        xc, gc = inp
        oh = (gc[:, None] == iota_cap[None, :]).astype(x.dtype)
        ps = jax.lax.dot_general(
            xc[None, :], oh, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
        return carry + ps[0], None

    out, _ = jax.lax.scan(body, jnp.zeros((cap,), x.dtype), (xb, gb))
    return out


def _use_onehot(cap: int) -> bool:
    # OPT-IN until measured on the real chip (bench.py opscmp `segsum`
    # receipt): f64 emulation on TPU may not route dot_general onto the MXU,
    # and an unverified compile failure in the driver's bench would cost the
    # whole headline. POLARS_TPU_ONEHOT_AGG=1 enables.
    import os as _os

    return cap <= _ONEHOT_CAP and _os.environ.get("POLARS_TPU_ONEHOT_AGG", "0") == "1"


# tiny capacities (the PDS-H Q1 class: a handful of dict-key groups): cap
# sibling masked reductions over the same operand — XLA multi-output-fuses
# them into one input pass, sidestepping the serialized TPU scatter with
# zero exotic ops. POLARS_TPU_STACK_AGG=0 restores the scatter.
_STACK_CAP = 32


def _use_stack(cap: int) -> bool:
    import os as _os

    return cap <= _STACK_CAP and _os.environ.get("POLARS_TPU_STACK_AGG", "1") != "0"


def _stack_seg_sum(x: jax.Array, gids: jax.Array, cap: int) -> jax.Array:
    # dtype=x.dtype: jnp.sum otherwise widens narrow ints to 64-bit, unlike
    # the scatter path this replaces (caught by the SPMD q4 count merge)
    return jnp.stack(
        [
            jnp.sum(jnp.where(gids == g, x, jnp.zeros((), x.dtype)), dtype=x.dtype)
            for g in range(cap)
        ]
    )


def seg_sum(values: jax.Array, mask: jax.Array, gids: jax.Array, cap: int) -> jax.Array:
    x = jnp.where(mask, values, jnp.zeros((), values.dtype))
    if _use_stack(cap):
        return _stack_seg_sum(x, gids, cap)
    if jnp.dtype(values.dtype).kind == "f" and _use_onehot(cap):
        return _onehot_seg_sum(x, gids, cap)
    return jnp.zeros((cap,), values.dtype).at[gids].add(x, mode="drop")


def seg_count(mask: jax.Array, gids: jax.Array, cap: int) -> jax.Array:
    if _use_stack(cap):
        return _stack_seg_sum(mask.astype(jnp.int64), gids, cap)
    if _use_onehot(cap):
        # counts <= 2^53 are exact in the f64 contraction
        return _onehot_seg_sum(mask.astype(jnp.float64), gids, cap).astype(jnp.int64)
    return jnp.zeros((cap,), jnp.int64).at[gids].add(mask.astype(jnp.int64), mode="drop")


def _stack_seg_red(x: jax.Array, gids: jax.Array, cap: int, red, ident) -> jax.Array:
    return jnp.stack(
        [red(jnp.where(gids == g, x, ident)) for g in range(cap)]
    )


def seg_min(values: jax.Array, mask: jax.Array, gids: jax.Array, cap: int) -> jax.Array:
    x = jnp.where(mask, values, _big(values.dtype))
    if jnp.dtype(values.dtype).kind == "f":
        # NaN is greatest (total order): never the min unless the group is all-NaN
        x = jnp.where(jnp.isnan(x), _big(values.dtype), x)
    if _use_stack(cap):
        return _stack_seg_red(x, gids, cap, jnp.min, _big(values.dtype))
    return jnp.full((cap,), _big(values.dtype), values.dtype).at[gids].min(x, mode="drop")


def seg_max(values: jax.Array, mask: jax.Array, gids: jax.Array, cap: int) -> jax.Array:
    x = jnp.where(mask, values, _small(values.dtype))
    if jnp.dtype(values.dtype).kind == "f":
        # NaN is greatest: a group containing NaN has max NaN
        nan_in = mask & jnp.isnan(values)
        if _use_stack(cap):
            has_nan = _stack_seg_red(nan_in, gids, cap, jnp.max, False)
        else:
            has_nan = jnp.zeros((cap,), bool).at[gids].max(nan_in, mode="drop")
        x = jnp.where(jnp.isnan(x), _small(values.dtype), x)
        if _use_stack(cap):
            out = _stack_seg_red(x, gids, cap, jnp.max, _small(values.dtype))
        else:
            out = jnp.full((cap,), _small(values.dtype), values.dtype).at[gids].max(x, mode="drop")
        return jnp.where(has_nan, jnp.asarray(jnp.nan, values.dtype), out)
    if _use_stack(cap):
        return _stack_seg_red(x, gids, cap, jnp.max, _small(values.dtype))
    return jnp.full((cap,), _small(values.dtype), values.dtype).at[gids].max(x, mode="drop")


def seg_any(values: jax.Array, mask: jax.Array, gids: jax.Array, cap: int) -> jax.Array:
    x = jnp.where(mask, values, False)
    if _use_stack(cap):
        return _stack_seg_red(x, gids, cap, jnp.max, False)
    return jnp.zeros((cap,), bool).at[gids].max(x, mode="drop")


def seg_all(values: jax.Array, mask: jax.Array, gids: jax.Array, cap: int) -> jax.Array:
    x = jnp.where(mask, values, True)
    if _use_stack(cap):
        return _stack_seg_red(x, gids, cap, jnp.min, True)
    return jnp.ones((cap,), bool).at[gids].min(x, mode="drop")


def seg_first_idx(mask: jax.Array, gids: jax.Array, cap: int) -> tuple[jax.Array, jax.Array]:
    """(row index of first masked row per group, has_any mask)."""
    n = gids.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    big = 2**31 - 1
    masked = jnp.where(mask, iota, big)
    if _use_stack(cap):
        idx = _stack_seg_red(masked, gids, cap, jnp.min, jnp.int32(big))
    else:
        idx = (
            jnp.full((cap,), big, jnp.int32)
            .at[gids]
            .min(masked, mode="drop")
        )
    has = idx != big
    return jnp.where(has, idx, 0), has


def seg_last_idx(mask: jax.Array, gids: jax.Array, cap: int) -> tuple[jax.Array, jax.Array]:
    n = gids.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    masked = jnp.where(mask, iota, -1)
    if _use_stack(cap):
        idx = _stack_seg_red(masked, gids, cap, jnp.max, jnp.int32(-1))
    else:
        idx = (
            jnp.full((cap,), -1, jnp.int32)
            .at[gids]
            .max(masked, mode="drop")
        )
    has = idx >= 0
    return jnp.where(has, idx, 0), has


def seg_mean(values: jax.Array, mask: jax.Array, gids: jax.Array, cap: int):
    from polars_tpu.kernels.fastmath import div_any

    acc_t = jnp.float64 if values.dtype != jnp.float32 else jnp.float32
    s = seg_sum(values.astype(acc_t), mask, gids, cap)
    c = seg_count(mask, gids, cap)
    return div_any(s, jnp.maximum(c, 1).astype(acc_t)), c > 0


def seg_var(values: jax.Array, mask: jax.Array, gids: jax.Array, cap: int, ddof: int):
    """Two-pass (mean-subtracted) variance — mirrors the stability of the
    reference's pairwise accumulation (polars-compute/src/var_cov.rs)."""
    acc_t = jnp.float64 if values.dtype != jnp.float32 else jnp.float32
    v = values.astype(acc_t)
    mean, has = seg_mean(v, mask, gids, cap)
    centered = v - mean[gids]
    ss = seg_sum(jnp.where(mask, centered * centered, 0.0), mask, gids, cap)
    c = seg_count(mask, gids, cap)
    denom = c - ddof
    ok = denom > 0
    from polars_tpu.kernels.fastmath import div_any

    return div_any(ss, jnp.maximum(denom, 1).astype(acc_t)), ok & has


def seg_nunique(values: jax.Array, validity: jax.Array | None, mask: jax.Array, gids: jax.Array, cap: int, dtype: dt.DataType) -> jax.Array:
    """Distinct count per group (nulls count as one distinct value)."""
    from polars_tpu.kernels.argsort import (
        boundaries_from_words,
        key_words,
        stable_argsort_words,
    )

    n = gids.shape[0]
    invalid = jnp.zeros((n,), jnp.int8) if validity is None else (~validity).astype(jnp.int8)
    big_g = cap + 1
    g = jnp.where(mask, gids, big_g)  # masked rows sort last
    words = [g, invalid, *key_words(values, dtype)]
    perm = stable_argsort_words(words)
    gs = g[perm]
    boundary = (gs != big_g) & boundaries_from_words(words, perm)
    return jnp.zeros((cap,), jnp.int64).at[gs].add(boundary.astype(jnp.int64), mode="drop")


def seg_quantile(
    values: jax.Array,
    mask: jax.Array,
    gids: jax.Array,
    cap: int,
    q: float,
    interpolation: str,
):
    """Per-group quantile via one sort by (gid, value) + offset arithmetic
    (reference: QuantileDispatcher, polars-core group_by/aggregations)."""
    from polars_tpu.kernels.argsort import key_words, stable_argsort_words

    n = gids.shape[0]
    big_g = cap + 1
    g = jnp.where(mask, gids, big_g)
    words = [g, *key_words(values, dt.Float64())]
    perm = stable_argsort_words(words)
    vals_sorted = values[perm]
    counts = seg_count(mask, gids, cap)
    offsets = jnp.cumsum(counts) - counts  # start of each group's run
    c = jnp.maximum(counts, 1)
    pos = (c - 1).astype(jnp.float64) * q
    if interpolation in ("nearest",):
        k = jnp.round(pos).astype(jnp.int64)
        idx = jnp.clip(offsets + k, 0, n - 1)
        out = vals_sorted[idx]
    elif interpolation == "lower":
        idx = jnp.clip(offsets + jnp.floor(pos).astype(jnp.int64), 0, n - 1)
        out = vals_sorted[idx]
    elif interpolation == "higher":
        idx = jnp.clip(offsets + jnp.ceil(pos).astype(jnp.int64), 0, n - 1)
        out = vals_sorted[idx]
    elif interpolation == "midpoint":
        lo = vals_sorted[jnp.clip(offsets + jnp.floor(pos).astype(jnp.int64), 0, n - 1)].astype(jnp.float64)
        hi = vals_sorted[jnp.clip(offsets + jnp.ceil(pos).astype(jnp.int64), 0, n - 1)].astype(jnp.float64)
        out = (lo + hi) * 0.5
    else:  # linear
        lo_i = jnp.floor(pos).astype(jnp.int64)
        frac = pos - lo_i
        lo = vals_sorted[jnp.clip(offsets + lo_i, 0, n - 1)].astype(jnp.float64)
        hi = vals_sorted[jnp.clip(offsets + lo_i + 1, 0, n - 1)].astype(jnp.float64)
        hi = jnp.where(lo_i + 1 > c - 1, lo, hi)
        out = lo + (hi - lo) * frac
    return out, counts > 0
