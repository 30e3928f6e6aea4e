"""Distributed operators via shard_map + XLA collectives.

Reference mapping (SURVEY.md §2.13):
- hash-partitioned shuffle  <- HashPartitioner + distributor_channel
  (polars-utils/src/hashing.rs:72, polars-async/src/primitives/)
- distributed group-by      <- per-pipeline partial agg + combine_locals
  barrier (polars-stream/src/nodes/group_by.rs:252)
- distributed hash join     <- per-partition parallel build/probe
  (polars-stream/src/nodes/joins/equi_join.rs:446-790)

Every collective is static-shape: shuffles send fixed-capacity buckets with
per-bucket valid counts; overflow is detected (psum'd flag) so the host can
retry at a larger capacity — the OOC-spill analogue for round 1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P

from polars_tpu.kernels.hashing import partition_of, splitmix64
from polars_tpu.parallel.mesh import AXIS


def dist_reduce_sum(mesh, values, mask):
    """Global masked sum of a row-sharded column (psum over ICI)."""

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P(AXIS), P(AXIS)), out_specs=P()
    )
    def f(v, m):
        local = jnp.sum(jnp.where(m, v, 0))
        return jax.lax.psum(local.reshape(1), AXIS)

    return f(values, mask)[0]


def dist_groupby_sum(mesh, gids, values, mask, capacity: int):
    """Distributed dense group-by sum: local scatter-agg into a fixed table,
    then psum — the two-tier preaggregation pattern (hot local table + global
    combine) when group cardinality is bounded (dictionary keys)."""

    @functools.partial(
        shard_map, mesh=mesh, in_specs=(P(AXIS), P(AXIS), P(AXIS)), out_specs=P()
    )
    def f(g, v, m):
        x = jnp.where(m, v, jnp.zeros((), v.dtype))
        local = jnp.zeros((capacity,), v.dtype).at[g].add(x, mode="drop")
        return jax.lax.psum(local, AXIS)

    return f(gids, values, mask)


def _bucketize(keys, payload_cols, mask, n_parts: int, cap: int):
    """Arrange local rows into (n_parts, cap) buckets by key partition.

    Returns (bucketed key array, bucketed payloads, per-bucket counts,
    overflow flag). Rows are placed via sort by partition id (the radix
    partition kernel's job on TPU).
    """
    n = keys.shape[0]
    from polars_tpu.kernels.argsort import stable_argsort_words

    h = splitmix64(keys.astype(jnp.int64))
    part = jnp.where(mask, partition_of(h, n_parts), n_parts)
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    perm = stable_argsort_words([part])
    part_s = part[perm]
    # rank within partition
    counts = jnp.zeros((n_parts + 1,), jnp.int32).at[part_s].add(1, mode="drop")
    offsets = jnp.cumsum(counts) - counts
    rank = iota - offsets[jnp.clip(part_s, 0, n_parts)]
    overflow = jnp.any(jnp.where(part_s < n_parts, rank >= cap, False))
    slot = jnp.clip(part_s, 0, n_parts - 1) * cap + jnp.clip(rank, 0, cap - 1)
    valid = (part_s < n_parts) & (rank < cap)

    tgt = jnp.where(valid, slot, n_parts * cap)  # invalid rows -> dummy slot

    def scatter(col):
        src = col[perm]
        out = jnp.zeros((n_parts * cap + 1,), col.dtype)
        return out.at[tgt].set(src)[: n_parts * cap].reshape(n_parts, cap)

    bkeys = scatter(keys)
    bmask = (
        jnp.zeros((n_parts * cap + 1,), bool)
        .at[tgt]
        .set(valid)[: n_parts * cap]
        .reshape(n_parts, cap)
    )
    bpayloads = [scatter(c) for c in payload_cols]
    return bkeys, bpayloads, bmask, overflow


def shuffle_by_key(mesh, keys, payload_cols, mask, cap_per_bucket: int):
    """Hash-partitioned all-to-all: every shard ends up with the rows whose
    key hashes to it. Returns (keys, payloads, mask, overflow) with leading
    dim = n_parts * cap rows per shard."""
    d = mesh.devices.size

    in_specs = (P(AXIS), tuple(P(AXIS) for _ in payload_cols), P(AXIS))
    out_specs = (P(AXIS), tuple(P(AXIS) for _ in payload_cols), P(AXIS), P())

    @functools.partial(shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_specs)
    def f(k, payloads, m):
        bk, bp, bm, overflow = _bucketize(k, list(payloads), m, d, cap_per_bucket)
        # all_to_all: axis 0 holds the destination shard
        gk = jax.lax.all_to_all(bk[None], AXIS, 1, 1, tiled=False)[0]
        gm = jax.lax.all_to_all(bm[None], AXIS, 1, 1, tiled=False)[0]
        gp = tuple(jax.lax.all_to_all(c[None], AXIS, 1, 1, tiled=False)[0] for c in bp)
        any_overflow = jax.lax.psum(overflow.astype(jnp.int32).reshape(1), AXIS)
        return (
            gk.reshape(-1),
            tuple(c.reshape(-1) for c in gp),
            gm.reshape(-1),
            any_overflow,
        )

    return f(keys, tuple(payload_cols), mask)


def dist_join_inner(mesh, lk, lvals, lmask, rk, rvals, rmask, cap_per_bucket: int, out_cap: int):
    """Distributed inner equi-join on int keys: shuffle both sides by key hash,
    then per-shard sort/probe/expand (the partitioned build/probe pattern)."""
    d = mesh.devices.size

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(AXIS),) * 6,
        out_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P()),
    )
    def f(lk_, lv_, lm_, rk_, rv_, rm_):
        blk, (blv,), blm, lof = _bucketize(lk_, [lv_], lm_, d, cap_per_bucket)
        brk, (brv,), brm, rof = _bucketize(rk_, [rv_], rm_, d, cap_per_bucket)
        glk = jax.lax.all_to_all(blk[None], AXIS, 1, 1)[0].reshape(-1)
        glv = jax.lax.all_to_all(blv[None], AXIS, 1, 1)[0].reshape(-1)
        glm = jax.lax.all_to_all(blm[None], AXIS, 1, 1)[0].reshape(-1)
        grk = jax.lax.all_to_all(brk[None], AXIS, 1, 1)[0].reshape(-1)
        grv = jax.lax.all_to_all(brv[None], AXIS, 1, 1)[0].reshape(-1)
        grm = jax.lax.all_to_all(brm[None], AXIS, 1, 1)[0].reshape(-1)

        # local sort-probe join
        from polars_tpu.kernels.argsort import key_words, stable_argsort_words
        import polars_tpu.datatypes as pdt

        nr = grk.shape[0]
        big = 0x7FFFFFFFFFFFFFFF
        rk_m = jnp.where(grm, grk.astype(jnp.int64), big)
        sperm = stable_argsort_words(key_words(rk_m, pdt.Int64()))
        sk = rk_m[sperm]
        lk_m = jnp.where(glm, glk.astype(jnp.int64), big - 1)
        lo = jnp.searchsorted(sk, lk_m, side="left")
        hi = jnp.searchsorted(sk, lk_m, side="right")
        matches = jnp.where(glm, hi - lo, 0)
        offsets = jnp.cumsum(matches)
        total = offsets[-1]
        k_out = jax.lax.broadcasted_iota(jnp.int64, (out_cap, 1), 0).squeeze(-1)
        probe = jnp.searchsorted(offsets, k_out, side="right").astype(jnp.int32)
        probe_c = jnp.clip(probe, 0, glk.shape[0] - 1)
        start = offsets[probe_c] - matches[probe_c]
        j = k_out - start
        build = sperm[jnp.clip(lo[probe_c] + j, 0, nr - 1)]
        ok = k_out < total
        out_lk = jnp.where(ok, glk[probe_c], 0)
        out_lv = jnp.where(ok, glv[probe_c], 0)
        out_rv = jnp.where(ok, grv[build], 0)
        join_overflow = total > out_cap
        any_of = jax.lax.psum(
            (lof.astype(jnp.int32) + rof.astype(jnp.int32) + join_overflow.astype(jnp.int32)).reshape(1),
            AXIS,
        )
        return out_lk, out_lv, out_rv, ok, any_of

    return f(lk, lvals, lmask, rk, rvals, rmask)
