"""True SPMD execution of query plans over a ``jax.sharding.Mesh``.

The distributed executor (SURVEY.md §2.13, §7 step 6): leaf tables are
row-sharded across the mesh's "shards" axis, and the WHOLE dist-traceable
subtree — filter/map chains, fused m:1/1:1 equi-joins, and group-bys —
compiles to ONE ``shard_map``-traced XLA program whose inter-chip exchange
is explicit collectives:

- group-by:  local pre-aggregation (combiner) -> hash-partitioned
  ``all_to_all`` shuffle of the PARTIAL tables -> local merge. This is the
  two-tier pattern of the reference's streaming group-by
  (polars-stream/src/nodes/group_by.rs:252-498 combine_locals), and it
  absorbs key skew structurally: a hot key contributes at most one partial
  row per shard, so no salted repartition is needed on this path. Aggs
  outside the decomposable set shuffle raw rows instead and rely on the
  lossless-capacity retry (the OOC analogue).
- join: build side broadcast via ``all_gather`` when small (skew-immune,
  d-times less traffic), else both sides hash-shuffled with the SAME
  consistent partitioner (HashPartitioner analogue,
  polars-utils/src/hashing.rs:72-99) and joined locally with the ordinary
  in-segment join (engine/join_traced.py) — the partitioned build/probe of
  polars-stream/src/nodes/joins/equi_join.rs:403-790.

Shuffles send fixed-capacity buckets; a psum'd overflow flag rides back with
the row count (ONE host sync per segment) and triggers a retry at lossless
capacity, so results are never silently truncated.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from polars_tpu import datatypes as dt
from polars_tpu.core.buffer import Buffer, pad_to, padded_size, row_mask
from polars_tpu.core.column import Column
from polars_tpu.core.frame import DataFrame
from polars_tpu.engine.common import ROW, Val
from polars_tpu.engine.compiler import eval_expr
from polars_tpu.engine.executors import (
    TTable,
    _TraceCtx,
    _eval_ctx,
    _is_fusable,
    _join_fusable,
    _segment_key,
    _table_sig,
    _trace_groupby,
    _trace_select,
    trace_node,
)
from polars_tpu.errors import ComputeError, InvalidOperationError
from polars_tpu.kernels.argsort import stable_argsort_words
from polars_tpu.kernels.hashing import hash_column, combine_hashes, partition_of
from polars_tpu.parallel.mesh import AXIS, make_mesh
from polars_tpu.plan import exprs as E
from polars_tpu.plan import logical as L
from polars_tpu.plan.schema_resolve import expand_exprs, node_schema
from polars_tpu.utils.tokens import obj_token

_DIST_CHAIN = (L.LFilter, L.LSelect, L.LWithColumns, L.LRename, L.LDrop)

def _broadcast_rows() -> int:
    """Build sides at or below this many (padded) global rows are broadcast
    (all_gather) instead of shuffled — LOPSIDED build-side choice analogue."""
    from polars_tpu.config import config

    return config().broadcast_join_rows


# ---------------------------------------------------------------------------
# window rewrite: scalar-agg windows -> group-by + m:1 join
# ---------------------------------------------------------------------------


def _scalar_over_group(e: E.ENode) -> bool:
    """True when ``e`` evaluates to ONE scalar per group, so the
    ``group_to_rows`` broadcast of ``e.over(k)`` equals a left join of the
    per-key aggregate back onto the rows."""
    if isinstance(e, E.EAlias):
        return _scalar_over_group(e.input)
    if isinstance(e, (E.ELiteral, E.ELen)):
        return True
    if isinstance(e, E.EAgg):
        return E.is_elementwise(e.input)
    if isinstance(e, E.EBinary):
        return _scalar_over_group(e.left) and _scalar_over_group(e.right)
    if isinstance(e, E.ECast):
        return _scalar_over_group(e.input)
    return False


def _rewrite_windows(node: L.LNode) -> L.LNode:
    """Rewrite projections containing scalar-agg window expressions into
    group-by + m:1 left join + projection, so the existing distributed
    group-by/join machinery parallelizes ``sum(x).over(k)`` without moving
    raw rows twice (reference: polars-expr window.rs evaluates via a
    group-by + broadcast; here the broadcast IS the broadcast/shuffled join).
    Rows never leave their shard: the per-key aggregate table is small and
    rides the partial-shuffle + broadcast paths."""
    inputs = node.inputs()
    new_inputs = tuple(_rewrite_windows(i) for i in inputs)
    if any(a is not b for a, b in zip(new_inputs, inputs)):
        node = L.rebuild(node, new_inputs)
    if not isinstance(node, (L.LSelect, L.LWithColumns)):
        return node
    exprs = node.exprs()
    wins: list[E.EWindow] = []
    for e in exprs:
        for w in E.walk(e):
            if isinstance(w, E.EWindow) and all(w is not x for x in wins):
                wins.append(w)
    if not wins:
        return node
    for w in wins:
        if (
            w.mapping_strategy != "group_to_rows"
            or w.order_by
            or not w.partition_by
            or not _scalar_over_group(w.function)
            or not all(E.is_elementwise(p) for p in w.partition_by)
        ):
            return node

    from polars_tpu.plan.optimizer.cse_expr import _replace_expr

    src = node.input
    cur = src
    new_exprs = list(exprs)
    by_keys: dict[tuple, list[tuple[int, E.EWindow]]] = {}
    uniq: list[E.EWindow] = []
    for w in wins:
        if w in uniq:
            continue
        uniq.append(w)
        try:
            by_keys.setdefault(w.partition_by, []).append((len(uniq) - 1, w))
        except TypeError:
            return node  # unhashable key payload: leave the plan alone
    temps: list[str] = []
    for gi, (keyset, group) in enumerate(by_keys.items()):
        knames = [f"__wk{gi}_{ki}__" for ki in range(len(keyset))]
        key_aliases = tuple(E.EAlias(p, kn) for kn, p in zip(knames, keyset))
        aggs = tuple(E.EAlias(w.function, f"__w{j}__") for j, w in group)
        gb = L.LGroupBy(src, key_aliases, aggs, False)
        cur = L.LJoin(
            cur, gb,
            left_on=tuple(keyset),
            right_on=tuple(E.EColumn(kn) for kn in knames),
            how="left", suffix="__wjoin__", nulls_equal=True,
            coalesce=False, validate="m:1",
        )
        temps.extend(knames)
        temps.extend(f"__w{j}__" for j, _ in group)
        for j, w in group:
            new_exprs = [
                _replace_expr(e, w, E.EColumn(f"__w{j}__")) for e in new_exprs
            ]

    import dataclasses as _dc

    out = _dc.replace(node, input=cur, expressions=tuple(new_exprs))
    if isinstance(node, L.LWithColumns):
        # with_columns passes every input column through: drop the join temps
        out = L.LDrop(out, tuple(t for t in temps if t in node_schema(out).names()))
    return out


# ---------------------------------------------------------------------------
# distributed general windows (rank / cum / order_by) — VERDICT r4 #7
# ---------------------------------------------------------------------------


def _select_windows(node: L.LNode) -> list["E.EWindow"]:
    if not isinstance(node, (L.LSelect, L.LWithColumns)):
        return []
    wins: list[E.EWindow] = []
    for e in node.exprs():
        for w in E.walk(e):
            if isinstance(w, E.EWindow) and all(w is not x for x in wins):
                wins.append(w)
    return wins


def _window_distributable(node: L.LNode) -> bool:
    """Select/with_columns whose windows can run via hash-co-location:
    group_to_rows strategy, one shared elementwise partition key set (rank /
    cum / order_by functions included — the scalar-agg subset is instead
    REWRITTEN into group-by + join by _rewrite_windows and never reaches
    here), and every non-window expression part elementwise."""
    wins = _select_windows(node)
    if not wins:
        return False
    first = wins[0]
    for w in wins:
        if (
            w.mapping_strategy != "group_to_rows"
            or not w.partition_by
            or w.partition_by != first.partition_by
            or not all(E.is_elementwise(p) for p in w.partition_by)
        ):
            return False
    from polars_tpu.plan.optimizer.cse_expr import _replace_expr

    for e in node.exprs():
        probe = e
        for w in wins:
            probe = _replace_expr(probe, w, E.EColumn("__w_atom__"))
        if not E.is_elementwise(probe):
            return False
    return True


def _dist_window_select(
    node: L.LNode, tt: TTable, tc: _TraceCtx, d: int, cap_scale: int
):
    """General windows over the mesh: hash-shuffle raw rows on the partition
    keys so every key's rows co-locate on one shard (received rows keep
    global original order, so order-dependent functions like cum_sum see the
    single-chip sequence), evaluate the whole projection locally with the
    ordinary traced window machinery, then restore the global row order with
    the distributed sort over a carried row id. Two shuffles total.
    Reference: polars-expr/src/expressions/window.rs:194-448 evaluates via
    group-by + map-back; the map-back here is the gid restore-sort."""
    exprs = node.exprs()
    wins = _select_windows(node)
    keys = wins[0].partition_by
    h, _ = _group_key_hash(tt, keys, tc)
    n = tt.padded
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    shard = jax.lax.axis_index(AXIS).astype(jnp.int64)
    gid = shard * jnp.int64(n) + iota.astype(jnp.int64)
    tt2 = TTable(
        dict(tt.cols, __wgid__=Val(gid, None, dt.Int64(), None, ROW)),
        tt.rowmask, tt.padded,
    )
    cap = _shuffle_cap(n, d, cap_scale)
    tt_s, ofl = _shuffle_ttable(tt2, h, d, cap)
    if isinstance(node, L.LWithColumns):
        tt_e = _trace_select(tt_s, tuple(exprs), tc, keep_input=True)
    else:
        tt_e = _trace_select(
            tt_s, tuple(exprs) + (E.EColumn("__wgid__"),), tc, keep_input=False
        )
    restore = L.LSort(
        input=node, by=(E.EColumn("__wgid__"),),
        descending=(False,), nulls_last=(False,),
    )
    tt_o, ofl2 = _dist_sort(restore, tt_e, tc, d, cap_scale)
    cols = {k: v for k, v in tt_o.cols.items() if k != "__wgid__"}
    return TTable(cols, tt_o.rowmask, tt_o.padded), jnp.maximum(ofl, ofl2)


# ---------------------------------------------------------------------------
# plan classification
# ---------------------------------------------------------------------------


def _classify(node: L.LNode, leaves: list[L.LNode], counters: dict) -> None:
    """Walk the dist-traceable region under ``node``; nodes outside it become
    leaves (materialized by the single-chip engine, then sharded)."""
    from polars_tpu.engine.streaming import _decompose_aggs, _node_rowlocal

    if isinstance(node, (L.LDataFrameScan, L.LScan)):
        leaves.append(node)
        return
    try:
        schema = node_schema(node)
        nested = any(
            isinstance(t, (dt.List, dt.Array, dt.Struct)) for t in schema.dtypes()
        )
    except Exception:
        nested = True
    if nested:
        # packed list words index into an UNSHARDED child; an all_to_all of
        # the parents would strand them — materialize single-chip instead
        leaves.append(node)
        return
    if isinstance(node, L.LJoin) and _join_fusable(node) and _is_fusable(node):
        counters["reductions"] += 1
        _classify(node.input_left, leaves, counters)
        _classify(node.input_right, leaves, counters)
        return
    if isinstance(node, L.LGroupBy) and _is_fusable(node) and not node.maintain_order:
        counters["reductions"] += 1
        _classify(node.input, leaves, counters)
        return
    if isinstance(node, L.LAsofJoin):
        counters["reductions"] += 1
        _classify(node.input_left, leaves, counters)
        _classify(node.input_right, leaves, counters)
        return
    if isinstance(node, L.LSort) and _is_fusable(node) and node.limit is None:
        # range-partitioned distributed sort (splitter exchange = a reduction)
        counters["reductions"] += 1
        _classify(node.input, leaves, counters)
        return
    if (
        isinstance(node, L.LDistinct)
        and not node.maintain_order
        and node.keep in ("any", "first", "last", "none")
    ):
        counters["reductions"] += 1
        _classify(node.input, leaves, counters)
        return
    if (
        isinstance(node, (L.LSelect, L.LWithColumns))
        and _is_fusable(node)
        and _window_distributable(node)
    ):
        # general windows (rank/cum/order_by): hash co-location + local eval
        counters["reductions"] += 1
        _classify(node.inputs()[0], leaves, counters)
        return
    if isinstance(node, _DIST_CHAIN) and _is_fusable(node):
        if _node_rowlocal(node):
            _classify(node.inputs()[0], leaves, counters)
            return
        if isinstance(node, L.LSelect) and _decompose_aggs(node.expressions) is not None:
            # decomposable ungrouped reduce (Q6/Q14-style aggregate select)
            counters["reductions"] += 1
            _classify(node.input, leaves, counters)
            return
    leaves.append(node)


def _find_dist_root(node: L.LNode) -> tuple[L.LNode, list[L.LNode], list[L.LNode]] | None:
    """Topmost spine node whose subtree contains a distributable reduction.
    Returns (root, nodes_above_root, leaf_nodes) or None."""
    above: list[L.LNode] = []
    cur = node
    while True:
        leaves: list[L.LNode] = []
        counters = {"reductions": 0}
        _classify(cur, leaves, counters)
        if counters["reductions"] > 0 and all(l is not cur for l in leaves):
            return cur, above, leaves
        ins = cur.inputs()
        if len(ins) != 1:
            return None
        above.append(cur)
        cur = ins[0]


# ---------------------------------------------------------------------------
# in-trace shuffle primitive
# ---------------------------------------------------------------------------


def _shuffle_ttable(
    tt: TTable, h: jax.Array | None, d: int, cap: int, part_ids: jax.Array | None = None
) -> tuple[TTable, jax.Array]:
    """Partitioned all_to_all of a per-shard table block.

    ``h``: int64 row hash (consistent across shards) — each local row goes to
    shard ``partition_of(h, d)``; or pass ``part_ids`` (int32 in [0, d)) for
    an explicit routing (range partitioning for distributed sort). Rows
    beyond ``cap`` per destination bucket are dropped and the returned ratio
    says what capacity multiple WOULD have fit (host retries one pow2 rung).
    Within a destination shard, received rows keep (source shard, source
    position) order — the original global row order.
    Returns (shuffled local TTable with ``d*cap`` rows, ratio int32).
    """
    n = tt.padded
    part = jnp.where(tt.rowmask, partition_of(h, d) if part_ids is None else part_ids, d)
    perm = stable_argsort_words([part])
    part_s = part[perm]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    counts = jnp.zeros((d + 1,), jnp.int32).at[part_s].add(1, mode="drop")
    offsets = jnp.cumsum(counts) - counts
    rank = iota - offsets[jnp.clip(part_s, 0, d)]
    # max bucket demand -> how many CAPACITY MULTIPLES this shuffle needs
    # (1 = fits); the host retries at the pow2 rung >= the global max, so one
    # overflow costs exactly one extra compile per segment shape
    needed = jnp.max(counts[:d])
    ratio = -(-needed // jnp.int32(cap))
    ok = (part_s < d) & (rank < cap)
    tgt = jnp.where(ok, part_s * cap + jnp.clip(rank, 0, cap - 1), d * cap)

    def send(col, fill=None):
        src = col[perm]
        init = jnp.zeros((d * cap + 1,), col.dtype)
        buck = init.at[tgt].set(src)[: d * cap].reshape(d, cap)
        return jax.lax.all_to_all(buck, AXIS, 0, 0).reshape(-1)

    new_mask = (
        jnp.zeros((d * cap + 1,), bool).at[tgt].set(ok)[: d * cap].reshape(d, cap)
    )
    new_mask = jax.lax.all_to_all(new_mask, AXIS, 0, 0).reshape(-1)

    cols: dict[str, Val] = {}
    for name, v in tt.cols.items():
        values = send(v.values)
        validity = None if v.validity is None else send(v.validity)
        cols[name] = Val(values, validity, v.dtype, v.table, ROW, v.child)
    ofl = jax.lax.pmax(ratio.astype(jnp.int32), AXIS)
    return TTable(cols, new_mask, d * cap), ofl


def _mask_ttable(tt: TTable, extra: jax.Array) -> TTable:
    return TTable(tt.cols, tt.rowmask & extra, tt.padded)


def _concat_ttables(a: TTable, b: TTable) -> TTable:
    """Row-concatenate two same-schema local blocks (padding rows ride along,
    masked off)."""
    cols: dict[str, Val] = {}
    for name, va in a.cols.items():
        vb = b.cols[name]
        values = jnp.concatenate([va.values, vb.values])
        if va.validity is None and vb.validity is None:
            validity = None
        else:
            validity = jnp.concatenate([
                va.validity if va.validity is not None else jnp.ones((a.padded,), bool),
                vb.validity if vb.validity is not None else jnp.ones((b.padded,), bool),
            ])
        cols[name] = Val(values, validity, va.dtype, va.table, ROW, va.child)
    mask = jnp.concatenate([a.rowmask, b.rowmask])
    return TTable(cols, mask, a.padded + b.padded)


def _compact_gather_ttable(tt: TTable, cap: int) -> tuple[TTable, jax.Array]:
    """Compact the block's valid rows into ``cap`` slots, then all_gather the
    compacted block everywhere -> (d*cap) replicated rows + overflow flag."""
    n = tt.padded
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    rank = jnp.cumsum(tt.rowmask.astype(jnp.int32)) - 1
    needed = jnp.sum(tt.rowmask.astype(jnp.int32))
    ratio = -(-needed // jnp.int32(cap))
    ok = tt.rowmask & (rank < cap)
    tgt = jnp.where(ok, jnp.clip(rank, 0, cap - 1), cap)

    def send(col):
        buck = jnp.zeros((cap + 1,), col.dtype).at[tgt].set(col)[:cap]
        return jax.lax.all_gather(buck, AXIS, axis=0, tiled=True)

    cols: dict[str, Val] = {}
    for name, v in tt.cols.items():
        values = send(v.values)
        validity = None if v.validity is None else send(v.validity)
        cols[name] = Val(values, validity, v.dtype, v.table, ROW, v.child)
    mask = jnp.zeros((cap + 1,), bool).at[tgt].set(ok)[:cap]
    mask = jax.lax.all_gather(mask, AXIS, axis=0, tiled=True)
    ofl = jax.lax.pmax(ratio.astype(jnp.int32), AXIS)
    return TTable(cols, mask, mask.shape[0]), ofl


def _gather_ttable(tt: TTable) -> TTable:
    """all_gather a per-shard block into the full (replicated) table."""
    cols: dict[str, Val] = {}
    for name, v in tt.cols.items():
        values = jax.lax.all_gather(v.values, AXIS, axis=0, tiled=True)
        validity = (
            None
            if v.validity is None
            else jax.lax.all_gather(v.validity, AXIS, axis=0, tiled=True)
        )
        cols[name] = Val(values, validity, v.dtype, v.table, ROW, v.child)
    mask = jax.lax.all_gather(tt.rowmask, AXIS, axis=0, tiled=True)
    return TTable(cols, mask, mask.shape[0])


def _shuffle_cap(rows_in: int, d: int, cap_scale: int) -> int:
    """Per-destination bucket capacity. ``cap_scale`` = 1: 2x the uniform
    share (skew slack); > 1: pow2-scaled retry rung (the capacity LADDER —
    each rung is a distinct compiled program, so retries jump straight to
    the measured requirement instead of walking an unbounded sequence of
    recompiles, VERDICT r3 item 6); <= 0: lossless (the full local row
    count — a shard cannot send more)."""
    if cap_scale <= 0:
        return rows_in
    base = max(128, padded_size(-(-rows_in * 2 // d)))
    return min(padded_size(rows_in), base * cap_scale)


# ---------------------------------------------------------------------------
# distributed operators (traced)
# ---------------------------------------------------------------------------


def _group_key_hash(tt: TTable, key_exprs, tc: _TraceCtx) -> tuple[jax.Array, list]:
    ctx = _eval_ctx(tt, tc.literals)
    vals = []
    for k in key_exprs:
        exprs = expand_exprs((k,), tt.schema())
        vals.append(eval_expr(exprs[0], ctx))
    h = None
    for v in vals:
        hc = hash_column(v.values, v.validity, 11)
        h = hc if h is None else combine_hashes(h, hc)
    return h, vals


def _dist_groupby(node: L.LGroupBy, tt: TTable, tc: _TraceCtx, d: int, cap_scale: int):
    """Distributed group-by: pre-agg + shuffle partials + merge when the aggs
    decompose; otherwise shuffle raw rows and group locally."""
    from polars_tpu.engine.streaming import _decompose_aggs

    key_names = [E.output_name(k) or "literal" for k in node.keys]
    dec = _decompose_aggs(node.aggs)
    if dec is not None:
        partial, merge, final = dec
        pnode = L.LGroupBy(node.input, node.keys, tuple(partial), False)
        tt_p = _trace_groupby(tt, pnode, tc)
        h, _ = _group_key_hash(tt_p, tuple(E.EColumn(k) for k in key_names), tc)
        cap = _shuffle_cap(tt_p.padded, d, cap_scale)
        tt_s, ofl = _shuffle_ttable(tt_p, h, d, cap)
        mnode = L.LGroupBy(
            node.input, tuple(E.EColumn(k) for k in key_names), tuple(merge), False
        )
        tt_m = _trace_groupby(tt_s, mnode, tc)
        sel = tuple([E.EColumn(k) for k in key_names] + list(final))
        tt_f = _trace_select(tt_m, sel, tc, keep_input=False)
        # _trace_select with a full-length select keeps the group rowmask
        return TTable(tt_f.cols, tt_m.rowmask, tt_m.padded), ofl

    # general aggs: shuffle raw rows so each shard owns whole groups
    h, _ = _group_key_hash(tt, node.keys, tc)
    cap = _shuffle_cap(tt.padded, d, cap_scale)
    tt_s, ofl = _shuffle_ttable(tt, h, d, cap)
    tt_g = _trace_groupby(tt_s, node, tc)
    return tt_g, ofl


def _dist_sort(node: L.LSort, tt: TTable, tc: _TraceCtx, d: int, cap_scale: int):
    """Distributed sort: sample-based range partitioning + local stable sort
    (reference: polars-stream Sort node + rayon par_sort,
    polars-core/src/chunked_array/ops/sort/mod.rs:80-114 — re-designed as one
    shard_map program: stride-sample sort words on every shard, all_gather
    the samples, pick d-1 quantile splitters IN-TRACE, route rows by
    splitter bucket through the capacity-laddered all_to_all, then one local
    radix word-sort per shard. Shard i ends up holding the i-th global key
    range, and within a shard the received (src, pos) order makes the final
    tie word stable — concatenating shards in order IS the sorted frame."""
    from polars_tpu.engine.sort import sort_words_for_key

    ctx = _eval_ctx(tt, tc.literals)
    keys = []
    for e in node.by:
        exprs = expand_exprs((e,), tt.schema())
        keys.append(eval_expr(exprs[0], ctx))
    desc = list(node.descending) or [False] * len(keys)
    nlast = list(node.nulls_last) or [False] * len(keys)
    words: list[jax.Array] = []
    first = True
    for v, de, nl in zip(keys, desc, nlast):
        words.extend(sort_words_for_key(v, de, nl, tt.rowmask if first else None))
        first = False

    n = tt.padded
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)

    # ---- splitters: stride-sample each shard's words, gather, sort, take
    # global quantiles among the VALID samples (invalid ones carry MAX rank
    # and sort last, so quantile positions just index the valid prefix)
    S = max(32, min(256, n))
    stride = max(n // S, 1)
    sidx = jnp.arange(S, dtype=jnp.int32) * stride % n
    sample_ok = tt.rowmask[sidx]
    sampled = []
    for w in words:
        sw = w[sidx]
        big = jnp.asarray(jnp.iinfo(w.dtype).max, w.dtype) if jnp.issubdtype(w.dtype, jnp.integer) else sw
        sampled.append(jnp.where(sample_ok, sw, big))
    gathered = [jax.lax.all_gather(s, AXIS, axis=0, tiled=True) for s in sampled]
    sperm = stable_argsort_words(gathered)
    sorted_samples = [g[sperm] for g in gathered]
    n_valid = jax.lax.psum(jnp.sum(sample_ok.astype(jnp.int32)), AXIS)
    # splitter positions: i * n_valid / d for i in 1..d-1 (traced gathers)
    pos = (jnp.arange(1, d, dtype=jnp.int32) * n_valid) // jnp.maximum(d, 1)
    pos = jnp.clip(pos, 0, d * S - 1)
    splitters = [s[pos] for s in sorted_samples]  # each (d-1,) per word

    # ---- bucket id: number of splitters strictly below the row (ties join
    # the LOWER bucket, keeping equal keys on one shard)
    bucket = jnp.zeros((n,), jnp.int32)
    for i in range(d - 1):
        gt = jnp.zeros((n,), bool)
        eq = jnp.ones((n,), bool)
        for w, sw in zip(words, splitters):
            sv = sw[i]
            gt = gt | (eq & (w > sv))
            eq = eq & (w == sv)
        bucket = bucket + gt.astype(jnp.int32)

    cap = _shuffle_cap(n, d, cap_scale)
    # global source position rides along as the stability tie word
    shard = jax.lax.axis_index(AXIS).astype(jnp.int64)
    gid = shard * jnp.int64(n) + iota.astype(jnp.int64)
    tt2 = TTable(
        dict(tt.cols, __sort_gid__=Val(gid, None, dt.Int64(), None, ROW)),
        tt.rowmask, tt.padded,
    )
    tt_s, ofl = _shuffle_ttable(tt2, None, d, cap, part_ids=bucket)

    # ---- local stable sort of the received range
    ctx2 = _eval_ctx(tt_s, tc.literals)
    words2: list[jax.Array] = []
    first = True
    for e, de, nl in zip(node.by, desc, nlast):
        exprs = expand_exprs((e,), tt_s.schema())
        v = eval_expr(exprs[0], ctx2)
        words2.extend(sort_words_for_key(v, de, nl, tt_s.rowmask if first else None))
        first = False
    g2 = tt_s.cols["__sort_gid__"].values
    # split the 62-bit global position into two non-negative int32 words so
    # the signed radix word compare never sees a set sign bit
    words2.append((g2 >> 31).astype(jnp.int32))
    words2.append((g2 & jnp.int64(0x7FFFFFFF)).astype(jnp.int32))
    perm = stable_argsort_words(words2)
    cols: dict[str, Val] = {}
    for name, v in tt_s.cols.items():
        if name == "__sort_gid__":
            continue
        cols[name] = v.with_(
            values=v.values[perm],
            validity=None if v.validity is None else v.validity[perm],
        )
    return TTable(cols, tt_s.rowmask[perm], tt_s.padded), ofl


def _dist_distinct(node: L.LDistinct, tt: TTable, tc: _TraceCtx, d: int, cap_scale: int):
    """Distributed distinct: hash-shuffle rows so equal keys co-locate
    (received rows keep global original order), then the ordinary local
    distinct kernel decides keep=first/last/any/none — its local decision is
    the global one because each key's rows all live on one shard, in order.
    (reference: polars-stream distinct via partitioned group-by)."""
    subset = node.subset if node.subset is not None else tuple(tt.schema().names())
    ctx = _eval_ctx(tt, tc.literals)
    h = None
    for name in subset:
        v = ctx.cols[name]
        hc = hash_column(v.values, v.validity, 17)
        h = hc if h is None else combine_hashes(h, hc)
    cap = _shuffle_cap(tt.padded, d, cap_scale)
    tt_s, ofl = _shuffle_ttable(tt, h, d, cap)
    local = L.LDistinct(node.input, node.subset, node.keep, False)
    tc.leaf_tables[id(node.input)] = tt_s
    tt_out = trace_node(local, tc)
    del tc.leaf_tables[id(node.input)]
    return tt_out, ofl


def _dist_asof(node: L.LAsofJoin, tt_l: TTable, tt_r: TTable, tc: _TraceCtx, d: int):
    """Distributed asof join: the right (build) side replicates via
    all_gather, every shard matches its LOCAL probe rows against the full
    right table, probe rows never move. Broadcast is both the simple and
    the correct choice here — an asof match may need a neighbor from any
    range partition, and build sides are the small table of the pattern
    (quotes vs trades). Reference: polars-ops join_asof always sees the
    whole right frame (crates/polars-ops/src/frame/join/asof/mod.rs); the
    distribution axis there is rayon over left rows, here the mesh.
    With ``by`` groups, the composite-key fold of join.asof_join_frames is
    rebuilt IN-TRACE: the global time span comes from pmin/pmax collectives
    instead of a host sync, and the span-overflow guard rides the segment's
    deferred error flag."""
    from polars_tpu.engine.join import _tolerance_ticks, asof_match
    from polars_tpu.engine.join_traced import _key_word_traced

    tt_rg = _gather_ttable(tt_r)
    ctx_l = _eval_ctx(tt_l, tc.literals)
    ctx_r = _eval_ctx(tt_rg, tc.literals)
    lon = E.output_name(node.left_on)
    ron = E.output_name(node.right_on)
    lcol = ctx_l.cols[lon]
    rcol = ctx_r.cols[ron]

    tolerance = node.tolerance
    if isinstance(tolerance, str):
        tolerance = _tolerance_ticks(tolerance, lcol.dtype)
    elif tolerance is not None and hasattr(tolerance, "total_seconds"):
        us = int(round(tolerance.total_seconds() * 1e6))
        tolerance = _tolerance_ticks(f"{us}us", lcol.dtype)

    is_f = lcol.dtype.is_float()
    lk = lcol.values if is_f else lcol.values.astype(jnp.int64)
    rk = rcol.values if is_f else rcol.values.astype(jnp.int64)
    lmask = tt_l.rowmask
    if lcol.validity is not None:
        lmask = lmask & lcol.validity
    rmask = tt_rg.rowmask
    if rcol.validity is not None:
        rmask = rmask & rcol.validity

    gl = gr = None
    if node.by_left:
        # composite key gid * K + (t - tmin), K from the GLOBAL span
        hl = hr = None
        for bl, br in zip(node.by_left, node.by_right):
            vl = ctx_l.cols[E.output_name(bl)]
            vr = ctx_r.cols[E.output_name(br)]
            wl, okl, _ = _key_word_traced(vl, vr)
            wr, okr, _ = _key_word_traced(vr, vl)
            if okl is not None:
                lmask = lmask & okl
            if okr is not None:
                rmask = rmask & okr
            cl = hash_column(wl, None, 29)
            cr = hash_column(wr, None, 29)
            hl = cl if hl is None else combine_hashes(hl, cl)
            hr = cr if hr is None else combine_hashes(hr, cr)
        from polars_tpu.engine.join import _sort_i64_single

        sorted_gr = _sort_i64_single(jnp.where(rmask, hr, 0x7FFFFFFFFFFFFFFF))
        gl = jnp.searchsorted(sorted_gr, hl).astype(jnp.int64)
        gr = jnp.searchsorted(sorted_gr, hr).astype(jnp.int64)
        lk64 = lk.astype(jnp.int64)
        rk64 = rk.astype(jnp.int64)
        big = jnp.iinfo(jnp.int64).max
        tmin_l = jax.lax.pmin(jnp.min(jnp.where(lmask, lk64, big)), AXIS)
        tmax_l = jax.lax.pmax(jnp.max(jnp.where(lmask, lk64, -big - 1)), AXIS)
        tmin_r = jnp.min(jnp.where(rmask, rk64, big))  # replicated: local = global
        tmax_r = jnp.max(jnp.where(rmask, rk64, -big - 1))
        tmin = jnp.minimum(tmin_l, tmin_r)
        tmax = jnp.maximum(tmax_l, tmax_r)
        span = jnp.maximum(tmax - tmin, 0)
        tol_i = int(tolerance) if tolerance is not None else 0
        K = span + 2 * abs(tol_i) + 4
        # span-overflow guard -> deferred error channel (single host sync)
        tc.flags.append(K >= jnp.int64((1 << 62) // (tt_rg.padded + 2)))
        lk = jnp.where(lmask, gl * K + (lk64 - tmin), jnp.int64(0))
        rk = jnp.where(rmask, gr * K + (rk64 - tmin), jnp.int64(0))

    ridx, ok = asof_match(
        lk, rk, rmask, node.strategy,
        None if tolerance is None else float(tolerance),
    )
    if node.by_left:
        ok = ok & (gr[ridx] == gl)
    ok = ok & lmask

    cols: dict[str, Val] = dict(tt_l.cols)
    skip = {ron, *(E.output_name(e) for e in node.by_right)}
    for name, v in tt_rg.cols.items():
        if name in skip:
            continue
        out_name = name + node.suffix if name in tt_l.cols else name
        values = v.values[ridx]
        validity = ok if v.validity is None else (v.validity[ridx] & ok)
        cols[out_name] = Val(values, validity, v.dtype, v.table, ROW, v.child)
    return TTable(cols, tt_l.rowmask, tt_l.padded)


def _join_side_hash(keys_self: list[Val], keys_other: list[Val]) -> jax.Array:
    """Side-symmetric shuffle hash: equal keys on either side hash equal."""
    from polars_tpu.engine.join_traced import _key_word_traced

    h = None
    for v, o in zip(keys_self, keys_other):
        w, valid, _exact = _key_word_traced(v, o)
        hc = hash_column(w, valid, 11)
        h = hc if h is None else combine_hashes(h, hc)
    return h


def _dist_join(node: L.LJoin, tt_l: TTable, tt_r: TTable, tc: _TraceCtx, d: int, cap_scale: int):
    from polars_tpu.engine.join_traced import trace_join

    def eval_key(e, tt):
        exprs = expand_exprs((e,), tt.schema())
        return eval_expr(exprs[0], _eval_ctx(tt, tc.literals))

    flip = node.validate == "1:m"
    tt_build = tt_l if flip else tt_r

    ofl = jnp.zeros((), jnp.int32)
    if tt_build.padded * d <= _broadcast_rows():
        # broadcast join: gather the (unique-key) build side everywhere, keep
        # the probe side sharded — no probe movement, immune to key skew
        if flip:
            tt_l = _gather_ttable(tt_l)
        else:
            tt_r = _gather_ttable(tt_r)
    else:
        lkeys = [eval_key(e, tt_l) for e in node.left_on]
        rkeys = [eval_key(e, tt_r) for e in node.right_on]
        lh = _join_side_hash(lkeys, rkeys)
        rh = _join_side_hash(rkeys, lkeys)
        cap_l = _shuffle_cap(tt_l.padded, d, cap_scale)
        cap_r = _shuffle_cap(tt_r.padded, d, cap_scale)
        if cap_scale <= 0:
            tt_l, ofl_l = _shuffle_ttable(tt_l, lh, d, cap_l)
            tt_r, ofl_r = _shuffle_ttable(tt_r, rh, d, cap_r)
            ofl = jnp.maximum(ofl_l, ofl_r)
        else:
            # SKEW-ROUTED partitioned join. A hot probe key sends every one
            # of its rows to one shard; the shuffle bucket overflows and the
            # lossless retry exchanges full local tables (d-times the
            # memory). Instead, a B-bucket probe-side histogram (psum'd
            # across shards — the CardinalitySketch / per-partition-count
            # analogue, polars-utils/src/cardinality_sketch.rs) detects
            # heavy hash buckets in-trace; their PROBE rows stay local (no
            # movement) and their (unique-key, m:1) BUILD rows replicate via
            # a compact all_gather — the salted-repartition treatment with
            # replication factor d only on the skewed tail. Light buckets
            # co-partition through the ordinary all_to_all.
            B = 256
            # flip=True: build = LEFT (validate="1:m"), probe = RIGHT
            hp = rh if flip else lh  # probe-side hash
            hb = lh if flip else rh
            tt_p = tt_r if flip else tt_l
            tt_b = tt_l if flip else tt_r
            bucket_p = (partition_of(hp, B)).astype(jnp.int32)
            bucket_b = (partition_of(hb, B)).astype(jnp.int32)
            hist = jnp.zeros((B,), jnp.int32).at[
                jnp.where(tt_p.rowmask, bucket_p, B - 1)
            ].add(tt_p.rowmask.astype(jnp.int32), mode="drop")
            hist = jax.lax.psum(hist, AXIS)
            # heavy when one bucket alone could overflow its (src,dst)
            # bucket: global count / d per source > cap/2 slack
            cap_p = _shuffle_cap(tt_p.padded, d, cap_scale)
            heavy = hist > (cap_p // 2) * d
            heavy_p = heavy[bucket_p] & tt_p.rowmask
            heavy_b = heavy[bucket_b] & tt_b.rowmask

            # light rows: ordinary co-partitioned exchange
            lt_p, ofl_p = _shuffle_ttable(
                _mask_ttable(tt_p, ~heavy_p), hp, d, cap_p
            )
            lt_b, ofl_b = _shuffle_ttable(
                _mask_ttable(tt_b, ~heavy_b), hb, d,
                _shuffle_cap(tt_b.padded, d, cap_scale),
            )
            # heavy build rows: compact + replicate everywhere
            heavy_cap = max(128, padded_size(-(-tt_b.padded // 8)) * max(cap_scale, 1))
            gt_b, ofl_g = _compact_gather_ttable(
                _mask_ttable(tt_b, heavy_b), heavy_cap
            )
            # heavy probe rows: NO movement — they join the replicated build
            local_p = _mask_ttable(tt_p, heavy_p)
            new_p = _concat_ttables(lt_p, local_p)
            new_b = _concat_ttables(lt_b, gt_b)
            ofl = jnp.maximum(jnp.maximum(ofl_p, ofl_b), ofl_g)
            if flip:  # build = left, probe = right
                tt_l, tt_r = new_b, new_p
            else:
                tt_l, tt_r = new_p, new_b

    cols, rowmask, bad = trace_join(node, tt_l, tt_r, eval_key)
    tc.flags.append(bad)
    return TTable(cols, rowmask, rowmask.shape[0]), ofl


def _dist_reduce_select(node: L.LSelect, tt: TTable, tc: _TraceCtx):
    """Distributed ungrouped reduce: per-shard partial aggregates, all_gather,
    merge + finalize replicated; only shard 0 keeps the single output row."""
    from polars_tpu.engine.streaming import _decompose_aggs

    partial, merge, final = _decompose_aggs(node.expressions)
    tt_p = _trace_select(tt, tuple(partial), tc, keep_input=False)
    tt_g = _gather_ttable(tt_p)
    tt_m = _trace_select(tt_g, tuple(merge), tc, keep_input=False)
    tt_f = _trace_select(tt_m, tuple(final), tc, keep_input=False)
    ax = jax.lax.axis_index(AXIS)
    mask = tt_f.rowmask & (ax == 0)
    return TTable(tt_f.cols, mask, tt_f.padded)


def _trace_dist(node: L.LNode, tc: _TraceCtx, d: int, cap_scale: int, ofl_acc: list):
    from polars_tpu.engine.streaming import _node_rowlocal

    if id(node) in tc.leaf_tables:
        return tc.leaf_tables[id(node)]
    if isinstance(node, (L.LSelect, L.LWithColumns)) and _window_distributable(node):
        tt_in = _trace_dist(node.inputs()[0], tc, d, cap_scale, ofl_acc)
        tt, ofl = _dist_window_select(node, tt_in, tc, d, cap_scale)
        ofl_acc.append(ofl)
        tc.leaf_tables[id(node)] = tt
        return tt
    if isinstance(node, L.LSelect) and not _node_rowlocal(node):
        tt_in = _trace_dist(node.input, tc, d, cap_scale, ofl_acc)
        tt = _dist_reduce_select(node, tt_in, tc)
        tc.leaf_tables[id(node)] = tt
        return tt
    if isinstance(node, L.LJoin):
        tt_l = _trace_dist(node.input_left, tc, d, cap_scale, ofl_acc)
        tt_r = _trace_dist(node.input_right, tc, d, cap_scale, ofl_acc)
        tt, ofl = _dist_join(node, tt_l, tt_r, tc, d, cap_scale)
        ofl_acc.append(ofl)
        tc.leaf_tables[id(node)] = tt
        return tt
    if isinstance(node, L.LAsofJoin):
        tt_l = _trace_dist(node.input_left, tc, d, cap_scale, ofl_acc)
        tt_r = _trace_dist(node.input_right, tc, d, cap_scale, ofl_acc)
        tt = _dist_asof(node, tt_l, tt_r, tc, d)
        tc.leaf_tables[id(node)] = tt
        return tt
    if isinstance(node, L.LGroupBy):
        tt_in = _trace_dist(node.input, tc, d, cap_scale, ofl_acc)
        tt, ofl = _dist_groupby(node, tt_in, tc, d, cap_scale)
        ofl_acc.append(ofl)
        tc.leaf_tables[id(node)] = tt
        return tt
    if isinstance(node, L.LSort):
        tt_in = _trace_dist(node.input, tc, d, cap_scale, ofl_acc)
        tt, ofl = _dist_sort(node, tt_in, tc, d, cap_scale)
        ofl_acc.append(ofl)
        tc.leaf_tables[id(node)] = tt
        return tt
    if isinstance(node, L.LDistinct):
        tt_in = _trace_dist(node.input, tc, d, cap_scale, ofl_acc)
        tt, ofl = _dist_distinct(node, tt_in, tc, d, cap_scale)
        ofl_acc.append(ofl)
        tc.leaf_tables[id(node)] = tt
        return tt
    # chain op: compute inputs distributed, register them as leaves, and let
    # the ordinary single-shard tracer handle this one node locally
    for i in node.inputs():
        tc.leaf_tables[id(i)] = _trace_dist(i, tc, d, cap_scale, ofl_acc)
    tt = trace_node(node, tc)
    tc.leaf_tables[id(node)] = tt
    return tt


# ---------------------------------------------------------------------------
# segment runner
# ---------------------------------------------------------------------------

_SPMD_JIT_CACHE: dict[tuple, Any] = {}

# test hook: when True, each run stores its lowered StableHLO text here so
# tests can assert the collective structure (all_to_all / all_gather present)
CAPTURE_HLO = False
LAST_LOWERED: str | None = None
LAST_CAP_SCALE: int | None = None  # test observability: capacity rung used


def _shard_leaf(df: DataFrame, mesh, d: int) -> tuple[list, int]:
    """Pad a leaf DataFrame's arrays to d*per rows and place them row-sharded.
    Returns (flat arg list, per-shard rows)."""
    per = max(128, padded_size(-(-max(df.height, 1) // d)))
    total = per * d
    sharding = NamedSharding(mesh, P(AXIS))
    args = []
    for c in df._columns:
        args.append(jax.device_put(pad_to(c.buffer.values, total), sharding))
        if c.buffer.validity is not None:
            args.append(jax.device_put(pad_to(c.buffer.validity, total), sharding))
    return args, per


def _est_padded(node: L.LNode, sizes: dict[int, int]) -> int:
    """Host estimate of the padded row extent flowing INTO ``node``'s
    position (upper bound; chains/filters keep the padded shape)."""
    if id(node) in sizes:
        return sizes[id(node)]
    ins = node.inputs()
    if not ins:
        return 0
    if isinstance(node, L.LJoin):
        flip = node.validate == "1:m"
        probe = node.input_left if not flip else node.input_right
        return _est_padded(probe, sizes)
    return max(_est_padded(i, sizes) for i in ins)


def _dict_key_capacity(keys, leaf_dfs) -> int | None:
    """Product of dict/bool key cardinalities (+1 for null) when EVERY key is
    a direct column of dictionary-coded or boolean dtype resolvable in the
    leaf frames; None otherwise. The CardinalitySketch analogue
    (polars-utils/src/cardinality_sketch.rs) — here the dictionary IS an
    exact host-side cardinality bound."""
    total = 1
    for k in keys:
        base = k
        while isinstance(base, E.EAlias):
            base = base.input
        if not isinstance(base, E.EColumn):
            return None
        card = None
        for _, df in leaf_dfs:
            for c in df._columns:
                if c.name != base.name:
                    continue
                if isinstance(c.dtype, dt.Boolean):
                    card = 3
                elif c.table is not None:
                    card = len(c.table) + 1
                break
        if card is None:
            return None
        total *= card
        if total > 1 << 20:
            return None
    return total


def _rows_bound(node: L.LNode, leaf_dfs, sizes) -> int:
    """Host-side UPPER bound on the rows ``node`` can emit: group-bys and
    distincts over dict/bool keys are bounded by key cardinality, chains by
    their input, m:1/1:1 joins by the probe side. The exact-dictionary
    stand-in for the reference's CardinalitySketch
    (polars-utils/src/cardinality_sketch.rs)."""
    if id(node) in sizes:
        return sizes[id(node)]
    if isinstance(node, L.LGroupBy):
        bound = _rows_bound(node.input, leaf_dfs, sizes)
        cap_k = _dict_key_capacity(node.keys, leaf_dfs)
        return min(bound, cap_k) if cap_k is not None else bound
    if isinstance(node, L.LDistinct):
        bound = _rows_bound(node.input, leaf_dfs, sizes)
        if node.subset is not None:
            cap_k = _dict_key_capacity(
                tuple(E.EColumn(s) for s in node.subset), leaf_dfs
            )
            if cap_k is not None:
                bound = min(bound, cap_k)
        return bound
    if isinstance(node, L.LJoin):
        flip = node.validate == "1:m"
        probe = node.input_right if flip else node.input_left
        return _rows_bound(probe, leaf_dfs, sizes)
    ins = node.inputs()
    if not ins:
        return 0
    return max(_rows_bound(i, leaf_dfs, sizes) for i in ins)


def _default_cap_provable(node: L.LNode, leaf_dfs, sizes, d: int) -> bool:
    """True when EVERY shuffle under ``node`` provably fits the default
    capacity rung from host-side information alone, so the overflow flag
    never fires and flip-free execution needs no retry channel (VERDICT r4
    #6). Provable cases: broadcast joins and asof joins (no probe shuffle at
    all); shuffles whose SEND side is bounded (dict/bool key capacity for
    group-by partials, a bounded input for sort/distinct/raw-row shuffles)
    below one bucket's capacity — then even the worst skew (every row to one
    destination) fits."""
    from polars_tpu.engine.streaming import _decompose_aggs

    def fits_one_bucket(send_bound: int, at: L.LNode) -> bool:
        # proof against the GUARANTEED capacity floor only (r5 review: the
        # traced caps are per-shard/per-partial extents the host can't see
        # exactly; _shuffle_cap(anything) >= 128, so send_bound <= 128 is
        # skew-proof regardless of sharding — enough for dict-keyed PDS-H
        # shapes, lossless for the rest)
        return send_bound <= 128

    if any(node is ln for ln, _ in leaf_dfs):
        return True
    if isinstance(node, L.LJoin):
        flip = node.validate == "1:m"
        build = node.input_left if flip else node.input_right
        probe = node.input_right if flip else node.input_left
        if _est_padded(build, sizes) * d > _broadcast_rows():
            # hash-shuffled join: provable only when BOTH sides' send
            # buckets are bounded below capacity
            if not (
                fits_one_bucket(_rows_bound(build, leaf_dfs, sizes), build)
                and fits_one_bucket(_rows_bound(probe, leaf_dfs, sizes), probe)
            ):
                return False
        return all(
            _default_cap_provable(i, leaf_dfs, sizes, d) for i in node.inputs()
        )
    if isinstance(node, L.LAsofJoin):  # build side always broadcast
        return all(
            _default_cap_provable(i, leaf_dfs, sizes, d) for i in node.inputs()
        )
    if isinstance(node, L.LGroupBy):
        if _decompose_aggs(node.aggs) is not None:
            send_bound = _rows_bound(node, leaf_dfs, sizes)  # partial table
        else:
            send_bound = _rows_bound(node.input, leaf_dfs, sizes)  # raw rows
        if not fits_one_bucket(send_bound, node.input):
            return False
        return _default_cap_provable(node.input, leaf_dfs, sizes, d)
    if isinstance(node, (L.LSort, L.LDistinct)) or (
        isinstance(node, (L.LSelect, L.LWithColumns)) and _window_distributable(node)
    ):
        # raw-row shuffle (range/hash): provable only for a bounded input
        if not fits_one_bucket(
            _rows_bound(node.inputs()[0], leaf_dfs, sizes), node.inputs()[0]
        ):
            return False
        return _default_cap_provable(node.inputs()[0], leaf_dfs, sizes, d)
    ins = node.inputs()
    if not ins:
        return True
    return all(_default_cap_provable(i, leaf_dfs, sizes, d) for i in ins)


def run_spmd_segment(
    root: L.LNode,
    leaf_dfs: list[tuple[L.LNode, DataFrame]],
    mesh,
    *,
    lossless: bool = False,
    cap_scale: int = 1,
    sync: bool = True,
) -> DataFrame:
    """``cap_scale``: pow2 rung of the shuffle-capacity ladder (1 = default
    2x-uniform slack, <= 0 = lossless). On overflow the shuffles report the
    exact capacity multiple they needed; the host retries ONCE at the pow2
    rung that fits it (one extra compile per segment shape), then falls back
    to lossless. Reference analogue: sketch-sized tables
    (polars-utils/src/cardinality_sketch.rs)."""
    if lossless:
        cap_scale = 0
    d = int(mesh.devices.size)
    if not sync and cap_scale > 0:
        # flip-free mode has no overflow-retry channel (reading the flag IS
        # the flip): run at default capacity only when the host-side bound
        # PROVES no shuffle can overflow, else at lossless capacity
        sizes = {id(ln): padded_size(df.height) for ln, df in leaf_dfs}
        if not _default_cap_provable(root, leaf_dfs, sizes, d):
            cap_scale = 0
    global LAST_CAP_SCALE
    LAST_CAP_SCALE = cap_scale
    out_schema = node_schema(root)
    out_names = out_schema.names()
    leaf_ids = [id(n) for n, _ in leaf_dfs]

    sharded = []
    pers = []
    for _, df in leaf_dfs:
        args, per = _shard_leaf(df, mesh, d)
        sharded.append(args)
        pers.append(per)

    key = (
        "spmd",
        d,
        cap_scale,
        tuple(pers),
        _segment_key(root, leaf_ids),
        tuple(_table_sig(df) for _, df in leaf_dfs),
    )
    entry = _SPMD_JIT_CACHE.get(key)
    if entry is None:
        captured_tables: dict[str, Any] = {}
        captured_children: dict[str, Any] = {}
        leaf_meta = [
            (lnode, [(c.name, c.dtype, c.table, c.buffer.validity is not None,
                      (pos, c.name, 0) if getattr(c, "child", None) is not None else None)
                     for c in df._columns])
            for pos, (lnode, df) in enumerate(leaf_dfs)
        ]

        def traced(leaf_args: list, heights: list):
            def local_fn(*flat):
                n_h = len(leaf_meta)
                flat, hts = flat[:-n_h], flat[-n_h:]
                it = iter(flat)
                leaf_tables: dict[int, TTable] = {}
                ax = jax.lax.axis_index(AXIS)
                from polars_tpu.engine.common import TracedChild

                for (lnode, colmeta), per, height in zip(leaf_meta, pers, hts):
                    cols: dict[str, Val] = {}
                    for (name, dtype, table, has_valid, child_src) in colmeta:
                        values = next(it)
                        validity = next(it) if has_valid else None
                        # provenance-only child: list/struct data stays host
                        # (list COMPUTE is not dist-traceable yet; passthrough
                        # reattaches the current call's leaf child)
                        child = (
                            TracedChild(None, None, None, None, None, child_src)
                            if child_src is not None else None
                        )
                        cols[name] = Val(values, validity, dtype, table, ROW, child)
                    iota = jax.lax.broadcasted_iota(jnp.int32, (per, 1), 0).squeeze(-1)
                    mask = (iota + ax * per) < height
                    leaf_tables[id(lnode)] = TTable(cols, mask, per)
                tc = _TraceCtx(leaf_tables, {})
                ofl_acc: list = []
                tt = _trace_dist(root, tc, d, cap_scale, ofl_acc)
                for name, v in tt.cols.items():
                    captured_tables[name] = v.table
                    if isinstance(v.child, TracedChild):
                        if v.child.src is None:
                            # in-trace-computed children (list.sort et al.)
                            # have no SPMD output path yet
                            raise InvalidOperationError(
                                f"{name}: in-trace list children are not "
                                "supported in the distributed engine"
                            )
                        captured_children[name] = ("src", *v.child.src)
                    elif v.child is not None:
                        captured_children[name] = v.child
                outs = []
                for name in out_names:
                    v = tt.cols[name]
                    outs.append(v.values)
                    outs.append(
                        v.validity if v.validity is not None else jnp.ones((tt.padded,), bool)
                    )
                bad = jnp.zeros((), bool)
                for f in tc.flags:
                    bad = bad | f
                bad = jax.lax.psum(bad.astype(jnp.int32), AXIS)
                # worst capacity multiple any shuffle needed (1 = all fit)
                ofl = jnp.ones((), jnp.int32)
                for o in ofl_acc:
                    ofl = jnp.maximum(ofl, o)
                return tuple(outs), tt.rowmask, bad, ofl

            flat_in = [a for args in leaf_args for a in args]
            sm = shard_map(
                local_fn,
                mesh=mesh,
                in_specs=tuple(P(AXIS) for _ in flat_in) + tuple(P() for _ in heights),
                out_specs=(
                    tuple(P(AXIS) for _ in range(2 * len(out_names))),
                    P(AXIS),
                    P(),
                    P(),
                ),
                check_vma=False,
            )
            outs, rm, bad, ofl = sm(*flat_in, *heights)
            # global compaction: valid rows first (one stable radix pass), the
            # same single-sync protocol as run_segment
            perm = stable_argsort_words([(~rm).astype(jnp.int8)])
            count = jnp.sum(rm.astype(jnp.int32))
            count = jnp.where(bad > 0, -(count + 1), count)
            rm_sorted = rm[perm]
            final = []
            for i in range(len(out_names)):
                final.append(outs[2 * i][perm])
                final.append(outs[2 * i + 1][perm] & rm_sorted)
            return final, count, ofl

        jfn = jax.jit(traced)
        entry = (jfn, captured_tables, captured_children)
        _SPMD_JIT_CACHE[key] = entry
    jfn, captured_tables, captured_children = entry

    heights = [
        dc if (dc := getattr(df, "_device_count", None)) is not None
        else jnp.int32(df.height)
        for _, df in leaf_dfs
    ]
    if CAPTURE_HLO:
        global LAST_LOWERED
        LAST_LOWERED = jfn.lower(sharded, heights).as_text()
    outs, count, ofl = jfn(sharded, heights)
    deferred = False
    if not sync:
        from polars_tpu.engine import pending

        if pending.active():
            # DEFERRED mode: the overflow flag still rides to the batched
            # end-of-query readback as an invariant check (capacity was
            # proven or lossless, so > 1 means a host-bound bug, not data)
            pending.defer(count, ofl=ofl, label=f"spmd:{type(root).__name__}")
            deferred = True
        else:
            jax.block_until_ready([count, ofl, *outs])
        n = outs[0].shape[0] if outs else 0
        of_i = 0
    else:
        n_arr, of_arr = jax.device_get([count, ofl])
        n, of_i = int(n_arr), int(of_arr)
    if of_i > 1 and cap_scale <= 0:
        raise ComputeError("distributed shuffle overflowed at lossless capacity")
    if of_i > 1 and cap_scale > 0:
        if cap_scale > 1:
            # the scaled rung STILL overflowed (adversarial capacity hooks /
            # pathological growth between attempts): lossless terminal rung
            return run_spmd_segment(root, leaf_dfs, mesh, lossless=True, sync=sync)
        # jump straight to the pow2 rung that fits the measured demand —
        # exactly one extra compile, cache-reusable across retries
        rung = 1 << max(int(of_i) - 1, 1).bit_length()
        return run_spmd_segment(root, leaf_dfs, mesh, cap_scale=rung, sync=sync)
    if n < 0:
        raise ComputeError(
            "join validation failed: keys do not satisfy the declared "
            "m:1/1:1/1:m cardinality"
        )
    size = padded_size(n)
    cols = []
    it = iter(outs)
    for name in out_names:
        values = next(it)
        validity = next(it)
        if values.shape[0] != size:
            values = values[:size] if values.shape[0] >= size else pad_to(values, size)
            validity = validity[:size] if validity.shape[0] >= size else pad_to(validity, size)
        child = captured_children.get(name)
        if isinstance(child, tuple) and child and child[0] == "src":
            _, lpos, cname, depth = child
            child = leaf_dfs[lpos][1]._get(cname).child
            for _ in range(depth):
                child = child.child
        cols.append(
            Column(
                name, out_schema[name], Buffer(values, validity, n),
                captured_tables.get(name), 0, child,
            )
        )
    out_df = DataFrame._from_columns(cols, n)
    if deferred:
        out_df._device_count = jnp.maximum(count, 0)
    return out_df


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


def collect_spmd(node: L.LNode, mesh=None, *, sync: bool = True) -> DataFrame:
    """Execute ``node`` with the SPMD engine where the plan shape allows;
    single-chip for the rest (the InMemoryMap fallback pattern).

    ``sync=False`` inside a ``pending.scope()`` is the FLIP-FREE protocol
    (VERDICT r4 #6): no segment reads its count back; intermediate frames
    carry device counts, error/overflow flags ride to one batched readback
    at ``pending.finalize``. Host-op subplans (special selects etc.) still
    materialize eagerly inside their own execute_plan recursion."""
    from polars_tpu.engine import pending
    from polars_tpu.engine.run import _needs_special, execute_plan

    if mesh is None:
        mesh = make_mesh()
    d = int(mesh.devices.size)
    if d <= 1:
        return execute_plan(node, sync=sync)
    node = _rewrite_windows(node)
    found = _find_dist_root(node)
    if found is None:
        return execute_plan(node, sync=sync)
    root, above, leaf_nodes = found
    leaf_dfs: list[tuple[L.LNode, DataFrame]] = []
    seen: set[int] = set()
    for ln in leaf_nodes:
        if id(ln) in seen:
            continue
        seen.add(id(ln))
        leaf_dfs.append((ln, execute_plan(ln, sync=sync)))
    # hashed-string gate (r5 review): the dist trace has the same
    # order-sensitivity constraints as the single-chip one — densify leaf
    # columns the dist region uses order-sensitively BEFORE sharding
    from polars_tpu.engine.run import _densify_hashed_leaves

    leaf_dfs = _densify_hashed_leaves(root, leaf_dfs)
    out = run_spmd_segment(root, leaf_dfs, mesh, sync=sync)
    cur: L.LNode = L.LDataFrameScan(df=out, ident=obj_token(out))
    for nd in reversed(above):
        cur = L.rebuild(nd, (cur,))
    if not sync and pending.active() and not all(
        _is_fusable(nd)
        and not (isinstance(nd, (L.LSelect, L.LWithColumns)) and _needs_special(nd))
        for nd in above
    ):
        # a host op above the distributed root would read the padded frame's
        # garbage tail as data — resolve the deferred counts first (this IS
        # the unavoidable sync a host op implies)
        fin = pending.finalize(out)
        cur = L.LDataFrameScan(df=fin, ident=obj_token(fin))
        for nd in reversed(above):
            cur = L.rebuild(nd, (cur,))
        return execute_plan(cur)
    return execute_plan(cur, sync=sync)
