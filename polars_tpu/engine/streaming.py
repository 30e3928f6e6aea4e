"""Streaming execution: larger-than-HBM plans via batch-wise processing.

The polars-stream analogue (SURVEY.md §2.11), generalized in round 2 beyond
GroupBy-over-scan. The plan's spine — the path from the root to its LARGEST
leaf — streams in fixed-size batches ("morsels") through the fused per-batch
chain; the topmost stateful node on that spine becomes the TERMINAL combiner:

- GroupBy, decomposable aggs (sum/count/len/min/max/mean/var/std): per-batch
  partial aggregates merged at the end (GroupedReduction update + the
  combine_locals barrier, polars-stream/src/nodes/group_by.rs:252).
- GroupBy, general aggs (median/quantile/n_unique/...): per-batch chain
  output narrowed to the key + agg input columns and accumulated through the
  out-of-core host store (engine/ooc.py — spills under a budget), then one
  final group-by.
- Sort with limit (TopK): per-batch device top-k, final merge — streaming,
  like the reference's TopK node.
- Sort without limit: chain streams, rows accumulate in the host store, one
  final in-memory sort — the reference's own design (sort lowers to
  InMemoryMap over materialized input, to_graph.rs:589-624).
- Distinct: per-batch distinct (keep first/last/any compose), final distinct
  over the concatenated survivors; keep="none" skips the per-batch pass.
- Slice/head: accumulate until offset+length rows exist, then STOP the scan
  (early termination).
- No stateful terminal: per-batch chain outputs concatenate (sink).

Joins inside the streamed chain run per batch with the streamed side as the
PROBE; build sides materialize exactly once (the build-resident /
probe-streamed pattern, polars-stream/src/nodes/joins/equi_join.rs).
Everything above the terminal runs in-memory on the (small) combined result
— the InMemoryMap fallback pattern.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

from polars_tpu import datatypes as dt
from polars_tpu.config import config, verbose
from polars_tpu.core.frame import DataFrame
from polars_tpu.errors import InvalidOperationError
from polars_tpu.plan import exprs as E
from polars_tpu.plan import logical as L
from polars_tpu.utils.tokens import obj_token

_DECOMPOSABLE = {"sum", "count", "len", "min", "max", "mean", "var", "std"}

_CHAIN = (L.LFilter, L.LSelect, L.LWithColumns, L.LRename, L.LDrop, L.LExplode)
_TERMINALS = (L.LGroupBy, L.LSort, L.LDistinct, L.LSlice)


# ---------------------------------------------------------------------------
# plan analysis
# ---------------------------------------------------------------------------


def _leaf_rows(n: L.LNode) -> int:
    if isinstance(n, L.LDataFrameScan):
        return n.df.height
    if isinstance(n, L.LScan):
        if n.fmt == "parquet":
            try:
                import pyarrow.parquet as pq

                return sum(pq.ParquetFile(p).metadata.num_rows for p in n.sources)
            except Exception:  # noqa: BLE001
                return 1 << 30
        return 1 << 30  # unknown size: assume big (prefer streaming it)
    return 0


def _collect_leaves(n: L.LNode, out: list) -> None:
    if isinstance(n, (L.LScan, L.LDataFrameScan)):
        out.append(n)
        return
    for i in n.inputs():
        _collect_leaves(i, out)


def _path_to(root: L.LNode, leaf: L.LNode) -> list[L.LNode] | None:
    if root is leaf:
        return [root]
    for i in root.inputs():
        sub = _path_to(i, leaf)
        if sub is not None:
            return [root, *sub]
    return None


def _probe_input(j: L.LJoin) -> L.LNode:
    """The side of a fused join whose rows stream (probe)."""
    return j.input_right if j.validate == "1:m" else j.input_left


def _node_rowlocal(n: L.LNode) -> bool:
    """Per-batch-safe chain node: maps/filters whose exprs are elementwise
    (the ExprCache.is_elementwise classification, lower_expr.rs:39-53).
    Aggregating selects, windows, ranks etc. must NOT stream as chain nodes."""
    if isinstance(n, (L.LRename, L.LDrop, L.LExplode)):
        return True
    if isinstance(n, L.LFilter):
        return E.is_elementwise(n.predicate)
    if isinstance(n, (L.LSelect, L.LWithColumns)):
        return all(E.is_elementwise(e) for e in n.exprs())
    return False


def _plan_stream(root: L.LNode):
    """Returns (leaf, terminal | None, chain_top, above_root) or None.

    ``chain_top`` is the per-batch-safe subplan fed to the terminal (the
    terminal's spine input, or the root itself when no terminal exists).
    """
    from polars_tpu.engine.executors import _is_fusable, _join_fusable

    leaves: list[L.LNode] = []
    _collect_leaves(root, leaves)
    if not leaves:
        return None
    leaf = max(leaves, key=_leaf_rows)
    path = _path_to(root, leaf)
    if path is None:
        return None
    # ascend from the leaf through per-batch-safe nodes
    idx = len(path) - 1  # path[idx] == leaf
    while idx > 0:
        n = path[idx - 1]
        if isinstance(n, _CHAIN) and _is_fusable(n) and _node_rowlocal(n):
            idx -= 1
            continue
        if isinstance(n, L.LJoin) and _join_fusable(n) and _is_fusable(n) and _probe_input(n) is path[idx]:
            idx -= 1
            continue
        break
    chain_top = path[idx]
    terminal = None
    if idx > 0:
        cand = path[idx - 1]
        if isinstance(cand, L.LSlice) and (cand.offset < 0 or cand.length is None):
            cand = None  # negative slices need the total count
        if isinstance(cand, L.LSelect) and _decompose_aggs(cand.expressions) is None:
            cand = None  # non-decomposable ungrouped reduce
        if isinstance(cand, (*_TERMINALS, L.LSelect)):
            terminal = cand
    if terminal is None and idx > 0 and chain_top is leaf:
        return None  # nothing streams (first node above the scan is stateful)
    return leaf, terminal, chain_top, root


# ---------------------------------------------------------------------------
# agg decomposition (GroupedReduction partial/combine/finalize lifecycle)
# ---------------------------------------------------------------------------


def _decompose_aggs(aggs):
    """Rewrite agg exprs into (partial_aggs, merge_aggs, final_exprs).

    sum/count/len -> sum of partials; min/max -> min/max of partials;
    mean -> (sum, count); var/std -> (sum, sum of squares, count) finalized
    as (s2 - s^2/c) / (c - ddof) (the streaming engine's combine form; the
    in-memory engine keeps its two-pass version for stability)."""
    import polars_tpu as pl

    partial: list[E.ENode] = []
    merge: list[E.ENode] = []
    final: list[E.ENode] = []
    idx = 0
    for a in aggs:
        name = E.output_name(a) or "literal"
        base = a
        while isinstance(base, E.EAlias):
            base = base.input
        if isinstance(base, E.ELen):
            # pl.len(): per-batch row counts sum (count of rows per group)
            p = f"__p{idx}"
            partial.append(E.EAlias(E.ELen(), p))
            merge.append(E.EAlias(E.EAgg(E.EColumn(p), "sum", ()), p))
            final.append(pl.col(p).cast(dt.UInt32()).alias(name)._node)
            idx += 1
            continue
        if not isinstance(base, E.EAgg) or base.kind not in _DECOMPOSABLE:
            return None
        k = base.kind
        if k == "mean":
            ps, pc = f"__p{idx}_s", f"__p{idx}_c"
            partial.append(E.EAlias(E.EAgg(base.input, "sum", ()), ps))
            partial.append(E.EAlias(E.EAgg(base.input, "count", base.options), pc))
            merge.append(E.EAlias(E.EAgg(E.EColumn(ps), "sum", ()), ps))
            merge.append(E.EAlias(E.EAgg(E.EColumn(pc), "sum", ()), pc))
            # count == 0 -> null (0/0 would yield NaN; the in-memory engine
            # and the reference both return null for an all-null group mean)
            final.append(
                pl.when(pl.col(pc) > 0)
                .then(pl.col(ps) / pl.col(pc))
                .otherwise(None)
                .alias(name)
                ._node
            )
        elif k in ("var", "std"):
            ddof = base.opt("ddof", 1)
            ps, p2, pc = f"__p{idx}_s", f"__p{idx}_2", f"__p{idx}_c"
            sq = E.EBinary(base.input, "*", base.input)
            partial.append(E.EAlias(E.EAgg(base.input, "sum", ()), ps))
            partial.append(E.EAlias(E.EAgg(sq, "sum", ()), p2))
            partial.append(E.EAlias(E.EAgg(base.input, "count", ()), pc))
            for col in (ps, p2, pc):
                merge.append(E.EAlias(E.EAgg(E.EColumn(col), "sum", ()), col))
            c = pl.col(pc)
            v = (pl.col(p2) - pl.col(ps) * pl.col(ps) / c) / (c - ddof)
            v = pl.when(c > ddof).then(v).otherwise(None)
            out_e = v.sqrt() if k == "std" else v
            final.append(out_e.alias(name)._node)
        else:
            p = f"__p{idx}"
            partial.append(E.EAlias(E.EAgg(base.input, k, base.options), p))
            mk = "sum" if k in ("sum", "count", "len") else k
            merge.append(E.EAlias(E.EAgg(E.EColumn(p), mk, ()), p))
            out_e = pl.col(p).alias(name)
            if k in ("count", "len"):
                out_e = pl.col(p).cast(dt.UInt32()).alias(name)
            final.append(out_e._node)
        idx += 1
    return partial, merge, final


def _expr_columns(nodes) -> set[str]:
    out: set[str] = set()
    for e in nodes:
        for s in E.walk(e):
            if isinstance(s, E.EColumn):
                out.add(s.name)
    return out


# ---------------------------------------------------------------------------
# execution
# ---------------------------------------------------------------------------


def _iter_batches(leaf: L.LNode, batch_rows: int):
    if isinstance(leaf, L.LScan):
        from polars_tpu.io.scan_exec import iter_scan_batches

        yield from iter_scan_batches(leaf, batch_rows)
    else:
        df = leaf.df
        for start in range(0, max(df.height, 1), batch_rows):
            b = df.slice(start, batch_rows)
            if b.height or df.height == 0:
                yield b
            if df.height == 0:
                return


def _skip_n(it, n: int):
    """Drop the first ``n`` items of a batch iterator (checkpoint resume:
    those batches' partials are already durable; the scan still decodes the
    skipped batches but no chain/device compute runs on them)."""
    for i, item in enumerate(it):
        if i >= n:
            yield item


def _partials(make_outputs, per_batch, ckpt):
    """Per-batch partial frames, resuming from / persisting to ``ckpt``.

    ``make_outputs(skip)`` -> iterator of chain outputs with the first
    ``skip`` batches not computed; ``per_batch`` reduces one chain output to
    its partial frame (the GroupedReduction ``update`` step). With a
    checkpoint, stored partials stream out first, then each newly computed
    partial is made durable BEFORE it is yielded — a crash at any point
    re-runs at most the in-flight batch (engine/checkpoint.py)."""
    if ckpt is None:
        for out in make_outputs(0):
            yield per_batch(out)
        return
    yield from ckpt.load_parts()
    for out in make_outputs(ckpt.done):
        part = per_batch(out)
        ckpt.add_part(part)
        yield part


# ---------------------------------------------------------------------------
# grace (hash-partitioned) join: both sides larger than memory
# ---------------------------------------------------------------------------


def _build_input(j: L.LJoin) -> L.LNode:
    p = _probe_input(j)
    return j.input_right if p is j.input_left else j.input_left


def _max_leaf_rows(n: L.LNode) -> int:
    leaves: list[L.LNode] = []
    _collect_leaves(n, leaves)
    return max((_leaf_rows(l) for l in leaves), default=0)


def _find_grace_join(chain_top: L.LNode, leaf: L.LNode, batch_rows: int):
    """The bottom-most spine join whose BUILD side is itself too large to
    materialize: both sides hash-partition to spill stores, then each
    partition pair joins in memory (the reference's partitioned SpillFrame
    path, polars-stream/src/nodes/joins/equi_join.rs:403-530)."""
    import os

    if os.environ.get("POLARS_TPU_STREAM_GRACE", "1") == "0":
        return None
    path = _path_to(chain_top, leaf) or []
    for n in reversed(path):  # bottom-most (closest to the leaf) first
        if isinstance(n, L.LJoin) and n.how != "cross" and n.left_on:
            if _max_leaf_rows(_build_input(n)) > 4 * batch_rows:
                return n
    return None


def _grace_k(build_rows: int, batch_rows: int) -> int:
    import os

    forced = int(os.environ.get("POLARS_TPU_STREAM_JOIN_PARTITIONS", "0"))
    if forced > 0:
        return forced
    k = -(-build_rows // max(2 * batch_rows, 1))
    return max(2, min(64, k))


def _partition_ids(df: DataFrame, key_exprs, n_parts: int) -> "Any":
    """Stable per-row partition id from the join keys' LOGICAL values (host
    side — dict codes are frame-local, so string keys hash by value)."""
    import numpy as np
    import pandas as pd

    from polars_tpu.engine.run import execute_plan

    h = None
    for i, k in enumerate(key_exprs):
        sub = L.LSelect(
            L.LDataFrameScan(df=df, ident=obj_token(df)),
            (E.EAlias(k, f"__k{i}"),),
        )
        vals = execute_plan(sub)._columns[0].to_pylist()
        hk = pd.util.hash_pandas_object(pd.Series(vals, dtype=object), index=False).to_numpy()
        h = hk if h is None else (h * np.uint64(0x9E3779B9) + hk)
    return (h % np.uint64(n_parts)).astype(np.int64)


def _take_rows(df: DataFrame, idx) -> DataFrame:
    from polars_tpu.engine.gather import gather_column

    cols = [gather_column(c, idx) for c in df._columns]
    return DataFrame._from_columns(cols, len(idx))


def _grace_outputs(chain_top: L.LNode, leaf: L.LNode, grace_j: L.LJoin, batch_rows: int):
    """Yield chain outputs for a plan whose spine join partitions both sides.

    Phase 1: stream the build subplan, hash-partition rows by join key into
    K spill stores. Phase 2: stream the probe leaf through the below-join
    chain, partition likewise. Phase 3: join each partition pair in memory
    and run the above-join chain on it. Peak memory ~ total/K per side
    (+ the OOC budget governs host-side spill)."""
    import numpy as np

    from polars_tpu.engine.ooc import HostRunStore
    from polars_tpu.engine.run import execute_plan

    probe_sub = _probe_input(grace_j)
    build_plan = _build_input(grace_j)
    probe_is_left = probe_sub is grace_j.input_left
    probe_keys = grace_j.left_on if probe_is_left else grace_j.right_on
    build_keys = grace_j.right_on if probe_is_left else grace_j.left_on
    n_parts = _grace_k(_max_leaf_rows(build_plan), batch_rows)
    if verbose():
        print(f"[polars_tpu] grace join: {n_parts} partitions")

    def scan(df: DataFrame) -> L.LNode:
        return L.LDataFrameScan(df=df, ident=obj_token(df))

    def spill_partitions(frames, keys):
        stores = [HostRunStore() for _ in range(n_parts)]
        template = None
        for f in frames:
            if template is None and f.width:
                template = f.clear()
            if f.height == 0:
                continue
            pids = _partition_ids(f, keys, n_parts)
            for p in np.unique(pids):
                stores[int(p)].add(_take_rows(f, np.nonzero(pids == p)[0]))
        return stores, template

    build_stores = probe_stores = None
    try:
        build_stores, build_tpl = spill_partitions(
            stream_batches(build_plan, batch_rows=batch_rows), build_keys
        )
        probe_chain = _freeze_build_sides(probe_sub, leaf, {})
        probe_stores, probe_tpl = spill_partitions(
            (
                execute_plan(_replace_input(probe_chain, leaf, scan(b)))
                for b in _iter_batches(leaf, batch_rows)
            ),
            probe_keys,
        )
        if build_tpl is None or probe_tpl is None:
            # a side produced no batches at all: resolve its schema statically
            from polars_tpu.core.schema import Schema
            from polars_tpu.plan.schema_resolve import node_schema

            if build_tpl is None:
                build_tpl = DataFrame(schema=dict(node_schema(build_plan).items()))
            if probe_tpl is None:
                probe_tpl = DataFrame(schema=dict(node_schema(probe_sub).items()))
        cache: dict = {}
        for p in range(n_parts):
            pdf = probe_stores[p].to_frame() if probe_stores[p].runs else probe_tpl.clear()
            bdf = build_stores[p].to_frame() if build_stores[p].runs else build_tpl.clear()
            if pdf.height == 0 and bdf.height == 0:
                continue
            if pdf.height == 0 and grace_j.how in ("inner", "left", "semi", "anti"):
                continue  # nothing to emit from an empty probe partition
            li, ri = (pdf, bdf) if probe_is_left else (bdf, pdf)
            joined = execute_plan(L.rebuild(grace_j, (scan(li), scan(ri))))
            sub = _replace_input(chain_top, grace_j, scan(joined))
            yield execute_plan(_freeze_build_sides(sub, leaf, cache))
    finally:
        for stores in (build_stores, probe_stores):
            if stores:
                for s in stores:
                    s.close()


def _freeze_build_sides(node: L.LNode, leaf: L.LNode, cache: dict) -> L.LNode:
    """Materialize every join input NOT on the stream spine exactly once."""
    from polars_tpu.engine.run import execute_plan

    if node is leaf or isinstance(node, (L.LScan, L.LDataFrameScan)):
        return node
    if isinstance(node, L.LJoin):
        probe = _probe_input(node)
        new_inputs = []
        for i in node.inputs():
            if i is probe:
                new_inputs.append(_freeze_build_sides(i, leaf, cache))
            else:
                if id(i) not in cache:
                    df = execute_plan(i)
                    cache[id(i)] = L.LDataFrameScan(df=df, ident=obj_token(df))
                new_inputs.append(cache[id(i)])
        return L.rebuild(node, tuple(new_inputs))
    return L.rebuild(node, tuple(_freeze_build_sides(i, leaf, cache) for i in node.inputs()))


def collect_streaming(
    node: L.LNode,
    *,
    batch_rows: int | None = None,
    checkpoint_dir: str | None = None,
    _fingerprint: str | None = None,
) -> DataFrame:
    """Execute with batch-streamed scans where the plan shape allows;
    otherwise fall back to the in-memory engine.

    ``checkpoint_dir`` makes the run RESUMABLE (engine/checkpoint.py): each
    per-batch partial is made durable before the next batch starts, and a
    restarted process with the same plan + batch size skips every completed
    batch. Only reduction terminals checkpoint (decomposable reduces /
    group-bys, TopK, distinct with keep != "none" — see engine/checkpoint.py);
    other plan shapes run normally and a restart recomputes them. Each
    durable partial is a device->host readback: on the axon backend the first
    one permanently flips the runtime into slow sync dispatch (CLAUDE.md §1)
    — recycle the worker process after a checkpointed run.

    Multi-stateful spines checkpoint each splice stage under a nested
    ``next_stage/`` directory whose identity derives from the PARENT
    fingerprint (``_fingerprint``), not from the spliced plan — the spliced
    leaf is the stage-1 result frame, whose representation (dict tables,
    relaxed dtypes after a parquet round-trip) may legally differ between the
    original run and a resume (ADVICE r4)."""
    from polars_tpu.engine.ooc import HostRunStore
    from polars_tpu.engine.run import execute_plan
    from polars_tpu.functions.eager import concat

    plan = _plan_stream(node)
    if plan is None:
        return execute_plan(node)
    leaf, terminal, chain_top, root = plan
    batch_rows = batch_rows or config().ideal_batch_size

    grace_j = _find_grace_join(chain_top, leaf, batch_rows)
    fp = None
    if checkpoint_dir is not None:
        import os as _osmod

        from polars_tpu.engine.checkpoint import plan_fingerprint

        # the fingerprint binds every knob that changes the SEQUENCE of
        # partials: the grace decision + partition count and the env toggles
        # feeding them (ADVICE r4 high). Nested stages inherit the parent's.
        extra = {
            "grace": grace_j is not None,
            "grace_env": _osmod.environ.get("POLARS_TPU_STREAM_GRACE", "1"),
            "grace_parts_env": _osmod.environ.get(
                "POLARS_TPU_STREAM_JOIN_PARTITIONS", "0"
            ),
        }
        if grace_j is not None:
            extra["grace_parts"] = _grace_k(
                _max_leaf_rows(_build_input(grace_j)), batch_rows
            )
        fp = _fingerprint or plan_fingerprint(node, batch_rows, extra)

    def mk_ckpt():
        """Open the checkpoint for a checkpointable terminal (or None)."""
        if checkpoint_dir is None:
            return None
        from polars_tpu.engine.checkpoint import StreamCheckpoint

        ck = StreamCheckpoint(checkpoint_dir, fp, batch_rows)
        if verbose() and ck.done:
            print(f"[polars_tpu] checkpoint: resuming after {ck.done} batches")
        return ck
    if grace_j is not None:
        def chain_outputs(skip: int = 0):
            return _skip_n(_grace_outputs(chain_top, leaf, grace_j, batch_rows), skip)
    else:
        chain = _freeze_build_sides(chain_top, leaf, {})

        def run_chain(batch_df: DataFrame) -> DataFrame:
            sub = _replace_input(chain, leaf, L.LDataFrameScan(df=batch_df, ident=obj_token(batch_df)))
            return execute_plan(sub)

        def chain_outputs(skip: int = 0):
            return (run_chain(b) for b in _skip_n(_iter_batches(leaf, batch_rows), skip))

    def splice(result: DataFrame, at: L.LNode) -> DataFrame:
        """Substitute ``result`` for ``at`` in the full plan and finish the
        rest RECURSIVELY through the streaming engine: if another stateful
        node sits above this terminal (group-by -> sort, distinct ->
        group-by, join -> group-by -> join ... — the multi-stateful spines of
        polars-stream/src/physical_plan/lower_ir.rs:155), the spliced plan
        streams again with the combined result as its new leaf; each pass
        consumes exactly one terminal, so the recursion terminates at a plan
        with no streamable terminal (-> in-memory). Replacement is by
        STRUCTURAL equality: the optimizer may have duplicated a shared
        subplan (Q15-style self-joins), and a float aggregate recomputed
        in-memory can differ in the last ulp from the streamed one — both
        copies must see the identical streamed result."""
        if at is root:
            return result
        rebuilt = _replace_equal(root, at, L.LDataFrameScan(df=result, ident=obj_token(result)))
        sub_ckpt = (
            None if checkpoint_dir is None
            else str(Path(checkpoint_dir) / "next_stage")
        )
        return collect_streaming(
            rebuilt,
            batch_rows=batch_rows,
            checkpoint_dir=sub_ckpt,
            _fingerprint=None if fp is None else fp + ":next_stage",
        )

    import polars_tpu as pl  # noqa: F401

    # ---- ungrouped reduce terminal (Q6-style aggregate select) --------------
    if isinstance(terminal, L.LSelect):
        partial, merge, final = _decompose_aggs(terminal.expressions)

        def per_batch_reduce(out: DataFrame) -> DataFrame:
            return execute_plan(
                L.LSelect(L.LDataFrameScan(df=out, ident=obj_token(out)), tuple(partial))
            )

        partials = list(_partials(chain_outputs, per_batch_reduce, mk_ckpt()))
        if not partials:
            return execute_plan(node)
        combined = concat(partials, how="vertical_relaxed") if len(partials) > 1 else partials[0]
        merged = execute_plan(
            L.LSelect(L.LDataFrameScan(df=combined, ident=obj_token(combined)), tuple(merge))
        )
        out = execute_plan(
            L.LSelect(L.LDataFrameScan(df=merged, ident=obj_token(merged)), tuple(final))
        )
        return splice(out, terminal)

    # ---- GroupBy terminal ---------------------------------------------------
    if isinstance(terminal, L.LGroupBy):
        gb = terminal
        dec = _decompose_aggs(gb.aggs)
        key_names = [E.output_name(k) or "literal" for k in gb.keys]
        if dec is not None:
            partial, merge, final = dec

            def per_batch_gb(out: DataFrame) -> DataFrame:
                sub = L.LGroupBy(
                    L.LDataFrameScan(df=out, ident=obj_token(out)),
                    gb.keys, tuple(partial), False,
                )
                p = execute_plan(sub)
                if verbose():
                    print(f"[polars_tpu] streamed batch -> {p.height} partial groups")
                return p

            partials = list(_partials(chain_outputs, per_batch_gb, mk_ckpt()))
            if not partials:
                return execute_plan(node)
            combined = concat(partials, how="vertical_relaxed") if len(partials) > 1 else partials[0]
            merged = execute_plan(
                L.LGroupBy(
                    L.LDataFrameScan(df=combined, ident=obj_token(combined)),
                    tuple(E.EColumn(n) for n in key_names),
                    tuple(merge),
                    gb.maintain_order,
                )
            )
            final_exprs = [E.EColumn(n) for n in key_names] + list(final)
            out = execute_plan(
                L.LSelect(L.LDataFrameScan(df=merged, ident=obj_token(merged)), tuple(final_exprs))
            )
            return splice(out, gb)

        # general aggs: narrow each batch to the needed columns, accumulate
        # through the OOC host store, one final group-by over the whole set
        needed = _expr_columns((*gb.keys, *gb.aggs))

        def per_batch_narrow(out: DataFrame) -> DataFrame:
            keep = [c for c in out.columns if c in needed] or out.columns[:1]
            return DataFrame._from_columns([out._get(c) for c in keep], out.height)

        # no checkpoint here: the narrowed rows ARE the input (persisting
        # them would write the whole scan twice) — see engine/checkpoint.py
        store = HostRunStore()
        try:
            for part in _partials(chain_outputs, per_batch_narrow, None):
                store.add(part)
            acc = store.to_frame()
        finally:
            store.close()
        out = execute_plan(
            L.LGroupBy(
                L.LDataFrameScan(df=acc, ident=obj_token(acc)),
                gb.keys, gb.aggs, gb.maintain_order,
            )
        )
        return splice(out, gb)

    # ---- Sort terminal ------------------------------------------------------
    if isinstance(terminal, L.LSort):
        st = terminal
        if st.limit is not None:
            # streaming TopK: per-batch device top-k, then merge; the
            # per-batch top-k is a reduction, so it checkpoints

            def per_batch_topk(out: DataFrame) -> DataFrame:
                return execute_plan(
                    L.rebuild(st, (L.LDataFrameScan(df=out, ident=obj_token(out)),))
                )

            parts: list[DataFrame] = list(
                _partials(chain_outputs, per_batch_topk, mk_ckpt())
            )
            if not parts:
                return execute_plan(node)
            combined = concat(parts, how="vertical_relaxed") if len(parts) > 1 else parts[0]
            out = execute_plan(
                L.rebuild(st, (L.LDataFrameScan(df=combined, ident=obj_token(combined)),))
            )
            return splice(out, st)
        # full sort: stream the chain, accumulate rows out-of-core, one final
        # in-memory sort (the reference's own lowering: sort -> InMemoryMap)
        store = HostRunStore()
        try:
            for out in chain_outputs():
                store.add(out)
            acc = store.to_frame()
        finally:
            store.close()
        out = execute_plan(
            L.rebuild(st, (L.LDataFrameScan(df=acc, ident=obj_token(acc)),))
        )
        return splice(out, st)

    # ---- Distinct terminal --------------------------------------------------
    if isinstance(terminal, L.LDistinct):
        di = terminal
        if di.keep != "none":  # per-batch reduction composes -> checkpoints

            def per_batch_distinct(out: DataFrame) -> DataFrame:
                return execute_plan(
                    L.rebuild(di, (L.LDataFrameScan(df=out, ident=obj_token(out)),))
                )

            parts = list(_partials(chain_outputs, per_batch_distinct, mk_ckpt()))
        else:
            parts = list(chain_outputs())
        if not parts:
            return execute_plan(node)
        combined = concat(parts, how="vertical_relaxed") if len(parts) > 1 else parts[0]
        out = execute_plan(
            L.rebuild(di, (L.LDataFrameScan(df=combined, ident=obj_token(combined)),))
        )
        return splice(out, di)

    # ---- Slice/head terminal (early stop) -----------------------------------
    if isinstance(terminal, L.LSlice):
        sl = terminal
        want = sl.offset + sl.length
        parts = []
        got = 0
        for out in chain_outputs():
            parts.append(out)
            got += out.height
            if got >= want:
                break
        if not parts:
            return execute_plan(node)
        combined = concat(parts, how="vertical_relaxed") if len(parts) > 1 else parts[0]
        out = execute_plan(
            L.rebuild(sl, (L.LDataFrameScan(df=combined, ident=obj_token(combined)),))
        )
        return splice(out, sl)

    # ---- no terminal: the chain IS the query (sink) -------------------------
    parts = list(chain_outputs())
    if not parts:
        return execute_plan(node)
    combined = concat(parts, how="vertical_relaxed") if len(parts) > 1 else parts[0]
    return splice(combined, chain_top)


def stream_batches(node: L.LNode, *, batch_rows: int | None = None):
    """Yield the query result as a stream of DataFrame batches (the morsel
    stream behind ``LazyFrame.collect_batches`` and the streaming sinks;
    reference: polars-lazy/src/frame/mod.rs collect_batches + the FileSink
    morsel pipeline, polars-stream/src/nodes/io_sinks/mod.rs:27-49).

    Plans that are a pure per-batch-safe chain over one streamable leaf yield
    incrementally with bounded memory; plans with a blocking terminal
    (group-by/sort/...) run through :func:`collect_streaming` (which itself
    streams the leaf and spills through the OOC store) and re-chunk the
    result. Always yields at least one (possibly empty) frame so consumers
    see the schema."""
    from polars_tpu.engine.run import execute_plan

    batch_rows = batch_rows or config().ideal_batch_size
    plan = _plan_stream(node)
    if plan is not None:
        leaf, terminal, chain_top, root = plan
        if terminal is None and chain_top is root:
            grace_j = _find_grace_join(chain_top, leaf, batch_rows)
            if grace_j is not None:
                outs = _grace_outputs(chain_top, leaf, grace_j, batch_rows)
            else:
                chain = _freeze_build_sides(chain_top, leaf, {})
                outs = (
                    execute_plan(_replace_input(
                        chain, leaf,
                        L.LDataFrameScan(df=batch_df, ident=obj_token(batch_df)),
                    ))
                    for batch_df in _iter_batches(leaf, batch_rows)
                )
            yielded = False
            for out in outs:
                if out.height:
                    yielded = True
                    yield out
            if not yielded:
                from polars_tpu.plan.schema_resolve import node_schema

                yield DataFrame(schema=node_schema(node))
            return
    df = collect_streaming(node, batch_rows=batch_rows)
    if df.height == 0:
        yield df
        return
    for start in range(0, df.height, batch_rows):
        yield df.slice(start, batch_rows)


def _replace_input(node: L.LNode, target: L.LNode, replacement: L.LNode) -> L.LNode:
    if node is target:
        return replacement
    inputs = node.inputs()
    new_inputs = tuple(_replace_input(i, target, replacement) for i in inputs)
    if new_inputs == inputs:
        return node
    return L.rebuild(node, new_inputs)


def _replace_equal(node: L.LNode, target: L.LNode, replacement: L.LNode) -> L.LNode:
    """Replace every occurrence structurally equal to ``target``."""
    if node is target or node == target:
        return replacement
    inputs = node.inputs()
    new_inputs = tuple(_replace_equal(i, target, replacement) for i in inputs)
    if all(a is b for a, b in zip(new_inputs, inputs)):
        return node
    return L.rebuild(node, new_inputs)
