"""Resumable streaming execution: checkpoint / job-level restart.

The reference engine has no in-query checkpointing (single process; its
adjacent mechanisms are the versioned plan serializer used by Polars Cloud,
polars-plan/src/client/mod.rs:7-23, and the OOC spill files that survive as
resumable partition state, polars-ooc/src/spill_file.rs). For a multi-host
TPU deployment the north-star failure story is JOB-LEVEL RESTART: a streaming
query that dies (device fault, preemption, host OOM) restarts from its last
completed batch instead of from scratch.

Design: the streaming engine reduces each per-batch chain output to a PARTIAL
frame (partial aggregates, per-batch top-k, narrowed rows, ...) before the
terminal combine (engine/streaming.py). Those partials are the natural
checkpoint unit — they are small, deterministic (the batch split of a scan at
fixed ``batch_rows`` is stable), and the combine step is associative, so a
restarted process can load the stored partials, skip that many scan batches,
and continue producing the rest.

Terminals that checkpoint: decomposable ungrouped reduces, decomposable
group-bys, TopK (sort with limit), and distinct with ``keep != "none"`` —
the ones whose per-batch partial is a genuine reduction. Full sorts,
slices, general (non-decomposable) aggregates and pure sinks accumulate raw
rows, so persisting their "partials" would write the whole input twice;
those plans run without checkpointing and a restart recomputes them.

Layout of a checkpoint directory::

    manifest.json           {format, version, fingerprint, batch_rows, done}
    part_00000.parquet      partial frame of batch 0 (zstd parquet)
    part_00001.parquet      ...

Every write is atomic AND durable (tmp + fsync + rename + directory fsync);
the manifest's ``done`` count advances only after its part file is durable,
so a crash — process OR machine — at any point re-runs at most the in-flight
batch. The fingerprint binds the checkpoint to the full decomposition
identity: (plan shape, batch size, grace-join decision + partition count,
engine version). Resuming with anything different raises instead of silently
mixing partials from two different computations (the partial sequence of a
grace-partitioned run is per-PARTITION, not per-batch — ADVICE r4).

NOTE (platform): each ``add_part`` performs a device->host readback of the
partial frame — inherent to durability. On the axon backend the FIRST
readback permanently flips the runtime into slow synchronous dispatch
(CLAUDE.md §1), so enabling ``checkpoint_dir`` trades steady-state speed for
restartability; production serving should recycle the worker process after a
checkpointed run. The fingerprint itself performs NO readback: in-memory
frames are identified by schema + height, never serialized.

In a multi-host run each process passes its own directory (e.g.
``f"{root}/proc{jax.process_index()}"``) — scan-work assignment is
deterministic per process (parallel/multihost.assign_files), so per-host
checkpoints compose exactly like per-host scans do.
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
from pathlib import Path

from polars_tpu.errors import ComputeError

_FORMAT = "polars_tpu_stream_checkpoint"
_VERSION = 2


# ---------------------------------------------------------------------------
# plan identity (readback-free)
# ---------------------------------------------------------------------------


def _identity(v) -> str:
    """Stable textual identity of a plan value WITHOUT materializing device
    frames (plan/serialize.py's codec ships full Arrow IPC bytes for
    LDataFrameScan — a device->host readback at query start, which on this
    platform permanently degrades the session; ADVICE r4). In-memory frames
    and series literals are identified by schema + length only: the batch
    split depends on nothing else, and content verification would itself
    require the readback this exists to avoid."""
    from polars_tpu.plan import exprs as E
    from polars_tpu.plan import logical as L

    if isinstance(v, L.LDataFrameScan):
        sch = ",".join(f"{n}:{d}" for n, d in v.df.schema.items())
        return f"DFScan[{sch}|h={v.df.height}|proj={_identity(v.projection)}]"
    if isinstance(v, E.ESeriesLit):
        c = v.column
        return f"SeriesLit[{c.name}:{c.dtype}|n={len(c)}]"
    if isinstance(v, (L.LNode, E.ENode)):
        parts = []
        for f in dataclasses.fields(v):
            if f.name == "ident":  # process-local tokens don't survive restart
                continue
            parts.append(f"{f.name}={_identity(getattr(v, f.name))}")
        return f"{type(v).__name__}({';'.join(parts)})"
    if isinstance(v, tuple):
        return "(" + ",".join(_identity(x) for x in v) + ")"
    if isinstance(v, (list, dict, set, frozenset)):
        return repr(v)
    if callable(v):  # UDFs: best-effort, stable within a process only
        return getattr(v, "__qualname__", repr(v))
    return repr(v)


def plan_fingerprint(node, batch_rows: int, extra: dict | None = None) -> str:
    """Stable identity of the full streaming decomposition.

    ``extra`` carries every execution parameter that changes the SEQUENCE of
    partials — the grace-join decision and its partition count, env toggles —
    so a resume under a different decomposition is rejected instead of
    silently mixing per-batch and per-partition partials (ADVICE r4 high)."""
    h = hashlib.sha256()
    h.update(_identity(node).encode())
    h.update(f"|batch_rows={batch_rows}|v={_VERSION}".encode())
    for k in sorted(extra or ()):
        h.update(f"|{k}={extra[k]}".encode())
    return h.hexdigest()[:32]


# ---------------------------------------------------------------------------
# durable writes
# ---------------------------------------------------------------------------


def _fsync_dir(path: Path) -> None:
    try:
        fd = os.open(path, os.O_RDONLY)
    except OSError:
        return  # e.g. platforms without directory fds
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def _durable_replace(tmp: Path, dst: Path) -> None:
    """fsync(tmp) -> rename -> fsync(dir): the rename is never durable before
    the data it names (ADVICE r4: rename without fsync can survive a power
    loss that the data did not)."""
    fd = os.open(tmp, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)
    os.replace(tmp, dst)
    _fsync_dir(dst.parent)


class StreamCheckpoint:
    """Persistent partial-frame log for one streaming query."""

    def __init__(self, directory: str | os.PathLike, fingerprint: str,
                 batch_rows: int):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.fingerprint = fingerprint
        self.batch_rows = batch_rows
        self.done = 0
        m = self._read_manifest()
        if m is not None:
            if m.get("fingerprint") != fingerprint:
                raise ComputeError(
                    f"checkpoint at {self.dir} belongs to a different query, "
                    "batch size, or batch decomposition (stored fingerprint "
                    f"{m.get('fingerprint')!r} != {fingerprint!r}); point at "
                    "a fresh directory or delete the stale checkpoint"
                )
            self.done = int(m.get("done", 0))
        else:
            self._write_manifest()

    # ---- manifest -----------------------------------------------------------

    def _manifest_path(self) -> Path:
        return self.dir / "manifest.json"

    def _read_manifest(self) -> dict | None:
        p = self._manifest_path()
        if not p.exists():
            return None
        try:
            doc = json.loads(p.read_text())
        except Exception as e:  # noqa: BLE001
            raise ComputeError(f"unreadable checkpoint manifest at {p}: {e}") from e
        if doc.get("format") != _FORMAT or doc.get("version") != _VERSION:
            raise ComputeError(
                f"{p} is not a version-{_VERSION} polars_tpu stream checkpoint"
            )
        return doc

    def _write_manifest(self) -> None:
        doc = {
            "format": _FORMAT,
            "version": _VERSION,
            "fingerprint": self.fingerprint,
            "batch_rows": self.batch_rows,
            "done": self.done,
        }
        tmp = self._manifest_path().with_suffix(".json.tmp")
        tmp.write_text(json.dumps(doc))
        _durable_replace(tmp, self._manifest_path())

    # ---- parts --------------------------------------------------------------

    def _part_path(self, i: int) -> Path:
        return self.dir / f"part_{i:05d}.parquet"

    def load_parts(self):
        """Yield the stored partial frames in batch order."""
        import pyarrow.parquet as pq

        from polars_tpu.io._arrow import arrow_to_df

        for i in range(self.done):
            p = self._part_path(i)
            if not p.exists():
                raise ComputeError(
                    f"checkpoint manifest says {self.done} parts but {p} is "
                    "missing — the checkpoint directory was modified"
                )
            yield arrow_to_df(pq.read_table(p))

    def add_part(self, df) -> None:
        """Durably append one partial frame, then advance the manifest."""
        import pyarrow.parquet as pq

        path = self._part_path(self.done)
        tmp = path.with_suffix(".parquet.tmp")
        pq.write_table(df.to_arrow(), tmp, compression="zstd")
        _durable_replace(tmp, path)
        self.done += 1
        self._write_manifest()
