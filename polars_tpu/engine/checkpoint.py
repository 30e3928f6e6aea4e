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

Layout of a checkpoint directory::

    manifest.json           {format, version, fingerprint, batch_rows, done}
    part_00000.parquet      partial frame of batch 0 (zstd parquet)
    part_00001.parquet      ...

Every write is atomic (tmp + rename); the manifest's ``done`` count advances
only after its part file is durable, so a crash mid-write never corrupts the
checkpoint — at worst the last in-flight batch re-runs. The fingerprint binds
the checkpoint to (serialized plan, batch size, engine version): resuming
with a different query or batch size raises instead of silently mixing
partials from two different computations.

In a multi-host run each process passes its own directory (e.g.
``f"{root}/proc{jax.process_index()}"``) — scan-work assignment is
deterministic per process (parallel/multihost.assign_files), so per-host
checkpoints compose exactly like per-host scans do.
"""

from __future__ import annotations

import hashlib
import json
import os
from pathlib import Path

from polars_tpu.errors import ComputeError

_FORMAT = "polars_tpu_stream_checkpoint"
_VERSION = 1


def plan_fingerprint(node, batch_rows: int) -> str:
    """Stable identity of (plan, batch size) for checkpoint validation.

    Uses the versioned plan serializer when the plan is serializable (scans,
    expressions); plans embedding unserializable state (UDFs) fall back to
    their repr, which is stable within a process but may not survive a
    restart — good enough to catch accidental cross-query reuse."""
    from polars_tpu.plan.serialize import serialize_plan

    try:
        blob = serialize_plan(node)
    except Exception:  # noqa: BLE001 — UDFs etc.: best-effort identity
        blob = repr(node)
    h = hashlib.sha256()
    h.update(blob.encode())
    h.update(f"|batch_rows={batch_rows}|v={_VERSION}".encode())
    return h.hexdigest()[:32]


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
                    f"checkpoint at {self.dir} belongs to a different query "
                    f"or batch size (stored fingerprint {m.get('fingerprint')!r}"
                    f" != {fingerprint!r}); point at a fresh directory or "
                    "delete the stale checkpoint"
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
        os.replace(tmp, self._manifest_path())

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
        os.replace(tmp, path)
        self.done += 1
        self._write_manifest()
