"""Multi-host execution: jax.distributed control plane + scan-work assignment.

The reference is single-process; its multi-node story is the closed Polars
Cloud (OSS hooks: the versioned plan serializer, polars-plan/src/client/
mod.rs:7-23). The TPU-native equivalent needs two pieces (SURVEY §2.13):

1. a runtime control plane — ``jax.distributed.initialize`` brings every host
   into one JAX runtime so a global Mesh spans all slices; collectives then
   ride ICI within a slice and DCN across slices with no engine changes
   (engine/spmd.py traces the same shard_map program either way);
2. deterministic scan-work assignment — each host reads only its slice of the
   file set (the role MultiScan's pre-init scheduler plays in-process,
   polars-stream/src/nodes/io_sources/multi_scan/mod.rs:31), then ingests rows
   into the host-local shards of the global mesh.

Single-host processes (the common case, and the only one testable here) pass
through untouched: ``init_multihost()`` is a no-op when no coordinator is
configured, and ``assign_files(files, 1, 0)`` returns everything.
"""

from __future__ import annotations

import os

from polars_tpu.errors import ComputeError

_initialized = False


def init_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Join this process to a multi-host JAX runtime.

    Arguments default from the standard env vars (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID, or their POLARS_TPU_* aliases).
    Returns True when a distributed runtime was initialized; False for the
    single-process fall-through. Safe to call more than once."""
    global _initialized
    if _initialized:
        return True
    coord = coordinator_address or os.environ.get(
        "POLARS_TPU_COORDINATOR", os.environ.get("JAX_COORDINATOR_ADDRESS")
    )
    if not coord:
        return False
    import jax

    nproc = num_processes if num_processes is not None else int(
        os.environ.get("POLARS_TPU_NUM_PROCESSES", os.environ.get("JAX_NUM_PROCESSES", "0"))
    )
    pid = process_id if process_id is not None else int(
        os.environ.get("POLARS_TPU_PROCESS_ID", os.environ.get("JAX_PROCESS_ID", "0"))
    )
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=nproc or None,
        process_id=pid,
    )
    _initialized = True
    return True


def process_info() -> tuple[int, int]:
    """(process_id, num_processes) for the current runtime."""
    import jax

    return jax.process_index(), jax.process_count()


def assign_files(files: list[str], num_processes: int, process_id: int) -> list[str]:
    """Deterministic, balanced scan-work assignment: file i -> process
    i % num_processes over the SORTED file list, so every host computes the
    identical global assignment without communication (the consistent
    HashPartitioner property, polars-utils/src/hashing.rs:72-99)."""
    if num_processes <= 1:
        return list(files)
    if not (0 <= process_id < num_processes):
        raise ComputeError(
            f"process_id {process_id} out of range for {num_processes} processes"
        )
    ordered = sorted(files)
    return [f for i, f in enumerate(ordered) if i % num_processes == process_id]


def checked_barrier(tag: str = "polars_tpu", timeout_s: float = 120.0) -> None:
    """All-host barrier with failure DETECTION (SURVEY §5 aux).

    SPMD collectives are lockstep: when one host dies mid-query, every other
    host blocks forever inside its next collective — there is no NCCL-style
    abort on this runtime. The detection primitive is therefore a watchdog
    around the coordinator's global sync: if any host fails to arrive within
    ``timeout_s``, raise a ComputeError naming the recovery procedure
    (restart the job; streamed queries resume completed batches from
    ``checkpoint_dir`` — engine/checkpoint.py manifests are keyed by plan
    fingerprint, so every host re-derives the same skip set).

    Single-process runtimes return immediately. The timed-out waiter thread
    is daemonic: the caller is expected to terminate (the only sound state
    after a lost peer — partial collectives cannot be cancelled).

    Reference analogue: the reference is single-process; its distributed
    offering health-checks via the closed Polars Cloud control plane
    (polars-plan/src/client/mod.rs submits plans, the service owns retries).
    """
    import jax

    if jax.process_count() <= 1:
        return
    import threading

    done = threading.Event()
    err: list = []

    def wait():
        try:
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices(tag)
        except Exception as e:  # noqa: BLE001
            err.append(e)
        finally:
            done.set()

    t = threading.Thread(target=wait, daemon=True)
    t.start()
    if not done.wait(timeout_s):
        raise ComputeError(
            f"multihost barrier {tag!r} timed out after {timeout_s:.0f}s — "
            "a host is unreachable or wedged. Restart the job; streaming "
            "queries with checkpoint_dir= resume completed batches "
            "(engine/checkpoint.py), in-memory queries recompute."
        )
    if err:
        raise ComputeError(f"multihost barrier {tag!r} failed: {err[0]}")


def local_shard_bounds(n_rows: int, num_processes: int, process_id: int) -> tuple[int, int]:
    """[start, stop) row range this host ingests of an n_rows table that is
    row-sharded contiguously across processes (remainder rows go to the
    leading processes, keeping shard sizes within 1 of each other)."""
    base, rem = divmod(n_rows, num_processes)
    start = process_id * base + min(process_id, rem)
    stop = start + base + (1 if process_id < rem else 0)
    return start, stop
