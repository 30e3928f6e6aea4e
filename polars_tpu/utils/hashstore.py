"""Hashed-key string columns: device hash64 codes + spilled raw bytes.

The high-cardinality string strategy's second half (VERDICT r4 #5). The
dictionary design (utils/strtable.py) builds an O(uniques) host table at
ingest; for a column like PDS-H ``l_comment`` at SF10 (~tens of millions of
uniques) that construction dominates scan time and host memory. The
reference never globally orders such keys — it hashes raw bytes and
probes (polars-expr/src/hash_keys.rs:19-104). The TPU-native equivalent:

- device array = int64 hash of each row's bytes (pandas' vectorized
  SipHash-style hasher, fixed key — identical for ingest chunks, literals,
  and dictionary remaps, so equal bytes always produce equal codes);
- raw bytes spill to an Arrow IPC file in ROW ORDER, host memory O(1);
- group-by / join / ==-vs-literal run directly on the hashes (hash space IS
  the code space; a dictionary-coded operand maps in by hashing its table);
- order-sensitive ops (sort, min/max, str.*) DENSIFY first: the engine's
  pre-pass rebuilds an ordinary dictionary column from the spill file
  (leaf columns re-encode from the file with zero device traffic;
  transformed columns read their hashes back — engine/run.py);
- materialization resolves needed hashes by streaming the spill file, and
  raises on a detected 64-bit collision among materialized keys instead of
  returning silently merged groups (the host-side stand-in for the
  reference's byte-equality probe verification).

Collision odds: P(any collision among u uniques) ~ u^2/2^65; u = 6e7 gives
~1e-4 per column — large enough that detection matters, small enough that
fail-loud + re-run with ``POLARS_TPU_HASHED_STRINGS=0`` is an acceptable
recovery path. Every hash that reaches the user passes through
``resolve``, which performs the detection.
"""

from __future__ import annotations

import os
import tempfile
import weakref

import numpy as np

from polars_tpu.errors import ComputeError
from polars_tpu.utils import strtable

_HASH_KEY = "0123456789123456"  # fixed 16-byte key: hashes stable process-wide

_BATCH = 1 << 20

# Stores holding equality literals not yet verified against their payload
# (r5 review: a filter like col("s") == "x" compares 64-bit hashes and its
# boolean mask never passes through resolve — a row whose distinct string
# collides with hash("x") would be silently included). Registration happens
# at trace time (find / hash_of_table); verification at the first
# materialization choke point (DataFrame._prefetch_host -> verify_pending).
_PENDING_VERIFY: "weakref.WeakSet" = weakref.WeakSet()


def verify_pending() -> None:
    """Verify every store with unverified equality literals (no-op when
    there are none). Called from the materialization choke points."""
    while _PENDING_VERIFY:
        store = next(iter(_PENDING_VERIFY))
        _PENDING_VERIFY.discard(store)
        store.verify_literals()


def _hash_filled(filled: np.ndarray) -> np.ndarray:
    """int64 hash of an object array with no nulls (caller pre-filled)."""
    import pandas as pd

    h = pd.util.hash_pandas_object(
        pd.Series(filled, dtype=object), index=False, hash_key=_HASH_KEY,
        categorize=False,
    ).to_numpy()
    return h.view(np.int64)  # uint64 -> two's-complement int64 (CLAUDE.md #5)


def hash_values(arr: np.ndarray, valid: np.ndarray | None = None) -> np.ndarray:
    """int64 hash of an object array of str/bytes (nulls -> 0). Pass ``valid``
    when the caller already has the null mask (e.g. from Arrow) — deriving it
    here costs a vectorized pd.isna pass (r5 review: this used to be a
    per-row Python loop on the exact huge columns the feature targets)."""
    import pandas as pd

    obj = np.asarray(arr, dtype=object)
    if valid is None:
        valid = ~pd.isna(obj)
    if valid.all():
        return _hash_filled(obj)
    filled = np.where(valid, obj, "")
    return np.where(valid, _hash_filled(filled), np.int64(0))


class SpilledStrings:
    """Row-ordered raw string/bytes payload of a hashed-key column.

    Quacks just enough like :class:`strtable.StringTable` for the engine's
    table plumbing: identity-hashed (shared ident counter, so jit cache keys
    never collide with dictionary tables), ``find`` maps a literal into code
    (=hash) space, ``take`` materializes codes back to values. ``hashed`` is
    the discriminator every dictionary-only code path must check."""

    hashed = True
    sorted_order = False

    __slots__ = (
        "path", "length", "is_binary", "ident", "_cache", "_owned",
        "_ingest_buffer", "_literals", "_unverified", "__weakref__",
    )

    def __init__(self, path: str, length: int, is_binary: bool, *, owned: bool = True):
        self.path = path
        self.length = length
        self.is_binary = is_binary
        self.ident = next(strtable._NEXT_IDENT)
        self._cache: dict = {}
        self._owned = owned
        self._ingest_buffer = None  # weakref to the ingest-order Buffer
        self._literals: dict = {}  # hash -> literal awaiting/passed verify
        self._unverified = False

    def __del__(self):  # best-effort spill cleanup
        try:
            if self._owned and os.path.exists(self.path):
                os.unlink(self.path)
        except Exception:  # noqa: BLE001
            pass

    def __len__(self) -> int:
        # row count, NOT unique count: deliberately huge so size-directed
        # heuristics (dense group capacity, smaller-side dictionary remap)
        # steer AWAY from treating this as an enumerable dictionary
        return self.length

    def __repr__(self) -> str:
        return f"SpilledStrings(rows={self.length}, path={self.path!r})"

    def __hash__(self) -> int:
        return self.ident

    def __eq__(self, other: object) -> bool:
        return self is other

    # -- construction ---------------------------------------------------------

    @classmethod
    def from_arrow(cls, arr, *, is_binary: bool = False) -> tuple[np.ndarray, np.ndarray | None, "SpilledStrings"]:
        """Spill an arrow string/binary array; returns (hashes[int64],
        validity or None, store). Streams in batches: peak host memory is
        one batch of python objects, never the whole column."""
        import pyarrow as pa
        import pyarrow.ipc as ipc

        from polars_tpu.config import config

        spill_dir = getattr(config(), "ooc_dir", None) or tempfile.gettempdir()
        os.makedirs(spill_dir, exist_ok=True)
        fd, path = tempfile.mkstemp(prefix="pt_hashstr_", suffix=".arrow", dir=spill_dir)
        os.close(fd)
        typ = pa.large_binary() if is_binary else pa.large_string()
        arr = arr.cast(typ)
        n = len(arr)
        hashes = np.empty(n, np.int64)
        any_null = arr.null_count > 0
        validity = np.ones(n, bool) if any_null else None
        schema = pa.schema([("v", typ)])
        with ipc.new_file(path, schema) as w:
            for start in range(0, max(n, 1), _BATCH):
                chunk = arr.slice(start, _BATCH)
                if len(chunk) == 0:
                    continue
                w.write_batch(pa.record_batch([chunk], schema=schema))
                vals = chunk.to_numpy(zero_copy_only=False)
                # reuse Arrow's validity instead of re-deriving it per row
                v = np.asarray(chunk.is_valid()) if chunk.null_count else None
                hashes[start:start + len(chunk)] = hash_values(vals, v)
                if any_null:
                    validity[start:start + len(chunk)] = (
                        v if v is not None else True
                    )
        return hashes, validity, cls(path, n, is_binary)

    # -- engine interface -----------------------------------------------------

    def find(self, value) -> int:
        """Literal -> code space (= its hash). Unlike StringTable.find this
        never returns -1-for-absent: an absent literal's hash simply matches
        no row, which compares the same way. The literal is registered for a
        collision check at materialization (module note on _PENDING_VERIFY)."""
        h = int(hash_values(np.asarray([value], object))[0])
        self.register_literals(np.asarray([h], np.int64), [value])
        return h

    def hash_of_table(self, table: "strtable.StringTable") -> np.ndarray:
        """Map a dictionary table's values into this column's code space.
        Registers the values for a collision check at materialization."""
        if len(table) == 0:
            return np.zeros(1, np.int64)
        hs = hash_values(table.values)
        self.register_literals(hs, list(table.values))
        return hs

    def register_literals(self, hashes: np.ndarray, values: list) -> None:
        """Record host-known values compared against this column in hash
        space; :meth:`verify_literals` later proves no payload string
        collides with any of them."""
        fresh = False
        for h, v in zip(np.asarray(hashes, np.int64).tolist(), values):
            if v is None:
                continue
            prev = self._literals.get(h)
            if prev is None:
                self._literals[h] = v
                fresh = True
            elif prev != v:
                raise ComputeError(
                    "64-bit hash collision between comparison operands "
                    f"{prev!r} and {v!r} — re-run with "
                    "POLARS_TPU_HASHED_STRINGS=0"
                )
        if fresh:
            self._unverified = True
            _PENDING_VERIFY.add(self)

    def verify_literals(self) -> None:
        """Scan the payload for rows whose hash matches a registered literal
        but whose bytes differ (the only way a hash-space equality mask can
        be wrong); raise instead of returning silently wrong rows."""
        if not self._unverified:
            return
        self._unverified = False
        # resolve() performs exactly the needed scan: any payload value whose
        # hash matches a cached/registered entry but differs raises. Seed the
        # cache with the literals so the cross-check covers them, then make
        # resolve scan those hashes by asking for them as "needed".
        need = np.fromiter(self._literals, np.int64, len(self._literals))
        saved = {h: self._cache.pop(h) for h in list(self._cache)
                 if h in self._literals}
        try:
            got = dict(self.resolve(need))
        finally:
            for h, v in saved.items():
                self._cache.setdefault(h, v)
        for h, lit in self._literals.items():
            found = got.get(h)
            if found is not None and found != lit:
                raise ComputeError(
                    "64-bit hash collision between string key "
                    f"{found!r} and comparison literal {lit!r} — re-run "
                    "with POLARS_TPU_HASHED_STRINGS=0"
                )

    def resolve(self, needed: np.ndarray) -> dict:
        """hash -> value for the needed set, streaming the spill file.

        Detects 64-bit collisions among the needed hashes: if one needed
        hash maps to two distinct byte values anywhere in the file, the
        query fails loudly instead of returning merged groups."""
        want = set(int(h) for h in np.asarray(needed, np.int64).tolist())
        want.difference_update(self._cache.keys())
        if not want:
            return self._cache
        import pyarrow.ipc as ipc

        want_arr = np.fromiter(want, np.int64, len(want))
        want_arr.sort()
        with ipc.open_file(self.path) as r:
            for bi in range(r.num_record_batches):
                batch = r.get_batch(bi)
                col = batch.column(0)
                vals = col.to_numpy(zero_copy_only=False)
                v = np.asarray(col.is_valid()) if col.null_count else None
                hs = hash_values(vals, v)
                # vectorized membership; the Python loop below only walks
                # MATCHED rows (r5 review: this was a per-row zip over the
                # whole file on every materialization)
                hit = np.isin(hs, want_arr, assume_unique=False)
                if v is not None:
                    hit &= v
                for i in np.flatnonzero(hit).tolist():
                    h, val = int(hs[i]), vals[i]
                    prev = self._cache.get(h, val)
                    if prev is not val and prev != val:
                        raise ComputeError(
                            "64-bit hash collision between string keys "
                            f"{prev!r} and {val!r} — re-run with "
                            "POLARS_TPU_HASHED_STRINGS=0 (dictionary "
                            "encoding) for this dataset"
                        )
                    self._cache[h] = val
        return self._cache

    def take(self, codes: np.ndarray) -> np.ndarray:
        """Materialize hash codes -> values (None for code rows < 0, which
        callers use for invalid entries)."""
        self.verify_literals()
        codes = np.asarray(codes, np.int64)
        lut = self.resolve(codes[codes != -1] if codes.size else codes)
        out = np.empty(len(codes), dtype=object)
        for i, h in enumerate(codes.tolist()):
            out[i] = None if h == -1 else lut.get(h)
        return out

    def values_for_rows(self):
        """Stream (values, validity) batches in ingest row order (densify)."""
        import pyarrow.ipc as ipc

        with ipc.open_file(self.path) as r:
            for bi in range(r.num_record_batches):
                batch = r.get_batch(bi)
                col = batch.column(0)
                yield (
                    col.to_numpy(zero_copy_only=False),
                    np.asarray(col.is_valid()),
                )


class UnionSpilledStrings:
    """Hashed-code table spanning several payload sources (concat of hashed
    columns, or hashed + dictionary columns mapped into hash space). Members
    are SpilledStrings / UnionSpilledStrings / StringTable; resolution fans
    out and cross-checks collisions between members."""

    hashed = True
    sorted_order = False

    __slots__ = (
        "members", "length", "ident", "_cache", "_ingest_buffer",
        "__weakref__",
    )

    def __init__(self, members):
        flat = []
        for m in members:
            if isinstance(m, UnionSpilledStrings):
                flat.extend(m.members)
            elif not any(x is m for x in flat):
                flat.append(m)
        # dedup identical members while preserving order
        seen, uniq = set(), []
        for m in flat:
            if id(m) not in seen:
                seen.add(id(m))
                uniq.append(m)
        self.members = uniq
        self.length = sum(len(m) for m in uniq)
        self.ident = next(strtable._NEXT_IDENT)
        self._cache: dict = {}
        self._ingest_buffer = None

    def __len__(self) -> int:
        return self.length

    def __hash__(self) -> int:
        return self.ident

    def __eq__(self, other: object) -> bool:
        return self is other

    def __repr__(self) -> str:
        return f"UnionSpilledStrings({len(self.members)} members, rows={self.length})"

    def find(self, value) -> int:
        h = int(hash_values(np.asarray([value], object))[0])
        self.register_literals(np.asarray([h], np.int64), [value])
        return h

    def hash_of_table(self, table) -> np.ndarray:
        if len(table) == 0:
            return np.zeros(1, np.int64)
        hs = hash_values(table.values)
        self.register_literals(hs, list(table.values))
        return hs

    def register_literals(self, hashes: np.ndarray, values: list) -> None:
        """Fan literal registration out to members. Dictionary members are
        verified immediately (their values are host-resident); spilled
        members defer to their own materialization-time scan."""
        hs = np.asarray(hashes, np.int64)
        for m in self.members:
            if isinstance(m, (SpilledStrings, UnionSpilledStrings)):
                m.register_literals(hs, values)
            else:  # StringTable: cheap host-side check right now
                mv = np.asarray(m.values, object)
                if not len(mv):
                    continue
                mh = hash_values(mv)
                hit = np.isin(mh, hs)
                lut = {h: v for h, v in zip(hs.tolist(), values)
                       if v is not None}
                for i in np.flatnonzero(hit).tolist():
                    lit = lut.get(int(mh[i]))
                    if lit is not None and lit != mv[i]:
                        raise ComputeError(
                            "64-bit hash collision between string key "
                            f"{mv[i]!r} and comparison literal {lit!r} — "
                            "re-run with POLARS_TPU_HASHED_STRINGS=0"
                        )

    def verify_literals(self) -> None:
        for m in self.members:
            if isinstance(m, (SpilledStrings, UnionSpilledStrings)):
                m.verify_literals()

    def resolve(self, needed: np.ndarray) -> dict:
        need = np.asarray(needed, np.int64)
        for m in self.members:
            if isinstance(m, (SpilledStrings, UnionSpilledStrings)):
                part = m.resolve(need)
            else:  # StringTable: small, hash its values directly
                vals = np.asarray(m.values, object)
                part = dict(zip(hash_values(vals).tolist(), vals.tolist()))
            for h, v in part.items():
                prev = self._cache.get(h, v)
                if prev is not v and prev != v:
                    raise ComputeError(
                        "64-bit hash collision between string keys "
                        f"{prev!r} and {v!r} across concatenated columns — "
                        "re-run with POLARS_TPU_HASHED_STRINGS=0"
                    )
                self._cache[h] = v
        return self._cache

    def take(self, codes: np.ndarray) -> np.ndarray:
        self.verify_literals()
        codes = np.asarray(codes, np.int64)
        lut = self.resolve(codes[codes != -1] if codes.size else codes)
        out = np.empty(len(codes), dtype=object)
        for i, h in enumerate(codes.tolist()):
            out[i] = None if h == -1 else lut.get(h)
        return out


def want_hashed(arr, threshold_rows: int) -> bool:
    """Auto-detection: a long column whose leading sample is mostly unique.
    Parquet's own signal agrees — writers fall back from dictionary to plain
    pages exactly when the dictionary grows too large."""
    import pyarrow.compute as pc

    n = len(arr)
    if threshold_rows <= 0 or n < threshold_rows:
        return False
    sample = arr.slice(0, min(n, 65536))
    try:
        uniq = pc.count_distinct(sample).as_py()
    except Exception:  # noqa: BLE001
        return False
    return uniq > 0.5 * len(sample)
