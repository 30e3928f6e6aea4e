"""Process-wide configuration.

Mirrors the reference's env-var config singleton (polars-config/src/lib.rs:17-120)
plus the user-facing ``pl.Config`` context manager (py-polars config.py:153).
"""

from __future__ import annotations

import contextlib
import os
from typing import Any


def _env_int(name: str, default: int) -> int:
    try:
        return int(os.environ.get(name, default))
    except ValueError:
        return default


def _env_bool(name: str, default: bool = False) -> bool:
    v = os.environ.get(name)
    if v is None:
        return default
    return v not in ("0", "false", "False", "")


class _GlobalConfig:
    """Engine tuning knobs, read from POLARS_* env vars at first use."""

    def __init__(self) -> None:
        self.reload_env_vars()

    def reload_env_vars(self) -> None:
        # Reference default: POLARS_IDEAL_MORSEL_SIZE = 100_000 (lib.rs:34-36).
        # On TPU the analogous unit is the device batch the streaming scan feeds
        # per step; bigger is better for XLA, default 2**20 rows.
        self.ideal_batch_size: int = _env_int("POLARS_TPU_BATCH_SIZE", 1 << 20)
        self.verbose: bool = _env_bool("POLARS_VERBOSE")
        self.track_metrics: bool = _env_bool("POLARS_TRACK_METRICS")
        # Sanitizer (utils/sanitize.py): 1 = host-metadata invariant checks on
        # every frame construction; 2 = + device-data checks (readbacks —
        # CPU/test use only, see CLAUDE.md §1)
        self.debug: int = _env_int("POLARS_TPU_DEBUG", 0)
        # Hash-aggregate table sizing (reference hot table = 4096 entries)
        self.hot_table_size: int = _env_int("POLARS_TPU_HOT_TABLE_SIZE", 4096)
        # Default max unique groups before falling back to sort-based group-by
        self.max_hash_groups: int = _env_int("POLARS_TPU_MAX_HASH_GROUPS", 1 << 22)
        # String dictionaries at or below this size are ordinalized (host
        # sort: code order == lex order) at ingest; larger ones keep their
        # insertion order and ordinalize lazily only when an order-sensitive
        # op touches them (reference analogue: hash_keys.rs — raw hash keys
        # for high-cardinality strings, no global sorted registry)
        self.ordinal_dict_max: int = _env_int("POLARS_TPU_ORDINAL_DICT_MAX", 1 << 16)
        # Hashed-key strings (utils/hashstore.py): columns with at least this
        # many rows AND a mostly-unique sample ingest as device hash64 codes
        # + row-ordered spill file instead of building an O(uniques) host
        # dictionary (reference: hash_keys.rs raw-hash string keys). 0
        # disables; POLARS_TPU_HASHED_STRINGS=0 is the documented collision
        # recovery switch.
        self.hashed_strings_min_rows: int = _env_int(
            "POLARS_TPU_HASHED_STRINGS",
            _env_int("POLARS_TPU_HASHED_STRINGS_MIN_ROWS", 1 << 22),
        )
        # Force engine: "", "xla", "interpret"
        self.engine_affinity: str = os.environ.get("POLARS_ENGINE_AFFINITY", "")
        # Number of partitions for distributed shuffle ops (0 = #devices)
        self.shuffle_partitions: int = _env_int("POLARS_TPU_SHUFFLE_PARTITIONS", 0)
        # SPMD joins: build sides at or below this many padded global rows are
        # broadcast (all_gather) instead of hash-shuffled
        self.broadcast_join_rows: int = _env_int("POLARS_TPU_BROADCAST_JOIN_ROWS", 1 << 21)
        # engine="auto" memory router (SURVEY 2.12): plans whose estimated
        # working set exceeds this many bytes route through the streaming
        # engine (OOC spill) instead of the in-memory engine. 0 = route by
        # device: 12 GB on a real accelerator (v5e HBM 16 GB minus fusion
        # headroom), disabled on CPU (tests pin engines explicitly).
        self.memory_budget: int = _env_int("POLARS_TPU_MEMORY_BUDGET", 0)
        # Formatting
        self.fmt_max_rows: int = _env_int("POLARS_FMT_MAX_ROWS", 10)
        self.fmt_max_cols: int = _env_int("POLARS_FMT_MAX_COLS", 8)
        self.fmt_str_len: int = _env_int("POLARS_FMT_STR_LEN", 30)


_config = _GlobalConfig()


def config() -> _GlobalConfig:
    return _config


def verbose() -> bool:
    return _config.verbose


class Config(contextlib.ContextDecorator):
    """User-facing config context manager (subset of py-polars ``pl.Config``)."""

    def __init__(self, **options: Any) -> None:
        self._saved: dict[str, Any] = {}
        self._options = options
        for k, v in options.items():
            setter = getattr(self, f"set_{k}", None)
            if setter is None:
                from polars_tpu.errors import InvalidOperationError

                raise InvalidOperationError(f"unknown Config option {k!r}")
            setter(v)

    def __enter__(self) -> Config:
        return self

    def __exit__(self, *exc: object) -> None:
        self.restore_defaults()

    # -- setters ----------------------------------------------------------
    @classmethod
    def set_tbl_rows(cls, n: int) -> type[Config]:
        _config.fmt_max_rows = n
        return cls

    @classmethod
    def set_tbl_cols(cls, n: int) -> type[Config]:
        _config.fmt_max_cols = n
        return cls

    @classmethod
    def set_fmt_str_lengths(cls, n: int) -> type[Config]:
        _config.fmt_str_len = n
        return cls

    @classmethod
    def set_verbose(cls, active: bool = True) -> type[Config]:
        _config.verbose = active
        return cls

    @classmethod
    def restore_defaults(cls) -> type[Config]:
        _config.reload_env_vars()
        return cls
