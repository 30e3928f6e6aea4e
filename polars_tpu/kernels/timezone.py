"""Timezone math for tz-aware Datetime columns.

TPU-first design: timestamps are stored as UTC instants (reference:
polars-core datetime chunked arrays store UTC; crates/polars-time/src/utils.rs
localize/unlocalize). Offset lookup is a `searchsorted` over the zone's DST
transition table, built ONCE on the host from `zoneinfo` and baked into the
trace as a static constant — the device op is a single vectorized gather, no
per-element host callbacks.

`zoneinfo` exposes no transition list, so we recover it by walking the
1884..2100 range in 20-day steps and bisecting each offset change to the
second. The result is cached per zone name.
"""

from __future__ import annotations

import functools
from datetime import datetime, timedelta, timezone

import jax.numpy as jnp
import numpy as np

from polars_tpu.errors import ComputeError

_US = 1_000_000
_TU_US = {"ms": 1_000, "us": 1_000_000, "ns": 1_000_000_000}


def _off_us(tz, epoch_s: int) -> int:
    d = datetime.fromtimestamp(epoch_s, tz=timezone.utc).astimezone(tz)
    return int(d.utcoffset().total_seconds() * _US)


def _dst_us(tz, epoch_s: int) -> int:
    d = datetime.fromtimestamp(epoch_s, tz=timezone.utc).astimezone(tz)
    dst = d.dst()
    return 0 if dst is None else int(dst.total_seconds() * _US)


@functools.lru_cache(maxsize=64)
def tz_table(tz_name: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(transition_utc_us, total_offset_us, dst_offset_us) — row i applies to
    instants in [transition[i], transition[i+1])."""
    try:
        from zoneinfo import ZoneInfo

        tz = ZoneInfo(tz_name)
    except Exception as exc:  # noqa: BLE001
        raise ComputeError(f"unable to parse time zone: {tz_name!r}") from exc

    lo = int(datetime(1884, 1, 1, tzinfo=timezone.utc).timestamp())
    hi = int(datetime(2100, 1, 1, tzinfo=timezone.utc).timestamp())
    step = 20 * 86_400
    instants = [lo]
    offsets = [_off_us(tz, lo)]
    dsts = [_dst_us(tz, lo)]
    t = lo
    while t < hi:
        t2 = min(t + step, hi)
        if _off_us(tz, t2) != _off_us(tz, t) or _dst_us(tz, t2) != _dst_us(tz, t):
            a, b = t, t2
            while b - a > 1:
                m = (a + b) // 2
                if _off_us(tz, m) == _off_us(tz, a) and _dst_us(tz, m) == _dst_us(tz, a):
                    a = m
                else:
                    b = m
            instants.append(b)
            offsets.append(_off_us(tz, b))
            dsts.append(_dst_us(tz, b))
        t = t2
    return (
        np.asarray(instants, np.int64) * _US,
        np.asarray(offsets, np.int64),
        np.asarray(dsts, np.int64),
    )


def _scaled_tables(tz_name: str, time_unit: str):
    trans, offs, dsts = tz_table(tz_name)
    scale = _TU_US[time_unit]
    if scale >= _US:
        k = scale // _US
        return trans * k, offs * k, dsts * k
    k = _US // scale
    return trans // k, offs // k, dsts // k


def utc_offset(values: jnp.ndarray, time_unit: str, tz_name: str) -> jnp.ndarray:
    """Total UTC offset (in the column's time unit) at each UTC instant."""
    trans, offs, _ = _scaled_tables(tz_name, time_unit)
    idx = jnp.searchsorted(jnp.asarray(trans), values, side="right") - 1
    return jnp.asarray(offs)[jnp.clip(idx, 0, len(offs) - 1)]


def dst_offset(values: jnp.ndarray, time_unit: str, tz_name: str) -> jnp.ndarray:
    trans, _, dsts = _scaled_tables(tz_name, time_unit)
    idx = jnp.searchsorted(jnp.asarray(trans), values, side="right") - 1
    return jnp.asarray(dsts)[jnp.clip(idx, 0, len(dsts) - 1)]


def local_from_utc(values: jnp.ndarray, time_unit: str, tz_name: str) -> jnp.ndarray:
    """UTC instants -> local wall-clock values (same epoch encoding)."""
    return values + utc_offset(values, time_unit, tz_name)


def utc_from_local(
    values: jnp.ndarray, time_unit: str, tz_name: str, ambiguous: str = "raise"
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Local wall-clock values -> UTC instants.

    Returns (utc, is_ambiguous, is_nonexistent). DST-ambiguous wall times
    resolve per `ambiguous` ('earliest' | 'latest' | 'raise' — the caller
    turns the flag into an error for 'raise'); nonexistent (spring-forward
    gap) times shift forward by the gap, flagged (reference:
    polars-time replace_time_zone / NonExistent::Raise).
    """
    trans, offs, _ = _scaled_tables(tz_name, time_unit)
    trans_j = jnp.asarray(trans)
    offs_j = jnp.asarray(offs)
    # interval i covers local wall times starting at trans[i] + offs[i]
    local_starts = trans_j + offs_j
    # candidate A: interpret with the offset of the interval the wall time
    # falls in when scanning local_starts (post-transition offsets)
    ia = jnp.clip(jnp.searchsorted(local_starts, values, side="right") - 1, 0, len(offs) - 1)
    off_a = offs_j[ia]
    utc_a = values - off_a
    # candidate B: previous interval's offset (pre-transition)
    ib = jnp.clip(ia - 1, 0, len(offs) - 1)
    off_b = offs_j[ib]
    utc_b = values - off_b
    # a candidate is valid if its UTC instant maps back into its interval
    valid_a = (utc_a >= trans_j[ia]) & (
        utc_a < jnp.where(ia + 1 < len(trans), trans_j[jnp.minimum(ia + 1, len(trans) - 1)], jnp.int64(2**62))
    )
    next_b = trans_j[jnp.minimum(ib + 1, len(trans) - 1)]
    valid_b = (ia != ib) & (utc_b >= trans_j[ib]) & (utc_b < next_b)
    is_ambiguous = valid_a & valid_b
    is_nonexistent = ~valid_a & ~valid_b
    if ambiguous == "latest":
        # the later UTC instant (post-transition offset = candidate A)
        out = jnp.where(valid_a, utc_a, utc_b)
    else:  # earliest / raise
        out = jnp.where(valid_b, utc_b, utc_a)
    # nonexistent: shift into the following interval (flagged for 'raise')
    out = jnp.where(is_nonexistent, utc_a, out)
    return out, is_ambiguous, is_nonexistent
