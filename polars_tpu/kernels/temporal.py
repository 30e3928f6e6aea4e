"""Civil-calendar math on epoch integers (polars-time analogue).

Algorithms are the branch-free civil_from_days / days_from_civil recipes
(Howard Hinnant's public-domain date algorithms), fully vectorized on the VPU.
Reference semantics: polars-time/src/ + chrono conversions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from polars_tpu.kernels.fastmath import div_any, floordiv_any, mod_any


def civil_from_days(days: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Epoch days -> (year, month, day), proleptic Gregorian."""
    z = days.astype(jnp.int64) + 719468
    era = floordiv_any(jnp.where(z >= 0, z, z - 146096), 146097)
    doe = (z - era * 146097).astype(jnp.int64)  # [0, 146096]
    yoe = floordiv_any(doe - floordiv_any(doe, 1460) + floordiv_any(doe, 36524) - floordiv_any(doe, 146096), 365)
    y = yoe + era * 400
    doy = doe - (365 * yoe + floordiv_any(yoe, 4) - floordiv_any(yoe, 100))
    mp = floordiv_any(5 * doy + 2, 153)
    d = doy - floordiv_any(153 * mp + 2, 5) + 1
    m = mp + jnp.where(mp < 10, 3, -9)
    y = y + (m <= 2)
    return y.astype(jnp.int32), m.astype(jnp.int8), d.astype(jnp.int8)


def days_from_civil(y: jax.Array, m: jax.Array, d: jax.Array) -> jax.Array:
    """(year, month, day) -> epoch days."""
    y = y.astype(jnp.int64) - (m <= 2)
    m = m.astype(jnp.int64)
    d = d.astype(jnp.int64)
    era = floordiv_any(jnp.where(y >= 0, y, y - 399), 400)
    yoe = y - era * 400
    mp = m + jnp.where(m > 2, -3, 9)
    doy = floordiv_any(153 * mp + 2, 5) + d - 1
    doe = yoe * 365 + floordiv_any(yoe, 4) - floordiv_any(yoe, 100) + doy
    return (era * 146097 + doe - 719468).astype(jnp.int32)


def weekday_from_days(days: jax.Array) -> jax.Array:
    """ISO weekday (Mon=1..Sun=7) from epoch days (1970-01-01 was a Thursday)."""
    d = days.astype(jnp.int64) + 3  # shift so 0 -> Monday
    wd = mod_any(d, 7)
    return (wd + 1).astype(jnp.int8)


def ordinal_day(days: jax.Array) -> jax.Array:
    y, _, _ = civil_from_days(days)
    jan1 = days_from_civil(y.astype(jnp.int64), jnp.full_like(days, 1, jnp.int64), jnp.full_like(days, 1, jnp.int64))
    return (days - jan1 + 1).astype(jnp.int16)


def is_leap_year(y: jax.Array) -> jax.Array:
    y = y.astype(jnp.int64)
    return (mod_any(y, 4) == 0) & ((mod_any(y, 100) != 0) | (mod_any(y, 400) == 0))


def iso_week(days: jax.Array) -> jax.Array:
    """ISO-8601 week number."""
    wd = weekday_from_days(days).astype(jnp.int64)  # 1..7
    thursday = days.astype(jnp.int64) - wd + 4  # the Thursday of this ISO week
    y, _, _ = civil_from_days(thursday)
    jan1 = days_from_civil(y.astype(jnp.int64), jnp.ones_like(thursday), jnp.ones_like(thursday))
    return (floordiv_any(thursday - jan1, 7) + 1).astype(jnp.int8)


def iso_year(days: jax.Array) -> jax.Array:
    wd = weekday_from_days(days).astype(jnp.int64)
    thursday = days.astype(jnp.int64) - wd + 4
    y, _, _ = civil_from_days(thursday)
    return y.astype(jnp.int32)


def days_in_month(y: jax.Array, m: jax.Array) -> jax.Array:
    m = m.astype(jnp.int32)
    base = jnp.asarray([0, 31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31], jnp.int32)[m]
    return jnp.where((m == 2) & is_leap_year(y), 29, base).astype(jnp.int8)
