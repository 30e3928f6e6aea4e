"""Civil-calendar math on epoch integers (polars-time analogue).

Algorithms are the branch-free civil_from_days / days_from_civil recipes
(Howard Hinnant's public-domain date algorithms), fully vectorized on the VPU.
Reference semantics: polars-time/src/ + chrono conversions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def civil_from_days(days: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Epoch days -> (year, month, day), proleptic Gregorian."""
    z = days.astype(jnp.int64) + 719468
    era = jnp.floor_divide(jnp.where(z >= 0, z, z - 146096), 146097)
    doe = (z - era * 146097).astype(jnp.int64)  # [0, 146096]
    yoe = jnp.floor_divide(doe - jnp.floor_divide(doe, 1460) + jnp.floor_divide(doe, 36524) - jnp.floor_divide(doe, 146096), 365)
    y = yoe + era * 400
    doy = doe - (365 * yoe + jnp.floor_divide(yoe, 4) - jnp.floor_divide(yoe, 100))
    mp = jnp.floor_divide(5 * doy + 2, 153)
    d = doy - jnp.floor_divide(153 * mp + 2, 5) + 1
    m = mp + jnp.where(mp < 10, 3, -9)
    y = y + (m <= 2)
    return y.astype(jnp.int32), m.astype(jnp.int8), d.astype(jnp.int8)


def days_from_civil(y: jax.Array, m: jax.Array, d: jax.Array) -> jax.Array:
    """(year, month, day) -> epoch days."""
    y = y.astype(jnp.int64) - (m <= 2)
    m = m.astype(jnp.int64)
    d = d.astype(jnp.int64)
    era = jnp.floor_divide(jnp.where(y >= 0, y, y - 399), 400)
    yoe = y - era * 400
    mp = m + jnp.where(m > 2, -3, 9)
    doy = jnp.floor_divide(153 * mp + 2, 5) + d - 1
    doe = yoe * 365 + jnp.floor_divide(yoe, 4) - jnp.floor_divide(yoe, 100) + doy
    return (era * 146097 + doe - 719468).astype(jnp.int32)


def weekday_from_days(days: jax.Array) -> jax.Array:
    """ISO weekday (Mon=1..Sun=7) from epoch days (1970-01-01 was a Thursday)."""
    d = days.astype(jnp.int64) + 3  # shift so 0 -> Monday
    wd = jnp.mod(d, 7)
    return (wd + 1).astype(jnp.int8)


def ordinal_day(days: jax.Array) -> jax.Array:
    y, _, _ = civil_from_days(days)
    jan1 = days_from_civil(y.astype(jnp.int64), jnp.full_like(days, 1, jnp.int64), jnp.full_like(days, 1, jnp.int64))
    return (days - jan1 + 1).astype(jnp.int16)


def is_leap_year(y: jax.Array) -> jax.Array:
    y = y.astype(jnp.int64)
    return (jnp.mod(y, 4) == 0) & ((jnp.mod(y, 100) != 0) | (jnp.mod(y, 400) == 0))


def iso_week(days: jax.Array) -> jax.Array:
    """ISO-8601 week number."""
    wd = weekday_from_days(days).astype(jnp.int64)  # 1..7
    thursday = days.astype(jnp.int64) - wd + 4  # the Thursday of this ISO week
    y, _, _ = civil_from_days(thursday)
    jan1 = days_from_civil(y.astype(jnp.int64), jnp.ones_like(thursday), jnp.ones_like(thursday))
    return (jnp.floor_divide(thursday - jan1, 7) + 1).astype(jnp.int8)


def iso_year(days: jax.Array) -> jax.Array:
    wd = weekday_from_days(days).astype(jnp.int64)
    thursday = days.astype(jnp.int64) - wd + 4
    y, _, _ = civil_from_days(thursday)
    return y.astype(jnp.int32)


def days_in_month(y: jax.Array, m: jax.Array) -> jax.Array:
    m = m.astype(jnp.int32)
    base = jnp.asarray([0, 31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31], jnp.int32)[m]
    return jnp.where((m == 2) & is_leap_year(y), 29, base).astype(jnp.int8)
