"""Division-free f64/i64 arithmetic (escape hatch; native ops by default).

Round-1 probing attributed a permanent ~25ms-per-dispatch degradation to
hardware division on this TPU backend; deeper probing traced the real cause
to device->host readback (see CLAUDE.md), and native division is clean. The
division-free implementations here — ``div64`` (magic-constant reciprocal
seed + Newton + Dekker-compensated quotient correction, bit-exact IEEE on
random testing), ``floordiv64``/``mod64`` (f64 reciprocal + exact integer
residual refinement, exact on the full i64 range) — are retained behind
POLARS_TPU_SOFT_DIV=1, and the ``*_any``/``*_const`` dispatchers below are
the engine-wide division entry points either way.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_MAGIC = 0x7EF311C3  # 2 * 0x3F800000 + tuning: reciprocal seed


def _recip_seed(a32: jax.Array) -> jax.Array:
    """~3%-accurate reciprocal of positive finite f32 via bit manipulation."""
    bits = jax.lax.bitcast_convert_type(a32, jnp.int32)
    return jax.lax.bitcast_convert_type(_MAGIC - bits, jnp.float32)


def _signbit64(y: jax.Array) -> jax.Array:
    """Sign bit of f64 (incl. -0.0) without ``jnp.signbit`` — its f64 lowering
    bitcasts through s64, unimplemented on this backend's x64 rewriter. The
    f64->f32 cast preserves the sign of zero; 32-bit bitcasts are supported."""
    return jax.lax.bitcast_convert_type(y.astype(jnp.float32), jnp.int32) < 0


def recip64(y: jax.Array) -> jax.Array:
    """1/y for f64 y without a division op."""
    a = jnp.abs(y)
    # clamp into f32 range for the seed; Newton runs in f64 on the true value
    a32 = jnp.clip(a, 1e-38, 1e38).astype(jnp.float32)
    r = _recip_seed(a32).astype(jnp.float64)
    for _ in range(4):
        r = r * (2.0 - a * r)
    neg = _signbit64(y)
    r = jnp.where(neg, -r, r)
    # IEEE edges
    r = jnp.where(y == 0, jnp.where(neg, -jnp.inf, jnp.inf), r)
    r = jnp.where(jnp.isinf(y), jnp.where(y > 0, 0.0, -0.0), r)
    r = jnp.where(jnp.isnan(y), jnp.nan, r)
    return r


def _on_tpu() -> bool:
    """Round-1 probing blamed hardware division for a permanent dispatch
    degradation; the real trigger turned out to be device->host readback (see
    CLAUDE.md), and native division is clean. The division-free
    implementations below are kept (they are exact and validated) behind
    POLARS_TPU_SOFT_DIV=1 as an escape hatch; by default all dispatchers use
    native ops on every backend."""
    import os

    return jax.default_backend() == "tpu" and bool(os.environ.get("POLARS_TPU_SOFT_DIV"))


def _twoprod(a: jax.Array, b: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Dekker exact product: returns (fl(a*b), error) with a*b == p + e."""
    p = a * b
    C = 134217729.0  # 2^27 + 1 splitting constant
    t = a * C
    ah = t - (t - a)
    al = a - ah
    t = b * C
    bh = t - (t - b)
    bl = b - bh
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def div64(x: jax.Array, y: jax.Array) -> jax.Array:
    """x / y in f64 without the division op.

    Newton-refined reciprocal followed by one compensated (Dekker two-product)
    quotient correction: the residual x - q0*y is computed exactly, so the
    result is correctly rounded except at rare half-ulp ties. Edge cases
    (0, inf, nan, near-overflow/underflow where Dekker would break) fall back
    to the uncorrected ~1-ulp quotient."""
    x = jnp.asarray(x, jnp.float64)
    y = jnp.asarray(y, jnp.float64)
    r = recip64(y)
    q0 = x * r
    p, e = _twoprod(q0, y)
    ok = (
        (jnp.abs(x) < 1e300) & (jnp.abs(x) > 1e-290)
        & (jnp.abs(y) < 1e300) & (jnp.abs(q0) < 1e300) & (jnp.abs(q0) > 1e-290)
    )
    q = jnp.where(ok, q0 + ((x - p) - e) * r, q0)
    return q


def div_any(x: jax.Array, y: jax.Array):
    """Division dispatch: native `/` unless POLARS_TPU_SOFT_DIV forces the
    division-free f64 path."""
    if jnp.result_type(x, y) == jnp.float64 and _on_tpu():
        return div64(x, y)
    return x / y


def floordiv64(x: jax.Array, y: jax.Array) -> jax.Array:
    """Integer floor division without hardware divide.

    f64 reciprocal approximation + exact integer residual refinement: each
    round shrinks the error by ~2^50, so three rounds cover the full i64
    range. Division-by-zero yields 0 (callers mask validity).
    """
    x = x.astype(jnp.int64)
    y = y.astype(jnp.int64)
    y_safe = jnp.where(y == 0, 1, y)
    ry = recip64(y_safe.astype(jnp.float64))
    q = jnp.floor(x.astype(jnp.float64) * ry).astype(jnp.int64)
    for _ in range(3):
        r = x - q * y_safe
        dq = jnp.floor(r.astype(jnp.float64) * ry).astype(jnp.int64)
        q = q + dq
        r2 = x - q * y_safe
        # final +-1 nudge toward floor semantics: 0 <= r < |y| with sign of y
        pos = y_safe > 0
        too_low = jnp.where(pos, r2 < 0, r2 > 0)
        too_high = jnp.where(pos, r2 >= y_safe, r2 <= y_safe)
        q = q - too_low.astype(jnp.int64) + too_high.astype(jnp.int64)
    return jnp.where(y == 0, 0, q)


def mod64(x: jax.Array, y: jax.Array) -> jax.Array:
    """Integer modulo (python sign semantics) without hardware divide."""
    y64 = y.astype(jnp.int64)
    out = x.astype(jnp.int64) - floordiv64(x, y) * jnp.where(y64 == 0, 1, y64)
    return jnp.where(y64 == 0, 0, out)


def floordiv_const(x: jax.Array, d: int) -> jax.Array:
    """Floor division by a positive compile-time constant."""
    assert d > 0
    x = x.astype(jnp.int64)
    if not _on_tpu():
        return jnp.floor_divide(x, d)
    inv = 1.0 / d  # python-evaluated: no traced division
    q = jnp.floor(x.astype(jnp.float64) * inv).astype(jnp.int64)
    for _ in range(2):
        r = x - q * d
        q = q + jnp.floor(r.astype(jnp.float64) * inv).astype(jnp.int64)
        r2 = x - q * d
        q = q - (r2 < 0).astype(jnp.int64) + (r2 >= d).astype(jnp.int64)
    return q


def mod_const(x: jax.Array, d: int) -> jax.Array:
    if not _on_tpu():
        return jnp.mod(x.astype(jnp.int64), d)
    return x.astype(jnp.int64) - floordiv_const(x, d) * d


def floordiv_any(x: jax.Array, y: jax.Array):
    """Floor-division dispatch: native `//` unless POLARS_TPU_SOFT_DIV."""
    rt = jnp.result_type(x, y)
    if jnp.dtype(rt).kind in ("i", "u"):
        if not _on_tpu():
            return jnp.floor_divide(x, y)
        if isinstance(y, int) and y > 0:
            return floordiv_const(x, y).astype(rt)
        return floordiv64(jnp.asarray(x), jnp.asarray(y)).astype(rt)
    return jnp.floor(div_any(x, y))


def mod_any(x: jax.Array, y: jax.Array):
    rt = jnp.result_type(x, y)
    if jnp.dtype(rt).kind in ("i", "u"):
        if not _on_tpu():
            return jnp.mod(x, y)
        if isinstance(y, int) and y > 0:
            return mod_const(x, y).astype(rt)
        return mod64(jnp.asarray(x), jnp.asarray(y)).astype(rt)
    # float modulo via division-free floor
    q = jnp.floor(div_any(x, y))
    return x - q * y
