"""Time-window rolling group-by (reference: polars-time rolling / group_by_rolling).

One window per row: keys sorted by (group, index); each row's window is a
contiguous run located with two vectorized ``searchsorted`` calls, and the
supported aggregations are prefix-sum differences — fully traced, one XLA
program, no per-row loops (TPU-native replacement for the reference's
sequential window iterator in polars-time/src/group_by/rolling).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from polars_tpu import datatypes as dt
from polars_tpu.core.buffer import Buffer, padded_size, row_mask
from polars_tpu.core.column import Column
from polars_tpu.core.frame import DataFrame
from polars_tpu.errors import InvalidOperationError

_SUPPORTED = ("sum", "mean", "count", "len", "min", "max", "first", "last", "var", "std")


def rolling_window_core(t, gid, valid, k_stride, cols, *, period, offset, closed, kinds, has_gid):
    """Fully-traceable time-window rolling core.

    Per-row windows located via two searchsorted calls over the (group, time)
    composite key; aggregations are prefix-sum range queries (min/max via a
    log-shift sparse table). Returns one ``(values, ok_mask)`` pair per entry
    in ``kinds``, both in ORIGINAL row order. No host sync inside — also the
    traced ``rolling_*_by`` expression path (engine/fn_position.py).
    """
    from polars_tpu.kernels.argsort import key_words, stable_argsort_words

    n = t.shape[0]
    t64 = t.astype(jnp.int64)
    tmin = jnp.min(jnp.where(valid, t64, jnp.iinfo(jnp.int64).max))
    tmin = jnp.where(jnp.any(valid), tmin, jnp.int64(0))
    if has_gid:
        g64 = jnp.where(valid, gid.astype(jnp.int64), 0)
    else:
        # ungrouped: k_stride unused (g64 == 0), key is just t - tmin
        g64 = jnp.zeros((n,), jnp.int64)
    # composite key separates groups. Invalid rows sort LAST via a
    # dedicated leading sort word — a multiplied sentinel like
    # (1<<40)*k_stride overflows int64 for realistic datetime spans and
    # silently sorted padding FIRST (round-1 advisor finding).
    key = g64 * k_stride + jnp.where(valid, t64 - tmin, 0)
    invalid_w = (~valid).astype(jnp.int32)
    perm = stable_argsort_words([invalid_w, *key_words(key, dt.Int64())])
    nvalid = jnp.sum(valid.astype(jnp.int32))
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    # invalid slots (sorted to the tail) must not satisfy any range query
    skey = jnp.where(iota < nvalid, key[perm], jnp.iinfo(jnp.int64).max)

    lo_q = key + offset
    hi_q = key + offset + period
    if closed == "right":
        lo = jnp.searchsorted(skey, lo_q, side="right")
        hi = jnp.searchsorted(skey, hi_q, side="right")
    elif closed == "left":
        lo = jnp.searchsorted(skey, lo_q, side="left")
        hi = jnp.searchsorted(skey, hi_q, side="left")
    elif closed == "both":
        lo = jnp.searchsorted(skey, lo_q, side="left")
        hi = jnp.searchsorted(skey, hi_q, side="right")
    else:  # "none"
        lo = jnp.searchsorted(skey, lo_q, side="right")
        hi = jnp.searchsorted(skey, hi_q, side="left")

    lo = jnp.clip(lo, 0, nvalid)
    hi = jnp.clip(hi, 0, nvalid)

    outs = []
    for (kind, min_samples, ddof), (vals, vvalid) in zip(kinds, cols):
        minp = float(max(min_samples or 1, 1))
        sv = vals[perm]
        sm = (vvalid & valid)[perm] if vvalid is not None else valid[perm]
        x = jnp.where(sm, sv.astype(jnp.float64), 0.0)
        c = sm.astype(jnp.float64)
        if kind in ("count", "len"):
            ps = jnp.cumsum(c if kind == "count" else valid[perm].astype(jnp.float64))
            out = ps[jnp.clip(hi - 1, 0, n - 1)] - jnp.where(lo > 0, ps[jnp.clip(lo - 1, 0, n - 1)], 0.0)
            out = jnp.where(hi > lo, out, 0.0)
            outs.append((out.astype(jnp.uint32), valid))
            continue
        psx = jnp.cumsum(x)
        psc = jnp.cumsum(c)

        def rng(ps):
            s = ps[jnp.clip(hi - 1, 0, n - 1)] - jnp.where(lo > 0, ps[jnp.clip(lo - 1, 0, n - 1)], 0.0)
            return jnp.where(hi > lo, s, 0.0)

        s = rng(psx)
        cnt = rng(psc)
        ok = (cnt >= minp) & valid
        if kind == "sum":
            outs.append((s, ok))
        elif kind == "mean":
            outs.append((s / jnp.maximum(cnt, 1.0), ok))
        elif kind in ("var", "std"):
            ps2 = jnp.cumsum(jnp.where(sm, (sv.astype(jnp.float64)) ** 2, 0.0))
            s2 = rng(ps2)
            m = s / jnp.maximum(cnt, 1.0)
            dd = float(ddof if ddof is not None else 1)
            v = (s2 - cnt * m * m) / jnp.maximum(cnt - dd, 1.0)
            v = jnp.maximum(v, 0.0)
            out = jnp.sqrt(v) if kind == "std" else v
            outs.append((out, ok & (cnt > dd)))
        elif kind in ("first", "last"):
            pos = lo if kind == "first" else hi - 1
            pos = jnp.clip(pos, 0, n - 1)
            outs.append((sv[pos], ok & sm[pos]))
        elif kind in ("min", "max"):
            # log-shift running extremum over sorted values (sparse table)
            big = jnp.where(sm, sv.astype(jnp.float64), jnp.inf if kind == "min" else -jnp.inf)
            tables = [big]
            shift = 1
            levels = int(np.ceil(np.log2(max(n, 2))))
            for _ in range(levels):
                prev = tables[-1]
                nxt = jnp.roll(prev, -shift)
                pad = jnp.where(
                    jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1) < n - shift,
                    nxt, jnp.inf if kind == "min" else -jnp.inf,
                )
                tables.append(jnp.minimum(prev, pad) if kind == "min" else jnp.maximum(prev, pad))
                shift *= 2
            stacked = jnp.stack(tables)  # (levels+1, n)
            width = jnp.maximum(hi - lo, 1)
            k = jnp.clip(jnp.floor(jnp.log2(width.astype(jnp.float64))).astype(jnp.int32), 0, levels)
            left = stacked[k, jnp.clip(lo, 0, n - 1)]
            right = stacked[k, jnp.clip(hi - (1 << k.astype(jnp.int64)).astype(jnp.int32), 0, n - 1)]
            out = jnp.minimum(left, right) if kind == "min" else jnp.maximum(left, right)
            outs.append((out, ok))
        else:
            raise InvalidOperationError(f"rolling agg {kind!r} unsupported")
    # lo/hi were queried with the UNSORTED per-row keys, so every output
    # is already in original row order — no inverse permutation needed
    return outs


@functools.lru_cache(maxsize=None)
def _rolling_jit(period: int, offset: int, closed: str, kinds: tuple, has_gid: bool):
    def fn(t, gid, valid, k_stride, cols):
        outs = rolling_window_core(
            t, gid, valid, k_stride, cols,
            period=period, offset=offset, closed=closed, kinds=kinds, has_gid=has_gid,
        )
        final = []
        for out, ok in outs:
            final.append(out)
            final.append(ok)
        return final

    return jax.jit(fn)


def rolling_frames(
    df: DataFrame,
    index: str,
    period_ticks: int,
    offset_ticks: int,
    closed: str,
    gb_names: list[str],
    aggs: list[tuple],  # (src col, kind, out name, out dtype[, min_samples[, ddof]])
) -> DataFrame:
    aggs = [tuple(a) + (1, 1)[len(a) - 4 :] for a in aggs]  # default min_samples=1, ddof=1
    icol = df._get(index)
    n = icol.buffer.padded
    valid = row_mask(n, df.height)
    if icol.buffer.validity is not None:
        valid = valid & icol.buffer.validity
    k_stride = jnp.int64(0)
    if gb_names:
        # dense composite gid over dictionary codes when available, else rank via sort
        gid = jnp.zeros((n,), jnp.int64)
        n_groups = 1
        for gname in gb_names:
            gcol = df._get(gname)
            if gcol.table is None:
                raise InvalidOperationError("rolling group_by currently needs string/categorical keys")
            codes = gcol.buffer.values.astype(jnp.int64) + 1
            if gcol.buffer.validity is not None:
                codes = jnp.where(gcol.buffer.validity, codes, 0)
            gid = gid * (len(gcol.table.values) + 1) + codes
            n_groups *= len(gcol.table.values) + 1
        has_gid = True
        # composite-key stride sized host-side so the overflow GUARD can run
        # (one barrier-level sync, same pattern as asof_join_frames' grouped
        # composite-key-range check in engine/join.py)
        t64 = icol.buffer.values.astype(jnp.int64)
        stats = jax.device_get([
            jnp.min(jnp.where(valid, t64, jnp.iinfo(jnp.int64).max)),
            jnp.max(jnp.where(valid, t64, jnp.iinfo(jnp.int64).min)),
        ])
        span = max(int(stats[1]) - int(stats[0]), 0)
        K = span + 2 * abs(period_ticks) + abs(offset_ticks) + 4
        if n_groups * K >= (1 << 62):
            raise InvalidOperationError(
                "rolling group_by: time span times group count exceeds the "
                "composite key range; pre-partition the frame instead"
            )
        k_stride = jnp.int64(K)
    else:
        gid = jnp.zeros((n,), jnp.int64)
        has_gid = False

    kinds = tuple((kind, minp, ddof) for _, kind, _, _, minp, ddof in aggs)
    cols = tuple(
        (df._get(src).buffer.values, df._get(src).buffer.validity) for src, *_ in aggs
    )
    jfn = _rolling_jit(period_ticks, offset_ticks, closed, kinds, has_gid)
    flat = jfn(icol.buffer.values, gid, valid, k_stride, cols)

    out_cols = [c for c in df._columns if c.name in (*gb_names, index)]
    it = iter(flat)
    for (_, kind, out_name, out_dtype, _minp, _ddof) in aggs:
        values = next(it)
        ok = next(it)
        validity = ok if ok is not None else None
        np_dt = jnp.dtype(dt.dtype_to_numpy(out_dtype))
        out_cols.append(
            Column(out_name, out_dtype, Buffer(values.astype(np_dt), validity, df.height), None)
        )
    return DataFrame._from_columns(out_cols, df.height)
