"""Host-index gather on Columns (reference: ChunkGather / take kernels)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from polars_tpu.core.buffer import Buffer, padded_size
from polars_tpu.core.column import Column
from polars_tpu.errors import OutOfBoundsError


def gather_column(col: Column, indices: np.ndarray) -> Column:
    n = len(col)
    idx = np.asarray(indices)
    if idx.dtype == object:
        validity_extra = np.array([i is not None for i in idx], bool)
        idx = np.array([0 if i is None else i for i in idx], np.int64)
    else:
        validity_extra = None
        idx = idx.astype(np.int64)
    neg = idx < 0
    if neg.any():
        idx = np.where(neg, idx + n, idx)
    if ((idx < 0) | (idx >= n)).any() and n > 0:
        bad = idx[(idx < 0) | (idx >= n)][0]
        raise OutOfBoundsError(f"gather index {bad} out of bounds for length {n}")
    m = len(idx)
    size = padded_size(m)
    pad_idx = np.zeros(size, np.int64)
    pad_idx[:m] = idx
    didx = jnp.asarray(pad_idx)
    values = col.buffer.values[didx]
    validity = None if col.buffer.validity is None else col.buffer.validity[didx]
    if validity_extra is not None:
        ve = np.ones(size, bool)
        ve[:m] = validity_extra
        dve = jnp.asarray(ve)
        validity = dve if validity is None else (validity & dve)
    return Column(col.name, col.dtype, Buffer(values, validity, m), col.table, 0, getattr(col, "child", None))

def gather_frame(cols: list[Column], indices: np.ndarray) -> list[Column]:
    """Gather every column of a frame in ONE device dispatch (per-column
    eager gathers cost ~25ms each once dispatch is degraded — see CLAUDE.md
    poison note)."""
    if not cols:
        return []
    n = cols[0].buffer.length
    idx = np.asarray(indices)
    if idx.dtype == object:
        validity_extra = np.array([i is not None for i in idx], bool)
        idx = np.array([0 if i is None else i for i in idx], np.int64)
    else:
        validity_extra = None
        idx = idx.astype(np.int64)
    neg = idx < 0
    if neg.any():
        idx = np.where(neg, idx + n, idx)
    if ((idx < 0) | (idx >= n)).any() and n > 0:
        bad = idx[(idx < 0) | (idx >= n)][0]
        raise OutOfBoundsError(f"gather index {bad} out of bounds for length {n}")
    m = len(idx)
    size = padded_size(m)
    pad_idx = np.zeros(size, np.int64)
    pad_idx[:m] = idx
    didx = jnp.asarray(pad_idx)
    extra = None
    if validity_extra is not None:
        ve = np.ones(size, bool)
        ve[:m] = validity_extra
        extra = jnp.asarray(ve)
    from polars_tpu.engine.join import _gather_side

    return _gather_side(cols, didx, extra, m)


def gather_struct_field(col, field):
    """Device gather of a struct ``field`` by the struct's id buffer — the
    ids are engine-managed (permuted by row ops like any column), so no
    host readback is needed (r5; the old path to_numpy'd the ids).
    Struct-level nulls AND the field's own nulls both mask the output."""
    nf = max(field.buffer.values.shape[0], 1)
    didx = jnp.clip(col.buffer.values.astype(jnp.int64), 0, nf - 1)
    vals = field.buffer.values[didx]
    valid = None if field.buffer.validity is None else field.buffer.validity[didx]
    if col.buffer.validity is not None:
        valid = col.buffer.validity if valid is None else (valid & col.buffer.validity)
    from polars_tpu.core.buffer import Buffer

    return type(field)(
        field.name, field.dtype, Buffer(vals, valid, len(col)), field.table, 0,
        getattr(field, "child", None),
    )
