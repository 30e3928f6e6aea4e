"""Table sort: multi-key stable argsort via packed radix passes.

TPU-native replacement for the reference's par_sort_unstable_by + row-encoding
multi-key sort (polars-core/src/chunked_array/ops/sort/, polars-row). Built on
kernels/argsort.py: each key column becomes order-preserving i32 words, null
ordering becomes a packed rank word, and the whole thing runs as LSD radix
passes of single-operand sorts (multi-operand ``lax.sort`` is pathological on
this backend — see kernels/argsort.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from polars_tpu.engine.common import Val
from polars_tpu.kernels.argsort import key_words, stable_argsort_words


def sort_words_for_key(
    v: Val, desc: bool, nulls_last: bool, rowmask: jax.Array | None
) -> list[jax.Array]:
    """(rank word, *key words) for one sort key. Rank orders: nulls-first
    nulls < values < nulls-last nulls < out-of-mask rows."""
    from polars_tpu.engine.strings import ensure_ordinal_val

    v = ensure_ordinal_val(v)  # unordered dicts: codes -> lex ranks (cached)
    n = v.values.shape[0]
    if v.validity is None:
        rank = jnp.ones((n,), jnp.int8)
    else:
        rank = jnp.where(v.validity, 1, 2 if nulls_last else 0).astype(jnp.int8)
    if rowmask is not None:
        rank = jnp.where(rowmask, rank, 3)
    return [rank, *key_words(v.values, v.dtype, descending=desc)]


def sort_perm(
    key_vals: list[Val],
    descending: list[bool],
    nulls_last: list[bool],
    rowmask: jax.Array,
    *,
    stable: bool = True,
) -> jax.Array:
    """Permutation placing rows in key order, masked-out rows last."""
    words: list[jax.Array] = []
    first = True
    for v, desc, nl in zip(key_vals, descending, nulls_last):
        words.extend(sort_words_for_key(v, desc, nl, rowmask if first else None))
        first = False
    if not key_vals:
        n = rowmask.shape[0]
        words = [(~rowmask).astype(jnp.int8)]
    return stable_argsort_words(words)


def apply_perm(v: Val, perm: jax.Array) -> Val:
    values = v.values[perm]
    validity = None if v.validity is None else v.validity[perm]
    return v.with_(values=values, validity=validity)
