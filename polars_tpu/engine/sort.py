"""Table sort: multi-key argsort over order-encoded words.

TPU-native replacement for the reference's par_sort_unstable_by + row-encoding
multi-key sort (polars-core/src/chunked_array/ops/sort/, polars-row): keys
become (null_rank, total-order word) pairs fed to one ``lax.sort`` call
(bitonic/radix under XLA), with out-of-mask rows forced last so filtered
tables sort without compaction first.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from polars_tpu.engine.common import Val
from polars_tpu.kernels.rowencode import order_words


def sort_perm(
    key_vals: list[Val],
    descending: list[bool],
    nulls_last: list[bool],
    rowmask: jax.Array,
    *,
    stable: bool = True,
) -> jax.Array:
    """Permutation placing rows in key order, masked-out rows last."""
    n = rowmask.shape[0]
    words: list[jax.Array] = [(~rowmask).astype(jnp.int8)]
    for v, desc, nl in zip(key_vals, descending, nulls_last):
        if v.validity is None:
            null_rank = jnp.ones((n,), jnp.int8)
        else:
            null_rank = jnp.where(v.validity, jnp.int8(1), jnp.int8(2 if nl else 0))
        words.append(null_rank)
        words.extend(order_words(v.values, v.dtype, descending=desc))
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    nk = len(words)
    sorted_ops = jax.lax.sort([*words, iota], num_keys=nk, is_stable=stable)
    return sorted_ops[-1]


def apply_perm(v: Val, perm: jax.Array) -> Val:
    values = v.values[perm]
    validity = None if v.validity is None else v.validity[perm]
    return v.with_(values=values, validity=validity)
