"""Honest device timing on fence-less backends (the axon TPU tunnel).

In clean (never-read-back) mode this backend's ``jax.block_until_ready`` and
``Array.is_ready()`` return immediately — dispatch is fire-and-forget, so a
naive ``t0; run; block; t1`` measures HOST DISPATCH ONLY (measured: "triad"
at 27 TB/s against an ~819 GB/s HBM roofline).  The only event that truly
waits for the device is a readback — and the first readback permanently flips
the runtime into ~26 ms-per-sync degraded mode (CLAUDE.md §1), so it must
happen exactly once, at the very end.

``DeviceTimeline`` turns that constraint into a measurement protocol:

  1. enqueue phase 0 (warm-up / compile), ``mark("start")``
  2. enqueue K dependent executions of the thing to time, ``mark("q1", K)``
  3. ... more phases ...
  4. ``resolve()``: reads every probe back IN ORDER.  TPU programs launch
     FIFO on the single core, so probe *i* completes only after every program
     enqueued before it; the wall-clock delta between consecutive probe
     readbacks is the true device execution time of the phase in between.
     The first readback eats the one-time flip penalty; an empty "rtt" phase
     measures the per-readback round trip to subtract from short phases.

Probes are tiny i32 scalars (cheap transfer, no x64 repack of payload data).
"""

from __future__ import annotations

import time
from typing import Any


class DeviceTimeline:
    def __init__(self) -> None:
        import jax
        import jax.numpy as jnp

        self._marks: list[tuple[str, int, Any]] = []

        @jax.jit
        def _probe(x):
            return x.ravel()[0].astype(jnp.int32) + jnp.int32(1)

        self._probe_fn = _probe
        self._anchor = jnp.zeros((1,), jnp.int32)

    def mark(self, label: str, n_calls: int = 1, anchor: Any = None) -> None:
        """Enqueue a probe after the phase ``label`` (``n_calls`` executions).

        ``anchor`` (a device array produced by the phase's last program) adds
        an explicit data dependency on top of FIFO launch order."""
        a = anchor if anchor is not None else self._anchor
        self._marks.append((label, n_calls, self._probe_fn(a)))

    def resolve(self) -> dict[str, dict[str, float]]:
        """Read probes back in order; return per-phase wall times.

        Returns {label: {"s": total_seconds, "n": n_calls}}.  The first mark's
        own duration (flip penalty + everything before it) is reported under
        its label too — by convention mark a "start" phase first and ignore
        it.  THIS FLIPS THE RUNTIME — call once, at the end of the session."""
        import numpy as np

        out: dict[str, dict[str, float]] = {}
        t_prev: float | None = None
        t0 = time.perf_counter()
        for label, k, p in self._marks:
            try:
                np.asarray(p)
            except Exception as e:  # noqa: BLE001
                # device fault (e.g. UNAVAILABLE mid-queue): salvage the
                # phases that already resolved instead of losing the run
                out[label] = {"s": -1.0, "n": k, "error": str(e)[:200]}
                import sys

                print(f"device_timer: probe {label!r} failed: {e}", file=sys.stderr)
                continue
            t = time.perf_counter()
            base = t_prev if t_prev is not None else t0
            out[label] = {"s": t - base, "n": k}
            t_prev = t
        return out
