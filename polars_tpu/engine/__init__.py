"""Physical execution engine: expression tracer/compiler + operator kernels.

The TPU replacement for polars-expr + polars-mem-engine + polars-stream: every
plan segment between barriers traces to ONE XLA program over padded device
arrays; filters are row masks (morsels analogue), barriers (group-by / join /
sort) are themselves traced, and host syncs happen only where an output length
is data-dependent.
"""
