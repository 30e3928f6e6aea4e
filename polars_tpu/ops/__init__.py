"""Eager Column-level operations (reference: polars-ops, polars-compute).

These wrap the pure-JAX kernels in :mod:`polars_tpu.kernels` for host-driven
(eager) use; the lazy engine composes the same kernels into whole-query XLA
programs instead.
"""
