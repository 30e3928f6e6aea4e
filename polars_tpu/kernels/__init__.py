"""Device kernels.

Two tiers, mirroring the reference's polars-compute (SIMD kernels) split:
- xla_*.py / plain modules: pure jax.numpy/lax implementations — always
  available, fused by XLA.
- pallas_*.py: hand-written Pallas TPU kernels for the roofline-critical inner
  loops (hash build/probe, radix partition, selection compaction), with the XLA
  implementations as fallbacks on CPU/interpret.
"""
