"""Logical plan, expression IR, and the optimizer (reference: polars-plan)."""
