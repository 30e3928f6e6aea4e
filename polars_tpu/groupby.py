"""Eager GroupBy builder (reference: py-polars dataframe/group_by.py)."""

from __future__ import annotations

from typing import Any

from polars_tpu.core.frame import DataFrame
from polars_tpu.expr.expr import parse_into_expr_list


class GroupBy:
    __slots__ = ("_df", "_by", "_named_by", "_maintain_order")

    def __init__(
        self, df: DataFrame, by: tuple, named_by: dict, *, maintain_order: bool = False
    ) -> None:
        self._df = df
        self._by = by
        self._named_by = named_by
        self._maintain_order = maintain_order

    def _lazy(self):
        return self._df.lazy().group_by(
            *self._by, maintain_order=self._maintain_order, **self._named_by
        )

    def agg(self, *aggs: Any, **named_aggs: Any) -> DataFrame:
        return self._lazy().agg(*aggs, **named_aggs).collect()

    def __iter__(self):
        keys = parse_into_expr_list(list(self._by), self._named_by)
        from polars_tpu.plan import exprs as E

        names = [E.output_name(k) for k in keys]
        parts = self._df.partition_by(names, maintain_order=True, as_dict=True)
        items = list(parts.items())
        for key, frame in items:
            yield (key if len(key) > 1 else key[0]), frame

    def sum(self) -> DataFrame:
        return self._lazy().sum().collect()

    def mean(self) -> DataFrame:
        return self._lazy().mean().collect()

    def min(self) -> DataFrame:
        return self._lazy().min().collect()

    def max(self) -> DataFrame:
        return self._lazy().max().collect()

    def median(self) -> DataFrame:
        return self._lazy().median().collect()

    def first(self) -> DataFrame:
        return self._lazy().first().collect()

    def last(self) -> DataFrame:
        return self._lazy().last().collect()

    def n_unique(self) -> DataFrame:
        return self._lazy().n_unique().collect()

    def quantile(self, quantile: float, interpolation: str = "nearest") -> DataFrame:
        return self._lazy().quantile(quantile, interpolation).collect()

    def count(self) -> DataFrame:
        return self._lazy().count().collect()

    def len(self, name: str = "len") -> DataFrame:
        return self._lazy().len(name).collect()
