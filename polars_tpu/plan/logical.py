"""Logical plan nodes.

Reference: ``DslPlan`` (polars-plan/src/dsl/plan.rs:30-189) and the arena ``IR``
(plans/ir/mod.rs:49). Nodes are immutable, hashable dataclasses; instead of an
index arena, structural sharing + memoized schema resolution give the same
O(1)-rewrites the reference gets from ``Arena<IR>``. The conversion pass in
plan/schema_resolve.py (dsl_to_ir analogue) expands selectors and resolves
dtypes, producing the same node classes with concrete per-column expressions.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from polars_tpu.plan.exprs import ENode


@dataclass(frozen=True)
class LNode:
    def inputs(self) -> tuple[LNode, ...]:
        return ()

    def exprs(self) -> tuple[ENode, ...]:
        return ()


@dataclass(frozen=True)
class LDataFrameScan(LNode):
    """In-memory table source (reference: DslPlan::DataFrameScan)."""

    df: Any = field(hash=False, compare=False)
    ident: int = 0
    projection: tuple[str, ...] | None = None

    def __hash__(self) -> int:
        return hash(("LDataFrameScan", self.ident, self.projection))


@dataclass(frozen=True)
class LScan(LNode):
    """File scan (reference: DslPlan::Scan + UnifiedScanArgs,
    dsl/file_scan/mod.rs:517)."""

    sources: tuple[str, ...]
    fmt: str  # "parquet" | "csv" | "ipc" | "ndjson"
    options: tuple[tuple[str, Any], ...] = ()
    projection: tuple[str, ...] | None = None
    predicate: ENode | None = None  # pushed-down scan predicate
    n_rows: int | None = None
    row_index: tuple[str, int] | None = None

    def opt(self, key: str, default: Any = None) -> Any:
        for k, v in self.options:
            if k == key:
                return v
        return default

    def exprs(self) -> tuple[ENode, ...]:
        return (self.predicate,) if self.predicate is not None else ()


@dataclass(frozen=True)
class LSelect(LNode):
    input: LNode
    expressions: tuple[ENode, ...]
    should_broadcast: bool = True

    def inputs(self) -> tuple[LNode, ...]:
        return (self.input,)

    def exprs(self) -> tuple[ENode, ...]:
        return self.expressions


@dataclass(frozen=True)
class LWithColumns(LNode):
    input: LNode
    expressions: tuple[ENode, ...]

    def inputs(self) -> tuple[LNode, ...]:
        return (self.input,)

    def exprs(self) -> tuple[ENode, ...]:
        return self.expressions


@dataclass(frozen=True)
class LFilter(LNode):
    input: LNode
    predicate: ENode

    def inputs(self) -> tuple[LNode, ...]:
        return (self.input,)

    def exprs(self) -> tuple[ENode, ...]:
        return (self.predicate,)


@dataclass(frozen=True)
class LGroupBy(LNode):
    input: LNode
    keys: tuple[ENode, ...]
    aggs: tuple[ENode, ...]
    maintain_order: bool = False

    def inputs(self) -> tuple[LNode, ...]:
        return (self.input,)

    def exprs(self) -> tuple[ENode, ...]:
        return (*self.keys, *self.aggs)


@dataclass(frozen=True)
class LJoin(LNode):
    input_left: LNode
    input_right: LNode
    left_on: tuple[ENode, ...]
    right_on: tuple[ENode, ...]
    how: str = "inner"  # inner|left|right|full|semi|anti|cross
    suffix: str = "_right"
    nulls_equal: bool = False
    coalesce: bool | None = None
    maintain_order: str = "none"
    validate: str = "m:m"  # m:1/1:1 unlock the fused (in-segment) join path

    def inputs(self) -> tuple[LNode, ...]:
        return (self.input_left, self.input_right)

    def exprs(self) -> tuple[ENode, ...]:
        return (*self.left_on, *self.right_on)


@dataclass(frozen=True)
class LSort(LNode):
    input: LNode
    by: tuple[ENode, ...]
    descending: tuple[bool, ...]
    nulls_last: tuple[bool, ...]
    maintain_order: bool = False
    limit: int | None = None  # fused top-k

    def inputs(self) -> tuple[LNode, ...]:
        return (self.input,)

    def exprs(self) -> tuple[ENode, ...]:
        return self.by


@dataclass(frozen=True)
class LSlice(LNode):
    input: LNode
    offset: int
    length: int | None

    def inputs(self) -> tuple[LNode, ...]:
        return (self.input,)


@dataclass(frozen=True)
class LDistinct(LNode):
    input: LNode
    subset: tuple[str, ...] | None
    keep: str = "any"  # any|first|last|none
    maintain_order: bool = False

    def inputs(self) -> tuple[LNode, ...]:
        return (self.input,)


@dataclass(frozen=True)
class LUnion(LNode):
    inputs_: tuple[LNode, ...]
    rechunk: bool = False

    def inputs(self) -> tuple[LNode, ...]:
        return self.inputs_


@dataclass(frozen=True)
class LHConcat(LNode):
    inputs_: tuple[LNode, ...]

    def inputs(self) -> tuple[LNode, ...]:
        return self.inputs_


@dataclass(frozen=True)
class LRename(LNode):
    input: LNode
    mapping: tuple[tuple[str, str], ...]
    strict: bool = True

    def inputs(self) -> tuple[LNode, ...]:
        return (self.input,)


@dataclass(frozen=True)
class LDrop(LNode):
    input: LNode
    columns: tuple[str, ...]
    strict: bool = True

    def inputs(self) -> tuple[LNode, ...]:
        return (self.input,)


@dataclass(frozen=True)
class LWithRowIndex(LNode):
    input: LNode
    name: str = "index"
    offset: int = 0

    def inputs(self) -> tuple[LNode, ...]:
        return (self.input,)


@dataclass(frozen=True)
class LExplode(LNode):
    input: LNode
    columns: tuple[str, ...]

    def inputs(self) -> tuple[LNode, ...]:
        return (self.input,)


@dataclass(frozen=True)
class LUnpivot(LNode):
    input: LNode
    on: tuple[str, ...] | None
    index: tuple[str, ...]
    variable_name: str = "variable"
    value_name: str = "value"

    def inputs(self) -> tuple[LNode, ...]:
        return (self.input,)


@dataclass(frozen=True)
class LMapFunction(LNode):
    """Opaque host UDF over the whole frame (reference: DslPlan::MapFunction)."""

    input: LNode
    function: Any = field(hash=False, compare=False)
    ident: int = 0
    schema_fn: Any = field(default=None, hash=False, compare=False)
    streamable: bool = False

    def __hash__(self) -> int:
        return hash(("LMapFunction", self.ident, self.input))

    def inputs(self) -> tuple[LNode, ...]:
        return (self.input,)


@dataclass(frozen=True)
class LSink(LNode):
    input: LNode
    path: str
    fmt: str
    options: tuple[tuple[str, Any], ...] = ()

    def inputs(self) -> tuple[LNode, ...]:
        return (self.input,)


@dataclass(frozen=True)
class LJoinWhere(LNode):
    """Inequality join (reference: iejoin, join_where)."""

    input_left: LNode
    input_right: LNode
    predicates: tuple[ENode, ...]
    suffix: str = "_right"

    def inputs(self) -> tuple[LNode, ...]:
        return (self.input_left, self.input_right)

    def exprs(self) -> tuple[ENode, ...]:
        return self.predicates


@dataclass(frozen=True)
class LAsofJoin(LNode):
    input_left: LNode
    input_right: LNode
    left_on: ENode
    right_on: ENode
    by_left: tuple[ENode, ...] = ()
    by_right: tuple[ENode, ...] = ()
    strategy: str = "backward"  # backward|forward|nearest
    tolerance: Any = None
    suffix: str = "_right"

    def inputs(self) -> tuple[LNode, ...]:
        return (self.input_left, self.input_right)


@dataclass(frozen=True)
class LCache(LNode):
    """Common-subplan cache marker (reference: IR::Cache,
    polars-plan/src/plans/optimizer/cse/): the wrapped subplan appears more
    than once in the query; it executes ONCE per collect and downstream
    consumers reuse the materialized frame (engine/run.py memo scope)."""

    input: LNode
    ident: int = 0

    def inputs(self) -> tuple[LNode, ...]:
        return (self.input,)


def rebuild(node: LNode, new_inputs: tuple[LNode, ...]) -> LNode:
    """Replace a node's inputs, preserving everything else."""
    old = node.inputs()
    if old == new_inputs:
        return node
    import dataclasses

    if isinstance(node, (LUnion, LHConcat)):
        return dataclasses.replace(node, inputs_=new_inputs)
    if isinstance(node, (LJoin, LJoinWhere, LAsofJoin)):
        return dataclasses.replace(node, input_left=new_inputs[0], input_right=new_inputs[1])
    return dataclasses.replace(node, input=new_inputs[0])
