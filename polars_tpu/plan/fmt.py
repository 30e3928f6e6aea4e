"""Plan pretty-printing (reference: polars-plan IR Display + polars-lazy dot.rs)."""

from __future__ import annotations

from polars_tpu.plan import logical as L


def explain_plan(node: L.LNode, indent: int = 0) -> str:
    pad = "  " * indent
    name = type(node).__name__[1:]
    detail = ""
    if isinstance(node, L.LDataFrameScan):
        detail = f" [{node.df.width} cols, {node.df.height} rows]"
        if node.projection:
            detail += f" π {list(node.projection)}"
    elif isinstance(node, L.LScan):
        detail = f" {node.fmt}: {list(node.sources)[:2]}"
        if node.projection is not None:
            try:
                from polars_tpu.io.scan_schema import scan_schema

                total = len(scan_schema(node))
            except Exception:  # noqa: BLE001 — source may be gone at print time
                total = len(node.projection)
            detail += f" π {len(node.projection)}/{total}"
        if node.predicate is not None:
            detail += f" σ {node.predicate!r}"
        if node.n_rows is not None:
            detail += f" n_rows={node.n_rows}"
    elif isinstance(node, L.LSelect):
        detail = f" {len(node.expressions)} exprs"
    elif isinstance(node, L.LWithColumns):
        detail = f" {len(node.expressions)} exprs"
    elif isinstance(node, L.LFilter):
        detail = f" {node.predicate!r}"
    elif isinstance(node, L.LGroupBy):
        detail = f" keys={len(node.keys)} aggs={len(node.aggs)}"
    elif isinstance(node, L.LJoin):
        detail = f" how={node.how}"
    elif isinstance(node, L.LSort):
        detail = f" by={len(node.by)} desc={node.descending}" + (
            f" limit={node.limit}" if node.limit is not None else ""
        )
    elif isinstance(node, L.LSlice):
        detail = f" offset={node.offset} len={node.length}"
    lines = [f"{pad}{name}{detail}"]
    for i in node.inputs():
        lines.append(explain_plan(i, indent + 1))
    return "\n".join(lines)


def _node_label(node: L.LNode) -> str:
    first = explain_plan(node).splitlines()[0]
    return first.replace('"', "'")


def plan_to_dot(node: L.LNode) -> str:
    """Graphviz dot text for a plan (reference: polars-lazy/src/dot.rs;
    py-polars LazyFrame.show_graph). Shared LCache subplans render as one
    node with multiple in-edges — the dedup is visible in the graph."""
    lines = [
        "graph polars_tpu_query {",
        "  rankdir=BT;",
        '  node [shape=box, fontname="monospace"];',
    ]
    ids: dict = {}
    edges: list[tuple[int, int]] = []

    def visit(n: L.LNode) -> int:
        # LCache nodes dedup by STRUCTURE (same ident+input -> one box)
        key = n if isinstance(n, L.LCache) else id(n)
        if key in ids:
            return ids[key]
        nid = len(ids)
        ids[key] = nid
        lines.append(f'  n{nid} [label="{_node_label(n)}"];')
        for i in n.inputs():
            edges.append((visit(i), nid))
        return nid

    visit(node)
    for a, b in edges:
        lines.append(f"  n{a} -- n{b};")
    lines.append("}")
    return "\n".join(lines)
