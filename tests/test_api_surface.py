"""API-surface parity sweep vs the reference py-polars source (AST-parsed —
the reference cannot import without its Rust core). Guards against silent
surface regressions; skipped when the reference checkout is absent.

Reference: py-polars/src/polars/{__init__,dataframe/frame,lazyframe/frame,
series/series,expr/expr}.py
"""

import ast
import pathlib

import pytest

import polars_tpu as pl

REF = pathlib.Path("/root/reference/py-polars/src/polars")

pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference checkout absent")


def _class_methods(path: pathlib.Path, classname: str) -> set[str]:
    tree = ast.parse(path.read_text())
    out: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.ClassDef) and node.name == classname:
            for item in node.body:
                if isinstance(item, (ast.FunctionDef, ast.AsyncFunctionDef)):
                    if not item.name.startswith("_"):
                        out.add(item.name)
    return out


@pytest.mark.parametrize(
    ("relpath", "classname", "cls"),
    [
        ("dataframe/frame.py", "DataFrame", pl.DataFrame),
        ("lazyframe/frame.py", "LazyFrame", pl.LazyFrame),
        ("expr/expr.py", "Expr", type(pl.col("a"))),
    ],
)
def test_class_method_parity(relpath, classname, cls):
    ref = _class_methods(REF / relpath, classname)
    ours = {m for m in dir(cls) if not m.startswith("_")}
    missing = sorted(ref - ours)
    assert not missing, f"{classname} missing: {missing}"


def test_series_method_parity_incl_delegation():
    # Series serves many methods through dynamic Expr delegation, so the
    # check is hasattr (which triggers __getattr__), not dir()
    ref = _class_methods(REF / "series/series.py", "Series")
    s = pl.Series("a", [1, 2, 3])
    missing = sorted(m for m in ref if not hasattr(s, m))
    assert not missing, f"Series missing: {missing}"


def test_top_level_exports_parity():
    tree = ast.parse((REF / "__init__.py").read_text())
    ref_all: list[str] = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id == "__all__":
                    ref_all = [ast.literal_eval(e) for e in node.value.elts]
    missing = [n for n in ref_all if not hasattr(pl, n)]
    assert not missing, f"pl.* missing: {missing}"


def test_namespace_parity():
    # expression namespaces and their methods
    s = pl.Series("s", ["a"])
    e = pl.col("x")
    for ns_file, ns_attr in [
        ("expr/string.py", "str"),
        ("expr/datetime.py", "dt"),
        ("expr/list.py", "list"),
        ("expr/array.py", "arr"),
        ("expr/struct.py", "struct"),
        ("expr/binary.py", "bin"),
        ("expr/categorical.py", "cat"),
        ("expr/name.py", "name"),
        ("expr/meta.py", "meta"),
    ]:
        path = REF / ns_file
        tree = ast.parse(path.read_text())
        classes = [n for n in ast.walk(tree) if isinstance(n, ast.ClassDef)]
        assert classes, ns_file
        ref = {
            item.name
            for node in classes
            for item in node.body
            if isinstance(item, (ast.FunctionDef, ast.AsyncFunctionDef))
            and not item.name.startswith("_")
        }
        ns = getattr(e, ns_attr)
        missing = sorted(m for m in ref if not hasattr(ns, m))
        assert not missing, f"Expr.{ns_attr} missing: {missing}"
