"""Random-plan differential fuzzing (reference test strategy:
py-polars/src/polars/testing/parametric/strategies/ + the parametric suite
under py-polars/tests/parametric/).

A seeded generator produces small mixed-dtype frames plus random expression
trees; each expression is built TOGETHER with a pandas-nullable-dtype oracle
callable, so results check against an independent implementation. Expressions
whose semantics diverge from pandas (Kleene corner cases, division by zero,
when/then null conditions) skip the oracle and instead cross-check the
in-memory, streaming, and distributed engines against each other.

All generation is `np.random.default_rng(seed)`-driven: every failure is
reproducible from its (seed, index) pair.
"""

from __future__ import annotations

import numpy as np

import polars_tpu as pl

# ---------------------------------------------------------------------------
# frames
# ---------------------------------------------------------------------------

_STR_POOL = ["alpha", "beta", "gamma", "delta", "", "Zz 9", "épsilon"]


def random_frame(rng: np.random.Generator, n_rows: int = 37):
    """(polars_tpu DataFrame, pandas DataFrame) with identical content.

    Columns cover the core dtype lattice with ~15% nulls: i64, i32-ish small
    ints, f64, bool, low-cardinality strings, and a group key.
    """
    import pandas as pd

    def nulls():
        return rng.random(n_rows) < 0.15

    data = {}
    pdata = {}

    iv = rng.integers(-50, 50, n_rows)
    m = nulls()
    data["i"] = [None if b else int(v) for v, b in zip(iv, m)]
    pdata["i"] = pd.array([pd.NA if b else int(v) for v, b in zip(iv, m)], dtype="Int64")

    jv = rng.integers(0, 7, n_rows)
    data["j"] = [int(v) for v in jv]
    pdata["j"] = pd.array([int(v) for v in jv], dtype="Int64")

    fv = np.round(rng.normal(0, 10, n_rows), 3)
    m = nulls()
    data["f"] = [None if b else float(v) for v, b in zip(fv, m)]
    pdata["f"] = pd.array([pd.NA if b else float(v) for v, b in zip(fv, m)], dtype="Float64")

    bv = rng.random(n_rows) < 0.5
    m = nulls()
    data["b"] = [None if x else bool(v) for v, x in zip(bv, m)]
    pdata["b"] = pd.array([pd.NA if x else bool(v) for v, x in zip(bv, m)], dtype="boolean")

    sv = rng.integers(0, len(_STR_POOL), n_rows)
    m = nulls()
    data["s"] = [None if b else _STR_POOL[v] for v, b in zip(sv, m)]
    pdata["s"] = pd.array(data["s"], dtype="string")

    gv = rng.integers(0, 5, n_rows)
    data["g"] = [int(v) for v in gv]
    pdata["g"] = pd.array([int(v) for v in gv], dtype="Int64")

    return pl.DataFrame(data), pd.DataFrame(pdata)


# ---------------------------------------------------------------------------
# expressions with a pandas oracle
# ---------------------------------------------------------------------------
# Each generator returns (expr, fn, kind) where fn(pdf) -> pandas Series with
# nullable dtype and polars-identical null propagation; kind in
# {"int", "float", "bool", "str"}.

_NUM_COLS = [("i", "int"), ("j", "int"), ("f", "float")]


def _gen_leaf(rng):
    r = rng.random()
    if r < 0.55:
        name, kind = _NUM_COLS[rng.integers(0, len(_NUM_COLS))]
        return pl.col(name), (lambda pdf, n=name: pdf[n]), kind
    if r < 0.75:
        v = int(rng.integers(-9, 10))
        import pandas as pd

        return (
            pl.lit(v),
            lambda pdf, v=v: pd.Series(pd.array([v] * len(pdf), dtype="Int64")),
            "int",
        )
    if r < 0.9:
        v = float(np.round(rng.uniform(-5, 5), 2))
        import pandas as pd

        return (
            pl.lit(v),
            lambda pdf, v=v: pd.Series(pd.array([v] * len(pdf), dtype="Float64")),
            "float",
        )
    return pl.col("b"), (lambda pdf: pdf["b"]), "bool"


def gen_oracle_expr(rng: np.random.Generator, depth: int = 3):
    """A random expression + pandas oracle over the SAFE shared-semantics
    subset: + - * on numerics, comparisons, Kleene & | ~ on booleans,
    fill_null, abs/neg."""
    if depth <= 0:
        return _gen_leaf(rng)
    op = rng.random()
    if op < 0.35:  # arithmetic
        a, fa, ka = gen_oracle_expr(rng, depth - 1)
        b, fb, kb = gen_oracle_expr(rng, depth - 1)
        if "bool" in (ka, kb) or "str" in (ka, kb):
            return gen_oracle_expr(rng, depth - 1)
        sym = ["+", "-", "*"][rng.integers(0, 3)]
        kind = "float" if "float" in (ka, kb) else "int"
        if sym == "+":
            return a + b, (lambda pdf: fa(pdf) + fb(pdf)), kind
        if sym == "-":
            return a - b, (lambda pdf: fa(pdf) - fb(pdf)), kind
        return a * b, (lambda pdf: fa(pdf) * fb(pdf)), kind
    if op < 0.55:  # comparison
        a, fa, ka = gen_oracle_expr(rng, depth - 1)
        b, fb, kb = gen_oracle_expr(rng, depth - 1)
        if "bool" in (ka, kb) or "str" in (ka, kb):
            a, fa, ka = _gen_leaf(rng)
            b, fb, kb = _gen_leaf(rng)
            if "bool" in (ka, kb) or "str" in (ka, kb):
                return gen_oracle_expr(rng, depth - 1)
        sym = ["<", "<=", ">", ">=", "==", "!="][rng.integers(0, 6)]
        ops = {
            "<": (lambda x, y: x < y),
            "<=": (lambda x, y: x <= y),
            ">": (lambda x, y: x > y),
            ">=": (lambda x, y: x >= y),
            "==": (lambda x, y: x == y),
            "!=": (lambda x, y: x != y),
        }
        f = ops[sym]
        return f(a, b), (lambda pdf: f(fa(pdf), fb(pdf))), "bool"
    if op < 0.7:  # Kleene boolean algebra (pandas BooleanDtype is Kleene too)
        a, fa, ka = gen_oracle_expr(rng, depth - 1)
        b, fb, kb = gen_oracle_expr(rng, depth - 1)
        if ka != "bool" or kb != "bool":
            return gen_oracle_expr(rng, depth - 1)
        if rng.random() < 0.5:
            return a & b, (lambda pdf: fa(pdf) & fb(pdf)), "bool"
        return a | b, (lambda pdf: fa(pdf) | fb(pdf)), "bool"
    if op < 0.8:  # not
        a, fa, ka = gen_oracle_expr(rng, depth - 1)
        if ka != "bool":
            return _invert_fallback(rng, depth)
        return ~a, (lambda pdf: ~fa(pdf)), "bool"
    if op < 0.9:  # fill_null
        a, fa, ka = gen_oracle_expr(rng, depth - 1)
        if ka == "bool":
            return a.fill_null(True), (lambda pdf: fa(pdf).fillna(True)), "bool"
        if ka == "str":
            return a.fill_null("x"), (lambda pdf: fa(pdf).fillna("x")), "str"
        v = int(rng.integers(-5, 6))
        return a.fill_null(v), (lambda pdf: fa(pdf).fillna(v)), ka
    # abs / neg on numerics
    a, fa, ka = gen_oracle_expr(rng, depth - 1)
    if ka == "bool" or ka == "str":
        return gen_oracle_expr(rng, depth - 1)
    if rng.random() < 0.5:
        return a.abs(), (lambda pdf: fa(pdf).abs()), ka
    return -a, (lambda pdf: -fa(pdf)), ka


def _invert_fallback(rng, depth):
    a, fa, ka = _gen_leaf(rng)
    while ka != "bool":
        a, fa, ka = _gen_leaf(rng)
    return ~a, (lambda pdf: ~fa(pdf)), "bool"


# engine-only expressions: valid polars, no trustworthy pandas one-liner —
# checked memory vs streaming vs distributed instead
def gen_engine_expr(rng: np.random.Generator, depth: int = 3):
    op = rng.random()
    if op < 0.2:
        a, _, ka = gen_oracle_expr(rng, depth - 1)
        b, _, kb = gen_oracle_expr(rng, depth - 1)
        if "bool" in (ka, kb) or "str" in (ka, kb):
            return pl.col("i") / pl.col("j")
        return a / b
    if op < 0.4:
        cond, _, kc = gen_oracle_expr(rng, depth - 1)
        if kc != "bool":
            cond = pl.col("b")
        t, _, _ = gen_oracle_expr(rng, depth - 1)
        f, _, _ = gen_oracle_expr(rng, depth - 1)
        return pl.when(cond).then(pl.col("i")).otherwise(pl.col("j"))
    if op < 0.55:
        a, _, ka = gen_oracle_expr(rng, depth - 1)
        if ka in ("bool", "str"):
            a = pl.col("f")
        return a.cum_sum()
    if op < 0.7:
        return pl.col(["i", "f"][rng.integers(0, 2)]).rank("ordinal")
    if op < 0.8:
        a, _, ka = gen_oracle_expr(rng, depth - 1)
        if ka in ("bool", "str"):
            a = pl.col("i")
        return a.sum().over("g")
    if op < 0.92:
        # newly traced string-list paths (r5): split/extract_all through the
        # dictionary LUT + range-reading list ops over their shared children
        pick = rng.integers(0, 4)
        if pick == 0:
            return pl.col("s").str.split("a").list.len()
        if pick == 1:
            return pl.col("s").str.split(" ").list.get(0)
        if pick == 2:
            return pl.col("s").str.extract_all(r"[a-z]+").list.len()
        return pl.col("s").str.split("e", inclusive=True).list.get(-1)
    return pl.col("f").shift(int(rng.integers(-2, 3)))


_ORACLE_AGGS = [
    ("sum", lambda g, c: g[c].sum()),
    ("min", lambda g, c: g[c].min()),
    ("max", lambda g, c: g[c].max()),
    ("mean", lambda g, c: g[c].mean()),
    ("count", lambda g, c: g[c].count()),
]


def gen_groupby_case(rng: np.random.Generator):
    """(aggs list for polars, pandas reducer) over random value columns."""
    n_aggs = int(rng.integers(1, 4))
    specs = []
    for k in range(n_aggs):
        name, pfn = _ORACLE_AGGS[rng.integers(0, len(_ORACLE_AGGS))]
        col = ["i", "j", "f"][rng.integers(0, 3)]
        specs.append((name, col, pfn, f"a{k}"))
    aggs = [getattr(pl.col(c), name)().alias(out) for name, c, _, out in specs]

    def oracle(pdf):
        g = pdf.groupby("g", sort=True)
        out = {}
        for name, c, pfn, alias in specs:
            out[alias] = pfn(g, c)
        import pandas as pd

        return pd.DataFrame(out).reset_index()

    return aggs, oracle


# ---------------------------------------------------------------------------
# comparison
# ---------------------------------------------------------------------------


def normalize(values) -> list:
    """pandas/polars output -> plain python with None for missing, rounded
    floats (streaming combine trees reassociate float sums)."""
    import pandas as pd

    out = []
    for v in values:
        if v is None or v is pd.NA or (isinstance(v, float) and v != v):
            out.append(None)
        elif isinstance(v, (bool, np.bool_)):
            out.append(bool(v))
        elif isinstance(v, (float, np.floating)):
            out.append(round(float(v), 6))
        elif isinstance(v, (int, np.integer)):
            out.append(int(v))
        else:
            out.append(v)
    return out


def gen_plan(rng: np.random.Generator, lf):
    """Random small plan: 2-4 ops drawn from {filter, with_columns(window /
    cumulative), sort, head, unique} — the shapes that stress optimizer
    passes (pushdown past projections, sort collapse, slice pushdown)."""
    n_ops = int(rng.integers(2, 5))
    for _ in range(n_ops):
        op = rng.random()
        if op < 0.3:
            cond, _, kc = gen_oracle_expr(rng, depth=2)
            if kc != "bool":
                cond = pl.col("f") > 0
            lf = lf.filter(cond)
        elif op < 0.6:
            e = gen_engine_expr(rng, depth=2)
            lf = lf.with_columns(e.alias(f"w{int(rng.integers(0, 1 << 30))}"))
        elif op < 0.8:
            # maintain_order pins tie order: plain sort leaves ties
            # UNSPECIFIED, which a strict opt-vs-none comparison may not see
            lf = lf.sort(
                ["i", "f", "g"][rng.integers(0, 3)],
                nulls_last=bool(rng.integers(0, 2)),
                maintain_order=True,
            )
        elif op < 0.9:
            lf = lf.head(int(rng.integers(1, 30)))
        else:
            lf = lf.unique(subset=["g"], keep="first", maintain_order=True)
    return lf
