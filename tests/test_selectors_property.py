"""Property test: random selector TREES over random schemas, resolved
end-to-end through TableFrame.select, vs a pure-Python model evaluated on
the (name, dtype, position) list (reference tableframe/selectors.py —
name/dtype/positional leaves composed with `| & - ~`).

What this actually exercises (the leaves are simple; the model is an
independent restatement): the select() binding path, schema-order
preservation, negative-index by_index, and that the proxy algebra stays
pure boolean over the leaf predicates at any nesting depth.
"""

from __future__ import annotations

import datetime as dt
import random

import pyspark.sql.types as T
import pytest

import tabsdata_spark as td
from tabsdata_spark.tableframe import selectors as cs

# dtype key -> (spark type string, sample value, type class key)
DTYPES = {
    "long": ("long", 1, "int"),
    "int": ("int", 1, "int"),
    "double": ("double", 1.5, "float"),
    "float": ("float", 1.5, "float"),
    "string": ("string", "s", "str"),
    "boolean": ("boolean", True, "bool"),
    "timestamp": ("timestamp", dt.datetime(2024, 1, 2, 3), "temporal"),
    "date": ("date", dt.date(2024, 1, 2), "temporal"),
}
NAMES = ["amount", "amt_usd", "a1", "Bee", "x", "x_raw", "note2", "idx",
         "total_amount", "flag"]

# leaf name -> (selector factory, model predicate over (name, tclass, i, n))
LEAVES = {
    "numeric": (cs.numeric, lambda nm, tc, i, n: tc in ("int", "float")),
    "integer": (cs.integer, lambda nm, tc, i, n: tc == "int"),
    "float": (cs.float, lambda nm, tc, i, n: tc == "float"),
    "string": (cs.string, lambda nm, tc, i, n: tc == "str"),
    "boolean": (cs.boolean, lambda nm, tc, i, n: tc == "bool"),
    "temporal": (cs.temporal, lambda nm, tc, i, n: tc == "temporal"),
    "all": (cs.all, lambda nm, tc, i, n: True),
    "first": (cs.first, lambda nm, tc, i, n: i == 0),
    "last": (cs.last, lambda nm, tc, i, n: i == n - 1),
    "starts_a": (lambda: cs.starts_with("a"),
                 lambda nm, tc, i, n: nm.startswith("a")),
    "ends_t": (lambda: cs.ends_with("t", "d"),
               lambda nm, tc, i, n: nm.endswith(("t", "d"))),
    "contains_m": (lambda: cs.contains("m", "ee"),
                   lambda nm, tc, i, n: "m" in nm or "ee" in nm),
    "alpha": (cs.alpha, lambda nm, tc, i, n: nm.isalpha()),
    "alnum": (cs.alphanumeric, lambda nm, tc, i, n: nm.isalnum()),
    "matches": (lambda: cs.matches(r"^[ax]"),
                lambda nm, tc, i, n: nm[:1] in ("a", "x")),
    "by_name": (lambda: cs.by_name("x", "idx", "ghost"),
                lambda nm, tc, i, n: nm in ("x", "idx", "ghost")),
    "by_index": (lambda: cs.by_index(0, 2, -1),
                 lambda nm, tc, i, n: i in (0, 2) or i - n in (0, 2, -1)),
}


def gen_tree(rng: random.Random, depth: int):
    """-> (SelectorProxy, model predicate, description)."""
    if depth <= 0 or rng.random() < 0.35:
        key = rng.choice(sorted(LEAVES))
        factory, pred = LEAVES[key]
        return factory(), pred, key
    op = rng.choice(["or", "and", "sub", "not"])
    a, pa, da = gen_tree(rng, depth - 1)
    if op == "not":
        return ~a, (lambda nm, tc, i, n: not pa(nm, tc, i, n)), f"~({da})"
    b, pb, db = gen_tree(rng, depth - 1)
    if op == "or":
        return (a | b,
                lambda nm, tc, i, n: pa(nm, tc, i, n) or pb(nm, tc, i, n),
                f"({da} | {db})")
    if op == "and":
        return (a & b,
                lambda nm, tc, i, n: pa(nm, tc, i, n) and pb(nm, tc, i, n),
                f"({da} & {db})")
    return (a - b,
            lambda nm, tc, i, n: pa(nm, tc, i, n) and not pb(nm, tc, i, n),
            f"({da} - {db})")


@pytest.mark.parametrize("seed", [20260907])
def test_selector_trees_match_model(spark, seed):
    rng = random.Random(seed)
    for p in range(150):
        k = rng.randint(1, 8)
        names = rng.sample(NAMES, k)
        types = [rng.choice(sorted(DTYPES)) for _ in range(k)]
        schema = ", ".join(f"{nm} {DTYPES[t][0]}"
                           for nm, t in zip(names, types))
        row = tuple(DTYPES[t][1] for t in types)
        tf = td.TableFrame.from_spark(spark.createDataFrame([row], schema))
        sel, pred, desc = gen_tree(rng, rng.randint(1, 3))
        got = tf.select(sel).columns
        want = [nm for i, (nm, t) in enumerate(zip(names, types))
                if pred(nm, DTYPES[t][2], i, k)]
        assert got == want, (f"seed={seed} p={p} tree={desc} "
                             f"schema={list(zip(names, types))} "
                             f"got={got} want={want}")
